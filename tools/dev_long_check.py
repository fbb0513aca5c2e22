"""Dev loop for the long-read WFA kernel: interpret-mode equality vs the
oracle on small configs, then synthetic long reads.

Usage: JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu python tools/dev_long_check.py [quick]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import aim_tpu.native as nat  # noqa: E402
from aim_tpu.config import AlignConfig  # noqa: E402
from aim_tpu.ops.wfa_pallas_long import wfa_forward_pallas_long  # noqa: E402
from tests.util import cigar_of, pack, random_pairs  # noqa: E402


def check(cfg, pats, txts, pl_, tl_, tag):
    out = wfa_forward_pallas_long(pats, txts, pl_.astype(np.int32),
                                  tl_.astype(np.int32), cfg=cfg,
                                  interpret=True)
    recs = np.asarray(out["step_records"])
    sc, ops, b, e = nat.wfa_steps_to_ops(
        recs, pl_, tl_, max_score=cfg.max_score, max_ops=2 * cfg.read_size)
    osc, oops, ob, oe = nat.wfa_align(
        pats, txts, pl_, tl_, mismatch=cfg.mismatch, gap_o=cfg.gap_o,
        gap_e=cfg.gap_e, max_score=cfg.max_score, adaptive=cfg.adaptive,
        backtrace=cfg.backtrace)
    bad = 0
    for i in range(len(pl_)):
        if sc[i] != osc[i]:
            if bad < 3:
                print(f"  [{tag}] pair {i}: score {sc[i]} != {osc[i]} "
                      f"(plen={pl_[i]} tlen={tl_[i]})")
            bad += 1
            continue
        if cfg.backtrace and osc[i] <= cfg.max_score:
            c1 = cigar_of(ops[i], b[i], e[i])
            c2 = cigar_of(oops[i], ob[i], oe[i])
            if c1 != c2:
                if bad < 3:
                    print(f"  [{tag}] pair {i}: cigar {c1[:50]} != {c2[:50]}"
                          f" score={sc[i]}")
                bad += 1
    print(f"[{tag}] n={len(pl_)} mismatches={bad}", flush=True)
    return bad


def synth(n, l, e, read_size, seed=0):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", np.uint8)
    pats = np.zeros((n, read_size), np.uint8)
    txts = np.zeros((n, read_size), np.uint8)
    p0 = bases[rng.integers(0, 4, (n, l))]
    t0 = np.where(rng.random((n, l)) < e,
                  bases[rng.integers(0, 4, (n, l))], p0)
    pats[:, :l] = p0
    txts[:, :l] = t0
    return pats, txts, np.full(n, l, np.int32), np.full(n, l, np.int32)


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    total = 0
    cases = [
        ("default", dict(mismatch=3, gap_o=4, gap_e=1, max_score=8,
                         read_size=32), 24, 20),
        ("adaptive", dict(mismatch=3, gap_o=4, gap_e=1, max_score=12,
                          read_size=32, adaptive=True), 25, 24),
        ("ge>go", dict(mismatch=2, gap_o=1, gap_e=3, max_score=9,
                       read_size=24), 27, 16),
    ]
    if quick:
        cases = cases[:1]
    for tag, kw, seed, maxlen in cases:
        cfg = AlignConfig(algo="wfa", backtrace=True, variant="hbm", **kw)
        pairs = random_pairs(seed=seed, n=80, max_len=maxlen)
        pats, txts, pl_, tl_ = pack(pairs, cfg.read_size)
        total += check(cfg, pats, txts, pl_, tl_, tag)
    if not quick:
        # modest long reads: l=400, e=2% -> smax ~ 40
        cfg = AlignConfig(algo="wfa", backtrace=True, variant="hbm",
                          mismatch=3, gap_o=4, gap_e=1, max_score=40,
                          read_size=416, adaptive=True)
        total += check(cfg, *synth(64, 400, 0.02, 416, seed=5), "l400")
    print("TOTAL mismatches:", total)
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()

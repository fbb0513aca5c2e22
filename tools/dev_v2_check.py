"""Dev loop for the v2 WFA kernel: interpret-mode equality vs the oracle.

Usage: JAX_PLATFORMS=cpu JAX_PLATFORM_NAME=cpu python tools/dev_v2_check.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import aim_tpu.native as nat  # noqa: E402
from aim_tpu.config import AlignConfig  # noqa: E402
from aim_tpu.ops.wfa_pallas2 import wfa_forward_pallas2, record_rows  # noqa: E402
from tests.util import cigar_of, pack, random_pairs  # noqa: E402


def check(cfg, pairs, tag):
    pats, txts, pl_, tl_ = pack(pairs, cfg.read_size)
    out = wfa_forward_pallas2(pats, txts, pl_.astype(np.int32),
                              tl_.astype(np.int32), cfg=cfg, interpret=True)
    recs = np.asarray(out["step_records"])
    sc, ops, b, e = nat.wfa_steps_to_ops(
        recs, pl_, tl_, max_score=cfg.max_score,
        max_ops=2 * cfg.read_size)
    osc, oops, ob, oe = nat.wfa_align(
        pats, txts, pl_, tl_, mismatch=cfg.mismatch, gap_o=cfg.gap_o,
        gap_e=cfg.gap_e, max_score=cfg.max_score, adaptive=cfg.adaptive,
        backtrace=cfg.backtrace)
    bad = 0
    for i in range(len(pairs)):
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
                    print(f"  [{tag}] pair {i}: cigar {c1[:60]} != {c2[:60]}"
                          f" score={sc[i]}")
                bad += 1
    print(f"[{tag}] n={len(pairs)} mismatches={bad}")
    return bad


def main():
    total = 0
    cases = [
        ("default", dict(mismatch=3, gap_o=4, gap_e=1, max_score=8,
                         read_size=32), 24, 20),
        ("adaptive", dict(mismatch=3, gap_o=4, gap_e=1, max_score=12,
                          read_size=32, adaptive=True), 25, 24),
        ("cheapgaps", dict(mismatch=5, gap_o=1, gap_e=1, max_score=10,
                           read_size=32), 26, 24),
        ("ge>go", dict(mismatch=2, gap_o=1, gap_e=3, max_score=9,
                       read_size=24), 27, 16),
        ("bigx", dict(mismatch=7, gap_o=2, gap_e=2, max_score=14,
                      read_size=40, adaptive=True), 28, 30),
        ("tiny", dict(mismatch=3, gap_o=4, gap_e=1, max_score=5,
                      read_size=16), 29, 8),
    ]
    for tag, kw, seed, maxlen in cases:
        cfg = AlignConfig(algo="wfa", backtrace=True, **kw)
        pairs = random_pairs(seed=seed, n=144, max_len=maxlen)
        total += check(cfg, pairs, tag)
    print("TOTAL mismatches:", total)
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()

"""Interpret-mode randomized-cost-model fuzz for the VMEM kernels.

Complements tools/fuzz_kernels.py (which goes through api.align and so
exercises XLA tiers on CPU hosts): this drives the Pallas VMEM kernels
DIRECTLY in interpret mode with randomized cost models, so it is
CPU-runnable kernel coverage.  Flagged pairs are excluded (their
fallback is the exactness contract); unflagged pairs must match the
oracle byte-for-byte.

    python tools/dev_vmem_fuzz.py [seed0] [n_models]
"""

import random
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import aim_tpu.native as nat  # noqa: E402
from aim_tpu.config import AlignConfig, wram_feasible  # noqa: E402
from tests.util import cigar_of, pack, random_pairs  # noqa: E402


def _cigars_equal(i, o, b, e, oo, ob, oe):
    return cigar_of(o[i], b[i], e[i]) == cigar_of(oo[i], ob[i], oe[i])


def fuzz_nw(rng, seed):
    from aim_tpu.ops.nw_pallas import nw_forward_pallas, vmem_fit_nw
    R = rng.choice([48, 96, 112])
    cfg = AlignConfig(algo="nw", read_size=R, backtrace=True,
                      max_score=rng.randrange(8, 40),
                      gap_i=rng.randrange(1, 6), gap_d=rng.randrange(1, 6),
                      mismatch=rng.randrange(1, 6))
    if not vmem_fit_nw(cfg):
        return 0, 0
    pairs = random_pairs(seed=seed, n=128, max_len=R - 8, balanced=False)
    pats, txts, pl, tl = pack(pairs, R)
    out = nw_forward_pallas(pats, txts, pl, tl, cfg=cfg, interpret=True)
    pr = np.asarray(out["packed_runs"])
    sc = pr[:, 1].astype(np.int32)
    fb = ((pr[:, 0].astype(np.int32) >> 8) & 1).astype(bool)
    osc, oo, ob, oe = nat.nw_align(pats, txts, pl, tl, mismatch=cfg.mismatch,
                                   gap_i=cfg.gap_i, gap_d=cfg.gap_d,
                                   backtrace=True)
    o, b, e = nat.wfa_runs_to_ops(pr, sc, pl, tl, max_score=1 << 30,
                                  max_ops=2 * R)
    bad = sum(1 for i in range(len(pl)) if not fb[i] and
              (sc[i] != osc[i] or not _cigars_equal(i, o, b, e, oo, ob, oe)))
    print(f"nw {dict(R=R, s=cfg.max_score, gi=cfg.gap_i, gd=cfg.gap_d, x=cfg.mismatch)} "
          f"seed={seed}: flagged={int(fb.sum())}/128 bad={bad}", flush=True)
    return bad, 1


def fuzz_swg(rng, seed):
    from aim_tpu.ops.swg_pallas import (swg_forward_pallas, swg_int8_sound,
                                        vmem_fit_swg)
    R = rng.choice([48, 96])
    variant = rng.choice(["vmem", "hbm"])  # int8 / int16 cells (derived)
    cfg = AlignConfig(algo="swg", read_size=R, backtrace=True,
                      max_score=rng.randrange(20, 120),
                      match=rng.choice([0, 0, 1]),
                      mismatch=rng.randrange(1, 8),
                      gap_o=rng.randrange(1, 7), gap_e=rng.randrange(1, 5),
                      variant=variant)
    cw = cfg.cell_width
    int8_ok = cfg.cell_width != 1 or (wram_feasible(cfg)
                                      and swg_int8_sound(cfg))
    if not (vmem_fit_swg(cfg) and int8_ok and cfg.match >= 0):
        return 0, 0
    pairs = random_pairs(seed=seed, n=128, max_len=R - 8, balanced=False)
    pats, txts, pl, tl = pack(pairs, R)
    out = swg_forward_pallas(pats, txts, pl, tl, cfg=cfg, interpret=True)
    pr = np.asarray(out["packed_runs"])
    sc = pr[:, 1].astype(np.int32)
    fb = ((pr[:, 0].astype(np.int32) >> 8) & 1).astype(bool)
    osc, oo, ob, oe = nat.swg_align(pats, txts, pl, tl, match=cfg.match,
                                    mismatch=cfg.mismatch, gap_o=cfg.gap_o,
                                    gap_e=cfg.gap_e, max_score=cfg.max_score,
                                    cell_width=cfg.cell_width, backtrace=True)
    o, b, e = nat.wfa_runs_to_ops(pr, sc, pl, tl, max_score=1 << 30,
                                  max_ops=2 * R)
    bad = sum(1 for i in range(len(pl)) if not fb[i] and
              (sc[i] != osc[i] or not _cigars_equal(i, o, b, e, oo, ob, oe)))
    print(f"swg {dict(R=R, s=cfg.max_score, m=cfg.match, x=cfg.mismatch, go=cfg.gap_o, ge=cfg.gap_e, cw=cw)} "
          f"seed={seed}: flagged={int(fb.sum())}/128 bad={bad}", flush=True)
    return bad, 1


def fuzz_wfa2(rng, seed):
    from aim_tpu.ops.wfa_pallas2 import vmem_fit2, wfa_forward_pallas2
    R = rng.choice([48, 96, 200, 254])
    cfg = AlignConfig(algo="wfa", read_size=R, backtrace=True,
                      max_score=rng.randrange(8, 36),
                      mismatch=rng.randrange(1, 6),
                      gap_o=rng.randrange(1, 6), gap_e=rng.randrange(1, 5),
                      adaptive=rng.choice([False, True]))
    if not vmem_fit2(cfg):
        return 0, 0
    pairs = random_pairs(seed=seed, n=128, max_len=R - 8, balanced=False)
    pats, txts, pl, tl = pack(pairs, R)
    out = wfa_forward_pallas2(pats, txts, pl, tl, cfg=cfg, interpret=True)
    rec = np.asarray(out["step_records"])
    sc, o, b, e = nat.wfa_steps_to_ops(rec, pl, tl, max_score=cfg.max_score,
                                       max_ops=2 * R)
    osc, oo, ob, oe = nat.wfa_align(pats, txts, pl, tl,
                                    mismatch=cfg.mismatch, gap_o=cfg.gap_o,
                                    gap_e=cfg.gap_e, max_score=cfg.max_score,
                                    adaptive=cfg.adaptive, backtrace=True)
    bad = int((sc != osc).sum())
    bad += sum(1 for i in range(len(pl)) if osc[i] <= cfg.max_score and
               not _cigars_equal(i, o, b, e, oo, ob, oe))
    print(f"wfa {dict(R=R, s=cfg.max_score, x=cfg.mismatch, go=cfg.gap_o, ge=cfg.gap_e, a=cfg.adaptive)} "
          f"seed={seed}: bad={bad}", flush=True)
    return bad, 1


def fuzz_genasm(rng, seed):
    from aim_tpu.ops.genasm_pallas import (genasm_forward_pallas,
                                           vmem_fit_genasm)
    from aim_tpu.ops.common import pack_seqs
    R = rng.choice([24, 48, 60])
    cfg = AlignConfig(algo="genasm", read_size=R, backtrace=True,
                      max_score=rng.randrange(4, 26),
                      mismatch=1, gap_i=1, gap_d=1)
    if not vmem_fit_genasm(cfg):
        return 0, 0
    pairs = random_pairs(seed=seed, n=128, max_len=R - 8, balanced=False)
    pats, txts, pl, tl = pack(pairs, R)
    pp, pt, okp = pack_seqs(pats, txts, pl, tl, R)
    assert okp
    out = genasm_forward_pallas(pp, pt, pl, tl, cfg=cfg, interpret=True,
                                packed=True)
    rec = np.asarray(out["genasm_records"])
    sc, o, b, e = nat.wfa_steps_to_ops(rec, pl, tl, max_score=R,
                                       max_ops=2 * R)
    osc, oo, ob, oe = nat.genasm_align(pats, txts, pl, tl,
                                       max_score=cfg.max_score,
                                       backtrace=True)
    bad = int((sc != osc).sum())
    bad += sum(1 for i in range(len(pl)) if osc[i] <= cfg.max_score and
               not _cigars_equal(i, o, b, e, oo, ob, oe))
    print(f"genasm {dict(R=R, k=cfg.max_score)} seed={seed}: bad={bad}",
          flush=True)
    return bad, 1


def main():
    seed0 = int(sys.argv[1]) if len(sys.argv) > 1 else 501
    n_models = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    total_bad = ran = 0
    for s in range(seed0, seed0 + n_models):
        rng = random.Random(s * 7919)
        for fn in (fuzz_nw, fuzz_swg, fuzz_wfa2, fuzz_genasm):
            bad, did = fn(rng, s)
            total_bad += bad
            ran += did
    print(f"VMEM FUZZ {'FAIL' if total_bad else 'OK'} "
          f"({ran} kernel runs, bad={total_bad})")
    sys.exit(1 if total_bad else 0)


if __name__ == "__main__":
    main()

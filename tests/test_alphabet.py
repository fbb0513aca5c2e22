"""Alphabet coverage: the NW/SWG device tiers (VMEM banded AND
HBM-streamed) compare symbols as raw bytes, so they serve ANY byte
alphabet — 2-bit packing is only a transport optimization, not a
correctness requirement.  Only the WFA kernels and GenASM (bit-parallel
designs over 2-bit words) require <=4 symbols and fall back to the
exact XLA/host tiers beyond it (api.align requires_packed gate).
The reference compares raw chars (e.g. NW/DPU-WRAM/dpu/nw.c:76-94), so
non-ACGT inputs are reference-parity, not an extension."""

import numpy as np
import pytest

import aim_tpu.native as nat
from aim_tpu.config import AlignConfig, derive_config
from tests.util import cigar_of


def _five_symbol_pairs(rng, n, R, lo, hi, err):
    bases = np.frombuffer(b"ACGTN", np.uint8)
    pats = np.zeros((n, R), np.uint8)
    txts = np.zeros((n, R), np.uint8)
    pl = np.zeros(n, np.int32)
    tl = np.zeros(n, np.int32)
    for i in range(n):
        lp = int(rng.integers(lo, hi))
        lt = lp + int(rng.integers(-1, 2))
        if lp > lt + 1:
            lp = lt + 1
        p = bases[rng.integers(0, 5, lp)]
        t = p[:min(lp, lt)].copy()
        if len(t) < lt:
            t = np.concatenate([t, bases[rng.integers(0, 5, lt - len(t))]])
        mut = rng.random(len(t)) < err
        t = np.where(mut, bases[rng.integers(0, 5, len(t))],
                     t).astype(np.uint8)
        pats[i, :lp] = p
        txts[i, :lt] = t
        pl[i], tl[i] = lp, lt
    # really uses the 5th symbol
    assert (pats == ord("N")).any()
    return pats, txts, pl, tl


def _oracle(algo, cfg, pats, txts, pl, tl):
    if algo == "nw":
        return nat.nw_align(pats, txts, pl, tl, mismatch=cfg.mismatch,
                            gap_i=cfg.gap_i, gap_d=cfg.gap_d,
                            backtrace=True)
    return nat.swg_align(pats, txts, pl, tl, match=cfg.match,
                         mismatch=cfg.mismatch, gap_o=cfg.gap_o,
                         gap_e=cfg.gap_e, max_score=cfg.max_score,
                         cell_width=cfg.cell_width, backtrace=True)


def _check(algo, cfg, fn, pats, txts, pl, tl, max_flag_frac):
    out = fn(pats, txts, pl, tl, cfg=cfg, interpret=True, packed=False)
    pr = np.asarray(out["packed_runs"])
    sc = pr[:, 1].astype(np.int32)
    fb = ((pr[:, 0].astype(np.int32) >> 8) & 1).astype(bool)
    assert fb.mean() <= max_flag_frac
    want, wops, wb, we = _oracle(algo, cfg, pats, txts, pl, tl)
    good = ~fb
    assert good.any()
    np.testing.assert_array_equal(sc[good], want[good])
    o, b, e = nat.wfa_runs_to_ops(pr, sc, pl, tl, max_score=(1 << 30),
                                  max_ops=2 * cfg.read_size)
    for i in range(len(pl)):
        if good[i]:
            assert cigar_of(o[i], b[i], e[i]) == \
                cigar_of(wops[i], wb[i], we[i]), i


@pytest.mark.parametrize("algo", ["nw", "swg"])
def test_vmem_tier_five_symbol_alphabet(algo):
    from aim_tpu.ops.nw_pallas import nw_forward_pallas
    from aim_tpu.ops.swg_pallas import swg_forward_pallas
    rng = np.random.default_rng(23)
    cfg = derive_config(algo, 100, 0.01, backtrace=True)
    pats, txts, pl, tl = _five_symbol_pairs(rng, 16, cfg.read_size,
                                            60, 100, 0.02)
    fn = nw_forward_pallas if algo == "nw" else swg_forward_pallas
    _check(algo, cfg, fn, pats, txts, pl, tl, max_flag_frac=0.6)


@pytest.mark.parametrize("algo", ["nw", "swg"])
def test_streamed_tier_five_symbol_alphabet(algo):
    from aim_tpu.ops.nwswg_pallas_long import nwswg_forward_pallas_long
    rng = np.random.default_rng(29)
    R = 96
    cfg = (AlignConfig(algo="nw", read_size=R, max_score=60,
                       backtrace=True, gap_i=2, gap_d=3, mismatch=3,
                       variant="hbm") if algo == "nw" else
           AlignConfig(algo="swg", read_size=R, max_score=400,
                       backtrace=True, match=0, mismatch=3, gap_o=4,
                       gap_e=1, variant="hbm"))
    pats, txts, pl, tl = _five_symbol_pairs(rng, 16, R, 50, 90, 0.02)
    # the tiny geometry flags conservatively (band envelope vs R=96);
    # the assertion that matters is exactness on the unflagged pairs
    _check(algo, cfg, nwswg_forward_pallas_long, pats, txts, pl, tl,
           max_flag_frac=0.6)

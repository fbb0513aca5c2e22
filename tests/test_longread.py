"""Long-read (HBM tier) path: larger READ_SIZE / MAX_SCORE configs — the
analogue of the reference's DPU-MRAM variants (NW READ_SIZE 1120,
WFA MAX_SCORE 250; ref common.h defaults)."""

import numpy as np

import aim_tpu.native as nat
from aim_tpu.config import AlignConfig
from tests.util import cigar_of, make_pair, pack

import random

R = 264
N = 12


def _pairs():
    rng = random.Random(41)
    out = []
    for _ in range(N):
        plen = rng.randrange(150, R - 30)
        tlen = max(1, plen + rng.choice([-1, 0, 0, 1]))
        out.append(make_pair(rng, plen, tlen, rng.randrange(0, 8)))
    return out


def test_wfa_hbm_longread_matches_oracle():
    from aim_tpu.api import align
    pairs = _pairs()
    pats, txts, pl, tl = pack(pairs, R)
    cfg = AlignConfig(algo="wfa", read_size=R, max_score=40, backtrace=True,
                      adaptive=True, variant="hbm", backend="xla",
                      batch_pairs=16)
    res = align(pats, txts, pl, tl, cfg)
    osc, oops, ob, oe = nat.wfa_align(pats, txts, pl, tl, mismatch=3,
                                      gap_o=4, gap_e=1, max_score=40,
                                      adaptive=True, backtrace=True)
    np.testing.assert_array_equal(res.scores, osc)
    for i in range(N):
        assert cigar_of(res.ops[i], res.begin[i], res.end[i]) == \
            cigar_of(oops[i], ob[i], oe[i])


def test_swg_hbm_int16_cells():
    # The MRAM-tier SWG always uses int16 cells (SURVEY §2.5) — larger
    # MAX_SCORE sentinel exercises that path.
    from aim_tpu.api import align
    pairs = _pairs()
    pats, txts, pl, tl = pack(pairs, R)
    cfg = AlignConfig(algo="swg", read_size=R, max_score=400, variant="hbm",
                      backend="xla", backtrace=True, batch_pairs=16)
    assert cfg.cell_width == 2
    res = align(pats, txts, pl, tl, cfg)
    osc, oops, ob, oe = nat.swg_align(pats, txts, pl, tl, match=0, mismatch=3,
                                      gap_o=4, gap_e=1, max_score=400,
                                      cell_width=2, backtrace=True)
    np.testing.assert_array_equal(res.scores, osc)
    for i in range(N):
        assert cigar_of(res.ops[i], res.begin[i], res.end[i]) == \
            cigar_of(oops[i], ob[i], oe[i])


def test_wfa_long_kernel_interpret_matches_oracle():
    """The HBM-spill Pallas kernel (ops/wfa_pallas_long.py) in interpret
    mode: forward ring + HBM history DMA + level-walk backtrace must be
    byte-exact vs the oracle (the real-TPU sweep incl. 10 kbp/smax=500
    runs out-of-band: tools/dev_long_tpu.py)."""
    from aim_tpu.ops.wfa_pallas_long import (long_fit,
                                             wfa_forward_pallas_long)

    pairs = _pairs()
    pats, txts, pl, tl = pack(pairs, R)
    cfg = AlignConfig(algo="wfa", read_size=R, max_score=40, backtrace=True,
                      adaptive=True, variant="hbm")
    assert long_fit(cfg)
    out = wfa_forward_pallas_long(pats, txts, pl.astype(np.int32),
                                  tl.astype(np.int32), cfg=cfg,
                                  interpret=True)
    recs = np.asarray(out["step_records"])
    sc, ops, b, e = nat.wfa_steps_to_ops(recs, pl, tl, max_score=40,
                                         max_ops=2 * R)
    osc, oops, ob, oe = nat.wfa_align(pats, txts, pl, tl, mismatch=3,
                                      gap_o=4, gap_e=1, max_score=40,
                                      adaptive=True, backtrace=True)
    np.testing.assert_array_equal(sc, osc)
    for i in range(N):
        assert cigar_of(ops[i], b[i], e[i]) == \
            cigar_of(oops[i], ob[i], oe[i])


def test_wfa_tier_selection():
    """Dispatch: short configs take the VMEM kernel, beyond-VMEM configs
    the HBM-spill kernel, and giants fall back to XLA."""
    from aim_tpu.config import derive_config
    from aim_tpu.ops.pallas_kernels import forward_fn
    from aim_tpu.ops.wfa_pallas2 import vmem_fit2

    short = derive_config("wfa", 100, 0.01, backtrace=True, adaptive=True)
    assert vmem_fit2(short) and forward_fn(short) is not None

    long_ = derive_config("wfa", 10000, 0.01, backtrace=True, adaptive=True,
                          variant="hbm")
    assert not vmem_fit2(long_)
    fn = forward_fn(long_)
    assert fn is not None and getattr(fn, "requires_packed", False)

    giant = long_.replace(max_score=2000)
    assert forward_fn(giant) is None


def test_wfa_long_kernel_mixed_lengths_interpret():
    """One tile mixing empty, tiny, and full-length pairs: the extend's
    block-window bounds span the whole word range (worst case for the
    gather skipping) and padded pairs finish at score 0."""
    from aim_tpu.ops.wfa_pallas_long import wfa_forward_pallas_long

    rng = np.random.default_rng(91)
    bases = np.frombuffer(b"ACGT", np.uint8)
    R2, K2 = 520, 50
    n = 16
    pats = np.zeros((n, R2), np.uint8)
    txts = np.zeros((n, R2), np.uint8)
    pl = np.zeros(n, np.int32)
    tl = np.zeros(n, np.int32)
    lens = [0, 1, 13, 50, 250, 500]
    for i in range(n):
        lp = lens[i % len(lens)]
        lt = max(0, lp + int(rng.integers(-3, 4))) if lp else 0
        p0 = bases[rng.integers(0, 4, lp)] if lp else np.zeros(0, np.uint8)
        if lt <= lp:
            t0 = p0[:lt].copy()
        else:
            t0 = np.concatenate([p0, bases[rng.integers(0, 4, lt - lp)]])
        if lt:
            mut = rng.random(lt) < 0.02
            t0 = np.where(mut, bases[rng.integers(0, 4, lt)], t0)
        pats[i, :lp] = p0
        txts[i, :lt] = t0
        pl[i] = lp
        tl[i] = lt
    cfg = AlignConfig(algo="wfa", read_size=R2, max_score=K2,
                      backtrace=True, adaptive=True, variant="hbm")
    out = wfa_forward_pallas_long(pats, txts, pl, tl, cfg=cfg,
                                  interpret=True)
    recs = np.asarray(out["step_records"])
    sc, ops, b, e = nat.wfa_steps_to_ops(recs, pl, tl, max_score=K2,
                                         max_ops=2 * R2)
    osc, oops, ob, oe = nat.wfa_align(pats, txts, pl, tl, mismatch=3,
                                      gap_o=4, gap_e=1, max_score=K2,
                                      adaptive=True, backtrace=True)
    np.testing.assert_array_equal(sc, osc)
    for i in range(n):
        if osc[i] <= K2:
            assert cigar_of(ops[i], b[i], e[i]) == \
                cigar_of(oops[i], ob[i], oe[i]), i

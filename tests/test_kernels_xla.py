"""TPU kernels (XLA backend) vs the native exact-semantics oracle:
scores AND CIGARs must match on randomized inputs including the
plen == tlen+1 tape-aliasing cases."""

import numpy as np
import pytest

import aim_tpu.native as nat
from aim_tpu.config import AlignConfig
from tests.util import cigar_of, pack, random_pairs

R = 24
PAIRS = random_pairs(seed=11, n=64, max_len=R)
PACKED = pack(PAIRS, R)


def test_nw_xla_matches_oracle():
    from aim_tpu.ops.nw_xla import nw_forward
    pats, txts, pl, tl = PACKED
    cfg = AlignConfig(algo="nw", read_size=R, backtrace=True)
    out = nw_forward(pats, txts, pl, tl, cfg=cfg)
    sc = np.asarray(out["scores"])
    fb = np.asarray(out["needs_fallback"])
    osc, oops, ob, oe = nat.nw_align(pats, txts, pl, tl, mismatch=3,
                                     gap_i=4, gap_d=4, backtrace=True)
    wops, wb, we = nat.nw_traceback_bits(np.asarray(out["bits"]), pl, tl, 2 * R)
    checked = 0
    for i in range(len(PAIRS)):
        if fb[i]:
            continue  # flagged pairs are rerouted to the oracle by api.align
        checked += 1
        assert sc[i] == osc[i], (i, PAIRS[i])
        assert cigar_of(oops[i], ob[i], oe[i]) == cigar_of(wops[i], wb[i], we[i])
    assert checked >= len(PAIRS) * 0.8


def test_swg_xla_matches_oracle():
    from aim_tpu.ops.swg_xla import swg_forward
    pats, txts, pl, tl = PACKED
    cfg = AlignConfig(algo="swg", read_size=R, max_score=26, backtrace=True)
    out = swg_forward(pats, txts, pl, tl, cfg=cfg)
    sc = np.asarray(out["scores"])
    fb = np.asarray(out["needs_fallback"])
    osc, oops, ob, oe = nat.swg_align(pats, txts, pl, tl, match=0, mismatch=3,
                                      gap_o=4, gap_e=1, max_score=26,
                                      cell_width=1, backtrace=True)
    wops, wb, we = nat.swg_traceback_bits(np.asarray(out["bits"]), pl, tl, 2 * R)
    checked = 0
    for i in range(len(PAIRS)):
        if fb[i]:
            continue
        checked += 1
        assert np.int8(sc[i]) == osc[i], (i, PAIRS[i])
        assert cigar_of(oops[i], ob[i], oe[i]) == cigar_of(wops[i], wb[i], we[i])
    assert checked >= len(PAIRS) * 0.7


@pytest.mark.parametrize("adaptive", [False, True])
def test_wfa_xla_matches_oracle(adaptive):
    from aim_tpu.ops.wfa_xla import wfa_forward
    pats, txts, pl, tl = PACKED
    smax = 15
    cfg = AlignConfig(algo="wfa", read_size=R, max_score=smax,
                      backtrace=True, adaptive=adaptive)
    out = wfa_forward(pats, txts, pl, tl, cfg=cfg)
    sc = np.asarray(out["scores"]).astype(np.int32)
    osc, oops, ob, oe = nat.wfa_align(pats, txts, pl, tl, mismatch=3,
                                      gap_o=4, gap_e=1, max_score=smax,
                                      adaptive=adaptive, backtrace=True)
    np.testing.assert_array_equal(sc, osc)
    K = 2 * smax + 1
    ph = np.asarray(out["packed_hist"])
    pm = np.asarray(out["packed_meta"])
    wops, wb, we = nat.wfa_backtrace_batch(
        ph[:, :, :K], ph[:, :, K:2 * K], ph[:, :, 2 * K:3 * K],
        pm[:, :, 0].astype(np.int32), pm[:, :, 1].astype(np.int32),
        pm[:, :, 2].astype(np.uint8), sc,
        pats, txts, pl, tl, mismatch=3, gap_o=4, gap_e=1, max_score=smax)
    for i in range(len(PAIRS)):
        assert cigar_of(oops[i], ob[i], oe[i]) == cigar_of(wops[i], wb[i], we[i]), \
            (i, PAIRS[i])


def test_api_align_with_fallback():
    """api.align reroutes flagged pairs; end result always equals oracle."""
    from aim_tpu.api import align
    pairs = random_pairs(seed=13, n=48, max_len=R, balanced=False)  # many plen>tlen+1
    pats, txts, pl, tl = pack(pairs, R)
    cfg = AlignConfig(algo="nw", read_size=R, backtrace=True, backend="xla",
                      batch_pairs=32)
    res = align(pats, txts, pl, tl, cfg)
    osc, oops, ob, oe = nat.nw_align(pats, txts, pl, tl, mismatch=3, gap_i=4,
                                     gap_d=4, backtrace=True)
    np.testing.assert_array_equal(res.scores, osc)
    for i in range(len(pairs)):
        assert cigar_of(res.ops[i], res.begin[i], res.end[i]) == \
            cigar_of(oops[i], ob[i], oe[i])

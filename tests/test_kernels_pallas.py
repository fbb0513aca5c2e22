"""Pallas TPU kernels in interpreter mode vs the native oracle —
the CPU-simulator analogue of the reference's functional simulator
(SURVEY.md §4)."""

import numpy as np
import pytest

import aim_tpu.native as nat
from aim_tpu.config import AlignConfig
from tests.util import cigar_of, pack, random_pairs

R = 24
SMAX = 15
PAIRS = random_pairs(seed=17, n=128, max_len=R)
PACKED = pack(PAIRS, R)


@pytest.mark.parametrize("adaptive", [False, True])
def test_wfa_pallas_interpret_matches_oracle(adaptive):
    from aim_tpu.ops.wfa_pallas import wfa_forward_pallas
    pats, txts, pl, tl = PACKED
    cfg = AlignConfig(algo="wfa", read_size=R, max_score=SMAX,
                      backtrace=True, adaptive=adaptive)
    out = wfa_forward_pallas(pats, txts, pl, tl, cfg=cfg, interpret=True)
    sc = np.asarray(out["scores"]).astype(np.int32)
    osc, oops, ob, oe = nat.wfa_align(pats, txts, pl, tl, mismatch=3,
                                      gap_o=4, gap_e=1, max_score=SMAX,
                                      adaptive=adaptive, backtrace=True)
    np.testing.assert_array_equal(sc, osc)
    K = 2 * SMAX + 1
    ph = np.asarray(out["packed_hist"])
    pm = np.asarray(out["packed_meta"])
    wops, wb, we = nat.wfa_backtrace_batch(
        ph[:, :, :K], ph[:, :, K:2 * K], ph[:, :, 2 * K:3 * K],
        pm[:, :, 0].astype(np.int32), pm[:, :, 1].astype(np.int32),
        pm[:, :, 2].astype(np.uint8), sc, pats, txts, pl, tl,
        mismatch=3, gap_o=4, gap_e=1, max_score=SMAX, score_major=True)
    for i in range(len(PAIRS)):
        assert cigar_of(oops[i], ob[i], oe[i]) == \
            cigar_of(wops[i], wb[i], we[i]), (i, PAIRS[i])

"""Cross-check the independent pure-Python goldens against the native C++
oracle — two implementations of the reference semantics must agree."""

import numpy as np
import pytest

import aim_tpu.native as nat
from aim_tpu.golden import nw_golden, swg_golden, wfa_golden, rle
from tests.util import cigar_of, pack, random_pairs

R = 32
PAIRS = random_pairs(seed=7, n=60, max_len=R, balanced=False)
PACKED = pack(PAIRS, R)


def test_nw():
    pats, txts, pl, tl = PACKED
    sc, ops, b, e = nat.nw_align(pats, txts, pl, tl, mismatch=3, gap_i=4,
                                 gap_d=4, backtrace=True)
    for i, (p, t) in enumerate(PAIRS):
        g = nw_golden(p, t, backtrace=True)
        assert g["score"] == sc[i], (i, p, t)
        assert g["cigar"] == rle(cigar_of(ops[i], b[i], e[i]).decode()), (i, p, t)


@pytest.mark.parametrize("cell_width,max_score", [(1, 26), (2, 400)])
def test_swg(cell_width, max_score):
    pats, txts, pl, tl = PACKED
    sc, ops, b, e = nat.swg_align(pats, txts, pl, tl, match=0, mismatch=3,
                                  gap_o=4, gap_e=1, max_score=max_score,
                                  cell_width=cell_width, backtrace=True)
    for i, (p, t) in enumerate(PAIRS):
        g = swg_golden(p, t, max_score=max_score, cell_width=cell_width,
                       backtrace=True)
        assert g["score"] == sc[i], (i, p, t)
        assert g["cigar"] == rle(cigar_of(ops[i], b[i], e[i]).decode()), (i, p, t)


@pytest.mark.parametrize("adaptive", [False, True])
def test_wfa(adaptive):
    pats, txts, pl, tl = PACKED
    sc, ops, b, e = nat.wfa_align(pats, txts, pl, tl, mismatch=3, gap_o=4,
                                  gap_e=1, max_score=30, adaptive=adaptive,
                                  backtrace=True)
    for i, (p, t) in enumerate(PAIRS):
        g = wfa_golden(p, t, max_score=30, adaptive=adaptive, backtrace=True)
        assert g["score"] == sc[i], (i, p, t)
        assert g["cigar"] == rle(cigar_of(ops[i], b[i], e[i]).decode()), (i, p, t)


def test_wfa_overflow_emits_1M():
    # score > MAX_SCORE: score = MAX_SCORE+1, cigar stays the prefilled
    # single 'M' (MRAM-tier behavior, ref: wfa.c:399-404).
    p, t = "AAAAAAAA", "TTTTTTTT"
    pats, txts, pl, tl = pack([(p, t)], 16)
    sc, ops, b, e = nat.wfa_align(pats, txts, pl, tl, mismatch=3, gap_o=4,
                                  gap_e=1, max_score=5, adaptive=False,
                                  backtrace=True)
    assert sc[0] == 6
    assert rle(cigar_of(ops[0], b[0], e[0]).decode()) == "1M"
    g = wfa_golden(p, t, max_score=5, backtrace=True)
    assert g["score"] == 6 and g["cigar"] == "1M"

from aim_tpu.config import AlignConfig, derive_config, launcher_pad8


def test_launcher_pad8_matches_reference_formula():
    # ceil((x+7)/8)*8 with float division (run-wfa-pim-mram.py:67)
    assert launcher_pad8(101) == 112
    # the reference formula over-pads exact multiples too: ceil(103/8)*8
    assert launcher_pad8(96) == 104
    assert launcher_pad8(97) == 104
    assert launcher_pad8(100 + 100 * 0.01) == 112


def test_derive_wfa_canonical():
    cfg = derive_config("wfa", 100, 0.01, backtrace=True, adaptive=True)
    assert cfg.read_size == 112
    assert cfg.max_score == 5          # ceil(max(1*3, 1*(4+1)))
    cfg5 = derive_config("wfa", 100, 0.05)
    assert cfg5.max_score == 25        # the README canonical MAX_SCORE
    assert cfg5.read_size == 112


def test_derive_nw_uses_double_gap():
    cfg = derive_config("nw", 100, 0.02, gap=4)
    # max(2*3, 2*(4+4)) = 16
    assert cfg.max_score == 16
    assert cfg.gap_i == cfg.gap_d == 4


def test_swg_cell_width_rule():
    assert AlignConfig(algo="swg", max_score=26).cell_width == 1
    assert AlignConfig(algo="swg", max_score=200).cell_width == 2
    assert AlignConfig(algo="swg", max_score=26, variant="hbm").cell_width == 2
    assert AlignConfig(algo="nw").cell_width == 2


def test_penalty_validation():
    import pytest
    with pytest.raises(ValueError):
        AlignConfig(algo="wfa", mismatch=0).validate()
    with pytest.raises(ValueError):
        AlignConfig(algo="swg", match=1).validate()

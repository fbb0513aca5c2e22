"""Pallas TPU kernels in interpreter mode vs the native oracle —
the CPU-simulator analogue of the reference's functional simulator
(SURVEY.md §4).  Covers the full on-device pipeline including the
device-side CIGAR backtrace (run-length records)."""

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
    from aim_tpu.ops.wfa_pallas2 import wfa_forward_pallas2
    pats, txts, pl, tl = PACKED
    cfg = AlignConfig(algo="wfa", read_size=R, max_score=SMAX,
                      backtrace=True, adaptive=adaptive)
    out = wfa_forward_pallas2(pats, txts, pl, tl, cfg=cfg, interpret=True)
    recs = np.asarray(out["step_records"])
    sc, wops, wb, we = nat.wfa_steps_to_ops(recs, pl, tl, max_score=SMAX,
                                            max_ops=2 * R)
    osc, oops, ob, oe = nat.wfa_align(pats, txts, pl, tl, mismatch=3,
                                      gap_o=4, gap_e=1, max_score=SMAX,
                                      adaptive=adaptive, backtrace=True)
    np.testing.assert_array_equal(sc, osc)
    for i in range(len(PAIRS)):
        assert cigar_of(oops[i], ob[i], oe[i]) == \
            cigar_of(wops[i], wb[i], we[i]), (i, PAIRS[i])


@pytest.mark.parametrize("balanced", [True, False])
@pytest.mark.parametrize("backtrace", [True, False])
def test_nw_pallas_interpret_matches_oracle(balanced, backtrace):
    from aim_tpu.ops.nw_pallas import nw_forward_pallas
    R = 40
    pairs = random_pairs(seed=11, n=128, max_len=R - 8, balanced=balanced)
    pats, txts, pl, tl = pack(pairs, R)
    cfg = AlignConfig(algo="nw", read_size=R, max_score=10,
                      backtrace=backtrace, gap_i=2, gap_d=3, mismatch=3)
    out = nw_forward_pallas(pats, txts, pl, tl, cfg=cfg, interpret=True)
    packed = np.asarray(out["packed_runs"])
    sc = packed[:, 1].astype(np.int32)
    fb = ((packed[:, 0].astype(np.int32) >> 8) & 1).astype(bool)
    osc, oops, ob, oe = nat.nw_align(pats, txts, pl, tl, mismatch=3,
                                     gap_i=2, gap_d=3, backtrace=backtrace)
    ok = ~fb
    assert ok.mean() > 0.5  # flags are the exception, not the rule
    np.testing.assert_array_equal(sc[ok], osc[ok])
    if backtrace:
        wops, wb, we = nat.wfa_runs_to_ops(packed, sc, pl, tl,
                                           max_score=1 << 30, max_ops=2 * R)
        for i in range(len(pairs)):
            if ok[i]:
                assert cigar_of(oops[i], ob[i], oe[i]) == \
                    cigar_of(wops[i], wb[i], we[i]), (i, pairs[i])


def test_nw_pallas_cheap_gaps_alias_chain():
    """Regression: cheap gaps make walks touch column 0, whose aliased
    flat-tape chain equals the CLEAN boundary (caught by fuzzing)."""
    from aim_tpu.ops.nw_pallas import nw_forward_pallas
    R = 40
    pairs = random_pairs(seed=101, n=256, max_len=R - 8, balanced=False)
    pats, txts, pl, tl = pack(pairs, R)
    cfg = AlignConfig(algo="nw", read_size=R, max_score=16,
                      backtrace=True, gap_i=1, gap_d=1, mismatch=4)
    out = nw_forward_pallas(pats, txts, pl, tl, cfg=cfg, interpret=True)
    packed = np.asarray(out["packed_runs"])
    sc = packed[:, 1].astype(np.int32)
    fb = ((packed[:, 0].astype(np.int32) >> 8) & 1).astype(bool)
    osc, oops, ob, oe = nat.nw_align(pats, txts, pl, tl, mismatch=4,
                                     gap_i=1, gap_d=1, backtrace=True)
    np.testing.assert_array_equal(sc[~fb], osc[~fb])
    wops, wb, we = nat.wfa_runs_to_ops(packed, sc, pl, tl,
                                       max_score=1 << 30, max_ops=2 * R)
    for i in range(len(pairs)):
        if not fb[i]:
            assert cigar_of(oops[i], ob[i], oe[i]) == \
                cigar_of(wops[i], wb[i], we[i]), (i, pairs[i])


@pytest.mark.parametrize("balanced", [True, False])
def test_swg_pallas_interpret_matches_oracle(balanced):
    from aim_tpu.ops.swg_pallas import swg_forward_pallas
    R = 40
    pairs = random_pairs(seed=23, n=128, max_len=R - 8, balanced=balanced)
    pats, txts, pl, tl = pack(pairs, R)
    cfg = AlignConfig(algo="swg", read_size=R, max_score=26, backtrace=True,
                      match=0, mismatch=3, gap_o=4, gap_e=1)
    out = swg_forward_pallas(pats, txts, pl, tl, cfg=cfg, interpret=True)
    packed = np.asarray(out["packed_runs"])
    sc = packed[:, 1].astype(np.int32)
    fb = ((packed[:, 0].astype(np.int32) >> 8) & 1).astype(bool)
    osc, oops, ob, oe = nat.swg_align(pats, txts, pl, tl, match=0,
                                      mismatch=3, gap_o=4, gap_e=1,
                                      max_score=26,
                                      cell_width=cfg.cell_width,
                                      backtrace=True)
    ok = ~fb
    assert ok.mean() > 0.5
    np.testing.assert_array_equal(sc[ok], osc[ok])
    wops, wb, we = nat.wfa_runs_to_ops(packed, sc, pl, tl,
                                       max_score=1 << 30, max_ops=2 * R)
    for i in range(len(pairs)):
        if ok[i]:
            assert cigar_of(oops[i], ob[i], oe[i]) == \
                cigar_of(wops[i], wb[i], we[i]), (i, pairs[i])


def test_wfa_pallas_packed_inputs_match_unpacked():
    """2-bit packed uploads + in-jit unpack must be bit-identical to the
    raw-byte path (same LUT recode for both sequences)."""
    from aim_tpu.ops.common import pack_seqs
    from aim_tpu.ops.wfa_pallas2 import wfa_forward_pallas2
    pats, txts, pl, tl = PACKED
    cfg = AlignConfig(algo="wfa", read_size=R, max_score=SMAX,
                      backtrace=True, adaptive=True)
    ref = np.asarray(wfa_forward_pallas2(pats, txts, pl, tl, cfg=cfg,
                                         interpret=True)["step_records"])
    pp, pt, ok = pack_seqs(pats, txts, pl, tl, R)
    assert ok
    got = np.asarray(wfa_forward_pallas2(pp, pt, pl, tl, cfg=cfg,
                                         interpret=True,
                                         packed=True)["step_records"])
    np.testing.assert_array_equal(got, ref)


def test_wfa_pallas_interpret_overflow_pairs():
    """Pairs exceeding MAX_SCORE must report MAX_SCORE+1 with a '1M' cigar
    (the HBM-tier reference behavior, ref: wfa.c:399-404)."""
    from aim_tpu.ops.wfa_pallas2 import wfa_forward_pallas2
    pats, txts, pl, tl = pack([("AAAAAAAA", "TTTTTTTT")] * 8, 16)
    cfg = AlignConfig(algo="wfa", read_size=16, max_score=5, backtrace=True)
    out = wfa_forward_pallas2(pats, txts, pl, tl, cfg=cfg, interpret=True)
    recs = np.asarray(out["step_records"])
    sc, wops, wb, we = nat.wfa_steps_to_ops(recs, pl, tl, max_score=5,
                                            max_ops=32)
    assert (sc == 6).all()
    for i in range(8):
        assert cigar_of(wops[i], wb[i], we[i]) == b"M"  # prints as "1M"


def test_wfa_pallas_v2_wide_reads_multiplane_nmw():
    """Reads past 128 bp exercise the multi-plane (NPL=2) next-nonzero-
    word table — the round-2 single-plane 3-bit packing silently broke
    for W16 > 8 (advisor finding).  R=200 -> Rp=208, W16=13."""
    from aim_tpu.ops.wfa_pallas2 import vmem_fit2, wfa_forward_pallas2
    R2, K2 = 200, 25
    pairs = random_pairs(seed=23, n=128, max_len=R2 - 4)
    pats, txts, pl, tl = pack(pairs, R2)
    cfg = AlignConfig(algo="wfa", read_size=R2, max_score=K2,
                      backtrace=True, adaptive=True)
    assert vmem_fit2(cfg)
    out = wfa_forward_pallas2(pats, txts, pl, tl, cfg=cfg, interpret=True)
    recs = np.asarray(out["step_records"])
    sc, wops, wb, we = nat.wfa_steps_to_ops(recs, pl, tl, max_score=K2,
                                            max_ops=2 * R2)
    osc, oops, ob, oe = nat.wfa_align(pats, txts, pl, tl, mismatch=3,
                                      gap_o=4, gap_e=1, max_score=K2,
                                      adaptive=True, backtrace=True)
    np.testing.assert_array_equal(sc, osc)
    for i in range(len(pairs)):
        if osc[i] <= K2:
            assert cigar_of(oops[i], ob[i], oe[i]) == \
                cigar_of(wops[i], wb[i], we[i]), (i, pairs[i])


def test_wfa_vmem_tier_gate_rp256():
    """Configs past Rp=256 must NOT take the VMEM kernel (4-bit next-word
    fields), and must still be served by the long kernel."""
    from aim_tpu.ops.pallas_kernels import forward_fn
    from aim_tpu.ops.wfa_pallas2 import vmem_fit2
    big = AlignConfig(algo="wfa", read_size=300, max_score=30,
                      backtrace=True, adaptive=True, variant="hbm")
    assert not vmem_fit2(big)
    fn = forward_fn(big)
    assert fn is not None and getattr(fn, "requires_packed", False)


def test_wfa_pallas_v2_rp256_boundary_exact():
    """The admission boundary itself: R=254 -> Rp=256, W16=16 — the
    LAST geometry the VMEM kernel serves.  Field 15 of the 4-bit
    next-word table (value <= 15, the encoding maximum) and the
    fidx=16 unwritten-plane probe (terminator-guarded, wfa_pallas2
    first_mismatch_from) are both live only here; lengths pinned near
    R land hi_b and the extension offsets in word 15."""
    import random
    from aim_tpu.ops.wfa_pallas2 import vmem_fit2, wfa_forward_pallas2
    from tests.util import make_pair
    R, K = 254, 14
    cfg = AlignConfig(algo="wfa", read_size=R, max_score=K,
                      backtrace=True, mismatch=3, gap_o=4, gap_e=1,
                      adaptive=True)
    assert vmem_fit2(cfg)
    rng = random.Random(3)
    pairs = []
    while len(pairs) < 128:
        p, t = make_pair(rng, rng.randrange(235, 248),
                         rng.randrange(236, 249), rng.randrange(0, 5))
        if len(p) <= R and len(t) <= R:
            pairs.append((p, t))
    pats, txts, pl, tl = pack(pairs, R)
    out = wfa_forward_pallas2(pats, txts, pl, tl, cfg=cfg, interpret=True,
                              packed=False)
    recs = np.asarray(out["step_records"])
    sc, wops, wb, we = nat.wfa_steps_to_ops(recs, pl, tl, max_score=K,
                                            max_ops=2 * R)
    osc, oops, ob, oe = nat.wfa_align(pats, txts, pl, tl, mismatch=3,
                                      gap_o=4, gap_e=1, max_score=K,
                                      adaptive=True, backtrace=True)
    np.testing.assert_array_equal(sc, osc)
    assert (osc <= K).sum() > 32
    for i in range(len(pairs)):
        if osc[i] <= K:
            assert cigar_of(oops[i], ob[i], oe[i]) == \
                cigar_of(wops[i], wb[i], we[i]), (i, pairs[i])


@pytest.mark.slow
def test_vmem_randomized_cost_model_fuzz():
    """One round of the randomized-cost-model interpret fuzz for all
    four VMEM kernels (tools/dev_vmem_fuzz.py) — direct Pallas kernel
    coverage that fuzz_kernels.py cannot give on CPU hosts (api.align
    serves XLA tiers there)."""
    import random as _random
    import tools.dev_vmem_fuzz as vf
    rng = _random.Random(977 * 7919)
    bad = ran = 0
    for fn in (vf.fuzz_nw, vf.fuzz_swg, vf.fuzz_wfa2, vf.fuzz_genasm):
        b, d = fn(rng, 977)
        bad += b
        ran += d
    assert bad == 0 and ran >= 2


def test_packed_domain_mm_builder_record_identity():
    """The packed-domain mismatch-plane builder (2-bit words, funnel
    XOR + even-bit compaction — nw_pallas._mismatch_bitplanes_packed)
    must produce records identical to the raw-byte path on DNA batches
    with varied lengths, including empty/one-sided pairs (round 5: it
    replaced the device unpack whose fusion cost +0.023 us/pair; on TPU
    the packed marginal now BEATS raw: 0.069 vs 0.092 NW)."""
    import random

    import numpy as np

    from aim_tpu.config import derive_config
    from aim_tpu.ops.common import pack_seqs
    from aim_tpu.ops.nw_pallas import nw_forward_pallas
    from aim_tpu.ops.swg_pallas import swg_forward_pallas
    from tests.util import make_pair, pack

    rng = random.Random(5)
    pairs = []
    for _ in range(64):
        plen = rng.randrange(1, 100)
        tlen = max(1, plen + rng.choice([-2, -1, 0, 0, 1]))
        pairs.append(make_pair(rng, plen, tlen, rng.randrange(0, 8)))
    pairs += [make_pair(rng, 0, 0, 0), make_pair(rng, 100, 0, 0),
              make_pair(rng, 0, 64, 0)]
    for algo, fwd in (("nw", nw_forward_pallas),
                      ("swg", swg_forward_pallas)):
        cfg = derive_config(algo, 100, 0.01, backtrace=True)
        pats, txts, pl_, tl_ = pack(pairs, cfg.read_size)
        pp, pt, ok = pack_seqs(pats, txts, pl_, tl_, cfg.read_size)
        assert ok
        o_raw = np.asarray(fwd(pats, txts, pl_.astype(np.int32),
                               tl_.astype(np.int32), cfg=cfg,
                               interpret=True)["packed_runs"])
        o_pk = np.asarray(fwd(pp, pt, pl_.astype(np.int32),
                              tl_.astype(np.int32), cfg=cfg,
                              interpret=True, packed=True)["packed_runs"])
        np.testing.assert_array_equal(o_raw, o_pk, err_msg=algo)

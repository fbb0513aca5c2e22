"""GenASM: the bitvector edit-distance family.  The reference snapshot
ships GenASM only as an empty submodule, so aim-tpu defines and anchors
the semantics: score = bounded Levenshtein distance, CIGAR = the repo NW
walker's unit-cost output (golden/genasm.py)."""

import numpy as np
import pytest

import aim_tpu.native as nat
from tests.util import cigar_of, pack, random_pairs


def _nw_unit(pats, txts, pl, tl):
    return nat.nw_align(pats, txts, pl, tl, mismatch=1, gap_i=1, gap_d=1,
                        backtrace=True)


def test_genasm_golden_matches_nw_unit_costs():
    """External anchor: on alias-free shapes (plen <= tlen — the NW
    oracle deliberately reproduces the reference's flat-tape aliasing
    when plen > tlen, which GenASM does not inherit) the golden must
    byte-match the NW walker at unit costs."""
    from aim_tpu.golden.genasm import genasm_golden
    pairs = [(p, t) if len(p) <= len(t) else (t, p)
             for p, t in random_pairs(seed=61, n=64, max_len=24)]
    R, K = 32, 12
    pats, txts, pl, tl = pack(pairs, R)
    osc, oops, ob, oe = _nw_unit(pats, txts, pl, tl)
    checked = 0
    for i, (p, t) in enumerate(pairs):
        dist, opstr = genasm_golden(p.encode(), t.encode(), K,
                                    backtrace=True)
        if osc[i] <= K:
            assert dist == osc[i], (i, p, t)
            assert opstr.encode() == oops[i][ob[i]:oe[i]].tobytes(), (i, p, t)
            checked += 1
        else:
            assert dist == K + 1
    assert checked > 32


def test_genasm_golden_edge_cases():
    from aim_tpu.golden.genasm import genasm_golden
    cases = [("", "", 0, ""), ("", "AC", 2, "II"), ("AC", "", 2, "DD"),
             ("A", "A", 0, "M"), ("A", "T", 1, "X"),
             ("ACGT", "AGT", 1, "MDMM")]
    for p, t, want_d, want_ops in cases:
        d, o = genasm_golden(p.encode(), t.encode(), 5, backtrace=True)
        assert d == want_d, (p, t, d)
        assert o == want_ops, (p, t, o)


def test_genasm_native_matches_golden():
    from aim_tpu.golden.genasm import genasm_golden
    pairs = random_pairs(seed=67, n=48, max_len=20)
    R, K = 24, 8
    pats, txts, pl, tl = pack(pairs, R)
    sc, ops, b, e = nat.genasm_align(pats, txts, pl, tl, max_score=K,
                                     backtrace=True)
    for i, (p, t) in enumerate(pairs):
        d, o = genasm_golden(p.encode(), t.encode(), K, backtrace=True)
        assert sc[i] == d, (i, p, t)
        if d <= K:
            assert cigar_of(ops[i], b[i], e[i]) == o.encode(), (i, p, t)


def test_genasm_api_and_cli_host_tier(tmp_path):
    """GenASM through api.align (host tier on CPU) and the CLI, emitted
    byte-identical to the oracle pipeline."""
    from aim_tpu.api import align
    from aim_tpu.cli import main
    from aim_tpu.config import derive_config
    from tests.util import write_pair_file

    pairs = random_pairs(seed=71, n=40, max_len=20)
    cfg = derive_config("genasm", 20, 0.05, backtrace=True, backend="xla")
    assert cfg.max_score == 2 and cfg.mismatch == 1
    pats, txts, pl, tl = pack(pairs, cfg.read_size)
    res = align(pats, txts, pl, tl, cfg)
    osc, oops, ob, oe = nat.genasm_align(pats, txts, pl, tl,
                                         max_score=cfg.max_score,
                                         backtrace=True)
    np.testing.assert_array_equal(res.scores, osc)
    for i in range(len(pairs)):
        assert cigar_of(res.ops[i], res.begin[i], res.end[i]) == \
            cigar_of(oops[i], ob[i], oe[i])

    inp = str(tmp_path / "pairs.txt")
    write_pair_file(inp, pairs)
    out = str(tmp_path / "ga.out")
    rc = main(["genasm", "-i", inp, "-o", out, "-l", "20", "-e", "0.05",
               "-n", "40", "-b", "--backend", "xla", "-q"])
    assert rc == 0
    ref = str(tmp_path / "ga.ref")
    nat.emit_output(ref, np.arange(len(osc), dtype=np.int32), osc, oops,
                    ob, oe, True)
    assert open(out, "rb").read() == open(ref, "rb").read()


def test_genasm_pallas_interpret_matches_oracle():
    from aim_tpu.config import AlignConfig
    from aim_tpu.ops.genasm_pallas import (genasm_forward_pallas,
                                           genasm_record_rows,
                                           vmem_fit_genasm)

    R, K = 32, 12
    pairs = random_pairs(seed=73, n=128, max_len=24)
    pats, txts, pl, tl = pack(pairs, R)
    cfg = AlignConfig(algo="genasm", read_size=R, max_score=K,
                      backtrace=True)
    assert vmem_fit_genasm(cfg)
    out = genasm_forward_pallas(pats, txts, pl.astype(np.int32),
                                tl.astype(np.int32), cfg=cfg,
                                interpret=True)
    recs = np.asarray(out["genasm_records"])
    assert recs.shape[1] == R + 4
    sc, ops, b, e = nat.wfa_steps_to_ops(recs, pl, tl, max_score=R,
                                         max_ops=2 * R)
    osc, oops, ob, oe = nat.genasm_align(pats, txts, pl, tl, max_score=K,
                                         backtrace=True)
    np.testing.assert_array_equal(sc, osc)
    for i in range(len(pairs)):
        assert cigar_of(ops[i], b[i], e[i]) == \
            cigar_of(oops[i], ob[i], oe[i]), (i, pairs[i])


def test_genasm_pallas_interpret_edge_cases():
    from aim_tpu.config import AlignConfig
    from aim_tpu.ops.genasm_pallas import genasm_forward_pallas

    EDGE = [("", "ACG"), ("ACG", ""), ("", ""), ("A", "A"), ("A", "T"),
            ("AC", "A"), ("A", "AC"), ("ACGT", "ACGT"), ("AAAA", "TTTT"),
            ("AAAAAAAA", "TTTTTTTT")] * 2
    R, K = 16, 5
    pats, txts, pl, tl = pack(EDGE, R)
    cfg = AlignConfig(algo="genasm", read_size=R, max_score=K,
                      backtrace=True)
    out = genasm_forward_pallas(pats, txts, pl.astype(np.int32),
                                tl.astype(np.int32), cfg=cfg,
                                interpret=True)
    recs = np.asarray(out["genasm_records"])
    sc, ops, b, e = nat.wfa_steps_to_ops(recs, pl, tl, max_score=R,
                                         max_ops=2 * R)
    osc, oops, ob, oe = nat.genasm_align(pats, txts, pl, tl, max_score=K,
                                         backtrace=True)
    np.testing.assert_array_equal(sc, osc)
    for i in range(len(EDGE)):
        assert cigar_of(ops[i], b[i], e[i]) == \
            cigar_of(oops[i], ob[i], oe[i]), (i, EDGE[i])


def test_genasm_shard_map_interpret_matches_oracle():
    """GenASM under shard_map (the api's multi-device path), interpret
    mode on the CPU mesh."""
    import functools
    import jax
    from jax.sharding import PartitionSpec as P
    shard_map = jax.shard_map
    from aim_tpu.config import AlignConfig
    from aim_tpu.ops.common import pack_seqs
    from aim_tpu.ops.genasm_pallas import genasm_forward_pallas
    from aim_tpu.parallel import make_mesh

    R, K = 24, 8
    pairs = random_pairs(seed=79, n=64, max_len=20)
    pats, txts, pl, tl = pack(pairs, R)
    cfg = AlignConfig(algo="genasm", read_size=R, max_score=K,
                      backtrace=True)
    pp, pt, ok = pack_seqs(pats, txts, pl, tl, R)
    assert ok
    mesh = make_mesh()
    inner = functools.partial(genasm_forward_pallas, cfg=cfg,
                              interpret=True, packed=True)
    fn = shard_map(lambda a, b, c, d: inner(a, b, c, d), mesh=mesh,
                   in_specs=(P("pairs"),) * 4,
                   out_specs={"genasm_records": P("pairs", None)},
                   check_vma=False)
    recs = np.asarray(fn(pp, pt, pl.astype(np.int32),
                         tl.astype(np.int32))["genasm_records"])
    sc = recs[:, R + 3]
    osc, _, _, _ = nat.genasm_align(pats, txts, pl, tl, max_score=K,
                                    backtrace=False)
    np.testing.assert_array_equal(sc, osc)


def test_genasm_long_tier_declares_primary_planes():
    """k > 124 GenASM configs run the npl=2 band as their PRIMARY tier;
    the forward fn must say so (fn.primary_planes) or api's retry
    ladder would futilely re-dispatch the same band width on flagged
    pairs (a pure waste of ~4 fixed relay transfer costs per chunk)."""
    from aim_tpu.config import AlignConfig
    from aim_tpu.ops import pallas_kernels
    from aim_tpu.ops.genasm_long import _npl

    wide = AlignConfig(algo="genasm", read_size=576, max_score=160,
                       backtrace=True)
    fn = pallas_kernels.forward_fn(wide)
    assert fn is not None and getattr(fn, "primary_planes", 1) == 2 \
        == _npl(wide)
    narrow = AlignConfig(algo="genasm", read_size=576, max_score=80,
                         backtrace=True)
    fn2 = pallas_kernels.forward_fn(narrow)
    assert fn2 is not None and getattr(fn2, "primary_planes", 1) == 1

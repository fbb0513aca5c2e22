"""Defensive behavior of the native record expansion and the 2-bit packer."""

import numpy as np

import aim_tpu.native as nat


def test_runs_to_ops_malformed_records_stay_in_bounds():
    """Garbage cursors / oversized runs (e.g. from a flagged pair) must
    never write outside the pair's ops row (oracle.cpp clamps)."""
    nrl, max_ops = 16, 64
    runs = np.zeros((4, nrl), np.int16)
    # pair 0: negative cursor (underflowed rc) -> start past nrl, no runs
    runs[0, 0] = -3  # underflowed cursor, stored as-is in int16
    # pair 1: runs summing far past max_operations
    runs[1, 0] = 1
    for j in range(2, nrl):
        runs[1, j] = (3 << 12) | 4095
    # pair 2: valid tiny record: cursor 13, runs at 14..15
    runs[2, 0] = 13
    runs[2, 14] = (0 << 12) | 30   # 30M
    runs[2, 15] = (3 << 12) | 2    # 2D
    scores = np.zeros(4, np.int32)
    plens = np.full(4, 32, np.int32)
    tlens = np.full(4, 32, np.int32)
    ops, begin, end = nat.wfa_runs_to_ops(runs, scores, plens, tlens,
                                          max_score=1 << 30, max_ops=max_ops)
    assert ops.shape == (4, max_ops)
    assert (begin >= 0).all() and (begin <= max_ops).all()
    assert (end == 64).all()
    assert ops[2, begin[2]:begin[2] + 30].tobytes() == b"M" * 30
    assert ops[2, begin[2] + 30:begin[2] + 32].tobytes() == b"DD"


def test_pack_seqs_fallbacks():
    from aim_tpu.ops.common import pack_seqs
    n, R = 8, 16
    pl = np.full(n, 12, np.int32)
    tl = np.full(n, 12, np.int32)
    # 5-symbol alphabet -> no packing
    pats = np.zeros((n, R), np.uint8)
    txts = np.zeros((n, R), np.uint8)
    pats[:, :12] = np.frombuffer(b"ACGTNACGTNAC", np.uint8)
    txts[:, :12] = pats[:, :12]
    _, _, ok = pack_seqs(pats, txts, pl, tl, R)
    assert not ok
    # interior NUL byte -> no packing (would alias the padding code)
    pats2 = pats.copy()
    pats2[:, :12] = np.frombuffer(b"ACGTAACGTAAC", np.uint8)
    txts2 = pats2.copy()
    pats2[0, 5] = 0
    _, _, ok = pack_seqs(pats2, txts2, pl, tl, R)
    assert not ok
    # clean 4-symbol batch -> packed, shape [n, Rp//4]
    pats2[0, 5] = ord("A")
    pp, pt, ok = pack_seqs(pats2, txts2, pl, tl, R)
    assert ok and pp.shape == (n, (R + 2 + 7) // 8 * 8 // 4)


def test_wfa_steps_to_ops_malformed_records():
    """The step-record expander must clamp, not overrun, on garbage
    records (oversized strokes, runs past the buffer, negative-ish
    fields): same defensive posture as aim_wfa_runs_to_ops."""
    import aim_tpu.native as nat
    n, smax, R = 4, 5, 16
    sr = smax + 4
    recs = np.zeros((n, sr), np.int32)
    pl = np.full(n, 10, np.int32)
    tl = np.full(n, 10, np.int32)
    # pair 0: oversized match strokes on every level
    recs[0, :smax + 1] = 0x3FFF
    recs[0, smax + 3] = 3
    # pair 1: max gap lengths with D flag + ops
    recs[1, :smax + 1] = (0x7FF << 16) | (1 << 27) | (1 << 14)
    recs[1, smax + 3] = 2
    # pair 2: huge final strokes
    recs[2, smax + 1] = 0x3FFF | (3 << 14)
    recs[2, smax + 2] = 0x3FFF | (2 << 14)
    recs[2, smax + 3] = 0
    # pair 3: overflow score -> default "M"
    recs[3, smax + 3] = smax + 1
    sc, ops, b, e = nat.wfa_steps_to_ops(recs, pl, tl, max_score=smax,
                                         max_ops=2 * R)
    assert ops.shape == (n, 2 * R)
    assert (b >= 0).all() and (b <= 2 * R).all()
    assert (e == pl + tl).all()
    assert sc[3] == smax + 1
    assert ops[3, b[3]:e[3]].tobytes() == b"M"


def test_parse_pairs_range_matches_full(tmp_path):
    """Range parser == full parse on every window, incl. ragged tails,
    missing trailing newline, and the fatal READ_SIZE line number."""
    import os
    p = tmp_path / "pairs.txt"
    lines = []
    rng = __import__("random").Random(5)
    seqs = []
    for i in range(7):
        a = "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 12)))
        seqs.append((a, b))
        lines += [">" + a, "<" + b]
    p.write_text("\n".join(lines) + "\n")
    full = nat.parse_pairs(str(p), 100, 16)
    assert len(full[2]) == 7
    for start in range(0, 9):
        for count in range(0, 9):
            sub = nat.parse_pairs_range(str(p), start, count, 16)
            got = len(sub[2])
            assert got == max(0, min(count, 7 - start))
            for j in range(got):
                np.testing.assert_array_equal(sub[0][j], full[0][start + j])
                np.testing.assert_array_equal(sub[1][j], full[1][start + j])
                assert sub[2][j] == full[2][start + j]
                assert sub[3][j] == full[3][start + j]
    assert nat.count_pairs(str(p), 100) == 7
    assert nat.count_pairs(str(p), 3) == 3

    # no trailing newline: getline-style length drops the final char,
    # identically in both parsers
    p2 = tmp_path / "pairs2.txt"
    p2.write_text(">ACGT\n<TTAA")
    f2 = nat.parse_pairs(str(p2), 10, 16)
    r2 = nat.parse_pairs_range(str(p2), 0, 10, 16)
    np.testing.assert_array_equal(f2[1], r2[1])
    assert list(f2[3]) == list(r2[3]) == [3]
    assert nat.count_pairs(str(p2), 10) == 1

    # fatal READ_SIZE reject: same global line number from both parsers,
    # also when the seek phase skipped past earlier pairs
    p3 = tmp_path / "pairs3.txt"
    p3.write_text(">AA\n<CC\n>" + "A" * 40 + "\n<GG\n")
    import pytest
    with pytest.raises(ValueError, match="line 4"):
        nat.parse_pairs(str(p3), 10, 16)
    with pytest.raises(ValueError, match="line 4"):
        nat.parse_pairs_range(str(p3), 1, 10, 16)
    os.unlink(str(p3))


def test_parse_pairs_threads_matches_sequential(tmp_path):
    """Window-parallel parse (VERDICT r3 item 9): byte-identical arrays
    and identical fatal semantics vs the sequential path, across thread
    counts and ragged totals (the 4096-pair gate is bypassed by calling
    the MT helper directly for small files)."""
    import aim_tpu.native as nat2
    rng = __import__("random").Random(11)
    p = tmp_path / "mt.txt"
    lines = []
    n = 1000
    for i in range(n):
        a = "".join(rng.choice("ACGT") for _ in range(rng.randint(0, 14)))
        b = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 14)))
        lines += [">" + a, "<" + b]
    p.write_text("\n".join(lines) + "\n")
    seq = nat2.parse_pairs(str(p), n, 16)
    lib = nat2.load()
    for threads in (2, 3, 7):
        mt = nat2._parse_pairs_mt(lib, str(p), n, 16, threads)
        for a, b in zip(seq, mt):
            np.testing.assert_array_equal(a, b)
    # over-ask tolerated (EOF), like the sequential parser
    mt = nat2._parse_pairs_mt(lib, str(p), n + 500, 16, 4)
    assert len(mt[2]) == n
    np.testing.assert_array_equal(seq[0], mt[0])

    # fatal READ_SIZE: the reported line is the GLOBAL first offender
    # even when a later window contains another offender
    bad = tmp_path / "mt_bad.txt"
    rows = [">AA", "<CC"] * 300
    rows[100] = ">" + "A" * 40          # pattern of pair 50 (lines 101/102)
    rows[500] = "<" + "G" * 40          # a later offender in another window
    bad.write_text("\n".join(rows) + "\n")
    import pytest
    # the parser reports after consuming BOTH lines of the pair: line 102
    with pytest.raises(ValueError, match="line 102"):
        nat2._parse_pairs_mt(lib, str(bad), 300, 16, 4)
    with pytest.raises(ValueError, match="line 102"):
        nat2.parse_pairs(str(bad), 300, 16)


def test_parse_pairs_threads_zero_autoscale(tmp_path):
    """threads=0 sizes the pool from the host and still round-trips
    (on a 1-core host it takes the sequential path)."""
    import aim_tpu.native as nat2
    p = tmp_path / "auto.txt"
    p.write_text(">ACGT\n<ACGT\n" * 5000)
    a = nat2.parse_pairs(str(p), 5000, 8, threads=0)
    b = nat2.parse_pairs(str(p), 5000, 8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

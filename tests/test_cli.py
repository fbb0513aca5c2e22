"""End-to-end CLI tests: file in -> reference-format file out, byte-identical
to the oracle pipeline."""

import numpy as np
import pytest

import aim_tpu.native as nat
from aim_tpu.cli import main
from tests.util import random_pairs, write_pair_file


@pytest.fixture(scope="module")
def pair_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "pairs.txt"
    # l=20 e=0.05 -> READ_SIZE=32, MAX_SCORE=5
    pairs = random_pairs(seed=21, n=40, max_len=20)
    write_pair_file(path, pairs)
    return str(path)


def _oracle_out(tmp, algo, pair_file, n, cfg_kw, out_name):
    pats, txts, pl, tl = nat.parse_pairs(pair_file, n, cfg_kw["read_size"])
    if algo == "wfa":
        sc, ops, b, e = nat.wfa_align(pats, txts, pl, tl,
                                      mismatch=3, gap_o=4, gap_e=1,
                                      max_score=cfg_kw["max_score"],
                                      adaptive=cfg_kw.get("adaptive", False),
                                      backtrace=True)
    elif algo == "nw":
        sc, ops, b, e = nat.nw_align(pats, txts, pl, tl, mismatch=3,
                                     gap_i=4, gap_d=4, backtrace=True)
    else:
        sc, ops, b, e = nat.swg_align(pats, txts, pl, tl, match=0, mismatch=3,
                                      gap_o=4, gap_e=1,
                                      max_score=cfg_kw["max_score"],
                                      cell_width=1, backtrace=True)
    path = str(tmp / out_name)
    nat.emit_output(path, np.arange(len(sc), dtype=np.int32), sc, ops, b, e,
                    backtrace=True)
    return path


@pytest.mark.parametrize("algo,extra", [
    ("nw", []),
    ("swg", []),
    ("wfa", []),
    ("wfa", ["-r"]),
])
def test_cli_byte_identical(tmp_path, pair_file, algo, extra):
    out = str(tmp_path / f"{algo}.out")
    rc = main([algo, "-i", pair_file, "-o", out, "-l", "20", "-e", "0.05",
               "-n", "40", "-b", "--backend", "xla", "-q"] + extra)
    assert rc == 0
    from aim_tpu.cli import build_parser, config_from_args
    args = build_parser().parse_args(
        [algo, "-i", pair_file, "-o", out, "-l", "20", "-e", "0.05",
         "-n", "40", "-b", "-q"] + extra)
    cfg = config_from_args(args)
    ref = _oracle_out(tmp_path, algo, pair_file, 40,
                      {"read_size": cfg.read_size, "max_score": cfg.max_score,
                       "adaptive": cfg.adaptive}, f"{algo}.ref")
    assert open(out, "rb").read() == open(ref, "rb").read()


def test_cli_score_only(tmp_path, pair_file):
    out = str(tmp_path / "scores.out")
    rc = main(["wfa", "-i", pair_file, "-o", out, "-l", "20", "-e", "0.05",
               "-n", "40", "--backend", "xla", "-q"])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert len(lines) == 40
    assert all(l.endswith(", ") for l in lines)  # "%d, %d, \n" format


def test_cli_rejects_bad_penalties(pair_file):
    with pytest.raises(SystemExit):
        main(["wfa", "-i", pair_file, "-o", "/tmp/x", "-l", "20", "-e",
              "0.05", "-n", "4", "-x", "0"])

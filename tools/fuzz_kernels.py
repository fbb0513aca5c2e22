"""Cross-cost-model fuzz harness: device kernels vs the exact oracle.

Runs random pair batches through `aim_tpu.api.align` under deliberately
NON-default cost models (cheap gaps, ge > go, wide bands, overflow-heavy
data, both memory tiers) and asserts byte-level score+CIGAR equality with
the `aim_tpu.native` oracle for every unflagged pair.  Two real kernel
defects in round 1 were only visible under such models — run this after
ANY kernel change, on the real TPU when available:

    python tools/fuzz_kernels.py [seed0 [n_seeds]]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")  # repo root

from aim_tpu.config import AlignConfig  # noqa: E402
from aim_tpu.api import align  # noqa: E402
import aim_tpu.native as nat  # noqa: E402
from tests.util import pack, random_pairs  # noqa: E402

CONFIGS = [
    ("nw", 48, dict(max_score=12, gap_i=2, gap_d=5, mismatch=1),
     dict(mismatch=1, gap_i=2, gap_d=5)),
    ("nw", 48, dict(max_score=16, gap_i=1, gap_d=1, mismatch=4),
     dict(mismatch=4, gap_i=1, gap_d=1)),
    ("nw", 96, dict(max_score=24, gap_i=3, gap_d=2, mismatch=2,
                    variant="hbm"),
     dict(mismatch=2, gap_i=3, gap_d=2)),
    ("swg", 48, dict(max_score=30, match=0, mismatch=5, gap_o=6, gap_e=2),
     dict(match=0, mismatch=5, gap_o=6, gap_e=2, max_score=30)),
    ("swg", 48, dict(max_score=60, match=0, mismatch=7, gap_o=2, gap_e=3),
     dict(match=0, mismatch=7, gap_o=2, gap_e=3, max_score=60)),
    ("swg", 96, dict(max_score=200, match=-1, mismatch=2, gap_o=3, gap_e=1,
                     variant="hbm"),
     dict(match=-1, mismatch=2, gap_o=3, gap_e=1, max_score=200)),
    ("wfa", 48, dict(max_score=20, mismatch=2, gap_o=3, gap_e=2,
                     adaptive=False),
     dict(mismatch=2, gap_o=3, gap_e=2, max_score=20, adaptive=False)),
    ("wfa", 48, dict(max_score=14, mismatch=5, gap_o=2, gap_e=1,
                     adaptive=True),
     dict(mismatch=5, gap_o=2, gap_e=1, max_score=14, adaptive=True)),
    ("wfa", 96, dict(max_score=40, mismatch=3, gap_o=4, gap_e=1,
                     adaptive=True),
     dict(mismatch=3, gap_o=4, gap_e=1, max_score=40, adaptive=True)),
    # VMEM tier past 128 bp: W16 > 8 exercises the multi-plane next-
    # nonzero-word table (the round-2 3-bit packing broke exactly here)
    ("wfa", 200, dict(max_score=35, mismatch=4, gap_o=2, gap_e=2,
                      adaptive=True),
     dict(mismatch=4, gap_o=2, gap_e=2, max_score=35, adaptive=True)),
    # VMEM-tier admission boundary itself: R=248 -> Rp=256, W16=16 (the
    # 4-bit next-word fields at their encoding maximum + the fidx=16
    # terminator-guarded probe — live only at this geometry; R must be a
    # multiple of 8 per the config contract, and 248 is the largest one
    # that still rounds to Rp=256)
    ("wfa", 248, dict(max_score=30, mismatch=3, gap_o=4, gap_e=1,
                      adaptive=True),
     dict(mismatch=3, gap_o=4, gap_e=1, max_score=30, adaptive=True)),
    # beyond the VMEM tier: exercises the HBM-spill long-read kernel
    # (ring spill, level-walk prefetch, gather extend) under non-default
    # cost models
    ("wfa", 256, dict(max_score=100, mismatch=5, gap_o=2, gap_e=1,
                      adaptive=True, variant="hbm"),
     dict(mismatch=5, gap_o=2, gap_e=1, max_score=100, adaptive=True)),
    ("wfa", 256, dict(max_score=90, mismatch=2, gap_o=1, gap_e=3,
                      variant="hbm"),
     dict(mismatch=2, gap_o=1, gap_e=3, max_score=90, adaptive=False)),
    # 1 kbp-class long-read config (keeps the HBM kernel's larger
    # geometry — NB>1 word blocks — under standing fuzz)
    ("wfa", 1040, dict(max_score=110, mismatch=4, gap_o=3, gap_e=2,
                       adaptive=True, variant="hbm"),
     dict(mismatch=4, gap_o=3, gap_e=2, max_score=110, adaptive=True),
     256),
    ("genasm", 48, dict(max_score=12, mismatch=1, gap_i=1, gap_d=1),
     dict(max_score=12)),
    ("genasm", 96, dict(max_score=20, mismatch=1, gap_i=1, gap_d=1),
     dict(max_score=20)),
    # beyond the NW/SWG VMEM tier: the HBM-streamed long kernel
    # (ops/nwswg_pallas_long.py) — multi-block forward carry + descending
    # walk under non-default cost models, incl. the cheap-gap alias-chain
    # regime that broke the VMEM tier in round 1
    ("nw", 2560, dict(max_score=300, gap_i=2, gap_d=5, mismatch=1,
                      variant="hbm"),
     dict(mismatch=1, gap_i=2, gap_d=5), 256),
    ("nw", 2560, dict(max_score=300, gap_i=1, gap_d=1, mismatch=4,
                      variant="hbm"),
     dict(mismatch=4, gap_i=1, gap_d=1), 256),
    ("swg", 2560, dict(max_score=400, match=0, mismatch=7, gap_o=2, gap_e=3,
                       variant="hbm"),
     dict(match=0, mismatch=7, gap_o=2, gap_e=3, max_score=400), 256),
    # GenASM long tier (ops/genasm_long.py): k past the VMEM bit-vector
    # gate (k >= 27) routes through the unit-cost streamed NW kernel with
    # certified >k overflow rewrites; k=110 leans on the admission bound
    ("genasm", 2560, dict(max_score=60, mismatch=1, gap_i=1, gap_d=1,
                          variant="hbm"),
     dict(max_score=60), 256),
    ("genasm", 2560, dict(max_score=110, mismatch=1, gap_i=1, gap_d=1,
                          variant="hbm"),
     dict(max_score=110), 256),
    # GenASM wide-k (125 < k <= 252 routes the npl=2 / C=127 band
    # statically; this also keeps the wide-band kernel under standing
    # TPU fuzz — api.align's retry tier runs the same kernel)
    ("genasm", 2560, dict(max_score=200, mismatch=1, gap_i=1, gap_d=1,
                          variant="hbm"),
     dict(max_score=200), 256),
    # GenASM plane-count boundary: k=124 is the LAST npl=1 config,
    # k=125 the FIRST static npl=2, k=252 the admission cap
    ("genasm", 2560, dict(max_score=124, mismatch=1, gap_i=1, gap_d=1,
                          variant="hbm"),
     dict(max_score=124), 256),
    ("genasm", 2560, dict(max_score=125, mismatch=1, gap_i=1, gap_d=1,
                          variant="hbm"),
     dict(max_score=125), 256),
    ("genasm", 2560, dict(max_score=252, mismatch=1, gap_i=1, gap_d=1,
                          variant="hbm"),
     dict(max_score=252), 256),
    # ---- >4-symbol alphabet rows (defeat 2-bit packing): byte-compare
    # tiers must stay exact, and api.align's packed_ok re-dispatch must
    # route GenASM-VMEM -> long tier and WFA-long -> XLA tier ----
    ("nw", 96, dict(max_score=24, gap_i=3, gap_d=2, mismatch=2,
                    variant="hbm"),
     dict(mismatch=2, gap_i=3, gap_d=2), 2048, "ACGTN"),
    ("swg", 48, dict(max_score=30, match=0, mismatch=5, gap_o=6, gap_e=2),
     dict(match=0, mismatch=5, gap_o=6, gap_e=2, max_score=30),
     2048, "ACGTN"),
    # WFA VMEM tier, W16 > 8 geometry, unpacked symbol planes
    ("wfa", 200, dict(max_score=35, mismatch=4, gap_o=2, gap_e=2,
                      adaptive=True),
     dict(mismatch=4, gap_o=2, gap_e=2, max_score=35, adaptive=True),
     2048, "ACGTN"),
    # WFA long config: packed_ok=False re-dispatch -> exact XLA tier
    ("wfa", 256, dict(max_score=100, mismatch=5, gap_o=2, gap_e=1,
                      adaptive=True, variant="hbm"),
     dict(mismatch=5, gap_o=2, gap_e=1, max_score=100, adaptive=True),
     256, "ACGTN"),
    # GenASM VMEM-fit config: re-dispatch -> byte-comparing long tier
    ("genasm", 48, dict(max_score=12, mismatch=1, gap_i=1, gap_d=1),
     dict(max_score=12), 2048, "ACGTN"),
    # GenASM long tier, 5-symbol
    ("genasm", 2560, dict(max_score=60, mismatch=1, gap_i=1, gap_d=1,
                          variant="hbm"),
     dict(max_score=60), 256, "ACGTN"),
]


def run_one(algo, R, kw, okw, seed, n=2048, alphabet="ACGT"):  # noqa: C901
    pairs = random_pairs(seed=seed, n=n, max_len=R - 8, balanced=False,
                         alphabet=alphabet)
    pats, txts, pl, tl = pack(pairs, R)
    cfg = AlignConfig(algo=algo, read_size=R, backtrace=True, **kw)
    res = align(pats, txts, pl, tl, cfg)
    if algo == "genasm":
        osc, oops, ob, oe = nat.genasm_align(pats, txts, pl, tl,
                                             backtrace=True, **okw)
    elif algo == "nw":
        osc, oops, ob, oe = nat.nw_align(pats, txts, pl, tl,
                                         backtrace=True, **okw)
    elif algo == "swg":
        osc, oops, ob, oe = nat.swg_align(pats, txts, pl, tl, backtrace=True,
                                          cell_width=cfg.cell_width, **okw)
    else:
        osc, oops, ob, oe = nat.wfa_align(pats, txts, pl, tl,
                                          backtrace=True, **okw)
    sbad = int((res.scores != osc).sum())
    cbad = sum(1 for i in range(n)
               if oops[i][ob[i]:oe[i]].tobytes() !=
               res.ops[i][res.begin[i]:res.end[i]].tobytes())
    print(f"{algo} R={R} {kw} alpha={len(set(alphabet))} seed={seed}: "
          f"fallback={res.n_fallback} score_bad={sbad} cigar_bad={cbad}",
          flush=True)
    if sbad or cbad:
        for i in range(n):
            if res.scores[i] != osc[i] or \
                    oops[i][ob[i]:oe[i]].tobytes() != \
                    res.ops[i][res.begin[i]:res.end[i]].tobytes():
                print("  FIRST BAD:", i, pairs[i], res.scores[i], osc[i])
                break
    return sbad + cbad


def main():
    seed0 = int(sys.argv[1]) if len(sys.argv) > 1 else 101
    n_seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    bad = 0
    for cfg_row in CONFIGS:
        algo, R, kw, okw = cfg_row[:4]
        n = cfg_row[4] if len(cfg_row) > 4 else 2048
        alphabet = cfg_row[5] if len(cfg_row) > 5 else "ACGT"
        for s in range(seed0, seed0 + n_seeds):
            bad += run_one(algo, R, kw, okw, s, n=n, alphabet=alphabet)
    print("TOTAL BAD:", bad)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

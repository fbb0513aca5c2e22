"""TPU-compiled fuzz: varied cost models + random pairs vs the oracle."""
import numpy as np
import aim_tpu.native as nat
from aim_tpu.config import AlignConfig
from aim_tpu.api import align
from tests.util import cigar_of, pack, random_pairs

CONFIGS = [
    ("nw", 96, dict(max_score=24, gap_i=3, gap_d=2, mismatch=2, variant="hbm"),
     dict(mismatch=2, gap_i=3, gap_d=2)),
    ("nw", 48, dict(max_score=20, gap_i=1, gap_d=4, mismatch=1),
     dict(mismatch=1, gap_i=1, gap_d=4)),
    ("swg", 96, dict(max_score=150, match=0, mismatch=1, gap_o=1, gap_e=1, variant="hbm"),
     dict(match=0, mismatch=1, gap_o=1, gap_e=1, max_score=150)),
    ("swg", 48, dict(max_score=60, match=0, mismatch=7, gap_o=2, gap_e=3),
     dict(match=0, mismatch=7, gap_o=2, gap_e=3, max_score=60)),
    ("wfa", 96, dict(max_score=40, mismatch=3, gap_o=4, gap_e=1, adaptive=True),
     dict(mismatch=3, gap_o=4, gap_e=1, max_score=40, adaptive=True)),
    ("wfa", 48, dict(max_score=25, mismatch=1, gap_o=1, gap_e=1, adaptive=False),
     dict(mismatch=1, gap_o=1, gap_e=1, max_score=25, adaptive=False)),
]

total_bad = 0
for algo, R, kw, okw in CONFIGS:
    for seed in (303, 404):
        pairs = random_pairs(seed=seed, n=2048, max_len=R - 8, balanced=False)
        pats, txts, pl, tl = pack(pairs, R)
        cfg = AlignConfig(algo=algo, read_size=R, backtrace=True, **kw)
        res = align(pats, txts, pl, tl, cfg)
        if algo == "nw":
            osc, oops, ob, oe = nat.nw_align(pats, txts, pl, tl, backtrace=True, **okw)
        elif algo == "swg":
            osc, oops, ob, oe = nat.swg_align(pats, txts, pl, tl, backtrace=True,
                                              cell_width=cfg.cell_width, **okw)
        else:
            osc, oops, ob, oe = nat.wfa_align(pats, txts, pl, tl, backtrace=True, **okw)
        sbad = int((res.scores != osc).sum())
        cbad = sum(1 for i in range(len(pairs))
                   if oops[i][ob[i]:oe[i]].tobytes() !=
                   res.ops[i][res.begin[i]:res.end[i]].tobytes())
        total_bad += sbad + cbad
        print(f"{algo} {kw} seed={seed}: fallback={res.n_fallback} "
              f"score_bad={sbad} cigar_bad={cbad}", flush=True)
        if sbad or cbad:
            for i in range(len(pairs)):
                if res.scores[i] != osc[i]:
                    print("  SCORE", i, pairs[i], res.scores[i], osc[i])
                    break
print("TOTAL BAD:", total_bad)

"""TPU-compiled fuzz: varied cost models + random pairs vs the oracle."""
import numpy as np
import aim_tpu.native as nat
from aim_tpu.config import AlignConfig
from aim_tpu.api import align
from tests.util import cigar_of, pack, random_pairs

CONFIGS = [
    # (algo, R, kwargs, oracle_kwargs)
    ("nw", 48, dict(max_score=12, gap_i=2, gap_d=5, mismatch=1),
     dict(mismatch=1, gap_i=2, gap_d=5)),
    ("nw", 48, dict(max_score=16, gap_i=1, gap_d=1, mismatch=4),
     dict(mismatch=4, gap_i=1, gap_d=1)),
    ("swg", 48, dict(max_score=30, match=0, mismatch=5, gap_o=6, gap_e=2),
     dict(match=0, mismatch=5, gap_o=6, gap_e=2, max_score=30)),
    ("swg", 48, dict(max_score=200, match=-1, mismatch=2, gap_o=3, gap_e=1),
     dict(match=-1, mismatch=2, gap_o=3, gap_e=1, max_score=200)),
    ("wfa", 48, dict(max_score=20, mismatch=2, gap_o=3, gap_e=2, adaptive=False),
     dict(mismatch=2, gap_o=3, gap_e=2, max_score=20, adaptive=False)),
    ("wfa", 48, dict(max_score=14, mismatch=5, gap_o=2, gap_e=1, adaptive=True),
     dict(mismatch=5, gap_o=2, gap_e=1, max_score=14, adaptive=True)),
]

total_bad = 0
for algo, R, kw, okw in CONFIGS:
    for seed in (505, 606):
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

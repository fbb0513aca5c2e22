"""Dev check: GenASM long-read adapter (ops/genasm_long.py) vs the host
oracle, interpret mode on CPU.  Covers <=k scores, >k overflow rewrite,
half-empty pairs, and CIGAR equality on unflagged pairs."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import random

import numpy as np

import aim_tpu.native as nat
from aim_tpu.config import AlignConfig
from tests.util import cigar_of, make_pair, pack


def main():
    rng = random.Random(91)
    R = 576  # 2 row blocks (RB=512)
    pairs = []
    # normal pairs, several near/over k
    for _ in range(10):
        lp = rng.randrange(420, 560)
        pairs.append(make_pair(rng, lp, max(1, lp + rng.choice([-1, 0, 1])),
                               rng.randrange(0, 60)))
    # half-empty + empty + tiny
    pairs.append(make_pair(rng, 0, 0, 0))
    pairs.append(make_pair(rng, 20, 0, 0))
    pairs.append(make_pair(rng, 0, 17, 0))
    pairs.append(make_pair(rng, 1, 1, 0))
    # heavy-error pair that must overflow
    pairs.append(make_pair(rng, 500, 500, 300))
    pats, txts, pl, tl = pack(pairs, R)
    pl = pl.astype(np.int32)
    tl = tl.astype(np.int32)

    for k in (40, 80, 124):
        cfg = AlignConfig(algo="genasm", read_size=R, max_score=k,
                          backtrace=True, variant="hbm")
        from aim_tpu.ops.genasm_long import (genasm_forward_pallas_long,
                                             long_fit_genasm)
        assert long_fit_genasm(cfg), k
        out = genasm_forward_pallas_long(pats, txts, pl, tl, cfg=cfg,
                                         interpret=True)
        packed = np.asarray(out["packed_runs"])
        sc = packed[:, 1].astype(np.int32)
        fb = ((packed[:, 0].astype(np.int32) >> 8) & 1).astype(bool)
        osc, oops, ob, oe = nat.genasm_align(pats, txts, pl, tl,
                                             max_score=k, backtrace=True)
        ok = ~fb
        print(f"k={k}: unflagged {ok.sum()}/{len(pl)} "
              f"scores={sc.tolist()} oracle={osc.tolist()} flag={fb.tolist()}")
        np.testing.assert_array_equal(sc[ok], osc[ok])
        wops, wb, we = nat.wfa_runs_to_ops(packed, sc, pl, tl,
                                           max_score=1 << 30,
                                           max_ops=2 * R + 8)
        bad = []
        for i in range(len(pl)):
            if ok[i]:
                got = cigar_of(wops[i], wb[i], we[i])
                want = cigar_of(oops[i], ob[i], oe[i])
                if got != want:
                    bad.append((i, got[:60], want[:60]))
        assert not bad, bad
        print(f"k={k}: OK")
    print("ALL OK")


if __name__ == "__main__":
    main()

"""Tune the long-WFA extend scan window (_CW words per round) on real
TPU.  Diag data (tools/dev_long_diag.py, round 4) shows ~10 scan rounds
per score step at l=10 kbp — the chunk while-loop rides the max match
run over P*128 lanes — so per-round fixed cost (4 scalar reductions +
loop overhead + gathers) is the kernel's dominant term.  Wider windows
trade fewer rounds for more words gathered per round.

    python tools/dev_cw_sweep.py [l [n]]

Prints marginal us/pair per CW plus an exactness check at the best CW.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

import aim_tpu.native as nat  # noqa: E402
from aim_tpu.api import _ensure_eager_dispatch  # noqa: E402
from aim_tpu.config import derive_config  # noqa: E402
from aim_tpu.ops.common import pack_seqs  # noqa: E402
from aim_tpu.ops import wfa_pallas_long as WL  # noqa: E402
from tests.util import cigar_of  # noqa: E402
from tools.dev_long_check import synth  # noqa: E402
from tools import _timing as T  # noqa: E402


def measure(cfg, dp, dt, dpl, dtl, n):
    fn = jax.jit(WL._wfa_long_jit.__wrapped__,
                 static_argnames=("cfg", "interpret"))

    def best_of(m):
        thunk = lambda: fn(dp[:m], dt[:m], dpl[:m], dtl[:m], cfg=cfg)
        best = T.best_of(thunk, repeats=3)
        out = thunk()
        jax.block_until_ready(out)
        return best, out

    t1, _ = best_of(64)
    t2, out = best_of(n)
    return (t2 - t1) / (n - 64) * 1e6, out


def main():
    l = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 320
    _ensure_eager_dispatch()
    cfg = derive_config("wfa", l, 0.01, backtrace=True, adaptive=True,
                        variant="hbm")
    pats, txts, pl_, tl_ = synth(n, l, 0.01, cfg.read_size, seed=7)
    pp, pt, ok = pack_seqs(pats, txts, pl_, tl_, cfg.read_size)
    assert ok
    dp, dt = jax.device_put(pp), jax.device_put(pt)
    dpl, dtl = jax.device_put(pl_), jax.device_put(tl_)
    jax.block_until_ready((dp, dt, dpl, dtl))
    results = {}
    out_by_cw = {}
    for cw in (4, 6, 8, 12):
        WL._CW = cw
        try:
            m, out = measure(cfg, dp, dt, dpl, dtl, n)
        finally:
            WL._CW = 4
        results[cw] = m
        out_by_cw[cw] = np.asarray(out["step_records"])
        print(f"CW={cw:2d}: {m:7.1f} us/pair", flush=True)
    base = out_by_cw[4]
    for cw, rec in out_by_cw.items():
        same = np.array_equal(rec, base)
        print(f"CW={cw:2d}: records identical to CW=4: {same}", flush=True)
        assert same, f"CW={cw} changed results!"
    # exactness of the base against the oracle (any CW matches it then)
    sc, ops, b, e = nat.wfa_steps_to_ops(base, pl_, tl_,
                                         max_score=cfg.max_score,
                                         max_ops=2 * cfg.read_size)
    osc, oops, ob, oe = nat.wfa_align(pats, txts, pl_, tl_, mismatch=3,
                                      gap_o=4, gap_e=1,
                                      max_score=cfg.max_score,
                                      adaptive=True, backtrace=True,
                                      threads=1)
    bad = int((sc != osc).sum())
    cbad = sum(cigar_of(ops[i], b[i], e[i]) != cigar_of(oops[i], ob[i], oe[i])
               for i in range(n) if sc[i] == osc[i] and osc[i] <= cfg.max_score)
    print(f"exactness: score_diffs={bad} cigar_diffs={cbad}", flush=True)
    best_cw = min(results, key=results.get)
    print(f"BEST: CW={best_cw} ({results[best_cw]:.1f} us/pair vs "
          f"CW=4 {results[4]:.1f})", flush=True)


if __name__ == "__main__":
    main()

"""Fit per-stage costs of the long-read kernel from in-kernel counters.

Same cfg (l, e) but varying DATA error rates => step/round/chunk counts
vary; regress tile time against (steps, ext_rounds, live_chunks) to
attribute the per-step cost.  Usage: python tools/dev_long_fit.py [l [e]]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from aim_tpu.api import _ensure_eager_dispatch  # noqa: E402
from aim_tpu.config import derive_config  # noqa: E402
from aim_tpu.ops.common import pack_seqs  # noqa: E402
from aim_tpu.ops import wfa_pallas_long as WL  # noqa: E402
from tools.dev_long_check import synth  # noqa: E402
from tools import _timing as T  # noqa: E402


def measure(cfg, e_data, n, l):
    pats, txts, pl_, tl_ = synth(n, l, e_data, cfg.read_size, seed=11)
    pp, pt, ok = pack_seqs(pats, txts, pl_, tl_, cfg.read_size)
    assert ok
    dp, dt = jax.device_put(pp), jax.device_put(pt)
    dpl, dtl = jax.device_put(pl_), jax.device_put(tl_)
    jax.block_until_ready((dp, dt, dpl, dtl))
    P = WL.long_tile_pairs(cfg)

    WL._ABLATE = {"diag"}
    try:
        fn = jax.jit(WL._wfa_long_jit.__wrapped__,
                     static_argnames=("cfg", "interpret"))
        recs = np.asarray(fn(dp, dt, dpl, dtl, cfg=cfg,
                             interpret=False)["step_records"])
    finally:
        WL._ABLATE = set()
    counts = recs[::P, :3].astype(np.int64)  # [T, 3] per-tile counters

    fn = jax.jit(WL._wfa_long_jit.__wrapped__,
                 static_argnames=("cfg", "interpret"))

    def best_of(m):
        return T.best_of(
            lambda: fn(dp[:m], dt[:m], dpl[:m], dtl[:m], cfg=cfg,
                       interpret=False),
            repeats=3)

    t1 = best_of(2 * P)
    t2 = best_of(n)
    tiles = (n - 2 * P) // P
    per_tile = (t2 - t1) / tiles * 1e6  # us per tile (marginal)
    # marginal counters: tiles beyond the first two
    c = counts[2:].mean(axis=0)
    return per_tile, c


def main():
    l = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    e = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    _ensure_eager_dispatch()
    cfg = derive_config("wfa", l, e, backtrace=True, adaptive=True,
                        variant="hbm")
    P = WL.long_tile_pairs(cfg)
    n = 10 * P
    rows = []
    for ed in (0.002, 0.005, 0.01, 0.015, 0.02):
        per_tile, c = measure(cfg, ed, n, l)
        rows.append((per_tile, *c))
        print(f"e_data={ed}: {per_tile:8.1f} us/tile "
              f"({per_tile / P:6.2f} us/pair) steps={c[0]:.0f} "
              f"rounds={c[1]:.0f} chunks={c[2]:.0f}", flush=True)
    A = np.array([[r[1], r[2], r[3], 1.0] for r in rows])
    y = np.array([r[0] for r in rows])
    coef, res, *_ = np.linalg.lstsq(A, y, rcond=None)
    print(f"fit: {coef[0]:.2f} us/step + {coef[1]:.2f} us/ext_round "
          f"+ {coef[2]:.2f} us/live_chunk + {coef[3]:.0f} const "
          f"(resid {np.sqrt(res / len(y))[0] if len(res) else 0:.1f})")


if __name__ == "__main__":
    main()

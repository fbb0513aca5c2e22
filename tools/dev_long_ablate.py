"""Ablation profiler for the long-read kernel on real TPU.

Times _wfa_long_kernel variants with individual stages disabled (via the
module-level _ABLATE set, read at trace time; each variant gets a fresh
jit so the cache key differs).  Ablated kernels are WRONG — timing only.

Usage: python tools/dev_long_ablate.py [l [e [n]]]
"""

import functools
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


def run(cfg, dp, dt, dpl, dtl, n):
    """Marginal slope between one tile (64) and n pairs — the relay's
    ~30 ms dispatch floor swamps single-tile timings (PERFNOTES.md)."""
    fn = jax.jit(WL._wfa_long_jit.__wrapped__,
                 static_argnames=("cfg", "interpret"))

    def best_of(m):
        return T.best_of(
            lambda: fn(dp[:m], dt[:m], dpl[:m], dtl[:m], cfg=cfg,
                       interpret=False),
            repeats=3)

    t1 = best_of(64)
    t2 = best_of(n)
    return (t2 - t1) / (n - 64) * 1e6


def main():
    l = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    e = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 320
    _ensure_eager_dispatch()
    cfg = derive_config("wfa", l, e, backtrace=True, adaptive=True,
                        variant="hbm")
    pats, txts, pl_, tl_ = synth(n, l, e, cfg.read_size, seed=7)
    pp, pt, ok = pack_seqs(pats, txts, pl_, tl_, cfg.read_size)
    assert ok
    dp, dt = jax.device_put(pp), jax.device_put(pt)
    dpl, dtl = jax.device_put(pl_), jax.device_put(tl_)
    jax.block_until_ready((dp, dt, dpl, dtl))
    base = run(cfg, dp, dt, dpl, dtl, n)
    print(f"l={l} smax={cfg.max_score} baseline: {base:.1f} us/pair",
          flush=True)
    for ab in ("backtrace", "extend_cont", "extend", "spill", "reduce",
               "compute", "gather"):
        WL._ABLATE = {ab}
        try:
            t = run(cfg, dp, dt, dpl, dtl, n)
            print(f"  -{ab:14s}: {t:7.1f} us/pair (delta {base - t:+.1f})",
                  flush=True)
        finally:
            WL._ABLATE = set()


if __name__ == "__main__":
    main()

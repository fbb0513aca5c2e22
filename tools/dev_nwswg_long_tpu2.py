"""NW/SWG long-tier slope timing on real TPU + CPU-oracle denominator.

Usage: python tools/dev_nwswg_long_tpu2.py [l] [xla]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import aim_tpu.native as nat  # noqa: E402
from aim_tpu.config import AlignConfig  # noqa: E402
from aim_tpu.ops.nwswg_pallas_long import nwswg_forward_pallas_long  # noqa: E402
from tools.dev_long_check import synth  # noqa: E402
from tools import _timing as T  # noqa: E402


def time_best(fn, reps=5):
    return T.best_of(fn, repeats=reps, warmup=False)


def main(l=4000):
    # flip the relay into eager-sync dispatch mode (PERFNOTES §1): timings
    # in the pre-D2H deferred mode are fake for pallas calls
    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((8,), jnp.int32)))
    R = -(-(l + max(64, l // 8)) // 32) * 32
    for algo in ("nw", "swg"):
        cfg = (AlignConfig(algo="nw", read_size=R, max_score=300,
                           backtrace=True, gap_i=1, gap_d=1, mismatch=1)
               if algo == "nw" else
               AlignConfig(algo="swg", read_size=R, max_score=400,
                           backtrace=True, match=0, mismatch=3, gap_o=4,
                           gap_e=1, variant="hbm"))
        times = {}
        for n in (256, 512):
            pats, txts, pl_, tl_ = synth(n, l, 0.01, R, seed=3)
            dp = jax.device_put(pats)
            dt_ = jax.device_put(txts)
            dpl = jax.device_put(pl_.astype(np.int32))
            dtl = jax.device_put(tl_.astype(np.int32))
            jax.block_until_ready((dp, dt_, dpl, dtl))
            jax.block_until_ready(nwswg_forward_pallas_long(
                dp, dt_, dpl, dtl, cfg=cfg))      # compile + warm
            times[n] = time_best(lambda: nwswg_forward_pallas_long(
                dp, dt_, dpl, dtl, cfg=cfg))
            print(f"{algo} l={l} n={n}: best={times[n]*1e3:.1f}ms",
                  flush=True)
        marg = (times[512] - times[256]) / 256 * 1e6
        print(f"{algo} l={l}: marginal {marg:.1f} us/pair", flush=True)

        # CPU-oracle single-thread denominator (64 pairs is plenty)
        pats, txts, pl_, tl_ = synth(64, l, 0.01, R, seed=4)
        t0 = time.perf_counter()
        if algo == "nw":
            nat.nw_align(pats, txts, pl_, tl_, mismatch=cfg.mismatch,
                         gap_i=cfg.gap_i, gap_d=cfg.gap_d, backtrace=True,
                         threads=1)
        else:
            nat.swg_align(pats, txts, pl_, tl_, match=cfg.match,
                          mismatch=cfg.mismatch, gap_o=cfg.gap_o,
                          gap_e=cfg.gap_e, max_score=cfg.max_score,
                          cell_width=2, backtrace=True, threads=1)
        cpu = (time.perf_counter() - t0) / 64 * 1e6
        print(f"{algo} l={l}: cpu_1t {cpu:.1f} us/pair "
              f"(kernel {cpu/marg:.1f}x)", flush=True)


if __name__ == "__main__":
    l = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    main(l)

"""Measure the difficulty-sort gain on the long-read WFA kernel (TPU).

Each 64-pair tile's while-loop runs to the tile's hardest pair; sorting
by the api._difficulty_order proxy groups similar scores per tile, so
the batch-average steps drop toward the per-pair mean (binomial error
variance at e=1%/10 kbp gives sd ~10 on a mean score ~140).  Decides
the AIM_TPU_SORT default for long-read runs:

    python tools/dev_sort_gain.py [l] [n]

Prints unsorted vs sorted best-of-3 kernel time on identical data.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

import aim_tpu.native as nat  # noqa: E402
from aim_tpu.api import _difficulty_order  # noqa: E402
from aim_tpu.config import derive_config  # noqa: E402
from aim_tpu.ops.common import pack_seqs  # noqa: E402
from aim_tpu.ops.wfa_pallas_long import wfa_forward_pallas_long  # noqa: E402
from tools.dev_long_check import synth  # noqa: E402


def bench_once(cfg, pats, txts, pl_, tl_):
    pp, pt, ok = pack_seqs(pats, txts, pl_, tl_, cfg.read_size)
    assert ok
    dp, dt = jax.device_put(pp), jax.device_put(pt)
    dpl, dtl = jax.device_put(pl_), jax.device_put(tl_)
    jax.block_until_ready((dp, dt, dpl, dtl))
    out = wfa_forward_pallas_long(dp, dt, dpl, dtl, cfg=cfg, packed=True)
    jax.block_until_ready(out)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = wfa_forward_pallas_long(dp, dt, dpl, dtl, cfg=cfg,
                                      packed=True)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    recs = np.asarray(out["step_records"])
    sc, *_ = nat.wfa_steps_to_ops(recs, pl_, tl_, max_score=cfg.max_score,
                                  max_ops=2 * cfg.read_size)
    return best, sc


def main():
    l = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    cfg = derive_config("wfa", l, 0.01, backtrace=True, adaptive=True,
                        variant="hbm")
    pats, txts, pl_, tl_ = synth(n, l, 0.01, cfg.read_size, seed=5)
    t_un, sc_un = bench_once(cfg, pats, txts, pl_, tl_)
    order = _difficulty_order(pats, txts, pl_, tl_)
    t_so, sc_so = bench_once(cfg, pats[order], txts[order], pl_[order],
                             tl_[order])
    assert (sc_so == sc_un[order]).all(), "sorted run changed scores!"
    print(f"l={l} n={n} smax={cfg.max_score}: unsorted {1e6 * t_un / n:.1f}"
          f" us/pair, sorted {1e6 * t_so / n:.1f} us/pair "
          f"(gain {100 * (1 - t_so / t_un):.1f}%) "
          f"score mean={sc_un.mean():.0f} sd={sc_un.std():.1f}")
    print("DECISION: export AIM_TPU_SORT=1 for long-read api.align runs"
          if t_so < 0.97 * t_un else
          "DECISION: keep AIM_TPU_SORT=0 (gain within noise)")


if __name__ == "__main__":
    main()

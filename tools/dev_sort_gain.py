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
from tools import _timing as T  # noqa: E402


def bench_once(cfg, pats, txts, pl_, tl_):
    pp, pt, ok = pack_seqs(pats, txts, pl_, tl_, cfg.read_size)
    assert ok
    dp, dt = jax.device_put(pp), jax.device_put(pt)
    dpl, dtl = jax.device_put(pl_), jax.device_put(tl_)
    jax.block_until_ready((dp, dt, dpl, dtl))
    out = wfa_forward_pallas_long(dp, dt, dpl, dtl, cfg=cfg, packed=True)
    jax.block_until_ready(out)  # compile + warm
    best = T.best_of(
        lambda: wfa_forward_pallas_long(dp, dt, dpl, dtl, cfg=cfg,
                                        packed=True),
        repeats=3, warmup=False)
    recs = np.asarray(out["step_records"])
    sc, *_ = nat.wfa_steps_to_ops(recs, pl_, tl_, max_score=cfg.max_score,
                                  max_ops=2 * cfg.read_size)
    return best, sc


def bench_v2(cfg, pats, txts, pl_, tl_):
    """Same protocol for the VMEM v2 kernel (the headline config): at
    smax=5/e=1%, ~36% of pairs score 0 — sorted, whole 128-pair tiles
    of them exit the while-loop at step 0 instead of riding to the
    tile max."""
    from aim_tpu.ops.wfa_pallas2 import wfa_forward_pallas2
    pp, pt, ok = pack_seqs(pats, txts, pl_, tl_, cfg.read_size)
    assert ok
    dp, dt = jax.device_put(pp), jax.device_put(pt)
    dpl, dtl = jax.device_put(pl_), jax.device_put(tl_)
    jax.block_until_ready((dp, dt, dpl, dtl))
    out = wfa_forward_pallas2(dp, dt, dpl, dtl, cfg=cfg, packed=True)
    jax.block_until_ready(out)
    best = T.best_of(
        lambda: wfa_forward_pallas2(dp, dt, dpl, dtl, cfg=cfg, packed=True),
        repeats=3, warmup=False)
    recs = np.asarray(out["step_records"])
    return best, recs[:, cfg.max_score + 3].astype(np.int32)


def main():
    # Sync-mode flip BEFORE any timed region: fresh-process deferred
    # mode makes block_until_ready return before completion for the
    # long kernels (measured 0.0 ms anchors — PERFNOTES.md §1).
    from aim_tpu.api import _ensure_eager_dispatch
    _ensure_eager_dispatch()
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
    print(f"LONG l={l} n={n} smax={cfg.max_score}: "
          f"unsorted {1e6 * t_un / n:.1f} us/pair, "
          f"sorted {1e6 * t_so / n:.1f} us/pair "
          f"(gain {100 * (1 - t_so / t_un):.1f}%) "
          f"score mean={sc_un.mean():.0f} sd={sc_un.std():.1f}")

    # headline config: VMEM v2 kernel, 100 bp / e=1%
    n2 = 65536
    cfg2 = derive_config("wfa", 100, 0.01, backtrace=True, adaptive=True)
    p2, t2, pl2, tl2 = synth(n2, 100, 0.01, cfg2.read_size, seed=7)
    tv_un, sv_un = bench_v2(cfg2, p2, t2, pl2, tl2)
    o2 = _difficulty_order(p2, t2, pl2, tl2)
    tv_so, sv_so = bench_v2(cfg2, p2[o2], t2[o2], pl2[o2], tl2[o2])
    assert (sv_so == sv_un[o2]).all(), "sorted v2 run changed scores!"
    print(f"V2 l=100 n={n2} smax={cfg2.max_score}: "
          f"unsorted {1e9 * tv_un / n2:.1f} ns/pair, "
          f"sorted {1e9 * tv_so / n2:.1f} ns/pair "
          f"(gain {100 * (1 - tv_so / tv_un):.1f}%)")
    gain = (t_so < 0.97 * t_un) or (tv_so < 0.97 * tv_un)
    print("DECISION: export AIM_TPU_SORT=1 for single-device api.align runs"
          if gain else
          "DECISION: keep AIM_TPU_SORT=0 (gain within noise)")


if __name__ == "__main__":
    main()

"""In-kernel counters for the long-read kernel on real TPU.

Runs the kernel in the "diag" ablation mode (counts forward steps,
extend-continuation rounds, and live compute chunks on pair 0 of each
tile — scores/CIGARs unaffected, extra state only) and prints per-tile
counts plus derived per-step averages.

Usage: python tools/dev_long_diag.py [l [e [n]]]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from aim_tpu.api import _ensure_eager_dispatch  # noqa: E402
from aim_tpu.config import derive_config  # noqa: E402
from aim_tpu.ops.common import pack_seqs  # noqa: E402
from aim_tpu.ops import wfa_pallas_long as WL  # noqa: E402
from tools.dev_long_check import synth  # noqa: E402


def main():
    l = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    e = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    _ensure_eager_dispatch()
    cfg = derive_config("wfa", l, e, backtrace=True, adaptive=True,
                        variant="hbm")
    pats, txts, pl_, tl_ = synth(n, l, e, cfg.read_size, seed=7)
    pp, pt, ok = pack_seqs(pats, txts, pl_, tl_, cfg.read_size)
    assert ok
    dp, dt = jax.device_put(pp), jax.device_put(pt)
    dpl, dtl = jax.device_put(pl_), jax.device_put(tl_)
    jax.block_until_ready((dp, dt, dpl, dtl))
    P = WL.long_tile_pairs(cfg)
    Kp = -(-(2 * cfg.max_score + 1) // 128) * 128
    NC = Kp // 128
    WL._ABLATE = {"diag"}
    try:
        fn = jax.jit(WL._wfa_long_jit.__wrapped__,
                     static_argnames=("cfg", "interpret"))
        out = fn(dp, dt, dpl, dtl, cfg=cfg, interpret=False)
        recs = np.asarray(out["step_records"])
    finally:
        WL._ABLATE = set()
    print(f"l={l} smax={cfg.max_score} P={P} Kp={Kp} (NC={NC}) n={n}")
    tot = np.zeros(3, np.int64)
    for t0 in range(0, n, P):
        steps, extr, livec = recs[t0, 0], recs[t0, 1], recs[t0, 2]
        wmax, wsum = recs[t0, 3], recs[t0, 4]
        tot += (steps, extr, livec)
        print(f"  tile@{t0:5d}: steps={steps:5d} ext_rounds={extr:6d} "
              f"live_chunks={livec:7d} "
              f"(avg {extr / max(steps, 1):.2f} rounds/step, "
              f"{livec / max(steps, 1):.2f} of {NC} chunks/step, "
              f"band wmax={wmax} wmean={wsum / max(steps, 1):.1f})")
    nt = max(1, (n + P - 1) // P)
    print(f"  mean/tile: steps={tot[0] / nt:.0f} ext_rounds={tot[1] / nt:.0f}"
          f" live_chunks={tot[2] / nt:.0f}")


if __name__ == "__main__":
    main()

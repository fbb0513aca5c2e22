"""Minimal compile+run smoke of the long kernel on the live backend.

Usage: python tools/dev_long_compile.py [l [e]]
Compiles one tile of the derived config and checks scores vs the oracle.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

import aim_tpu.native as nat  # noqa: E402
from aim_tpu.config import derive_config  # noqa: E402
from aim_tpu.ops.common import pack_seqs  # noqa: E402
from aim_tpu.ops.wfa_pallas_long import (long_tile_pairs,  # noqa: E402
                                         wfa_forward_pallas_long)
from tools.dev_long_check import synth  # noqa: E402


def main():
    l = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    e = float(sys.argv[2]) if len(sys.argv) > 2 else 0.02
    cfg = derive_config("wfa", l, e, backtrace=True, adaptive=True,
                        variant="hbm")
    P = long_tile_pairs(cfg)
    print(f"l={l} e={e} smax={cfg.max_score} R={cfg.read_size} P={P}",
          flush=True)
    pats, txts, pl_, tl_ = synth(P, l, e, cfg.read_size, seed=5)
    pp, pt, ok = pack_seqs(pats, txts, pl_, tl_, cfg.read_size)
    assert ok
    dp, dt = jax.device_put(pp), jax.device_put(pt)
    dpl, dtl = jax.device_put(pl_), jax.device_put(tl_)
    jax.block_until_ready((dp, dt, dpl, dtl))
    t0 = time.perf_counter()
    out = wfa_forward_pallas_long(dp, dt, dpl, dtl, cfg=cfg, packed=True)
    jax.block_until_ready(out)
    print(f"compile+run {time.perf_counter() - t0:.1f}s", flush=True)
    recs = np.asarray(out["step_records"])
    sc, ops, b, en = nat.wfa_steps_to_ops(recs, pl_, tl_,
                                          max_score=cfg.max_score,
                                          max_ops=2 * cfg.read_size)
    osc, _, _, _ = nat.wfa_align(pats, txts, pl_, tl_, mismatch=3, gap_o=4,
                                 gap_e=1, max_score=cfg.max_score,
                                 adaptive=True, backtrace=True)
    bad = int((sc != osc).sum())
    print(f"score_bad={bad}/{P}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()

"""A/B the VMEM NW/SWG kernels' packed-input path against raw bytes at
bench-scale batches (the packed path adds a device-side XLA unpack
prologue before the mismatch-bitplane build; bench.py measures packed
because api.align uploads packed — this tool attributes the marginal
difference so BASELINE can report both honestly).

    python tools/dev_packed_ab.py [reps_small reps_big]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from aim_tpu.api import _ensure_eager_dispatch  # noqa: E402
from aim_tpu.config import derive_config  # noqa: E402
from aim_tpu.ops.common import pack_seqs  # noqa: E402
from tools.dev_long_check import synth  # noqa: E402
from tools import _timing as T  # noqa: E402


def slope(fn, cfg, pats, txts, pl_, tl_, reps, packed):
    n = len(pl_)
    ts = []
    for r in reps:
        dp = jax.device_put(np.tile(pats, (r, 1)))
        dt = jax.device_put(np.tile(txts, (r, 1)))
        dpl = jax.device_put(np.tile(pl_, r))
        dtl = jax.device_put(np.tile(tl_, r))
        jax.block_until_ready((dp, dt, dpl, dtl))
        best = T.best_of(
            lambda: fn(dp, dt, dpl, dtl, cfg=cfg, packed=packed),
            repeats=3)
        ts.append(best)
        del dp, dt, dpl, dtl
    return (ts[1] - ts[0]) / (n * (reps[1] - reps[0])) * 1e6


def main():
    _ensure_eager_dispatch()
    reps = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (8, 32)
    n = 20000
    from aim_tpu.ops.nw_pallas import nw_forward_pallas
    from aim_tpu.ops.swg_pallas import swg_forward_pallas
    for algo, fn in (("nw", nw_forward_pallas), ("swg", swg_forward_pallas)):
        cfg = derive_config(algo, 100, 0.01, backtrace=True)
        pats, txts, pl_, tl_ = synth(n, 100, 0.01, cfg.read_size, seed=3)
        pl_ = pl_.astype(np.int32)
        tl_ = tl_.astype(np.int32)
        pp, pt, ok = pack_seqs(pats, txts, pl_, tl_, cfg.read_size)
        assert ok
        m_raw = slope(fn, cfg, pats, txts, pl_, tl_, reps, packed=False)
        m_pk = slope(fn, cfg, pp, pt, pl_, tl_, reps, packed=True)
        print(f"{algo}: raw={m_raw:.4f} us/pair  packed={m_pk:.4f} us/pair "
              f"(prologue {m_pk - m_raw:+.4f})", flush=True)


if __name__ == "__main__":
    main()

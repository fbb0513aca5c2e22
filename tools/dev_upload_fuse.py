"""Measure whether fusing a chunk's four upload arrays (pats, txts,
plens, tlens) into ONE host buffer cuts the relay's fixed per-transfer
cost (~25-30 ms each, PERFNOTES.md §2).

If the 1-buffer upload of the canonical 20k-pair chunk is >=2 fixed
costs cheaper than the 4-array upload, api.align should adopt the fused
layout (slice + bitcast on device).  Run on the live TPU:

    python tools/dev_upload_fuse.py [n_pairs]
"""

import sys
import time

import numpy as np
from tools import _timing as T  # noqa: E402

sys.path.insert(0, "/root/repo")


def main(n=20000):
    import jax
    from aim_tpu.config import derive_config
    from aim_tpu.ops.common import pack_seqs

    cfg = derive_config("wfa", 100, 0.01, backtrace=True, adaptive=True)
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    R = cfg.read_size
    pats = np.zeros((n, R), np.uint8)
    pats[:, :100] = bases[rng.integers(0, 4, (n, 100))]
    txts = pats.copy()
    plens = np.full(n, 100, np.int32)
    tlens = np.full(n, 100, np.int32)
    up, ut, ok = pack_seqs(pats, txts, plens, tlens, R)
    assert ok

    # one throwaway D2H to reach the eager steady state (PERFNOTES §1)
    w = jax.device_put(np.ones(1024, np.uint8))
    jax.block_until_ready(w)
    np.asarray(w)

    def four():
        a = jax.device_put(up)
        b = jax.device_put(ut)
        c = jax.device_put(plens)
        d = jax.device_put(tlens)
        jax.block_until_ready((a, b, c, d))
        return a, b, c, d

    def one():
        buf = np.concatenate([up.reshape(-1), ut.reshape(-1),
                              plens.view(np.uint8).reshape(-1),
                              tlens.view(np.uint8).reshape(-1)])
        db = jax.device_put(buf)
        jax.block_until_ready(db)
        return db

    for name, fn in (("four-arrays", four), ("one-buffer", one)):
        best = T.best_of(fn, repeats=5)
        print(f"{name}: best {best*1e3:.1f} ms", flush=True)

    # End-to-end answer: api.align with the fused transport on vs off
    # (the flag is read per call).  Adopt the fused default iff this
    # shows a clear win — the raw H2D numbers above explain WHY.
    import os
    from aim_tpu.api import align
    for flag in ("0", "1"):
        os.environ["AIM_TPU_FUSED_UPLOAD"] = flag
        align(pats, txts, plens, tlens, cfg)  # compile + steady state
        best = T.best_of(lambda: align(pats, txts, plens, tlens, cfg),
                         repeats=3, block=False, warmup=False)
        r = align(pats, txts, plens, tlens, cfg)
        print(f"align fused={flag}: best {best*1e3:.1f} ms "
              f"({n/best:.0f} pairs/s, load {r.t_load*1e3:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20000)

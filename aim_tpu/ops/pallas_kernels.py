"""Backend dispatch for the hand-written Pallas TPU kernels.

forward_fn(cfg) returns a kernel callable with the same signature as the
XLA implementations, or None when no Pallas kernel covers the config yet
(the caller falls back to XLA).
"""

from __future__ import annotations

from aim_tpu.config import ALGO_WFA, AlignConfig


def forward_fn(cfg: AlignConfig):
    if cfg.algo == ALGO_WFA and cfg.variant == "vmem" and cfg.max_score <= 63:
        from aim_tpu.ops.wfa_pallas import wfa_forward_pallas

        def fn(*args, **kw):
            return wfa_forward_pallas(*args, **kw)

        fn.score_major = True
        return fn
    return None

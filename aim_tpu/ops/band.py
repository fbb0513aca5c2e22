"""Shared machinery for the banded Pallas kernels (NW, SWG).

Both kernels lay the DP band out over 128-lane rows, G pairs per row
(each owning an L-lane segment, L a power of two; G=1 degenerates to one
pair per row), and share: the min-plus prefix scan that linearizes the
in-row deletion chain (ref: NW/DPU-WRAM/dpu/nw.c:139,
SWG/DPU-WRAM/dpu/swg.c:151-153), the +-1 band shifts, and the per-group
all-reduces (group-cyclic roll butterflies) that implement per-pair reads
of shared rows in the grouped layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
F32 = jnp.float32


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def ctz32(u):
    """Count trailing zeros of u != 0 (any int32, incl. bit 31): isolate
    the lsb, float-bitcast, read the exponent.  Mosaic has no ctz
    primitive; this stays in vregs."""
    lsb = (u & (0 - u)).astype(F32)
    return ((jax.lax.bitcast_convert_type(lsb, I32) >> 23) & 0xFF) - 127


def group_reduce_max(x, b_iota, L: int):
    """Per-group all-reduce max over each L-lane segment, result broadcast
    to every lane of its group (L a power of two; L=128 degenerates to a
    full-row reduce).  Butterfly of group-cyclic rolls: rolling by s
    within a group is a physical roll by s with the wrapped lanes
    (b < s) taken from the roll by s - L instead."""
    s = 1
    while s < L:
        fwd = pltpu.roll(x, s, 1)
        wrap = pltpu.roll(x, (s - L) % 128, 1)
        x = jnp.maximum(x, jnp.where(b_iota >= s, fwd, wrap))
        s *= 2
    return x


def group_reduce_sum(x, b_iota, L: int):
    """Per-group all-reduce sum (see group_reduce_max)."""
    s = 1
    while s < L:
        fwd = pltpu.roll(x, s, 1)
        wrap = pltpu.roll(x, (s - L) % 128, 1)
        x = x + jnp.where(b_iota >= s, fwd, wrap)
        s *= 2
    return x

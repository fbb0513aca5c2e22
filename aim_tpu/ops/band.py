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


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def log_shifts(width: int):
    """Powers of two below width (prefix/suffix scan step sizes)."""
    out = []
    s = 1
    while s < width:
        out.append(s)
        s *= 2
    return out


def band_ops(b_iota, B: int, slope: int, inf: int, L: int = 128):
    """Returns (minplus, sl1, sr1) over [P, 128] band-lane arrays.

    b_iota is the within-group band position of each lane (== the lane
    iota when one pair's band spans the whole row, L=128; == lane % L in
    the grouped layout where G = 128//L pairs share a row).  All shifts
    are physical lane rolls whose cross-group reads are masked out by the
    b_iota bounds, so the same code serves both layouts.

    minplus(z)[b] = min_{j<=b} (z[j] + (b-j)*slope); sl1/sr1 read band
    positions b-1 / b+1 with a fill value at the group edges.
    """
    ramp = b_iota * slope
    shifts = log_shifts(B)

    def minplus(z):
        x = z - ramp
        for s_ in shifts:
            rolled = pltpu.roll(x, s_, 1)
            x = jnp.minimum(x, jnp.where(b_iota >= s_, rolled, inf))
        return x + ramp

    def sl1(w, fill):
        r = pltpu.roll(w, 1, 1)
        return jnp.where(b_iota >= 1, r, fill)

    def sr1(w, fill):
        r = pltpu.roll(w, 127, 1)
        return jnp.where(b_iota <= L - 2, r, fill)

    return minplus, sl1, sr1


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

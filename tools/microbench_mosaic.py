"""Microbenchmark: which Mosaic ops exist + what they cost on this TPU.

Probes the primitives the WFA kernel v2 redesign depends on:
  * jnp.take_along_axis along lanes (dynamic per-lane gather)
  * sublane roll (pltpu.roll axis=0) and lane roll (axis=1)
  * jax.lax.population_count (for bit-parallel LCP extend)
  * per-lane variable shifts (u32 >> vec)
  * int8 vs int32 elementwise throughput
  * lax.while_loop inside a kernel
  * one-hot word-select (the bit-parallel extend's inner fetch)

Method per probe: a kernel whose body repeats the op REPS times inside a
fori_loop (carried dependency so nothing folds away); timed at two REPS
values in the post-D2H eager mode; the slope is the honest per-rep cost
(PERFNOTES.md: absolute dispatch times carry a ~30 ms relay floor).

Usage: python tools/microbench_mosaic.py [probe ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tools import _timing as T  # noqa: E402

I32 = jnp.int32


def _mk(kernel, reps, out_shape=(8, 128), dtype=I32, n_in=1,
        in_shape=(8, 128)):
    k = functools.partial(kernel, reps)
    return pl.pallas_call(
        k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
    )


def _time(fn, *args):
    return T.best_of(lambda: fn(*args), repeats=3)


def probe(name, build, reps_lo=64, reps_hi=512):
    """build(reps) -> (jitted_fn, args). Prints per-rep slope in us."""
    try:
        fn_lo, args = build(reps_lo)
        t_lo = _time(fn_lo, *args)
        fn_hi, args = build(reps_hi)
        t_hi = _time(fn_hi, *args)
        slope_us = (t_hi - t_lo) / (reps_hi - reps_lo) * 1e6
        print(f"{name:40s} OK   {slope_us:9.3f} us/rep   "
              f"(t{reps_lo}={t_lo*1e3:.2f}ms t{reps_hi}={t_hi*1e3:.2f}ms)")
        return slope_us
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"{name:40s} FAIL {msg}")
        return None


# ---------------------------------------------------------------- probes
def build_gather_lanes(reps):
    """take_along_axis along lanes: [N,128] src, [N,128] idx."""
    N = 448  # = K8*P/128 scale-ish

    def kern(reps, src_ref, idx_ref, out_ref):
        src = src_ref[:]
        idx = idx_ref[:]

        def body(i, acc):
            g = jnp.take_along_axis(src, (idx + acc) % 128, axis=1)
            return (acc + g) % 7

        out_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros_like(src))

    src = jnp.arange(N * 128, dtype=I32).reshape(N, 128) % 101
    idx = (jnp.arange(N * 128, dtype=I32).reshape(N, 128) * 7) % 128
    return _mk(kern, reps, out_shape=(N, 128), n_in=2), (src, idx)


def build_gather_sublane_src(reps):
    """take_along_axis along axis 0 (sublanes)."""
    def kern(reps, src_ref, idx_ref, out_ref):
        src = src_ref[:]
        idx = idx_ref[:]

        def body(i, acc):
            g = jnp.take_along_axis(src, (idx + acc) % 56, axis=0)
            return (acc + g) % 7

        out_ref[:] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros((56, 128), I32))

    src = jnp.arange(56 * 128, dtype=I32).reshape(56, 128) % 101
    idx = (jnp.arange(56 * 128, dtype=I32).reshape(56, 128) * 7) % 56
    return _mk(kern, reps, out_shape=(56, 128), n_in=2), (src, idx)


def build_roll_sublane(reps):
    def kern(reps, x_ref, out_ref):
        def body(i, acc):
            return pltpu.roll(acc, 1, 0) + 1

        out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])

    x = jnp.arange(56 * 128, dtype=I32).reshape(56, 128) % 101
    return _mk(kern, reps, out_shape=(56, 128)), (x,)


def build_roll_lane(reps):
    def kern(reps, x_ref, out_ref):
        def body(i, acc):
            return pltpu.roll(acc, 1, 1) + 1

        out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])

    x = jnp.arange(56 * 128, dtype=I32).reshape(56, 128) % 101
    return _mk(kern, reps, out_shape=(56, 128)), (x,)


def build_popcount(reps):
    def kern(reps, x_ref, out_ref):
        def body(i, acc):
            return jax.lax.population_count(acc ^ x_ref[:]) + acc % 3

        out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])

    x = jnp.arange(56 * 128, dtype=I32).reshape(56, 128) % 30000
    return _mk(kern, reps, out_shape=(56, 128)), (x,)


def build_varshift(reps):
    def kern(reps, x_ref, s_ref, out_ref):
        s = s_ref[:]

        def body(i, acc):
            u = acc.astype(jnp.uint32)
            return ((u >> s.astype(jnp.uint32))
                    | (u << ((32 - s) % 32).astype(jnp.uint32))).astype(I32)

        out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])

    x = jnp.arange(56 * 128, dtype=I32).reshape(56, 128) % 30000
    s = (jnp.arange(56 * 128, dtype=I32).reshape(56, 128) * 3) % 31 + 1
    return _mk(kern, reps, n_in=2, out_shape=(56, 128)), (x, s)


def build_i32_min(reps, shape=(128, 128)):
    def kern(reps, x_ref, out_ref):
        x = x_ref[:]

        def body(i, acc):
            return jnp.minimum(acc + 1, x) + (acc & 3)

        out_ref[:] = jax.lax.fori_loop(0, reps, body, x)

    x = jnp.arange(shape[0] * shape[1], dtype=I32).reshape(shape) % 101
    return _mk(kern, reps, out_shape=shape), (x,)


def build_i8_min(reps, shape=(128, 128)):
    def kern(reps, x_ref, out_ref):
        x = x_ref[:]

        def body(i, acc):
            return jnp.minimum(acc + 1, x) + (acc & 3)

        out_ref[:] = jax.lax.fori_loop(0, reps, body, x)

    x = (np.arange(shape[0] * shape[1]) % 101).astype(np.int8).reshape(shape)
    return _mk(kern, reps, out_shape=shape, dtype=jnp.int8), (jnp.asarray(x),)


def build_while(reps):
    def kern(reps, x_ref, out_ref):
        x = x_ref[:]

        def cond(st):
            i, acc = st
            return (i < reps) & (jnp.max(acc) < 10 ** 6)

        def body(st):
            i, acc = st
            return i + 1, jnp.minimum(acc + 1, acc * 2 + x % 5)

        _, acc = jax.lax.while_loop(cond, body, (0, x))
        out_ref[:] = acc

    x = jnp.arange(56 * 128, dtype=I32).reshape(56, 128) % 101
    return _mk(kern, reps, out_shape=(56, 128)), (x,)


def build_onehot_wordsel(reps):
    """The bit-parallel extend fetch: select word q (of W=8) per element
    of a [56,128] plane from a [8,128] word plane (broadcast rows)."""
    def kern(reps, w_ref, q_ref, out_ref):
        w = w_ref[:]
        q = q_ref[:]

        def body(i, acc):
            qq = (q + acc) % 8
            r = jnp.zeros((56, 128), I32)
            for j in range(8):
                r = r + jnp.where(qq == j, w[j:j + 1, :], 0)
            return r % 9

        out_ref[:] = jax.lax.fori_loop(0, reps, body, jnp.zeros((56, 128), I32))

    w = jnp.arange(8 * 128, dtype=I32).reshape(8, 128) % 30000
    q = (jnp.arange(56 * 128, dtype=I32).reshape(56, 128) * 3) % 8
    return _mk(kern, reps, n_in=2, out_shape=(56, 128)), (w, q)


def build_transpose(reps):
    def kern(reps, x_ref, out_ref):
        def body(i, acc):
            return acc.T + 1

        out_ref[:] = jax.lax.fori_loop(0, reps, body, x_ref[:])

    x = jnp.arange(128 * 128, dtype=I32).reshape(128, 128) % 101
    return _mk(kern, reps, out_shape=(128, 128)), (x,)


def build_onehot_reduce_rp(reps):
    """Today's extend inner op for ONE k: one-hot gather over Rp lanes."""
    def kern(reps, nm_ref, off_ref, out_ref):
        nm = nm_ref[:]
        off = off_ref[:]
        riota = jax.lax.broadcasted_iota(I32, (128, 128), 1)

        def body(i, acc):
            e = jnp.sum(jnp.where(riota == (off + acc) % 111, nm, 0),
                        axis=1, keepdims=True)
            return (acc + e) % 5

        out_ref[:] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros((128, 1), I32))

    nm = jnp.arange(128 * 128, dtype=I32).reshape(128, 128) % 101
    off = (jnp.arange(128, dtype=I32).reshape(128, 1) * 7) % 111
    return _mk(kern, reps, n_in=2, out_shape=(128, 1)), (nm, off)


def build_dynslice_row(reps):
    """Dynamic scratch row read+write [S2,56,128] (forward hist access)."""
    def kern(reps, x_ref, out_ref, hist_ref):
        x = x_ref[:]
        hist_ref[0] = x

        def body(i, acc):
            s = i % 60
            r = hist_ref[s] + 1
            hist_ref[s + 1] = jnp.minimum(r, acc)
            return r % 97

        out_ref[:] = jax.lax.fori_loop(0, reps, body, x)

    x = jnp.arange(56 * 128, dtype=I32).reshape(56, 128) % 101
    f = pl.pallas_call(
        functools.partial(kern, reps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((56, 128), I32),
        scratch_shapes=[pltpu.VMEM((62, 56, 128), I32)],
    )
    return f, (x,)


PROBES = {
    "gather_lanes": build_gather_lanes,
    "gather_sublanes": build_gather_sublane_src,
    "roll_sublane": build_roll_sublane,
    "roll_lane": build_roll_lane,
    "popcount": build_popcount,
    "varshift": build_varshift,
    "i32_min_128x128": build_i32_min,
    "i8_min_128x128": build_i8_min,
    "while_loop": build_while,
    "onehot_wordsel_56x128_W8": build_onehot_wordsel,
    "transpose_128": build_transpose,
    "onehot_reduce_Rp(today's extend/k)": build_onehot_reduce_rp,
    "dynslice_hist_row": build_dynslice_row,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    print(f"devices: {jax.devices()}")
    # Flip into the eager dispatch mode (honest timings; PERFNOTES.md).
    b = jax.device_put(np.zeros(64, np.uint8))
    jax.block_until_ready(b)
    np.asarray(b)
    for n in names:
        probe(n, PROBES[n])


if __name__ == "__main__":
    main()

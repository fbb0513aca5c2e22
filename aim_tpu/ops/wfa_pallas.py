"""WFA / WFA-adaptive — Pallas TPU kernel (VMEM-resident tier).

One fused kernel per pair tile replaces the XLA while-loop program: the
whole wavefront state machine (extend -> reduce -> end-check -> compute-next)
runs on-chip with the dense history resident in VMEM output blocks — the
TPU shape of the reference's DPU-WRAM tier where all wavefronts stay in the
scratchpad (ref: WFA/DPU-WRAM/dpu/wfa.c:345, wavefronts[MAX_SCORE+1] array).

Key device choices:
  * extend = sublane one-hot reduce over a precomputed next-mismatch table
    (h in sublanes, k in lanes) — no gathers, pure VPU.
  * compute_next's lookback (s-x, s-o-e, s-e) is statically bounded, so the
    per-score extents/flags ride in a ROLLING WINDOW loop carry with static
    column indices — no dynamic lane indexing anywhere; the dense wavefront
    history uses only leading-dim dynamic indexing ([S+2, P, Kp] blocks).
  * outputs are score-major ([S+2, n, Kp] / [S+2, n]) and walked zero-copy
    by the strided native walker (score_major=True).

Semantics mirror ops/wfa_xla.py exactly (same reference quirks preserved);
tests assert equality against the native oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aim_tpu.config import AlignConfig
from aim_tpu.ops.wfa_xla import build_nm_table

I32 = jnp.int32
I16 = jnp.int16
NULL = -16384
BIG = 2 ** 30


def _round_up(x, m):
    return -(-x // m) * m


def _wfa_kernel(cfg: AlignConfig, P: int, Kp: int, Rp: int, LB: int,
                plens_ref, tlens_ref, nmt_ref,
                scores_ref, hm_ref, hi_ref, hd_ref,
                klo_ref, khi_ref, fl_ref):
    smax = cfg.max_score
    x, go, ge = cfg.mismatch, cfg.gap_o, cfg.gap_e

    plens = plens_ref[:]            # [P, 1] i32
    tlens = tlens_ref[:]
    ak = tlens - plens              # [P, 1]
    kvec = jax.lax.broadcasted_iota(I32, (P, Kp), 1) - smax
    lane_valid = kvec <= smax       # lanes beyond K are dead

    null16 = jnp.full((P, Kp), NULL, I16)

    # ---- score 0 (ref: wfa.c:364-366) ----
    # (selects happen in int32 — Mosaic dislikes 8x128-tiled bool masks
    # applied to 16x128-tiled values — and are cast on store)
    hm_ref[0] = jnp.where(kvec == 0, 0, NULL).astype(I16)
    hi_ref[0] = null16
    hd_ref[0] = null16
    fl0 = 1 | (1 << 2) | (1 << 3)
    klo_ref[0:1, :] = jnp.zeros((1, P), I32)
    khi_ref[0:1, :] = jnp.zeros((1, P), I32)
    fl_ref[0:1, :] = jnp.full((1, P), fl0, I32)

    # Rolling metadata window: column LB-1 = current score s, column LB-1-d
    # = score s-d.  Pre-score-0 columns start "not exists" (flags 0).
    # Full-tile width (128 lanes) keeps the while-carry layouts legal for
    # Mosaic; only lanes [0, LB) are meaningful.
    col = jax.lax.broadcasted_iota(I32, (P, 128), 1)
    klw0 = jnp.where(col == LB - 1, 0, 1)
    khw0 = jnp.where(col == LB - 1, 0, -1)
    flw0 = jnp.where(col == LB - 1, fl0, 0)

    # Mosaic only rotates 32-bit vectors; shift in int32 (values fit).
    def sl(w):  # value at lane k-1
        r = pltpu.roll(w, 1, 1)
        pos = jax.lax.broadcasted_iota(I32, w.shape, 1)
        return jnp.where(pos >= 1, r, NULL)

    def sr(w):  # value at lane k+1
        r = pltpu.roll(w, Kp - 1, 1)
        pos = jax.lax.broadcasted_iota(I32, w.shape, 1)
        return jnp.where(pos <= Kp - 2, r, NULL)

    def colslice(w, j):
        return jax.lax.slice_in_dim(w, j, j + 1, axis=1)  # [P, 1], static j

    def body(state):
        s, active_i, scores, klw, khw, flw = state
        active = active_i > 0
        m = hm_ref[s].astype(I32)
        kl = colslice(klw, LB - 1)
        kh = colslice(khw, LB - 1)
        fl = colslice(flw, LB - 1)
        exists = (fl & 1) == 1
        m_null = ~exists | (((fl >> 1) & 1) == 1)
        inr = (kl <= kvec) & (kvec <= kh)

        # ---- extend (ref: wfa.c:193-215): offset -> first mismatch >=
        # offset on this diagonal, via a sublane one-hot reduce ----
        do_ext = active & ~m_null & inr & (m >= 0)
        idx = jnp.clip(m, 0, Rp - 1)
        h_iota = jax.lax.broadcasted_iota(I32, (P, Rp, Kp), 1)
        hit = h_iota == idx[:, None, :]
        ext = jnp.sum(jnp.where(hit, nmt_ref[:].astype(I32), 0), axis=1)
        offi = jnp.where(do_ext, ext, m)
        hm_ref[s] = offi.astype(I16)

        # ---- reduce (WFA-adaptive, ref: wfa.c:70-141) ----
        if cfg.adaptive:
            width = kh - kl + 1
            do_red = active & ~m_null & (width >= 10)
            v = offi - kvec
            dist = jnp.maximum(plens - v, tlens - offi)
            dmask = jnp.where(inr, dist, BIG)
            mind = jnp.minimum(jnp.min(dmask, axis=1, keepdims=True),
                               jnp.maximum(plens, tlens))
            keep = (dist - mind) <= 50
            top_limit = jnp.minimum(ak - 1, kh)
            cand_lo = jnp.where((kvec >= kl) & (kvec < top_limit) & keep,
                                kvec, BIG)
            fk = jnp.min(cand_lo, axis=1, keepdims=True)
            klo_new = jnp.maximum(kl, jnp.minimum(fk, top_limit))
            bottom_limit = jnp.maximum(ak + 1, klo_new)
            cand_hi = jnp.where((kvec <= kh) & (kvec > bottom_limit) & keep,
                                kvec, -BIG)
            lk = jnp.max(cand_hi, axis=1, keepdims=True)
            khi_new = jnp.minimum(kh, jnp.maximum(lk, bottom_limit))
            nullify = do_red & (klo_new > khi_new)
            shrink = do_red & ~nullify
            kl = jnp.where(shrink, klo_new, kl)
            kh = jnp.where(shrink, khi_new, kh)
            fl = jnp.where(nullify, fl | 0b1110, fl)
            sel = col == LB - 1
            klw = jnp.where(sel, kl, klw)
            khw = jnp.where(sel, kh, khw)
            flw = jnp.where(sel, fl, flw)
            # republish score s's sidecar row post-reduce
            klo_ref[pl.ds(s, 1), :] = kl.reshape(1, P)
            khi_ref[pl.ds(s, 1), :] = kh.reshape(1, P)
            fl_ref[pl.ds(s, 1), :] = fl.reshape(1, P)
            m_null = m_null | nullify
            inr = (kl <= kvec) & (kvec <= kh)

        # ---- end reached (ref: wfa.c:217-237) ----
        at_ak = (kvec == ak) & lane_valid
        m_at_ak = jnp.sum(jnp.where(at_ak, offi, 0), axis=1, keepdims=True)
        er = active & ~m_null & (kl <= ak) & (ak <= kh) & (m_at_ak >= tlens)
        scores = jnp.where(er, s, scores)
        active = active & ~er

        # ---- compute score s+1 (ref: wfa.c:275-354) ----
        s2 = s + 1
        # Window columns for s2-d: after the conceptual shift the column of
        # score (s2 - d) in the CURRENT window is LB - d.
        f_sub, l_sub, h_sub = (colslice(flw, LB - x),
                               colslice(klw, LB - x),
                               colslice(khw, LB - x))
        f_o, l_o, h_o = (colslice(flw, LB - go - ge),
                         colslice(klw, LB - go - ge),
                         colslice(khw, LB - go - ge))
        f_e, l_e, h_e = (colslice(flw, LB - ge),
                         colslice(klw, LB - ge),
                         colslice(khw, LB - ge))
        m_sub_null = ((f_sub & 1) == 0) | (((f_sub >> 1) & 1) == 1)
        m_o_null = ((f_o & 1) == 0) | (((f_o >> 1) & 1) == 1)
        i_e_null = ((f_e & 1) == 0) | (((f_e >> 2) & 1) == 1)
        d_e_null = ((f_e & 1) == 0) | (((f_e >> 3) & 1) == 1)
        i_out_null = m_o_null & i_e_null
        d_out_null = m_o_null & d_e_null
        allnull = m_sub_null & i_out_null & d_out_null

        sub_lo = jnp.where(m_sub_null, 1, l_sub)
        sub_hi = jnp.where(m_sub_null, -1, h_sub)
        o_lo = jnp.where(m_o_null, 1, l_o)
        o_hi = jnp.where(m_o_null, -1, h_o)
        e_both = i_e_null & d_e_null
        e_lo = jnp.where(e_both, 1, l_e)
        e_hi = jnp.where(e_both, -1, h_e)
        lo = jnp.minimum(jnp.minimum(sub_lo, o_lo), e_lo) - 1
        hi_ = jnp.maximum(jnp.maximum(sub_hi, o_hi), e_hi) + 1

        mw_sub = hm_ref[jnp.maximum(s2 - x, 0)].astype(I32)
        mw_o = hm_ref[jnp.maximum(s2 - go - ge, 0)].astype(I32)
        iw_e = hi_ref[jnp.maximum(s2 - ge, 0)].astype(I32)
        dw_e = hd_ref[jnp.maximum(s2 - ge, 0)].astype(I32)

        km1 = kvec - 1
        kp1 = kvec + 1
        ins_g = jnp.where(~m_o_null & (o_lo <= km1) & (km1 <= o_hi),
                          sl(mw_o), NULL)
        ins_i = jnp.where(~i_e_null & (e_lo <= km1) & (km1 <= e_hi),
                          sl(iw_e), NULL)
        both_null = (ins_g == NULL) & (ins_i == NULL)
        ins = jnp.where(both_null, NULL, jnp.maximum(ins_g, ins_i) + 1)
        del_g = jnp.where(~m_o_null & (o_lo <= kp1) & (kp1 <= o_hi),
                          sr(mw_o), NULL)
        del_d = jnp.where(~d_e_null & (e_lo <= kp1) & (kp1 <= e_hi),
                          sr(dw_e), NULL)
        dl = jnp.maximum(del_g, del_d)
        sub = jnp.where((sub_lo <= kvec) & (kvec <= sub_hi),
                        mw_sub + 1, NULL)
        ins_m = jnp.where(i_out_null, -10, ins)
        del_m = jnp.where(d_out_null, -10, dl)
        sub_m = jnp.where(m_sub_null, -10, sub)
        m_new = jnp.maximum(del_m, jnp.maximum(sub_m, ins_m))

        inr_new = (lo <= kvec) & (kvec <= hi_)
        write = ~allnull & inr_new
        hm_ref[s2] = jnp.where(write, m_new, NULL).astype(I16)
        hi_ref[s2] = jnp.where(write & ~i_out_null, ins, NULL).astype(I16)
        hd_ref[s2] = jnp.where(write & ~d_out_null, dl, NULL).astype(I16)
        newf = jnp.where(allnull, 0,
                         1 | (i_out_null.astype(I32) << 2)
                         | (d_out_null.astype(I32) << 3))
        kl2 = jnp.where(allnull, 1, lo)
        kh2 = jnp.where(allnull, -1, hi_)
        klo_ref[pl.ds(s2, 1), :] = kl2.reshape(1, P)
        khi_ref[pl.ds(s2, 1), :] = kh2.reshape(1, P)
        fl_ref[pl.ds(s2, 1), :] = newf.reshape(1, P)
        # Shift the window left and place score s2's metadata in lane LB-1.
        def shift_in(w, newcol):
            shifted = jnp.concatenate(
                [jax.lax.slice_in_dim(w, 1, 128, axis=1),
                 jax.lax.slice_in_dim(w, 0, 1, axis=1)], axis=1)
            return jnp.where(col == LB - 1, newcol, shifted)
        klw = shift_in(klw, kl2)
        khw = shift_in(khw, kh2)
        flw = shift_in(flw, newf)
        return s2, active.astype(I32), scores, klw, khw, flw

    def cond(state):
        s, active_i = state[0], state[1]
        return (s <= smax) & (jnp.max(active_i) > 0)

    s0 = jnp.int32(0)
    active0 = jnp.ones((P, 1), I32)
    scores0 = jnp.zeros((P, 1), I32)
    _, active_i, scores, _, _, _ = jax.lax.while_loop(
        cond, body, (s0, active0, scores0, klw0, khw0, flw0))
    scores = jnp.where(active_i > 0, smax + 1, scores)
    scores_ref[0:1, :] = scores.reshape(1, P)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def wfa_forward_pallas(pats, txts, plens, tlens, *, cfg: AlignConfig,
                       interpret: bool = False):
    """Pallas WFA forward.  Output dict mirrors wfa_xla.wfa_forward but in
    the score-major layout:
      scores [n] i32; hist_m/i/d [S+2, n, Kp] i16; klo/khi/flags [S+2, n] i32
    (walk with native.wfa_backtrace_batch(..., score_major=True)).
    """
    smax = cfg.max_score
    R = cfg.read_size
    n = pats.shape[0]
    K = 2 * smax + 1
    Kp = _round_up(K, 128)
    Rp = _round_up(R + 2, 8)
    S2 = smax + 2
    # Rolling-window width: the shift moves score s-d to column LB-1-d; the
    # deepest static lookback used is LB - min_col >= 1 -> LB > go+ge, x.
    LB = max(cfg.mismatch, cfg.gap_o + cfg.gap_e, cfg.gap_e) + 1
    P = 128 if Kp <= 128 else 64

    nm = build_nm_table(pats, txts, plens.astype(I32), tlens.astype(I32),
                        smax, R)                       # [n, K, R+1] i16
    nm_t = jnp.transpose(
        jnp.pad(nm, ((0, 0), (0, Kp - K), (0, Rp - (R + 1)))), (0, 2, 1))

    grid = (n // P,)
    out_shapes = (
        jax.ShapeDtypeStruct((1, n), I32),           # scores
        jax.ShapeDtypeStruct((S2, n, Kp), I16),      # hist m
        jax.ShapeDtypeStruct((S2, n, Kp), I16),      # hist i
        jax.ShapeDtypeStruct((S2, n, Kp), I16),      # hist d
        jax.ShapeDtypeStruct((S2, n), I32),          # klo
        jax.ShapeDtypeStruct((S2, n), I32),          # khi
        jax.ShapeDtypeStruct((S2, n), I32),          # flags
    )
    kernel = functools.partial(_wfa_kernel, cfg, P, Kp, Rp, LB)
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, Rp, Kp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, P), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S2, P, Kp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S2, P, Kp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S2, P, Kp), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S2, P), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S2, P), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S2, P), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(plens.astype(I32).reshape(n, 1), tlens.astype(I32).reshape(n, 1), nm_t)
    scores, hm, hi, hd, klo, khi, fl = res
    out = {"scores": scores[0]}
    if cfg.backtrace:
        # Slice the lane padding (Kp -> K) and the scratch score slot off
        # on-device: the host only ever walks [0, S+1) x [0, K) and D2H
        # bandwidth is precious.
        s1 = smax + 1
        out["packed_hist"] = jnp.concatenate(
            [hm[:s1, :, :K], hi[:s1, :, :K], hd[:s1, :, :K]], axis=2)
        out["packed_meta"] = jnp.stack(
            [klo[:s1].astype(I16), khi[:s1].astype(I16),
             fl[:s1].astype(I16)], axis=2)
    return out

"""SWG (Gotoh affine-gap, global, minimizing) — banded Pallas TPU kernel
(VMEM-resident tier) with on-device CIGAR traceback.

Same band machinery as ops/nw_pallas.py (lane b = v - h + C): the I matrix
is elementwise from the previous row (lane b+1), the diagonal M term is at
lane b, and the coupled M/D in-row chain reduces to one min-plus prefix
scan because D[v] = min(c[v-1]+GO+GE, D[v-1]+GE) with c[v] = min(diag+sub,
I[v]) (same linearization as ops/swg_xla.py; ref recurrence:
SWG/DPU-WRAM/dpu/swg.c:146-163).

Direction bits per cell (same encoding as ops/swg_xla.py / the native
walker): bits0..1 M-choice (0 enter-D, 1 enter-I, 2 'M', 3 'X'; priority
D -> I -> match -> mismatch, ref swg.c:79-98), bit2 D-opened, bit3
I-opened.  They stay in VMEM and are walked ON DEVICE by a descending row
sweep: the I layer crosses one row per sweep step; D runs resolve within
a row (a small score-bounded unroll handles M->D->M chains); M-run
merging keeps the packed record small.

Banding exactness (flagged to the host oracle otherwise):
  * excursion d beyond the [min(0,kend), max(0,kend)] corridor costs
    >= 2*GO + 2*d*GE  =>  exact when |kend| + dmax + 1 <= C with
    dmax = max(0, (s - 2*GO)) // (2*GE) + 1;
  * the reference's MAX_SCORE-as-init-sentinel participates in real mins
    (e.g. I(1,v) = MAX_SCORE+GE beats M0[v]+GO+GE for large v); those
    sentinel chains enter from out-of-band row-0/column-0 cells, and they
    cannot influence walk-visited cells when s < MAX_SCORE + GE —
    flagged otherwise;
  * flat-tape aliasing: the h==1 column-0 triple of an aliased pair
    (plen == tlen+1) equals the clean boundary triple (GO+GE, GO+GE, MS),
    so only the deeper chain needs guarding: aliased pairs with
    plen <= s//GE + dmax + 2 are flagged;
  * cell-type wrap (int8 iff MAX_SCORE < 127 in this tier): configs are
    admitted only when swg_int8_sound() proves NO int8 accumulation can
    leave [0, 127] anywhere in the reference tape, so wrap — in-band or
    out-of-band — is impossible and int8 arithmetic equals exact
    arithmetic.  Proof sketch: the MAX_SCORE init sentinel participates
    in every boundary min (ref: swg.c:128-137), so every stored value is
    anchored: I(h,v) <= min(M(h-1,v)+GO+GE, MS+h*GE), D symmetric,
    M <= min(I, D), boundary rows are GO+k*GE or MS — hence stored <=
    max(MS, GO) + R*GE, and every transient sum adds at most
    max(GO+GE, MISMATCH) (match cost is 0 on this tier: the launcher
    validation forces m <= 0 and the Pallas gate m >= 0).  Lower bound 0
    since all costs are non-negative.  Configs beyond the bound keep the
    reference's genuine wrap semantics via the full-width XLA tier, whose
    wrap flags see every cell.  The in-band range flag below remains as a
    belt-and-braces guard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aim_tpu.config import AlignConfig
from aim_tpu.ops.band import (band_ops, group_reduce_max, group_reduce_sum,
                              log_shifts, round_up)
from aim_tpu.ops.nw_pallas import band_half, group_geom, runs_lanes_nw

I32 = jnp.int32
I16 = jnp.int16
INF = 2 ** 20

OP_M, OP_X, OP_I, OP_D = 0, 1, 2, 3
CH_D, CH_I, CH_M, CH_X = 0, 1, 2, 3
L_M, L_I, L_D = 0, 1, 2


def _swg_kernel(cfg: AlignConfig, P: int, Rp: int, NRL: int, C: int,
                L: int, G: int,
                pats_ref, txts_ref, plens_ref, tlens_ref,
                runs_ref, bits_ref):
    R = cfg.read_size
    mat, mis = cfg.match, cfg.mismatch
    go, ge = cfg.gap_o, cfg.gap_e
    ms = cfg.max_score
    B = 2 * C + 1
    cmax = 127 if cfg.cell_width == 1 else 32767
    margin = go + ge + max(mis, abs(mat), ge)

    lane = jax.lax.broadcasted_iota(I32, (P, 128), 1)
    b_iota = lane & (L - 1)              # within-group band position
    g_iota = lane >> (L.bit_length() - 1)
    in_band = b_iota < B

    def grouped_scalar(ref):
        out = jnp.zeros((P, 128), I32)
        for g in range(G):
            out = jnp.where(g_iota == g, ref[g * P:(g + 1) * P], out)
        return out

    plens = grouped_scalar(plens_ref)
    tlens = grouped_scalar(tlens_ref)
    kend = plens - tlens
    aliased = plens == tlens + 1
    multi_alias = plens > tlens + 1

    # ---- row 0 triples (ref: swg.c:128-137) ----
    v0 = b_iota - C
    r0_valid = (v0 >= 0) & (v0 <= plens) & in_band
    d0 = jnp.where(v0 == 0, ms, go + v0 * ge)
    i0 = jnp.full((P, 128), ms, I32)
    m0 = jnp.where(v0 == 0, 0, d0)
    at_alias = aliased & (v0 == plens) & (v0 > 0)
    d0 = jnp.where(at_alias, ms, d0)
    i0 = jnp.where(at_alias, go + ge, i0)
    m0 = jnp.where(at_alias, go + ge, m0)
    d0 = jnp.where(r0_valid, d0, INF)
    i0 = jnp.where(r0_valid, i0, INF)
    m0 = jnp.where(r0_valid, m0, INF)

    minplus, sl1, sr1 = band_ops(b_iota, B, ge, INF, L)

    Rpw = max(128, round_up(Rp, 128))

    def windows(ref, shift):
        ws = []
        for g in range(G):
            w = ref[g * P:(g + 1) * P, :].astype(I32)
            w = jnp.pad(w, ((0, 0), (0, Rpw - Rp)), constant_values=-1)
            ws.append(pltpu.roll(w, shift, 1) if shift else w)
        return ws

    patws0 = windows(pats_ref, C)
    txtws0 = windows(txts_ref, 0)

    def gather_groups(ws):
        out = jnp.zeros((P, 128), I32)
        for g in range(G):
            wb = ws[g] if Rpw == 128 else \
                jax.lax.slice_in_dim(ws[g], 0, 128, axis=1)
            src = pltpu.roll(wb, g * L, 1) if g else wb
            out = jnp.where(g_iota == g, src, out)
        return out

    def fwd_body(i, carry):
        pm, pi, pd, patws, txtws, score_acc, ovf_acc = carry
        h = i + 1
        patb = gather_groups(patws)
        # text char of this row: lane 0 of each pair's rolled text window
        tch = gather_groups([jnp.broadcast_to(
            jax.lax.slice_in_dim(w, 0, 1, axis=1), (P, Rpw))
            for w in txtws])
        v = b_iota - C + h
        valid = (v >= 1) & (v <= plens) & in_band
        sub = jnp.where(patb == tch, mat, mis)

        # column-0 boundary triple.  Clean: M=I=GO+h*GE, D=MS.  Aliased
        # (plen == tlen+1): the flat-tape chain cell(h-1, plen) bootstraps
        # from the aliased boundary slot and reproduces the clean M/I
        # (go+h*ge, by induction — guarded by the alias flag below) while
        # its D plane is genuinely large -> INF.
        mb = go + h * ge
        ib = mb
        db = jnp.where(aliased & (h >= 2), INF, ms)

        i_cur = jnp.minimum(sr1(pm, INF) + go + ge, sr1(pi, INF) + ge)
        i_cur = jnp.where(valid, i_cur, INF)
        i_cur = jnp.where((v == 0) & in_band, ib, i_cur)
        c = jnp.minimum(pm + sub, i_cur)
        c = jnp.where(valid, c, INF)
        c_s = sl1(c, INF)
        m_left = sl1(jnp.where((v == 0) & in_band, mb, INF), INF)
        # z for the D min-plus chain: v==0 -> D boundary; v==1 -> M0+GO+GE;
        # else c[v-1]+GO+GE.
        z = jnp.where((v == 0) & in_band, db,
                      jnp.where(v == 1, m_left + go + ge, c_s + go + ge))
        z = jnp.where(valid | ((v == 0) & in_band), z, INF)
        d_cur = minplus(z)
        d_cur = jnp.where(valid | ((v == 0) & in_band), d_cur, INF)
        m_cur = jnp.minimum(c, d_cur)
        m_cur = jnp.where((v == 0) & in_band, mb, m_cur)
        m_cur = jnp.where(valid | ((v == 0) & in_band), m_cur, INF)

        live = valid & (h <= tlens)
        mx = jnp.maximum(jnp.abs(m_cur), jnp.maximum(jnp.abs(i_cur),
                                                     jnp.abs(d_cur)))
        # Band-edge cells legitimately carry INF (no in-band path for that
        # plane); real DP values are < R*max-cost << INF//2, so only
        # values below that are genuine wrap risks.
        ovf_acc = jnp.maximum(
            ovf_acc,
            (live & (mx > cmax - margin) & (mx < INF // 2)).astype(I32))

        # direction bits (ops/swg_xla.py parity)
        m_cur_s = sl1(m_cur, INF)
        choice = jnp.where(m_cur == d_cur, CH_D,
                           jnp.where(m_cur == i_cur, CH_I,
                                     jnp.where(m_cur == pm + mat, CH_M,
                                               CH_X)))
        d_open = (d_cur == m_cur_s + go + ge).astype(I32)
        i_open = (i_cur == sr1(pm, INF) + go + ge).astype(I32)
        code = jnp.where(valid, choice | (d_open << 2) | (i_open << 3),
                         CH_M)
        if cfg.backtrace:  # codes only feed the traceback
            # 2 rows of 4-bit codes share one byte plane (VMEM-fit for long
            # reads); the first row landing in a byte writes it fresh.
            q = h >> 1
            shq = 4 * (h & 1)
            old = bits_ref[q].astype(I32) & 0xFF
            fresh = ((h & 1) == 0) | (h == 1)
            newb = jnp.where(fresh, code << shq, old | (code << shq))
            bits_ref[q] = newb.astype(jnp.int8)

        hit = (h == tlens) & (b_iota == kend + C) & in_band
        score_acc = jnp.where(hit, m_cur, score_acc)

        patws2 = [pltpu.roll(w, Rpw - 1, 1) for w in patws]
        txtws2 = [pltpu.roll(w, Rpw - 1, 1) for w in txtws]
        return m_cur, i_cur, d_cur, patws2, txtws2, score_acc, ovf_acc

    score0 = jnp.zeros((P, 128), I32)
    ovf0 = jnp.zeros((P, 128), I32)
    _, _, _, _, _, score_acc, ovf_acc = jax.lax.fori_loop(
        0, R, fwd_body, (m0, i0, d0, patws0, txtws0, score0, ovf0))
    score = group_reduce_sum(score_acc, b_iota, L)
    overflow = group_reduce_max(ovf_acc, b_iota, L) > 0
    score = jnp.where((plens == 0) | (tlens == 0), 0, score)

    # ---- exactness flags ----
    dmax = jnp.maximum(0, score - 2 * go) // (2 * ge) + 1
    bad_band = (jnp.abs(kend) + dmax + 1) > C
    # Out-of-band sentinel chains (row-0 I / column-0 D seeds of MS) carry
    # value MS + depth*GE; they can only undercut a walk-visited cell
    # (value <= s) at depth <= (s - MS)/GE, where the visited cell's
    # row-0/column-0 ancestor at distance <= depth + dmax must itself be
    # out-of-band — impossible while (s - MS)/GE + dmax <= C.
    bad_sentinel = ((score - ms) // ge + dmax) > C
    # Aliased chain-induction validity (see the column-0 comment): the
    # closed-form M/I chain needs its insertion term to dominate at
    # (h, plen) throughout the influence region; negative match costs
    # void the dia lower bound entirely.
    hs = C + dmax + 3
    bad_alias = aliased & (
        ((2 * go + (hs + 1) * ge) > (plens - hs - 1) * ge) | (mat < 0))
    # Boundary-sourced wrap: the reference casts each candidate (e.g.
    # M[h,0] + GO + GE) to the cell type BEFORE the min, so the boundary
    # chains (GO + len*GE) can inject wrapped values into interior cells
    # even when no interior value approaches the cell range.
    bad_wrap = ((go + jnp.maximum(plens, tlens) * ge + margin) > cmax) \
        | (ms + margin > cmax)
    flag = (multi_alias | bad_band | bad_sentinel | bad_alias | overflow
            | bad_wrap | (plens > tlens + C) | (tlens > plens + C)
            | (score < 0))

    # ======================= on-device traceback =======================
    # Per-pair walk state is group-broadcast; reads of the shared code
    # row at per-pair positions are one-hot selects + segment all-reduces.

    def seg_at(arr, pos):
        """arr value at group-local band position pos, broadcast to the
        whole segment — one within-vreg lane gather (Mosaic supports
        take_along_axis at exactly 128 lanes) instead of a one-hot select
        plus a log-L group all-reduce.  Out-of-range pos is clipped; every
        caller masks such lanes."""
        idx = g_iota * L + jnp.clip(pos, 0, L - 1)
        return jnp.take_along_axis(arr, idx, axis=1)

    def emit_merge(st, mask, op, length):
        """Append/merge a run; the top-of-stack run lives in registers
        (see ops/nw_pallas.py emit_merge — plane re-reads per emit
        dominated the walk)."""
        runs, rc, top_op, top_len = st
        do = mask & (length > 0)
        can = do & (top_len > 0) & (top_op == op) \
            & (top_len + length <= 4095) & (rc < NRL - 1)
        top_len = jnp.where(can, top_len + length, top_len)
        push = do & ~can
        val_old = (top_op << 12) | top_len
        runs = jnp.where((b_iota == rc + 1) & push & (top_len > 0)
                         & (rc + 1 >= 2) & (rc + 1 <= NRL - 1),
                         val_old, runs)
        top_op = jnp.where(push, op, top_op)
        top_len = jnp.where(push, jnp.minimum(length, 4095), top_len)
        rc = jnp.where(push, rc - 1, rc)
        return runs, rc, top_op, top_len

    def emit_flush(st):
        runs, rc, top_op, top_len = st
        val = (top_op << 12) | top_len
        runs = jnp.where((b_iota == rc + 1) & (top_len > 0)
                         & (rc + 1 >= 2) & (rc + 1 <= NRL - 1), val, runs)
        return runs, rc

    if cfg.backtrace:
        hcur = tlens
        vcur = plens
        layer = jnp.zeros((P, 128), I32)    # start in M (ref swg.c:52)
        runs = jnp.zeros((P, 128), I32)
        rc = jnp.full((P, 128), NRL - 1, I32)

        def bt_body(i, st):
            hcur, vcur, layer, runs, rc, top_op, top_len, unfinished = st
            h = R - i
            act = (hcur == h) & (hcur > 0) & (vcur > 0)
            cr = (bits_ref[h >> 1].astype(I32) >> (4 * (h & 1))) & 0xF
            choice = cr & 3
            dopen = (cr >> 2) & 1
            iopen = (cr >> 3) & 1
            # prefix: last b' <= b (same group) with d_open == 1 (D-runs
            # stop AT the first opened D, inclusive).
            pmd = jnp.where(dopen == 1, b_iota, -1)
            for s_ in log_shifts(L):
                rolled = pltpu.roll(pmd, s_, 1)
                pmd = jnp.maximum(pmd, jnp.where(b_iota >= s_, rolled, -1))

            # I-layer arrival: one 'I' per sweep row (ref swg.c:66-72).
            in_i = act & (layer == L_I)
            one = jnp.ones((P, 128), I32)
            runs, rc, top_op, top_len = emit_merge(
                (runs, rc, top_op, top_len), in_i, OP_I, one)
            b_i = vcur - h + C
            io_here = seg_at(iopen, b_i)
            layer = jnp.where(in_i & (io_here == 1), L_M, layer)
            hcur = hcur - jnp.where(in_i, 1, 0)

            # M-phase (may chain M -> D-run -> M within the row).  A
            # fixed unroll instead of a while_loop (data-dependent loops
            # fault this target); every chain link beyond the first costs
            # >= GO+GE of score, so 1 + MAX_SCORE//(GO+GE) links (capped
            # at 4) cover everything unflagged — a pair still pending
            # after that is flagged to the fallback path.
            # (A pair whose I-arrival step just returned it to M has moved
            # to row h-1 — it must NOT run this row's M-phase.)
            pending = act & (layer == L_M) & ~in_i
            for _ in range(min(4, 1 + ms // (go + ge))):
                pend = pending
                b = vcur - h + C
                ch = seg_at(choice, b)
                is_d = pend & (ch == CH_D)
                pmd_b = seg_at(pmd, b)
                dlen = jnp.where(is_d, b - pmd_b + 1, 0)
                capped = is_d & (dlen >= vcur)
                dlen = jnp.minimum(dlen, vcur)
                runs, rc, top_op, top_len = emit_merge(
                    (runs, rc, top_op, top_len), is_d, OP_D, dlen)
                vcur = vcur - dlen
                layer = jnp.where(capped, L_D, layer)   # exits via v==0
                # non-D exits: one merged emit with a per-pair op code
                is_i = pend & (ch == CH_I)
                is_m = pend & (ch == CH_M)
                is_x = pend & (ch == CH_X)
                op_sel = jnp.where(is_i, OP_I, jnp.where(is_m, OP_M, OP_X))
                runs, rc, top_op, top_len = emit_merge(
                    (runs, rc, top_op, top_len), is_i | is_m | is_x,
                    op_sel, one)
                io_h = seg_at(iopen, b)
                layer = jnp.where(is_i, jnp.where(io_h == 1, L_M, L_I),
                                  layer)
                hcur = hcur - jnp.where(is_i | is_m | is_x, 1, 0)
                vcur = vcur - jnp.where(is_m | is_x, 1, 0)
                pending = is_d & ~capped & (vcur > 0)
            unfinished = jnp.maximum(unfinished, pending.astype(I32))
            return (hcur, vcur, layer, runs, rc, top_op, top_len,
                    unfinished)

        zeros = jnp.zeros((P, 128), I32)
        hcur, vcur, layer, runs, rc, top_op, top_len, unfinished = \
            jax.lax.fori_loop(
                0, R, bt_body,
                (hcur, vcur, layer, runs, rc, zeros, zeros, zeros))
        # tails (ref swg.c:111-117): I x h, then D x v.
        st2 = emit_merge((runs, rc, top_op, top_len), hcur > 0, OP_I, hcur)
        st2 = emit_merge(st2, vcur > 0, OP_D, vcur)
        runs, rc = emit_flush(st2)
        flag = flag | (rc < 1) | (unfinished > 0)
    else:
        runs = jnp.zeros((P, 128), I32)
        rc = jnp.full((P, 128), NRL - 1, I32)

    runs = jnp.where(b_iota == 0, rc | (flag.astype(I32) << 8), runs)
    runs = jnp.where(b_iota == 1, jnp.clip(score, -32768, 32767), runs)
    # scatter each group's record region to its pairs' output rows
    # (rotate in int32 — Mosaic only rotates 32-bit vectors)
    for g in range(G):
        seg = pltpu.roll(runs, (128 - g * L) % 128, 1) if g else runs
        runs_ref[g * P:(g + 1) * P, :] = \
            jax.lax.slice_in_dim(seg, 0, NRL, axis=1).astype(I16)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "packed"))
def swg_forward_pallas(pats, txts, plens, tlens, *, cfg: AlignConfig,
                       interpret: bool = False, packed: bool = False):
    """Banded Pallas SWG forward + on-device traceback, one fused dispatch.

    Record format as ops/nw_pallas.py: lane0 = cursor | flags<<8, lane1 =
    score, runs in lanes cursor+1..NRL-1.
    """
    R = cfg.read_size
    n = pats.shape[0]
    C = band_half(cfg)
    Rp = round_up(R + 2, 8)
    NRL = runs_lanes_nw(cfg)
    P = 128
    L, G = group_geom(cfg)
    PT = P * G

    if packed:
        shifts = jnp.arange(4, dtype=jnp.uint8) * 2
        pats = ((pats[:, :, None] >> shifts) & 3).reshape(n, -1)
        txts = ((txts[:, :, None] >> shifts) & 3).reshape(n, -1)

    n_orig = n
    if n % PT:
        padn = round_up(n, PT) - n
        pats = jnp.pad(pats, ((0, padn), (0, 0)))
        txts = jnp.pad(txts, ((0, padn), (0, 0)))
        plens = jnp.pad(plens, (0, padn))
        tlens = jnp.pad(tlens, (0, padn))
        n += padn
    if pats.shape[1] < Rp:
        pats = jnp.pad(pats, ((0, 0), (0, Rp - pats.shape[1])))
        txts = jnp.pad(txts, ((0, 0), (0, Rp - txts.shape[1])))

    kernel = functools.partial(_swg_kernel, cfg, P, Rp, NRL, C, L, G)
    runs = pl.pallas_call(
        kernel,
        grid=(n // PT,),
        in_specs=[
            pl.BlockSpec((PT, Rp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PT, Rp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PT, NRL), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, NRL), I16),
        scratch_shapes=[
            # direction codes, 2 rows of 4-bit codes per byte (a dummy
            # single plane in score-only mode — never written)
            pltpu.VMEM(((R // 2 + 1) if cfg.backtrace else 1, P, 128),
                       jnp.int8),
        ],
        interpret=interpret,
    )(pats, txts, plens.astype(I32).reshape(n, 1),
      tlens.astype(I32).reshape(n, 1))
    return {"packed_runs": runs[:n_orig]}


def swg_int8_sound(cfg: AlignConfig) -> bool:
    """True when no int8 accumulation can leave [0, 127] anywhere in the
    reference's int8 tape (see the module docstring's anchoring proof):
    every stored value is <= max(MAX_SCORE, GAP_O) + R*GAP_E and every
    transient candidate adds at most max(GAP_O+GAP_E, MISMATCH) on top.
    Within the bound, int8 arithmetic == exact arithmetic and the banded
    kernel's band-exactness argument applies unchanged; beyond it, the
    config keeps the reference's genuine wrap semantics via the
    full-width XLA tier."""
    if cfg.cell_width != 1:
        return True
    stored_max = max(cfg.max_score, cfg.gap_o) + cfg.read_size * cfg.gap_e
    step_max = max(cfg.gap_o + cfg.gap_e, cfg.mismatch)
    return cfg.match == 0 and stored_max + step_max <= 127


def vmem_fit_swg(cfg: AlignConfig) -> bool:
    """Covers the reference's long-read tier (SWG-MRAM default READ_SIZE
    560, ref: SWG/*/common/common.h)."""
    bits = (cfg.read_size // 2 + 1) * 128 * 128
    return (2 * bits + 6 * 1024 * 1024 < 16 * 1024 * 1024
            and cfg.read_size <= 2047 and band_half(cfg) >= 2)

"""NW edit distance — banded Pallas TPU kernel (VMEM-resident tier) with
on-device CIGAR traceback.

The reference's DPU-WRAM variant keeps the whole (P+1)x(T+1) DP table in
the 64 KB scratchpad (ref: NW/DPU-WRAM/dpu/nw.c:109-153,187).  The TPU
analogue here keeps a *banded* DP in VMEM: cells (h, v) with
|v - h| <= C (band half-width C derived from MAX_SCORE) are computed per
text row h; direction codes for every in-band cell stay in a VMEM scratch
plane and are walked ON DEVICE into run-length CIGAR records, so only a
[n, NRL] i16 record crosses D2H (vs the full-table direction bits of the
XLA/HBM tier, ops/nw_xla.py — the DPU-MRAM analogue).

Banding is exact for a pair iff no optimal path can leave the band:
reaching diagonal excursion d beyond the [min(0,kend), max(0,kend)]
corridor costs >= d*(GAP_I+GAP_D), so a pair with banded score s is exact
when |kend| + s//(GAP_I+GAP_D) + 1 <= C.  Pairs failing that (or the
flat-tape aliasing / int16-wrap conditions below) are flagged
needs_fallback and re-run by the caller on the exact path — on
launcher-derived configs (MAX_SCORE = ceil(e*l*max(x, 2g))) real data
virtually never flags.

Band coordinates: lane b = v - h + C; row h-1 of the DP appears at the
SAME lane for the diagonal term and at lane b+1 for the insertion term;
the in-row deletion chain is a min-plus prefix scan along lanes (same
linearization as ops/common.min_plus_scan, ref: nw.c:139).

Reference semantics preserved (as in ops/nw_xla.py):
  * flat-tape aliasing: for plen == tlen+1 pairs the column-0 chain
    cell(h-1, plen) bootstraps from the aliased boundary slot and equals
    the CLEAN h*GAP_I by induction (see the col0 comment; pairs whose
    chain induction could break in the influence region are flagged).
  * traceback priority D -> I -> diag, 'X' iff equality with diag +
    MISMATCH (ref: nw.c:76-94); trailing I/D tails (nw.c:100-106).
  * int16 cells (NW_W16): pairs whose live in-band cells exceed int16 are
    flagged for the oracle (where the reference wraps).
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

I32 = jnp.int32
I16 = jnp.int16
INF = 2 ** 20   # in-band "+infinity"; must stay <= 2**24 (PERFNOTES.md §1)
INT16_MAX = 32767

OP_M, OP_X, OP_I, OP_D = 0, 1, 2, 3
# direction codes (shared with ops/nw_xla.py and the native walker)
C_D, C_I, C_M, C_X = 0, 1, 2, 3

FLAG_FALLBACK = 1


def band_half(cfg: AlignConfig) -> int:
    """Band half-width: excursions cost GAP_I+GAP_D per unit, length skew
    |kend| <= wrong ~ MAX_SCORE/min-cost; C = MAX_SCORE covers both with
    margin on launcher-derived configs."""
    return min(cfg.max_score + 2, 62)


def runs_lanes_nw(cfg: AlignConfig) -> int:
    """Packed record lanes: lane0 = rc | flags<<8, lane1 = score, runs in
    [2, NRL).  With merge-emit, run count <= op alternations + tails
    <= 2*MAX_SCORE + 4 for unflagged pairs (each alternation needs >= 1
    unit of score); flagged pairs go to the fallback anyway."""
    return min(128, round_up(2 * cfg.max_score + 8, 8))


def group_geom(cfg: AlignConfig):
    """Grouped-lane geometry: G pairs share each 128-lane row, each owning
    an L-lane segment (L = smallest power of two holding both the band
    and the runs record).  For wide bands L=128, G=1 and everything
    degenerates to one pair per row."""
    B = 2 * band_half(cfg) + 1
    need = max(B, runs_lanes_nw(cfg))
    L = 8
    while L < need:
        L *= 2
    L = min(L, 128)
    return L, 128 // L


def _nw_kernel(cfg: AlignConfig, P: int, Rp: int, NRL: int, C: int,
               L: int, G: int,
               pats_ref, txts_ref, plens_ref, tlens_ref,
               runs_ref, bits_ref):
    R = cfg.read_size
    gi, gd, x = cfg.gap_i, cfg.gap_d, cfg.mismatch
    B = 2 * C + 1

    lane = jax.lax.broadcasted_iota(I32, (P, 128), 1)
    b_iota = lane & (L - 1)              # within-group band position
    g_iota = lane >> (L.bit_length() - 1)  # group index of each lane
    in_band = b_iota < B

    # Per-pair scalars, group-broadcast to every lane of the pair's
    # segment: pair (g, r) lives at block rows [g*P, (g+1)*P).
    def grouped_scalar(ref):
        out = jnp.zeros((P, 128), I32)
        for g in range(G):
            seg = ref[g * P:(g + 1) * P]     # [P, 1]
            out = jnp.where(g_iota == g, seg, out)
        return out

    plens = grouped_scalar(plens_ref)
    tlens = grouped_scalar(tlens_ref)
    kend = plens - tlens
    aliased = plens == tlens + 1
    multi_alias = plens > tlens + 1

    # ---- row 0: v = b - C; cell = v*gd; aliased slot v==plen (only ever
    # in-band for tiny plen — those pairs are flagged) gets GAP_I.
    v0 = b_iota - C
    row0 = jnp.where((v0 >= 0) & (v0 <= plens) & in_band, v0 * gd, INF)
    row0 = jnp.where(aliased & (v0 == plens) & in_band & (v0 >= 0),
                     gi, row0)

    minplus, sl1, sr1 = band_ops(b_iota, B, gd, INF, L)

    # Per-group pair-major sequence windows (one pair per row inside each
    # window; see the layout comment in the single-group kernel).  The
    # grouped compare row is assembled from each window's first L lanes.
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
        """Grouped row: lane g*L + b <- ws[g][row, b]."""
        out = jnp.zeros((P, 128), I32)
        for g in range(G):
            wb = ws[g] if Rpw == 128 else \
                jax.lax.slice_in_dim(ws[g], 0, 128, axis=1)
            src = pltpu.roll(wb, g * L, 1) if g else wb
            out = jnp.where(g_iota == g, src, out)
        return out

    def fwd_body(i, carry):
        prev, patws, txtws, score_acc, ovf_acc = carry
        h = i + 1
        patb = gather_groups(patws)
        # text char of this row: lane 0 of each pair's rolled text window
        tch = gather_groups([jnp.broadcast_to(
            jax.lax.slice_in_dim(w, 0, 1, axis=1), (P, Rpw))
            for w in txtws])
        v = b_iota - C + h
        valid = (v >= 1) & (v <= plens) & in_band
        sub = jnp.where(patb == tch, 0, x)
        # prev row at same v sits at band position b+1; diag (v-1) at b.
        ins = jnp.where(valid, sr1(prev, INF) + gi, INF)
        dia = jnp.where(valid, prev + sub, INF)
        indep = jnp.minimum(ins, dia)
        # column-0 boundary: v=0 at b = C - h (in-band for h <= C).
        # For ALIASED pairs (plen == tlen+1) the flat-tape chain
        # cell(h-1, plen) bootstraps from the aliased h-boundary slot and
        # reproduces EXACTLY the clean h*GAP_I by induction (the
        # insertion term h*gi stays below dia/dl ~ (plen-h)*gd while the
        # guard below holds), so clean and aliased share one closed form.
        col0 = h * gi
        z = jnp.where((v == 0) & in_band, col0, indep)
        z = jnp.where(valid | ((v == 0) & in_band), z, INF)
        cur = minplus(z)
        # clamp out-of-band / invalid lanes so INF never bleeds via ramp
        cur = jnp.where(valid | ((v == 0) & in_band), cur, INF)

        live = valid & (h <= tlens)
        ovf_acc = jnp.maximum(
            ovf_acc, (live & (jnp.abs(cur) > INT16_MAX)).astype(I32))

        # direction codes (priority D -> I -> diag/X; nw_xla parity)
        cur_s = sl1(cur, INF)
        del_eq = cur == cur_s + gd
        ins_eq = cur == sr1(prev, INF) + gi
        x_eq = cur == prev + x
        code = jnp.where(del_eq, C_D,
                         jnp.where(ins_eq, C_I, jnp.where(x_eq, C_X, C_M)))
        code = jnp.where(valid, code, C_M)   # non-D outside valid cells
        if cfg.backtrace:  # codes only feed the traceback
            # 4 rows of 2-bit codes share one byte plane (VMEM-fit for
            # long reads); the first row landing in a byte writes fresh.
            q = h >> 2
            shq = 2 * (h & 3)
            old = bits_ref[q].astype(I32) & 0xFF
            fresh = ((h & 3) == 0) | (h == 1)
            newb = jnp.where(fresh, code << shq, old | (code << shq))
            bits_ref[q] = newb.astype(jnp.int8)

        # the end cell lands at one lane per pair; collected at the end
        hit = (h == tlens) & (b_iota == kend + C) & in_band
        score_acc = jnp.where(hit, cur, score_acc)

        patws2 = [pltpu.roll(w, Rpw - 1, 1) for w in patws]
        txtws2 = [pltpu.roll(w, Rpw - 1, 1) for w in txtws]
        return cur, patws2, txtws2, score_acc, ovf_acc

    score0 = jnp.zeros((P, 128), I32)
    ovf0 = jnp.zeros((P, 128), I32)
    _, _, _, score_acc, ovf_acc = jax.lax.fori_loop(
        0, R, fwd_body, (row0, patws0, txtws0, score0, ovf0))
    # broadcast per-pair results to every lane of the pair's segment
    score = group_reduce_sum(score_acc, b_iota, L)
    overflow = group_reduce_max(ovf_acc, b_iota, L) > 0
    score = jnp.where((plens == 0) | (tlens == 0), 0, score)

    # ---- band-exactness conditions -> needs_fallback flag ----
    dmax = score // (gi + gd)
    bad_band = (jnp.abs(kend) + dmax + 1) > C
    # Aliased chain-induction validity: the closed-form column 0 (h*gi)
    # equals the flat-tape chain only while the chain's insertion term
    # dominates at (h, plen), i.e. h*gi <= (plen-h)*gd for every row h in
    # the influence region Hs (column 0 can affect walk-visited cells up
    # to h ~ C + dmax).
    hs = C + dmax + 3
    bad_alias = aliased & (hs * gi > (plens - hs) * gd)
    flag = multi_alias | bad_band | bad_alias | overflow
    flag = flag | (plens > tlens + C) | (tlens > plens + C)

    # ======================= on-device traceback =======================
    # Per-pair walk state is group-broadcast (every lane of a pair's
    # segment holds the same value); reads of the shared code row at a
    # per-pair position are one-hot selects + a segment all-reduce.

    def seg_at(arr, pos):
        """arr value at group-local band position pos, broadcast to the
        whole segment — one within-vreg lane gather (Mosaic supports
        take_along_axis at exactly 128 lanes) instead of a one-hot select
        plus a log-L group all-reduce.  Out-of-range pos is clipped; every
        caller masks such lanes."""
        idx = g_iota * L + jnp.clip(pos, 0, L - 1)
        return jnp.take_along_axis(arr, idx, axis=1)

    def emit_merge(st, mask, op, length):
        """Append/merge a run.  The top-of-stack run lives in registers
        (top_op/top_len, group-broadcast) — re-reading it from the runs
        plane cost a one-hot + group-reduce per emit, which dominated
        the walk.  The plane only receives a run when the NEXT one is
        pushed (plus a final flush after the loop)."""
        runs, rc, top_op, top_len = st
        do = mask & (length > 0)
        can = do & (top_len > 0) & (top_op == op) \
            & (top_len + length <= 4095) & (rc < NRL - 1)
        top_len = jnp.where(can, top_len + length, top_len)
        push = do & ~can
        # flush the previous top into its plane slot (rc+1)
        val_old = (top_op << 12) | top_len
        runs = jnp.where((b_iota == rc + 1) & push & (top_len > 0)
                         & (rc + 1 >= 2) & (rc + 1 <= NRL - 1),
                         val_old, runs)
        top_op = jnp.where(push, op, top_op)
        top_len = jnp.where(push, jnp.minimum(length, 4095), top_len)
        # no floor: pushing past band position 2 drives rc below 1, which
        # becomes needs_fallback (capacity exceeded).
        rc = jnp.where(push, rc - 1, rc)
        return runs, rc, top_op, top_len

    def emit_flush(st):
        runs, rc, top_op, top_len = st
        val = (top_op << 12) | top_len
        runs = jnp.where((b_iota == rc + 1) & (top_len > 0)
                         & (rc + 1 <= NRL - 1) & (rc + 1 >= 2), val, runs)
        return runs, rc

    if cfg.backtrace:
        hcur = tlens
        vcur = plens
        runs = jnp.zeros((P, 128), I32)
        rc = jnp.full((P, 128), NRL - 1, I32)
        top0 = jnp.zeros((P, 128), I32)

        def bt_body(i, st):
            hcur, vcur, runs, rc, top_op, top_len = st
            h = R - i
            act = (hcur == h) & (hcur > 0) & (vcur > 0)
            cr = (bits_ref[h >> 2].astype(I32) >> (2 * (h & 3))) & 3
            # run of consecutive D codes ending at each band position:
            # pm[b] = last b' <= b (same group) with code != D.
            nd = jnp.where(cr != C_D, b_iota, -1)
            pm = nd
            for s_ in log_shifts(L):
                rolled = pltpu.roll(pm, s_, 1)
                pm = jnp.maximum(pm, jnp.where(b_iota >= s_, rolled, -1))
            b = vcur - h + C
            pm_b = seg_at(pm, b)
            dlen = jnp.where(act, b - pm_b, 0)
            dlen = jnp.minimum(dlen, vcur)         # never walk past v=0
            st2 = emit_merge((runs, rc, top_op, top_len), act, OP_D, dlen)
            vcur = vcur - dlen
            # one row-exit step (I or diag) if still in the main loop
            act2 = act & (vcur > 0)
            b2 = vcur - h + C
            code2 = seg_at(cr, b2)
            is_i = act2 & (code2 == C_I)
            is_m = act2 & (code2 == C_M)
            is_x = act2 & (code2 == C_X)
            one = jnp.ones((P, 128), I32)
            op_sel = jnp.where(is_i, OP_I, jnp.where(is_m, OP_M, OP_X))
            runs, rc, top_op, top_len = emit_merge(
                st2, is_i | is_m | is_x, op_sel, one)
            hcur = hcur - jnp.where(is_i | is_m | is_x, 1, 0)
            vcur = vcur - jnp.where(is_m | is_x, 1, 0)
            return hcur, vcur, runs, rc, top_op, top_len

        hcur, vcur, runs, rc, top_op, top_len = jax.lax.fori_loop(
            0, R, bt_body, (hcur, vcur, runs, rc, top0, top0))
        # tails (ref: nw.c:100-106): I x h, then D x v (only one nonzero)
        st2 = emit_merge((runs, rc, top_op, top_len), hcur > 0, OP_I, hcur)
        st2 = emit_merge(st2, vcur > 0, OP_D, vcur)
        runs, rc = emit_flush(st2)
        flag = flag | (rc < 1)
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
def nw_forward_pallas(pats, txts, plens, tlens, *, cfg: AlignConfig,
                      interpret: bool = False, packed: bool = False):
    """Banded Pallas NW forward + on-device traceback, one fused dispatch.

    With packed=True, pats/txts are 2-bit packed (ops/common.pack_seqs);
    a 2-op XLA prologue unpacks them on device.

    Returns {"packed_runs": [n, NRL] i16}: lane0 = cursor | flags<<8
    (bit0 = needs_fallback), lane1 = score, CIGAR runs in lanes
    cursor+1..NRL-1 (host: native.wfa_runs_to_ops).
    """
    R = cfg.read_size
    n = pats.shape[0]
    C = band_half(cfg)
    Rp = round_up(R + 2, 8)
    NRL = runs_lanes_nw(cfg)
    P = 128
    L, G = group_geom(cfg)
    PT = P * G          # pairs per tile (G pairs share each lane row)

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

    kernel = functools.partial(_nw_kernel, cfg, P, Rp, NRL, C, L, G)
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
            # direction codes, 4 rows of 2-bit codes per byte (a dummy
            # single plane in score-only mode — never written)
            pltpu.VMEM(((R // 4 + 1) if cfg.backtrace else 1, P, 128),
                       jnp.int8),
        ],
        interpret=interpret,
    )(pats, txts, plens.astype(I32).reshape(n, 1),
      tlens.astype(I32).reshape(n, 1))
    return {"packed_runs": runs[:n_orig]}


def vmem_fit_nw(cfg: AlignConfig) -> bool:
    """The codes plane ((R//4+1) x 128 x 128 i8, 4 rows per byte) is the
    dominant scratch; 2x slack for block buffers + the kernel body's
    spill stack.  Covers the reference's long-read tier (NW-MRAM default
    READ_SIZE 1120, ref: NW/DPU-MRAM/common/common.h:84)."""
    bits = (cfg.read_size // 4 + 1) * 128 * 128
    return (2 * bits + 6 * 1024 * 1024 < 16 * 1024 * 1024
            and cfg.read_size <= 2047 and band_half(cfg) >= 2)

"""WFA / WFA-adaptive — Pallas TPU kernel (VMEM-resident tier) with
on-device CIGAR backtrace.

ONE fused kernel per pair tile runs the whole alignment: the per-diagonal
next-mismatch (NM) table build, the wavefront forward pass (extend ->
reduce -> end-check -> compute-next), AND the CIGAR backtrace — with all
alignment state resident in VMEM scratch that never leaves the chip.  This
is the TPU shape of the reference's DPU design where the score loop and
the backtrace both run on the DPU and only (score, operations) records
return to the host (ref: WFA/DPU-*/dpu/wfa.c + wfa_backtracing.c).

Device formulations:
  * the extend char loop (ref: wfa.c:193-215) becomes a gather-free lookup
    into a per-(pair, diagonal) NM table built IN-KERNEL from the packed
    sequences: per diagonal k, a static lane roll aligns pattern[h-k] with
    text[h]; a log2(R) suffix-min turns the mismatch mask into "first
    mismatch position >= h".  Building it on-chip (vs streaming a
    precomputed [n, K, R] table from HBM) makes the whole program a single
    dispatch, which matters on this relay runtime (PERFNOTES.md §1).
  * ALL dynamic indexing is one-hot algebra: per-score extents/flags live
    in pair-major [P, 128] arrays indexed by score lane (reads:
    sum(where(lane==s, w, 0)); writes: where(lane==s, new, w)); per-pair
    wavefront reads at arbitrary (score, k) accumulate over a fori of the
    history's leading dim.
  * the backtrace emits RUN-LENGTH records (op, len) right-to-left into a
    per-pair lane buffer; the end score rides in lane 0's high byte —
    ~tens of bytes per pair cross D2H instead of the wavefront history
    (native.wfa_runs_to_ops expands them into the reference ops buffer).

Semantics mirror ops/wfa_xla.py + the native walker exactly (same
reference quirks, including backtrace m-reads ignoring m_null, NULL+1
trace arithmetic, the unconditional match-stroke writes, and trailing-gap
insertion at the valid-location transition); tests assert equality
against the native oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aim_tpu.config import AlignConfig

I32 = jnp.int32
I16 = jnp.int16
NULL = -16384
# Device-side "infinity": values >= ~2**29 in any materialized buffer flip
# this runtime into a ~500x slower dispatch mode (see ops/common.py).
BIG = 2 ** 20

# Run op codes (shared with native.aim_wfa_runs_to_ops).
OP_M, OP_X, OP_I, OP_D = 0, 1, 2, 3


def _round_up(x, m):
    return -(-x // m) * m


def runs_lanes(smax: int) -> int:
    """Lane count of the packed runs record.  Worst case run count: the
    backtrace loop runs smax+1 iterations emitting <= 2 runs each (match
    stroke + one op), plus one trailing-gap run at the valid-location
    transition, plus <= 2 final strokes; lane 0 holds cursor|score<<8."""
    return _round_up(2 * smax + 6, 8)


def unpack_scores(packed_runs) -> jnp.ndarray:
    """Host/device-side: extract scores from the packed runs lane 0."""
    return (packed_runs[:, 0].astype(jnp.int32) >> 8) & 0xFF


def _wfa_kernel(cfg: AlignConfig, P: int, Kp: int, Rp: int, NRL: int,
                K: int,
                pats_ref, txts_ref, plens_ref, tlens_ref,
                runs_ref,
                nm_ref, hm_ref, hi_ref, hd_ref):
    # nm/hm/hi/hd are VMEM *scratch*: the NM table and wavefront history
    # live and die on-chip — no HBM traffic beyond sequences in / runs out.
    smax = cfg.max_score
    R = cfg.read_size
    x, go, ge = cfg.mismatch, cfg.gap_o, cfg.gap_e
    S1 = smax + 1

    plens = plens_ref[:]            # [P, 1] i32
    tlens = tlens_ref[:]
    ak = tlens - plens              # [P, 1]
    kvec = jax.lax.broadcasted_iota(I32, (P, Kp), 1) - smax
    lane_valid = kvec <= smax       # lanes beyond K are dead
    scol = jax.lax.broadcasted_iota(I32, (P, 128), 1)  # score lanes

    null16 = jnp.full((P, Kp), NULL, I16)
    nm_dtype = nm_ref.dtype

    # ---- in-kernel NM table (ref extend loop's lookup structure) ----
    # NM[k][p, h] = first h' >= h failing the match condition
    # (v'=h'-k in [0,plen), h' in [0,tlen), pattern[v']==text[h']);
    # lanes h in (tlen..Rp) hold h itself, so offsets past the text (which
    # the reference's while-loop leaves unchanged) read back unchanged.
    pat32 = pats_ref[:].astype(I32)     # [P, Rp]
    txt32 = txts_ref[:].astype(I32)
    h_iota = jax.lax.broadcasted_iota(I32, (P, Rp), 1)
    log_shifts = []
    sh = 1
    while sh < Rp:
        log_shifts.append(sh)
        sh *= 2
    for kk in range(K):
        kd = kk - smax
        pat_sh = pltpu.roll(pat32, kd % Rp, 1)   # lane h -> pattern[h-kd]
        v = h_iota - kd
        match = ((v >= 0) & (v < plens) & (h_iota < tlens)
                 & (pat_sh == txt32))
        arr = jnp.where(match, R, h_iota)
        # suffix-min: arr[h] := min(arr[h..]) in log2(Rp) roll+min steps.
        for s_ in log_shifts:
            rolled = pltpu.roll(arr, Rp - s_, 1)
            arr = jnp.where(h_iota < Rp - s_, jnp.minimum(arr, rolled), arr)
        nm_ref[kk] = arr.astype(nm_dtype)

    # ---- score 0 (ref: wfa.c:364-366) ----
    # (selects happen in int32 — Mosaic dislikes 8x128-tiled bool masks
    # applied to 16x128-tiled values — and are cast on store)
    hm_ref[0] = jnp.where(kvec == 0, 0, NULL).astype(I16)
    hi_ref[0] = null16
    hd_ref[0] = null16
    fl0 = 1 | (1 << 2) | (1 << 3)

    # Pair-major per-score sidecars, score = lane index.  Scores beyond the
    # current one read flags 0 = "not exists" until written.
    klw0 = jnp.where(scol == 0, 0, 1)
    khw0 = jnp.where(scol == 0, 0, -1)
    flw0 = jnp.where(scol == 0, fl0, 0)

    def side(w, sx):
        """Read sidecar w at per-pair (or scalar) score sx -> [P, 1]."""
        return jnp.sum(jnp.where(scol == sx, w, 0), axis=1, keepdims=True)

    def side_put(w, sx, val):
        return jnp.where(scol == sx, val, w)

    # Mosaic only rotates 32-bit vectors; shift in int32 (values fit).
    def sl(w):  # value at lane k-1
        r = pltpu.roll(w, 1, 1)
        pos = jax.lax.broadcasted_iota(I32, w.shape, 1)
        return jnp.where(pos >= 1, r, NULL)

    def sr(w):  # value at lane k+1
        r = pltpu.roll(w, Kp - 1, 1)
        pos = jax.lax.broadcasted_iota(I32, w.shape, 1)
        return jnp.where(pos <= Kp - 2, r, NULL)

    # ======================= forward score loop =======================
    def body(state):
        s, active_i, scores, klw, khw, flw = state
        active = active_i > 0
        m = hm_ref[s].astype(I32)
        kl = side(klw, s)
        kh = side(khw, s)
        fl = side(flw, s)
        exists = (fl & 1) == 1
        m_null = ~exists | (((fl >> 1) & 1) == 1)
        inr = (kl <= kvec) & (kvec <= kh)

        # ---- extend (ref: wfa.c:193-215): offset -> first mismatch >=
        # offset on this diagonal.  Static loop over the (few) diagonals;
        # each is one lane one-hot reduce over its in-kernel NM row.
        do_ext = active & ~m_null & inr & (m >= 0)
        idx = jnp.clip(m, 0, Rp - 1)
        riota = jax.lax.broadcasted_iota(I32, (P, Rp), 1)
        ext = m
        for kk in range(K):
            sel_k = kvec == (kk - smax)
            within = (kl <= kk - smax) & (kk - smax <= kh)
            off_k = jnp.sum(jnp.where(sel_k, idx, 0), axis=1, keepdims=True)
            nm_k = nm_ref[kk].astype(I32)
            e_k = jnp.sum(jnp.where(riota == off_k, nm_k, 0), axis=1,
                          keepdims=True)
            ext = jnp.where(sel_k & within, e_k, ext)
        # Offsets beyond the NM lanes (m >= Rp, possible via long gap
        # chains) extend to themselves, as in the reference.
        offi = jnp.where(do_ext & (m < Rp), ext, m)
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
            klw = side_put(klw, s, kl)
            khw = side_put(khw, s, kh)
            flw = side_put(flw, s, fl)
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
        f_sub = side(flw, s2 - x)
        l_sub = side(klw, s2 - x)
        h_sub = side(khw, s2 - x)
        f_o = side(flw, s2 - go - ge)
        l_o = side(klw, s2 - go - ge)
        h_o = side(khw, s2 - go - ge)
        f_e = side(flw, s2 - ge)
        l_e = side(klw, s2 - ge)
        h_e = side(khw, s2 - ge)
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
        klw = side_put(klw, s2, kl2)
        khw = side_put(khw, s2, kh2)
        flw = side_put(flw, s2, newf)
        return s2, active.astype(I32), scores, klw, khw, flw

    s0 = jnp.int32(0)
    active0 = jnp.ones((P, 1), I32)
    scores0 = jnp.zeros((P, 1), I32)
    _, active_i, scores, klw, khw, flw = jax.lax.fori_loop(
        0, smax + 1, lambda _, st: body(st),
        (s0, active0, scores0, klw0, khw0, flw0))
    scores = jnp.where(active_i > 0, smax + 1, scores)

    rlane = jax.lax.broadcasted_iota(I32, (P, 128), 1)

    if not cfg.backtrace:
        packed0 = jnp.where(rlane == 0, (scores << 8) | (NRL - 1), 0)
        runs_ref[:, :] = jax.lax.slice_in_dim(
            packed0, 0, NRL, axis=1).astype(I16)
        return

    # ======================= on-device backtrace =======================
    # Mirrors native wfa_backtrace_dense (ref: wfa_backtracing.c:219-375)
    # with per-pair lane-vector state and one-hot history reads.

    def hist4(s_o, s_e, s_x):
        """Accumulate the wavefront rows at per-pair scores s_o/s_e/s_x."""
        init = tuple(jnp.full((P, Kp), NULL, I32) for _ in range(4))

        def acc(s, carry):
            a_mo, a_ie, a_de, a_mx = carry
            mrow = hm_ref[s].astype(I32)
            irow = hi_ref[s].astype(I32)
            drow = hd_ref[s].astype(I32)
            a_mo = jnp.where(s_o == s, mrow, a_mo)
            a_ie = jnp.where(s_e == s, irow, a_ie)
            a_de = jnp.where(s_e == s, drow, a_de)
            a_mx = jnp.where(s_x == s, mrow, a_mx)
            return a_mo, a_ie, a_de, a_mx

        return jax.lax.fori_loop(0, S1, acc, init)

    def lane_at(arr, kx):
        """arr [P, Kp] at physical lane kx [P, 1] -> [P, 1] (0 if OOB)."""
        pos = jax.lax.broadcasted_iota(I32, (P, Kp), 1)
        return jnp.sum(jnp.where(pos == kx, arr, 0), axis=1, keepdims=True)

    def meta_ok(sx, kx):
        """m-read bounds: score >= 0, component exists, klo<=k<=khi.
        (m_null deliberately NOT checked — ref wfa_backtracing.c:73-91.)"""
        fl = side(flw, sx)
        return ((sx >= 0) & ((fl & 1) == 1)
                & (side(klw, sx) <= kx) & (kx <= side(khw, sx)))

    def meta_ok_bit(sx, kx, bit):
        fl = side(flw, sx)
        return (meta_ok(sx, kx) & (((fl >> bit) & 1) == 0))

    # Initial state (start at the alignment diagonal of the final score).
    bt_ok = scores <= smax  # overflow pairs skip backtrace (wfa.c:399-404)
    sc0 = jnp.where(bt_ok, scores, -1)
    a_mo0, _, _, _ = hist4(sc0, jnp.full((P, 1), -1, I32), sc0)
    offset = lane_at(a_mo0, ak + smax)
    offset = jnp.where(bt_ok, offset, -1)
    k = ak
    score = jnp.where(bt_ok, scores, 0)
    btype = jnp.zeros((P, 1), I32)  # 0=M 1=I 2=D
    v = offset - k
    h = offset
    valid = (v > 0) & (v <= plens) & (h > 0) & (h <= tlens)

    runs0 = jnp.zeros((P, 128), I32)
    rc0 = jnp.full((P, 1), NRL - 1, I32)  # runs descend within [1, NRL)

    def emit(runs, rc, mask, op, length):
        """Append a run (right-to-left) where mask & length > 0."""
        do = mask & (length > 0)
        val = (op << 12) | jnp.minimum(length, 4095)
        runs = jnp.where((rlane == rc) & do, val, runs)
        rc = jnp.where(do, rc - 1, rc)
        return runs, rc

    def bt_body(_, st):
        score, k, offset, btype, valid_i, runs, rc = st
        valid = valid_i > 0
        v = offset - k
        h = offset
        pre = (v > 0) & (h > 0) & (score > 0)
        # valid-location transition: add the trailing gap
        # (ref: wfa_backtracing.c:48-69, 249-256)
        now_valid = (v > 0) & (v <= plens) & (h > 0) & (h <= tlens)
        newly = pre & ~valid & now_valid
        runs, rc = emit(runs, rc, newly & (k < ak), OP_I, ak - k)
        runs, rc = emit(runs, rc, newly & (k > ak), OP_D, k - ak)
        valid = valid | newly

        s_o = score - go - ge
        s_e = score - ge
        s_x = score - x
        a_mo, a_ie, a_de, a_mx = hist4(
            jnp.where(pre, s_o, -1), jnp.where(pre, s_e, -1),
            jnp.where(pre, s_x, -1))
        not_i = btype != 1
        not_d = btype != 2
        is_m = btype == 0
        del_ext = jnp.where(pre & not_i & meta_ok_bit(s_e, k + 1, 3),
                            lane_at(a_de, k + 1 + smax), NULL)
        del_open = jnp.where(pre & not_i & meta_ok(s_o, k + 1),
                             lane_at(a_mo, k + 1 + smax), NULL)
        # the +1 applies to the RAW stored value even when it is NULL
        # (ref: wfa_backtracing.c:110-166)
        ins_ext = jnp.where(pre & not_d & meta_ok_bit(s_e, k - 1, 2),
                            lane_at(a_ie, k - 1 + smax) + 1, NULL)
        ins_open = jnp.where(pre & not_d & meta_ok(s_o, k - 1),
                             lane_at(a_mo, k - 1 + smax) + 1, NULL)
        misms = jnp.where(pre & is_m & meta_ok(s_x, k),
                          lane_at(a_mx, k + smax) + 1, NULL)
        max_all = jnp.maximum(misms, jnp.maximum(
            jnp.maximum(ins_ext, ins_open), jnp.maximum(del_ext, del_open)))

        # match stroke (emitted regardless of valid_location — ref :198-201)
        mstroke = pre & is_m
        nmatch = offset - max_all
        runs, rc = emit(runs, rc, mstroke, OP_M, nmatch)
        offset = jnp.where(mstroke, max_all, offset)
        v2 = offset - k
        h2 = offset
        brk = mstroke & ((v2 <= 0) | (h2 <= 0))
        go_ = pre & ~brk

        b0 = go_ & (max_all == del_ext)
        b1 = go_ & ~b0 & (max_all == del_open)
        b2 = go_ & ~b0 & ~b1 & (max_all == ins_ext)
        b3 = go_ & ~b0 & ~b1 & ~b2 & (max_all == ins_open)
        b4 = go_ & ~b0 & ~b1 & ~b2 & ~b3 & (max_all == misms)
        one = jnp.ones((P, 1), I32)
        runs, rc = emit(runs, rc, (b0 | b1) & valid, OP_D, one)
        runs, rc = emit(runs, rc, (b2 | b3) & valid, OP_I, one)
        runs, rc = emit(runs, rc, b4 & valid, OP_X, one)
        score = jnp.where(b0 | b2, s_e,
                          jnp.where(b1 | b3, s_o,
                                    jnp.where(b4, s_x, score)))
        k = k + jnp.where(b0 | b1, 1, 0) - jnp.where(b2 | b3, 1, 0)
        offset = offset - jnp.where(b2 | b3 | b4, 1, 0)
        btype = jnp.where(b0, 2, jnp.where(b2, 1,
                          jnp.where(b1 | b3, 0, btype)))
        return score, k, offset, btype, valid.astype(I32), runs, rc

    score, k, offset, btype, valid_i, runs, rc = jax.lax.fori_loop(
        0, smax + 1, bt_body,
        (score, k, offset, btype, valid.astype(I32), runs0, rc0))

    # final strokes (ref: wfa_backtracing.c:354-373)
    v = offset - k
    h = offset
    fin_m = bt_ok & (score == 0)
    runs, rc = emit(runs, rc, fin_m, OP_M, offset)
    runs, rc = emit(runs, rc, bt_ok & ~fin_m, OP_D, v)
    runs, rc = emit(runs, rc, bt_ok & ~fin_m, OP_I, h)
    # lane 0: final cursor | end score << 8 (runs live in lanes rc+1..NRL-1)
    runs = jnp.where(rlane == 0, rc | (scores << 8), runs)
    runs_ref[:, :] = jax.lax.slice_in_dim(runs, 0, NRL, axis=1).astype(I16)


def pack_seqs(pats: "np.ndarray", txts: "np.ndarray", plens, tlens,
              read_size: int):
    """Host-side 2-bit packing of a [n, R] uint8 sequence pair batch.

    Returns (packed_pats, packed_txts [n, Rp//4] u8, True) when the
    COMBINED alphabet has <= 4 symbols (the DNA case — H2D bytes over this
    relay are precious, PERFNOTES.md §2), else the inputs unchanged with
    False.  One shared injective recode preserves alignment semantics:
    the kernels only compare pattern bytes against text bytes for
    equality.
    """
    import numpy as np
    Rp = _round_up(read_size + 2, 8)
    try:
        from aim_tpu import native
        if native.available():
            return native.pack_seqs(np.ascontiguousarray(pats, np.uint8),
                                    np.ascontiguousarray(txts, np.uint8),
                                    plens, tlens, Rp)
    except Exception:
        pass  # fall through to the numpy path
    seen = np.zeros(256, bool)
    seen[pats.reshape(-1)] = True
    seen[txts.reshape(-1)] = True
    syms = np.nonzero(seen)[0]
    if seen[0]:
        syms = syms[1:]  # byte 0 beyond the valid region is just padding
    if len(syms) > 4:
        return pats, txts, False
    if seen[0]:
        # Byte 0 may alias syms[0]'s code only if it never occurs INSIDE a
        # valid region (positions < plen/tlen) — text-file parsing cannot
        # produce interior NULs, but direct API callers could.
        pos = np.arange(pats.shape[1])
        if ((pats == 0) & (pos < np.asarray(plens)[:, None])).any() or \
           ((txts == 0) & (pos < np.asarray(tlens)[:, None])).any():
            return pats, txts, False
    lut = np.zeros(256, np.uint8)
    lut[syms] = np.arange(len(syms), dtype=np.uint8)

    def one(arr):
        codes = np.zeros((arr.shape[0], Rp), np.uint8)
        codes[:, :arr.shape[1]] = lut[arr]
        pk = (codes[:, 0::4] | (codes[:, 1::4] << 2)
              | (codes[:, 2::4] << 4) | (codes[:, 3::4] << 6))
        return np.ascontiguousarray(pk)

    return one(pats), one(txts), True


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "packed"))
def wfa_forward_pallas(pats, txts, plens, tlens, *, cfg: AlignConfig,
                       interpret: bool = False, packed: bool = False):
    """Pallas WFA forward (+ on-device backtrace), one fused dispatch.

    With packed=True, pats/txts are 2-bit packed [n, Rp//4] u8 (see
    pack_seqs); a 2-op XLA prologue unpacks them on device.

    Returns {"packed_runs": [n, NRL] i16}: lane 0 = cursor | score << 8;
    when cfg.backtrace, run-length CIGAR records in lanes cursor+1..NRL-1
    (host: native.wfa_runs_to_ops).  Scores: ops.wfa_pallas.unpack_scores.
    """
    smax = cfg.max_score
    R = cfg.read_size
    n = pats.shape[0]
    K = 2 * smax + 1
    K8 = _round_up(K, 8)
    Kp = _round_up(K, 128)
    Rp = _round_up(R + 2, 8)
    S2 = smax + 2
    NRL = runs_lanes(smax) if cfg.backtrace else 8
    P = tile_pairs(cfg)
    if P is None:
        raise ValueError("config exceeds the VMEM budget; use the XLA tier")
    nm_dtype = jnp.int8 if R + 1 < 128 else I16

    if packed:
        shifts = jnp.arange(4, dtype=jnp.uint8) * 2
        pats = ((pats[:, :, None] >> shifts) & 3).reshape(n, -1)
        txts = ((txts[:, :, None] >> shifts) & 3).reshape(n, -1)

    # Pad the batch to a tile multiple (zero-length pairs finish at score 0).
    n_orig = n
    if n % P:
        padn = _round_up(n, P) - n
        pats = jnp.pad(pats, ((0, padn), (0, 0)))
        txts = jnp.pad(txts, ((0, padn), (0, 0)))
        plens = jnp.pad(plens, (0, padn))
        tlens = jnp.pad(tlens, (0, padn))
        n = n + padn
    # Sequence blocks cover lanes [0, Rp); pad the (already read_size-wide)
    # arrays so block shapes are static.
    if pats.shape[1] < Rp:
        pats = jnp.pad(pats, ((0, 0), (0, Rp - pats.shape[1])))
        txts = jnp.pad(txts, ((0, 0), (0, Rp - txts.shape[1])))

    grid = (n // P,)
    kernel = functools.partial(_wfa_kernel, cfg, P, Kp, Rp, NRL, K)
    runs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, Rp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, Rp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((P, NRL), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, NRL), I16),
        scratch_shapes=[
            pltpu.VMEM((K8, P, Rp), nm_dtype),  # NM table (on-chip only)
            pltpu.VMEM((S2, P, Kp), I16),       # hist m
            pltpu.VMEM((S2, P, Kp), I16),       # hist i
            pltpu.VMEM((S2, P, Kp), I16),       # hist d
        ],
        interpret=interpret,
    )(pats, txts, plens.astype(I32).reshape(n, 1),
      tlens.astype(I32).reshape(n, 1))
    return {"packed_runs": runs[:n_orig]}


def tile_pairs(cfg: AlignConfig):
    """Largest pair-tile P whose fused-kernel scratch fits VMEM (v5e:
    16 MB; compile fails with a scoped-vmem OOM beyond it —
    PERFNOTES.md §3), or None.  Budget: NM + 3 history planes + ~2x
    slack for the kernel body's spill stack and block double-buffering.
    Long reads shrink P instead of falling off the fast path (the
    NM plane scales with K*R)."""
    smax = cfg.max_score
    R = cfg.read_size
    if R > 4095:
        # Run-length records carry 12-bit lengths; a single match stroke
        # can span up to R characters (no merging in the WFA emits).
        return None
    K8 = _round_up(2 * smax + 1, 8)
    Rp = _round_up(R + 2, 8)
    Kp = _round_up(2 * smax + 1, 128)
    for P in (128, 64, 32, 16):
        nm_bytes = K8 * P * Rp * (1 if R + 1 < 128 else 2)
        hist_bytes = 3 * (smax + 2) * P * Kp * 2
        # The kernel body's spill stack grows with the history (the
        # backtrace keeps ~NRL live lane vectors): 3x on hist + 5 MB
        # fixed slack matches measured compiles up to smax=50.
        if 2 * nm_bytes + 3 * hist_bytes + 5 * 1024 * 1024 < 16 * 1024 * 1024:
            return P
    return None


def vmem_fit(cfg: AlignConfig) -> bool:
    return tile_pairs(cfg) is not None

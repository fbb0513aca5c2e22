"""WFA / WFA-adaptive — Pallas TPU kernel v2 (VMEM tier, pairs-in-lanes).

One fused kernel per 128-pair tile runs the whole alignment on-chip.
The layout and algorithm redesign removes the round-1 kernel's three
dominant costs (each measured via tools/microbench_mosaic.py; the old
kernel lived at ops/wfa_pallas.py until commit 856e1fb):

  * LAYOUT: diagonals k live in SUBLANES ([K8, 128] planes), pairs in
    lanes.  K8 = roundup(2*smax+1, 8) rows instead of v1's 128 padded
    lanes; k +-1 shifts are (cheap) sublane rolls; K is no longer capped
    by the 128-lane register width, which is what lets the long-read HBM
    tier reuse this kernel body.
  * EXTEND: the old kernel walked all K diagonals through a one-hot
    gather over an O(K*R) next-mismatch table per score step (its
    profiled hot spot).  This one precomputes a per-(diagonal, pair) MISMATCH BITMASK — W16 words of
    16 text positions each, built from static anti-diagonal slices of a
    reversed pattern plane, with sequence bounds applied as two threshold
    masks per word — and answers "first mismatch >= offset" in exactly
    two bounded probes: the word containing the offset, then (via a
    packed next-nonzero-word table) the first later word with a mismatch
    bit.  No data-dependent inner loop; ~40 plane ops per score step vs
    v1's O(K) one-hot reduces.  This is the TPU shape of the reference's
    per-character extend loop (ref: WFA/DPU-MRAM/dpu/wfa.c:193-215).
  * BACKTRACE: the old kernel re-scanned the whole score history per
    step (O(S^2) plane work).  This one walks SCORE LEVELS s = s_start..0; at each level the
    three predecessor scores s-x, s-o-e, s-e are level-relative, so the
    history rows are direct dynamic-slice reads and the per-pair (score,
    k) gather collapses to one one-hot over K8 sublanes.  Each level
    writes ONE step record (match-stroke len | op | trailing-gap) into a
    level-indexed output row; the host expands records to the reference
    ops buffer (native.wfa_steps_to_ops), replaying the reference's
    right-to-left emission order (ref: wfa_backtracing.c:219-375).
  * The forward pass is a while_loop that exits when every pair in the
    tile has finished — easy tiles stop at their real max score instead
    of always paying MAX_SCORE iterations.

Semantics are identical to the native oracle, including the reference
quirks: backtrace m-reads ignore m_null, the +1 applies to raw NULL
values, unconditional match-stroke offset updates, trailing-gap insertion
at the valid-location transition, and the MRAM-variant overflow behavior
(score > MAX_SCORE skips backtrace; ref: wfa.c:399-404).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aim_tpu.config import AlignConfig
from aim_tpu.ops.band import round_up as _round_up

I32 = jnp.int32
I16 = jnp.int16
F32 = jnp.float32
NULL = -16384
BIG = 2 ** 20  # device "infinity": must stay far below 2**29 (PERFNOTES.md)

OP_M, OP_X, OP_I, OP_D = 0, 1, 2, 3
P = 128  # pairs per tile (one per lane)


def record_rows(smax: int) -> int:
    """Rows of the step-record output: one per score level 0..smax, two
    final-stroke rows, one scores row; padded to the sublane tile."""
    return _round_up(smax + 4, 8)


def _wfa2_kernel(cfg: AlignConfig, K8: int, Rp: int, W16: int, Le8: int,
                 SR: int,
                 patx_ref, txtx_ref, lens_ref,
                 rec_ref,
                 mm_ref, hm_ref, hi_ref, hd_ref, side_ref):
    smax = cfg.max_score
    R = cfg.read_size
    x, go, ge = cfg.mismatch, cfg.gap_o, cfg.gap_e

    plens = lens_ref[0:1, :]                 # [1, P] i32
    tlens = lens_ref[1:2, :]
    ak = tlens - plens                       # alignment diagonal, per pair
    kio = jax.lax.broadcasted_iota(I32, (K8, P), 0)
    kvec = kio - smax                        # diagonal index per row
    row_valid = kvec <= smax                 # rows beyond K are dead

    null_k = jnp.full((K8, P), NULL, I16)

    # ================= mismatch bitmask build =================
    # mm_ref[w][k, p] bit j (0..15) set  <=>  text position h = 16w + j is
    # NOT a match on diagonal k: pattern[h-kd] != text[h] or h outside
    # [max(kd,0), min(tlen, plen+kd)).  patx is the reversed pattern plane
    # prepared by the XLA prologue: patx[i, p] = pat[p, smax + Rp - 1 - i],
    # so the K8 rows at base Rp-1-h hold pat[h-kd] for kd = row - smax —
    # every slice below is static.
    txt_all = txtx_ref[:]                   # [Rp, P] i32 byte codes
    eqbits = [jnp.zeros((K8, P), I32) for _ in range(W16)]
    for h in range(Rp):
        w = patx_ref[Rp - 1 - h:Rp - 1 - h + K8, :]
        eq = (w == txt_all[h:h + 1, :])
        eqbits[h // 16] = eqbits[h // 16] + jnp.where(eq, 1 << (h % 16), 0)
    lo_b = jnp.maximum(kvec, 0)             # first valid h on the diagonal
    hi_b = jnp.minimum(tlens, plens + kvec)  # first invalid h (clamped >=0)
    hi_b = jnp.maximum(hi_b, 0)
    ones16 = 0xFFFF
    for w in range(W16):
        lo_rel = jnp.clip(lo_b - 16 * w, 0, 16)
        hi_rel = jnp.clip(hi_b - 16 * w, 0, 16)
        below = (1 << lo_rel) - 1
        above = (ones16 << hi_rel) & ones16
        mm_ref[w] = (eqbits[w] ^ ones16) | below | above

    # nmw: packed 4-bit fields over NPL int32 planes (8 fields per
    # plane), field w (w = 1..W16-1) = first word index >= w whose
    # mismatch mask is nonzero.  4 bits hold indices <= 15, i.e.
    # W16 <= 16 / Rp <= 256 — enforced by vmem_fit2; wider configs route
    # to the long-read kernel.  (The round-2 version packed 3-bit fields
    # into ONE plane, silently wrong past Rp = 128 — advisor finding.)
    # A terminator bit exists at h = hi_b < Rp for every live diagonal,
    # so the probe below always resolves within W16 words.
    NPL = (W16 + 7) // 8
    nxt = jnp.full((K8, P), W16 - 1, I32)
    nmws = [jnp.zeros((K8, P), I32) for _ in range(NPL)]
    for w in range(W16 - 1, 0, -1):
        nz = mm_ref[w] != 0
        nxt = jnp.where(nz, w, nxt)
        nmws[w // 8] = nmws[w // 8] | (nxt << (4 * (w % 8)))

    def first_mismatch_from(m):
        """First text position >= m flagged mismatch on the row's
        diagonal (caller guards 0 <= m < Rp)."""
        q = jnp.clip(m >> 4, 0, W16 - 1)
        mw = jnp.zeros((K8, P), I32)
        nw = jnp.zeros((K8, P), I32)
        for w in range(W16):
            sel = q == w
            mw = jnp.where(sel, mm_ref[w], mw)
        bits1 = mw & ((ones16 << jnp.clip(m - q * 16, 0, 16)) & ones16)
        # round 2 word index: first mismatch word strictly after q.
        # fidx = q+1 may equal W16 (probe in the last word): the unwritten
        # field reads 0, harmless — the terminator bit guarantees hit1
        # there, so nw is never consulted.
        fidx = q + 1
        fld = jnp.zeros((K8, P), I32)
        for pidx in range(NPL):
            fld = jnp.where((fidx >> 3) == pidx, nmws[pidx], fld)
        w2 = (fld >> (4 * (fidx & 7))) & 15
        w2 = jnp.clip(w2, 0, W16 - 1)
        for w in range(W16):
            sel = w2 == w
            nw = jnp.where(sel, mm_ref[w], nw)
        hit1 = bits1 != 0
        bits = jnp.where(hit1, bits1, nw)
        base = jnp.where(hit1, q * 16, w2 * 16)
        # ctz via the float32 exponent of the isolated lowest set bit
        # (bits <= 0xFFFF so the conversion is exact)
        lsb = bits & -bits
        e = (jax.lax.bitcast_convert_type(lsb.astype(F32), I32) >> 23) - 127
        return base + jnp.where(bits != 0, e, 0)

    # ================= score 0 =================
    hm_ref[0] = jnp.where(kvec == 0, 0, NULL).astype(I16)
    hi_ref[0] = null_k
    hd_ref[0] = null_k
    sio = jax.lax.broadcasted_iota(I32, (8, P), 0)
    fl0 = 1 | (1 << 2) | (1 << 3)

    def side_pack(kl, kh, fl):
        row = jnp.where(sio == 0, kl, 0)
        row = jnp.where(sio == 1, kh, row)
        return jnp.where(sio == 2, fl, row)

    side_ref[0] = side_pack(jnp.zeros((1, P), I32), jnp.zeros((1, P), I32),
                            jnp.full((1, P), fl0, I32))

    def side_read(s):
        """(klo, khi, flags) at score s; scores < 0 read as nonexistent."""
        row = side_ref[jnp.maximum(s, 0)]
        neg = s < 0
        kl = jnp.where(neg, 1, row[0:1, :])
        kh = jnp.where(neg, -1, row[1:2, :])
        fl = jnp.where(neg, 0, row[2:3, :])
        return kl, kh, fl

    def sl(w):  # value at diagonal k-1 (row above)
        r = pltpu.roll(w, 1, 0)
        return jnp.where(kio >= 1, r, NULL)

    def sr(w):  # value at diagonal k+1
        r = pltpu.roll(w, K8 - 1, 0)
        return jnp.where(kio <= K8 - 2, r, NULL)

    # ================= forward score loop =================
    def fwd_body(state):
        s, active_i, scores = state
        active = active_i > 0
        m = hm_ref[s].astype(I32)
        kl, kh, fl = side_read(s)
        exists = (fl & 1) == 1
        m_null = ~exists | (((fl >> 1) & 1) == 1)
        inr = (kl <= kvec) & (kvec <= kh)

        # ---- extend (ref: wfa.c:193-215) ----
        do_ext = active & ~m_null & inr & (m >= 0) & (m < Rp)
        ext = first_mismatch_from(jnp.clip(m, 0, Rp - 1))
        offi = jnp.where(do_ext, ext, m)
        hm_ref[s] = offi.astype(I16)

        # ---- reduce (WFA-adaptive, ref: wfa.c:70-141) ----
        if cfg.adaptive:
            width = kh - kl + 1
            do_red = active & ~m_null & (width >= 10)
            v = offi - kvec
            dist = jnp.maximum(plens - v, tlens - offi)
            dmask = jnp.where(inr, dist, BIG)
            mind = jnp.minimum(jnp.min(dmask, axis=0, keepdims=True),
                               jnp.maximum(plens, tlens))
            keep = (dist - mind) <= 50
            top_limit = jnp.minimum(ak - 1, kh)
            cand_lo = jnp.where((kvec >= kl) & (kvec < top_limit) & keep,
                                kvec, BIG)
            fk = jnp.min(cand_lo, axis=0, keepdims=True)
            klo_new = jnp.maximum(kl, jnp.minimum(fk, top_limit))
            bottom_limit = jnp.maximum(ak + 1, klo_new)
            cand_hi = jnp.where((kvec <= kh) & (kvec > bottom_limit) & keep,
                                kvec, -BIG)
            lk = jnp.max(cand_hi, axis=0, keepdims=True)
            khi_new = jnp.minimum(kh, jnp.maximum(lk, bottom_limit))
            nullify = do_red & (klo_new > khi_new)
            shrink = do_red & ~nullify
            kl = jnp.where(shrink, klo_new, kl)
            kh = jnp.where(shrink, khi_new, kh)
            fl = jnp.where(nullify, fl | 0b1110, fl)
            side_ref[s] = side_pack(kl, kh, fl)
            m_null = m_null | nullify
            inr = (kl <= kvec) & (kvec <= kh)

        # ---- end reached (ref: wfa.c:217-237) ----
        at_ak = (kvec == ak) & row_valid
        m_at_ak = jnp.sum(jnp.where(at_ak, offi, 0), axis=0, keepdims=True)
        er = active & ~m_null & (kl <= ak) & (ak <= kh) & (m_at_ak >= tlens)
        scores = jnp.where(er, s, scores)
        active = active & ~er

        # ---- compute score s+1 (ref: wfa.c:275-354) ----
        s2 = s + 1
        l_sub, h_sub, f_sub = side_read(s2 - x)
        l_o, h_o, f_o = side_read(s2 - go - ge)
        l_e, h_e, f_e = side_read(s2 - ge)
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
        side_ref[s2] = side_pack(kl2, kh2, newf)
        return s2, active.astype(I32), scores

    def fwd_cond(state):
        s, active_i, _ = state
        return (s <= smax) & (jnp.max(active_i) > 0)

    _, active_i, scores = jax.lax.while_loop(
        fwd_cond, fwd_body,
        (jnp.int32(0), jnp.ones((1, P), I32), jnp.zeros((1, P), I32)))
    scores = jnp.where(active_i > 0, smax + 1, scores)

    # ================= step-record output =================
    rec_ref[:, :] = jnp.zeros((SR, P), I32)
    rec_ref[smax + 3:smax + 4, :] = scores

    if not cfg.backtrace:
        return

    # ================= backtrace over score levels =================
    # Mirrors the native walker (ref: wfa_backtracing.c:219-375); see the
    # module docstring for the level-walk equivalence argument.
    bt_ok = scores <= smax
    lvl0 = jnp.max(jnp.where(bt_ok, scores, 0))

    def bt_body(i, st):
        score, k, offset, btype, valid_i, started_i = st
        s = lvl0 - i
        kl_o, kh_o, fl_o = side_read(s - go - ge)
        kl_e, kh_e, fl_e = side_read(s - ge)
        kl_x, kh_x, fl_x = side_read(s - x)
        mo = hm_ref[jnp.maximum(s - go - ge, 0)].astype(I32)
        mx = hm_ref[jnp.maximum(s - x, 0)].astype(I32)
        ie = hi_ref[jnp.maximum(s - ge, 0)].astype(I32)
        de = hd_ref[jnp.maximum(s - ge, 0)].astype(I32)

        # pairs whose walk begins at this level
        start = bt_ok & (scores == s) & ~(started_i > 0)
        off0 = jnp.sum(jnp.where((kio == ak + smax) & row_valid & start,
                                 hm_ref[jnp.maximum(s, 0)].astype(I32), 0),
                       axis=0, keepdims=True)
        offset = jnp.where(start, off0, offset)
        k = jnp.where(start, ak, k)
        btype = jnp.where(start, 0, btype)
        started = (started_i > 0) | start
        v = offset - k
        h = offset
        valid0 = (v > 0) & (v <= plens) & (h > 0) & (h <= tlens)
        # select in int32 — Mosaic rejects selects between bool vectors
        valid = jnp.where(start, valid0.astype(I32), valid_i) > 0

        act = started & (score == s) & (s > 0)
        pre = act & (v > 0) & (h > 0)

        # valid-location transition: trailing gap
        # (ref: wfa_backtracing.c:48-69, 249-256)
        now_valid = (v > 0) & (v <= plens) & (h > 0) & (h <= tlens)
        newly = pre & ~valid & now_valid
        gap_len = jnp.where(newly & (k != ak), jnp.abs(ak - k), 0)
        gap_d = (newly & (k > ak)).astype(I32)
        valid = valid | newly

        # candidate source offsets; the priority order is load-bearing
        # for CIGAR equality (ref: wfa_backtracing.c:290-345)
        rm1 = kio == (k - 1 + smax)
        rp0 = kio == (k + smax)
        rp1 = kio == (k + 1 + smax)

        def gat(plane, rows):
            return jnp.sum(jnp.where(rows, plane, 0), axis=0, keepdims=True)

        def ok(kl, kh, fl, kx, sx):
            return (sx >= 0) & ((fl & 1) == 1) & (kl <= kx) & (kx <= kh)

        def ok_bit(kl, kh, fl, kx, sx, bit):
            return ok(kl, kh, fl, kx, sx) & (((fl >> bit) & 1) == 0)

        s_o = s - go - ge
        s_e = s - ge
        s_x = s - x
        not_i = btype != 1
        not_d = btype != 2
        is_m = btype == 0
        del_ext = jnp.where(pre & not_i & ok_bit(kl_e, kh_e, fl_e, k + 1,
                                                 s_e, 3),
                            gat(de, rp1), NULL)
        del_open = jnp.where(pre & not_i & ok(kl_o, kh_o, fl_o, k + 1, s_o),
                             gat(mo, rp1), NULL)
        ins_ext = jnp.where(pre & not_d & ok_bit(kl_e, kh_e, fl_e, k - 1,
                                                 s_e, 2),
                            gat(ie, rm1) + 1, NULL)
        ins_open = jnp.where(pre & not_d & ok(kl_o, kh_o, fl_o, k - 1, s_o),
                             gat(mo, rm1) + 1, NULL)
        misms = jnp.where(pre & is_m & ok(kl_x, kh_x, fl_x, k, s_x),
                          gat(mx, rp0) + 1, NULL)
        max_all = jnp.maximum(misms, jnp.maximum(
            jnp.maximum(ins_ext, ins_open), jnp.maximum(del_ext, del_open)))

        # match stroke (ref: wfa_backtracing.c:198-201)
        mstroke = pre & is_m
        nmatch = jnp.where(mstroke, jnp.maximum(offset - max_all, 0), 0)
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
        opv = jnp.where((b0 | b1) & valid, OP_D,
                        jnp.where((b2 | b3) & valid, OP_I,
                                  jnp.where(b4 & valid, OP_X, 0)))
        rec = (jnp.minimum(nmatch, 0x3FFF)
               | (opv << 14)
               | (jnp.minimum(gap_len, 0x7FF) << 16)
               | (gap_d << 27))
        rec_ref[pl.ds(s, 1), :] = rec

        score = jnp.where(b0 | b2, s_e,
                          jnp.where(b1 | b3, s_o,
                                    jnp.where(b4, s_x, score)))
        k = k + jnp.where(b0 | b1, 1, 0) - jnp.where(b2 | b3, 1, 0)
        offset = offset - jnp.where(b2 | b3 | b4, 1, 0)
        btype = jnp.where(b0, 2, jnp.where(b2, 1,
                          jnp.where(b1 | b3, 0, btype)))
        return (score, k, offset, btype, valid.astype(I32),
                started.astype(I32))

    zeros = jnp.zeros((1, P), I32)
    score, k, offset, btype, valid_i, started_i = jax.lax.fori_loop(
        0, lvl0 + 1, bt_body,
        (scores, zeros, zeros, zeros, zeros, zeros))

    # final strokes (ref: wfa_backtracing.c:354-373).  Every bt_ok pair
    # was started at its own score level (score <= lvl0 by construction).
    v = offset - k
    h = offset
    fin_m = bt_ok & (score == 0)
    fin_g = bt_ok & ~fin_m
    # reference emission order: D(v) before I(h) (I lands leftmost)
    rec_ref[smax + 1:smax + 2, :] = jnp.where(
        fin_m,
        jnp.minimum(jnp.maximum(offset, 0), 0x3FFF) | (OP_M << 14),
        jnp.where(fin_g,
                  jnp.minimum(jnp.maximum(v, 0), 0x3FFF) | (OP_D << 14), 0))
    rec_ref[smax + 2:smax + 3, :] = jnp.where(
        fin_g, jnp.minimum(jnp.maximum(h, 0), 0x3FFF) | (OP_I << 14), 0)


def vmem_fit2(cfg: AlignConfig) -> bool:
    """Whether the fused v2 kernel's scratch fits the 16 MB VMEM budget
    (PERFNOTES.md §3), with slack for the compiler's spill stack."""
    smax = cfg.max_score
    R = cfg.read_size
    if smax > 1023 or R + 2 > 0x3FFF:
        return False  # step-record bit fields (11-bit gap, 14-bit stroke)
    K8 = _round_up(2 * smax + 1, 8)
    Rp = _round_up(R + 2, 16)
    if Rp > 256:
        # next-nonzero-word table packs 4-bit word indices (W16 <= 16);
        # longer reads route to the HBM-spill long kernel, exact there.
        return False
    S2 = smax + 2
    hist = 3 * S2 * K8 * P * 2
    mm = (Rp // 16) * K8 * P * 4
    side = S2 * 8 * P * 4
    seqs = (_round_up(Rp + K8, 8) + Rp) * P * 4
    return hist + mm + side + seqs + 5 * 1024 * 1024 < 16 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "packed"))
def wfa_forward_pallas2(pats, txts, plens, tlens, *, cfg: AlignConfig,
                        interpret: bool = False, packed: bool = False):
    """Pallas WFA v2 forward (+ on-device backtrace), one fused dispatch.

    Returns {"step_records": [n, record_rows(smax)] i32}: rows 0..smax are
    per-score-level step records, rows smax+1/smax+2 the final strokes,
    row smax+3 the scores (native.wfa_steps_to_ops expands them;
    unpack_scores2 extracts scores).
    """
    smax = cfg.max_score
    R = cfg.read_size
    n = pats.shape[0]
    K8 = _round_up(2 * smax + 1, 8)
    Rp = _round_up(R + 2, 16)
    W16 = Rp // 16
    Le8 = _round_up(Rp + K8, 8)
    SR = record_rows(smax)

    if packed:
        shifts = jnp.arange(4, dtype=jnp.uint8) * 2
        pats = ((pats[:, :, None] >> shifts) & 3).reshape(n, -1)
        txts = ((txts[:, :, None] >> shifts) & 3).reshape(n, -1)

    n_orig = n
    if n % P:
        padn = _round_up(n, P) - n
        pats = jnp.pad(pats, ((0, padn), (0, 0)))
        txts = jnp.pad(txts, ((0, padn), (0, 0)))
        plens = jnp.pad(plens, (0, padn))
        tlens = jnp.pad(tlens, (0, padn))
        n = n + padn
    if pats.shape[1] < Rp:
        pats = jnp.pad(pats, ((0, 0), (0, Rp - pats.shape[1])))
        txts = jnp.pad(txts, ((0, 0), (0, Rp - txts.shape[1])))
    pats = pats[:, :Rp].astype(jnp.int32)
    txts = txts[:, :Rp].astype(jnp.int32)

    T = n // P
    # Prologue (XLA, on device): pairs-in-lanes planes per tile.
    # patx[t, i, p] = pat[t*P+p, smax + Rp - 1 - i]  (reversed + offset)
    pat3 = pats.reshape(T, P, Rp).transpose(0, 2, 1)      # [T, Rp, P]
    txt3 = txts.reshape(T, P, Rp).transpose(0, 2, 1)
    patr = jnp.flip(pat3, axis=1)
    patx = jnp.pad(patr, ((0, 0), (smax, Le8 - Rp - smax), (0, 0)))
    lens = jnp.stack([plens.astype(I32).reshape(T, P),
                      tlens.astype(I32).reshape(T, P)], axis=1)  # [T, 2, P]
    lens = jnp.pad(lens, ((0, 0), (0, 6), (0, 0)))

    kernel = functools.partial(_wfa2_kernel, cfg, K8, Rp, W16, Le8, SR)
    rec = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((None, Le8, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Rp, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, SR, P), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, SR, P), I32),
        scratch_shapes=[
            pltpu.VMEM((W16, K8, P), I32),       # mismatch bitmasks
            pltpu.VMEM((smax + 2, K8, P), I16),  # hist m
            pltpu.VMEM((smax + 2, K8, P), I16),  # hist i
            pltpu.VMEM((smax + 2, K8, P), I16),  # hist d
            pltpu.VMEM((smax + 2, 8, P), I32),   # klo/khi/flags per score
        ],
        interpret=interpret,
    )(patx.reshape(T, Le8, P), txt3.reshape(T, Rp, P), lens)
    # [T, SR, P] -> [n, smax+4] (drop the pad rows before D2H — the
    # relay charges ~60-90 ms/MB for pulls, PERFNOTES.md §2)
    recs = rec.transpose(0, 2, 1).reshape(n, SR)[:n_orig, :smax + 4]
    return {"step_records": recs}


def unpack_scores2(step_records, smax: int) -> jnp.ndarray:
    return step_records[:, smax + 3].astype(jnp.int32)

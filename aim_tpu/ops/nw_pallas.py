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

Layout: G pairs share each 128-lane row, each owning an L-lane band
segment (L the smallest power of two holding band + record); P = 128
sublane rows -> PT = 128 * G pairs per tile.

Round-3 rework (3x target over the round-2 kernel, VERDICT item 2):
  * the per-row pattern/text gathers and window rolls (~26 plane ops per
    row) are gone: an XLA prologue precomputes the banded MISMATCH
    BITPLANES (bit j of word w at band lane b = pat[b-C+h-1] != txt[h-1]
    for h = 32w+j+1) and the kernel reads one dynamically indexed word
    per row (the TPU shape of the reference's per-cell char compare,
    ref: nw.c:120-127);
  * the min-plus deletion scan is truncated to the score-derived chain
    depth DS (a walk-visited cell's in-row chain costs gd per link, so
    value <= S implies depth <= S//gd; pairs with score//gd > DS are
    flagged needs_fallback) — 2 rounds instead of log2(L) on launcher
    configs;
  * direction codes accumulate in registers, 16 codes per i32 word,
    stored once per 16 rows;
  * the traceback is EVENT-driven: a while loop where every active pair
    consumes a D-run + one row-exit event per iteration, with whole
    MATCH RUNS skipped in one step via a descending-packed is-match
    bitplane (ctz on the inverted word) — ~20 iterations on launcher
    configs instead of R row-synchronized ones.

Banding is exact for a pair iff no optimal path can leave the band:
reaching diagonal excursion d beyond the [min(0,kend), max(0,kend)]
corridor costs >= d*(GAP_I+GAP_D), so a pair with banded score s is exact
when |kend| + s//(GAP_I+GAP_D) + 1 <= C.  Pairs failing that (or the
flat-tape aliasing / int16-wrap / chain-depth conditions) are flagged
needs_fallback and re-run by the caller on the exact path — on
launcher-derived configs (MAX_SCORE = ceil(e*l*max(x, 2g))) real data
virtually never flags.

Reference semantics preserved (as in ops/nw_xla.py):
  * flat-tape aliasing: for plen == tlen+1 pairs the column-0 chain
    cell(h-1, plen) bootstraps from the aliased boundary slot and equals
    the CLEAN h*GAP_I by induction (see the col0 comment; pairs whose
    chain induction could break in the influence region are flagged).
  * traceback priority D -> I -> diag, 'X' iff equality with diag +
    MISMATCH (ref: nw.c:76-94); trailing I/D tails (nw.c:100-106).
  * int16 cells (NW_W16): configs whose cells could exceed int16 keep the
    per-row overflow check; the check is elided at trace time when
    (2R+2)*max(gi,gd,x) fits int16 (then no cell can wrap).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aim_tpu.config import AlignConfig
from aim_tpu.ops.band import (ctz32 as _ctz32, group_reduce_max,
                              group_reduce_sum, round_up)

I32 = jnp.int32
I16 = jnp.int16
F32 = jnp.float32
INF = 2 ** 20   # in-band "+infinity"; must stay <= 2**24 (PERFNOTES.md §1)
INT16_MAX = 32767

OP_M, OP_X, OP_I, OP_D = 0, 1, 2, 3
# direction codes (shared with ops/nw_xla.py and the native walker)
C_D, C_I, C_M, C_X = 0, 1, 2, 3

FLAG_FALLBACK = 1


def band_geometry(cfg: AlignConfig):
    """(C, L, G, NRL): band half-width, segment lanes, pairs per row,
    record lanes.

    Picks the SMALLEST power-of-two segment whose band and record
    capacity PROVABLY cover every score <= MAX_SCORE pair of the config
    (round-3: lane occupancy was the NW/SWG kernels' main throughput
    loss — the canonical l=100 configs fit L=16, doubling pairs/tile):
      * a pair with score s has diagonal skew |kend| <= s // min-indel
        cost and band excursion dmax, so C >= skew + dmax + 1 never
        band-flags it;
      * its CIGAR has at most 2*(s // min-op-cost) + 3 merged runs
        (every run alternation burns one non-free op), so capacity
        NRL - 2 >= that never capacity-flags it.
    Pairs beyond MAX_SCORE may flag and fall back — same contract as the
    reference launchers' MAX_SCORE sizing (ref: run-nw-pim-wram.py)."""
    smax = cfg.max_score
    if cfg.algo == "swg":
        # one k-unit of skew needs an unmatched indel: cheapest GO+k*GE
        skew = max(0, smax - cfg.gap_o) // cfg.gap_e + 1
        dmax = max(0, smax - 2 * cfg.gap_o) // (2 * cfg.gap_e) + 1
        mincost = max(1, min(cfg.mismatch, cfg.gap_o + cfg.gap_e))
    else:
        skew = smax // max(1, min(cfg.gap_i, cfg.gap_d))
        dmax = smax // max(1, cfg.gap_i + cfg.gap_d)
        mincost = max(1, min(cfg.mismatch, cfg.gap_i, cfg.gap_d))
    need_c = min(dmax + skew + 1, smax + 2, 62)
    need_runs = min(2 * (smax // mincost) + 5, 2 * smax + 6)
    for L in (8, 16, 32, 64, 128):
        C = min(smax + 2, (L - 1) // 2, 62)
        NRL = min(L, round_up(2 * smax + 8, 8))
        if C >= need_c and NRL - 2 >= need_runs:
            return C, L, 128 // L, NRL
    return min(smax + 2, 62), 128, 1, min(128, round_up(2 * smax + 8, 8))


def band_half(cfg: AlignConfig) -> int:
    return band_geometry(cfg)[0]


def runs_lanes_nw(cfg: AlignConfig) -> int:
    """Packed record lanes: lane0 = rc | flags<<8, lane1 = score, runs in
    [2, NRL) (capacity argument: band_geometry)."""
    return band_geometry(cfg)[3]


def vmem_tier_hbm_per_pair(cfg: AlignConfig) -> int:
    """Per-pair HBM footprint of this tier's dispatch, for
    api._memory_batch_cap: the banded mismatch-bitplane input
    (_mismatch_bitplanes, 512*W32/G bytes landed) plus its padded i32
    build plane (4*32*W32*L — the largest intermediate XLA could
    materialize if it does not fuse the shift-sum), the packed
    sequences, and the runs record."""
    R = cfg.read_size
    _, L, G, _ = band_geometry(cfg)
    W32 = (R + 31) // 32
    return 4 * 32 * W32 * L + 512 * W32 // G + 4 * R + 512


def group_geom(cfg: AlignConfig):
    _, L, G, _ = band_geometry(cfg)
    return L, G


def scan_rounds(cfg: AlignConfig, chain_cost: int) -> int:
    """Deletion-scan rounds: depth 2^r - 1 must cover the deepest in-row
    chain a <=MAX_SCORE path can fund (chain_cost per link); capped at
    the full-band log2 (the exactness flag re-checks with the pair's real
    score, so MAX_SCORE here is only a sizing hint)."""
    L, _ = group_geom(cfg)
    need = min(cfg.max_score // max(chain_cost, 1) + 1, L - 1)
    r = 0
    while (1 << r) - 1 < need:
        r += 1
    return r


def _nw_kernel(cfg: AlignConfig, P: int, NRL: int, C: int, L: int, G: int,
               W32: int, Q16: int, DS: int, check_ovf: bool,
               mm_ref, plens_ref, tlens_ref,
               runs_ref, cbits_ref, ism_ref):
    R = cfg.read_size
    gi, gd, x = cfg.gap_i, cfg.gap_d, cfg.mismatch
    B = 2 * C + 1

    lane = jax.lax.broadcasted_iota(I32, (P, 128), 1)
    b_iota = lane & (L - 1)              # within-group band position
    g_iota = lane >> (L.bit_length() - 1)  # group index of each lane
    in_band = b_iota < B

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

    ramp = b_iota * gd
    hitmask = (b_iota == kend + C) & in_band
    upper = jnp.minimum(plens, tlens + C)  # v <= plens, v - h <= C

    def sl1(w, fill):
        r = pltpu.roll(w, 1, 1)
        return jnp.where(b_iota >= 1, r, fill)

    def sr1(w, fill):
        r = pltpu.roll(w, 127, 1)
        return jnp.where(b_iota <= L - 2, r, fill)

    # ---------------- forward (one fori iteration per text row) --------
    # rows past the tile's longest text are dead — dynamic loop bound
    # (the walk only reads rows <= tlens, and the h == hmax stores flush
    # the partial code words)
    hmax = jnp.minimum(jnp.max(tlens), R)

    def fwd_body(i, carry):
        prev, score_acc, ovf_acc, cacc, iacc = carry
        h = i + 1
        # banded mismatch cost from the precomputed bitplanes
        sub = ((mm_ref[(h - 1) >> 5] >> ((h - 1) & 31)) & 1) * x
        v = b_iota + (h - C)
        valid = (v >= 1) & (v <= upper) & in_band
        insv = sr1(prev, INF) + gi           # shared with ins_eq below
        diav = prev + sub
        indep = jnp.minimum(insv, diav)
        # column-0 boundary: v=0 at b = C - h (in-band for h <= C).
        # For ALIASED pairs (plen == tlen+1) the flat-tape chain
        # cell(h-1, plen) bootstraps from the aliased h-boundary slot and
        # reproduces EXACTLY the clean h*GAP_I by induction (the
        # insertion term h*gi stays below dia/dl ~ (plen-h)*gd while the
        # bad_alias guard below holds), so clean and aliased share one
        # closed form.
        z = jnp.where(valid, indep, INF)
        z = jnp.where((v == 0) & in_band, h * gi, z)
        # truncated min-plus deletion chain (depth 2^DSR - 1 = DS;
        # exactness flagged via score//gd > DS below)
        mscan = z - ramp
        s_ = 1
        while s_ <= DS:
            rolled = pltpu.roll(mscan, s_, 1)
            mscan = jnp.minimum(mscan,
                                jnp.where(b_iota >= s_, rolled, INF))
            s_ *= 2
        cur = mscan + ramp
        cur = jnp.where(valid | ((v == 0) & in_band), cur, INF)

        if check_ovf:
            live = valid & (h <= tlens)
            ovf_acc = jnp.maximum(
                ovf_acc, (live & (jnp.abs(cur) > INT16_MAX)).astype(I32))

        if cfg.backtrace:
            # direction codes (priority D -> I -> diag/X; nw_xla parity).
            # Dead lanes read INF and can never satisfy an equality (all
            # costs > 0), so they fall through to C_M — safe for the
            # D-run scan, which must see non-D outside the band.
            del_eq = cur == sl1(cur, INF) + gd
            ins_eq = cur == insv
            x_eq = cur == prev + x
            code = jnp.where(del_eq, C_D,
                             jnp.where(ins_eq, C_I,
                                       jnp.where(x_eq, C_X, C_M)))

            # pack 16 codes per i32 (ascending by row), 1 is-match bit
            # per row DESCENDING within each 32-row word (so a downward
            # match-run scan becomes a ctz on the inverted shifted word)
            shc = 2 * ((h - 1) & 15)
            cacc = jnp.where((h & 15) == 1, code << shc,
                             cacc | (code << shc))
            ismb = (code == C_M).astype(I32)
            shi = 31 - ((h - 1) & 31)
            iacc = jnp.where((h & 31) == 1, ismb << shi,
                             iacc | (ismb << shi))

            @pl.when(((h & 15) == 0) | (h == hmax))
            def _():
                cbits_ref[(h - 1) >> 4] = cacc

            @pl.when(((h & 31) == 0) | (h == hmax))
            def _():
                ism_ref[(h - 1) >> 5] = iacc

        hit = hitmask & (h == tlens)
        score_acc = jnp.where(hit, cur, score_acc)
        return cur, score_acc, ovf_acc, cacc, iacc

    zero = jnp.zeros((P, 128), I32)
    _, score_acc, ovf_acc, _, _ = jax.lax.fori_loop(
        0, hmax, fwd_body, (row0, zero, zero, zero, zero))
    # broadcast per-pair results to every lane of the pair's segment
    score = group_reduce_sum(score_acc, b_iota, L)
    overflow = group_reduce_max(ovf_acc, b_iota, L) > 0
    score = jnp.where((plens == 0) | (tlens == 0), 0, score)

    # ---- band-exactness conditions -> needs_fallback flag ----
    dmax = score // (gi + gd)
    bad_band = (jnp.abs(kend) + dmax + 1) > C
    # Aliased chain-induction validity (see col0 above): h*gi must stay
    # dominant for every row h in the influence region Hs.
    hs = C + dmax + 3
    bad_alias = aliased & (hs * gi > (plens - hs) * gd)
    # truncated deletion scan: exact only while no walk-visited chain is
    # deeper than DS (each link costs gd)
    bad_chain = (score // gd) > DS
    flag = multi_alias | bad_band | bad_alias | overflow | bad_chain
    flag = flag | (plens > tlens + C) | (tlens > plens + C)

    # ======================= on-device traceback =======================
    # Event-driven walk: per iteration every active pair consumes one
    # D-run plus one row-exit event (I, X, or a whole M-run).  Per-pair
    # reads of the shared code/is-match words use select ladders over the
    # word planes plus one within-vreg lane gather.

    def seg_at(arr, pos):
        """arr value at group-local band position pos, broadcast to the
        whole segment (Mosaic take_along_axis at exactly 128 lanes).
        Out-of-range pos is clipped; every caller masks such lanes."""
        idx = g_iota * L + jnp.clip(pos, 0, L - 1)
        return jnp.take_along_axis(arr, idx, axis=1)

    def emit_merge(st, mask, op, length):
        """Append/merge a run.  The top-of-stack run lives in registers
        (top_op/top_len, group-broadcast); the plane only receives a run
        when the NEXT one is pushed (plus a final flush)."""
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
        def ladder(ref, nq, qvec):
            out = jnp.zeros((P, 128), I32)
            for q in range(nq):
                out = jnp.where(qvec == q, ref[q], out)
            return out

        def bt_cond(st):
            it, hcur, vcur = st[0], st[1], st[2]
            return (it < 2 * R + 2) & \
                (jnp.max(((hcur > 0) & (vcur > 0)).astype(I32)) > 0)

        def bt_body(st):
            it, hcur, vcur, runs, rc, top_op, top_len = st
            act = (hcur > 0) & (vcur > 0)
            hm1 = jnp.maximum(hcur - 1, 0)
            # this pair's code row (16 codes per word)
            crow = (ladder(cbits_ref, Q16, hm1 >> 4)
                    >> (2 * (hm1 & 15))) & 3
            # D-run: pm[b] = last band position <= b whose code != D
            nd = jnp.where(crow != C_D, b_iota, -1)
            pm = nd
            s_ = 1
            while s_ <= DS:
                rolled = pltpu.roll(pm, s_, 1)
                pm = jnp.maximum(pm, jnp.where(b_iota >= s_, rolled, -1))
                s_ *= 2
            b = vcur - hcur + C
            pm_b = seg_at(pm, b)
            dlen = jnp.where(act, jnp.minimum(b - pm_b, vcur), 0)
            st2 = emit_merge((runs, rc, top_op, top_len), act, OP_D, dlen)
            vcur = vcur - dlen
            act2 = act & (vcur > 0)
            b2 = vcur - hcur + C
            code2 = seg_at(crow, b2)
            is_i = act2 & (code2 == C_I)
            is_x = act2 & (code2 == C_X)
            is_m = act2 & (code2 == C_M)
            # match-run length: consecutive M codes down from hcur at the
            # (constant) band position b2, read from the descending-packed
            # is-match word; runs crossing the 32-row word boundary simply
            # continue (and merge) next iteration
            pos = hm1 & 31
            iw = seg_at(ladder(ism_ref, W32, hm1 >> 5), b2)
            u = (~(iw >> (31 - pos))) & \
                jnp.where(pos == 31, -1, (1 << (pos + 1)) - 1)
            mrun = jnp.where(u == 0, pos + 1, _ctz32(u))
            mrun = jnp.where(is_m,
                             jnp.minimum(mrun, jnp.minimum(vcur, hcur)), 0)
            one = jnp.ones((P, 128), I32)
            op_sel = jnp.where(is_i, OP_I, jnp.where(is_m, OP_M, OP_X))
            length = jnp.where(is_m, mrun, one)
            runs, rc, top_op, top_len = emit_merge(
                st2, is_i | is_m | is_x, op_sel, length)
            hcur = hcur - jnp.where(is_i | is_x, 1, mrun)
            vcur = vcur - jnp.where(is_x, 1, mrun)
            return (it + 1, hcur, vcur, runs, rc, top_op, top_len)

        runs0 = jnp.zeros((P, 128), I32)
        rc0 = jnp.full((P, 128), NRL - 1, I32)
        it_end, hcur, vcur, runs, rc, top_op, top_len = jax.lax.while_loop(
            bt_cond, bt_body,
            (jnp.int32(0), tlens, plens, runs0, rc0, zero, zero))
        # tails (ref: nw.c:100-106): I x h, then D x v (only one nonzero
        # for unflagged pairs; the iteration cap marks stragglers)
        flag = flag | ((hcur > 0) & (vcur > 0))
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


def _mismatch_bitplanes(pats, txts, R, C, L, G, P, T):
    """XLA prologue: banded mismatch bitplanes for the grouped layout.

    Returns [T, W32, P, 128] i32 where bit j of word w at (row r, lane
    g*L + b) = (pat[b-C+h-1] != txt[h-1]) for pair (t, g*P + r) at
    h = 32*w + j + 1.  Pure static slices + shifts — XLA fuses this into
    the upload epilogue; the kernel then reads ONE word per row."""
    n = pats.shape[0]
    B = 2 * C + 1
    W32 = (R + 31) // 32
    if pats.shape[1] < R:
        pats = jnp.pad(pats, ((0, 0), (0, R - pats.shape[1])))
        txts = jnp.pad(txts, ((0, 0), (0, R - txts.shape[1])))
    # pattern index for cell (h, b) is b - C + h - 1; with a C-wide left
    # pad, column b + h - 1 of patp reads exactly that (OOB -> -1)
    patp = jnp.pad(pats.astype(I32), ((0, 0), (C, B)),
                   constant_values=-1)
    txtc = txts.astype(I32)[:, :R]
    cols = [(patp[:, b:b + R] != txtc) for b in range(B)]
    mm = jnp.stack(cols, axis=2)                     # [n, R, B]
    mm = jnp.pad(mm, ((0, 0), (0, W32 * 32 - R), (0, L - B)))
    mm = mm.astype(I32).reshape(n, W32, 32, L)
    mm = (mm << jnp.arange(32, dtype=I32)[None, None, :, None]).sum(axis=2)
    mm = mm.reshape(T, G, P, W32, L).transpose(0, 3, 2, 1, 4)
    return mm.reshape(T, W32, P, 128)


def _mismatch_bitplanes_packed(pk_pats, pk_txts, R, C, L, G, P, T):
    """Packed-domain twin of _mismatch_bitplanes: inputs are 2-bit
    packed (ops/common.pack_seqs, 4 bases/byte), compared 16 bases per
    i32 word via shifted-XOR + even-bit compaction — no device-side
    unpack (whose computed-operand fusion cost a measured +0.023-0.028
    us/pair on the NW/SWG marginals, round-4/5 A/B), and the column
    stack/transpose runs on W32 packed words instead of R bools.

    Semantics equal the raw builder wherever the kernel can look:
      * out-of-range pattern indices (p_idx < 0 or >= R), which the raw
        builder forces to mismatch via its -1 pad, are forced by STATIC
        per-column masks here (the affected h bits are a per-column
        constant count at each end);
      * pad-vs-real comparisons inside [plen, R) may differ (the 2-bit
        recode can alias the zero pad with symbol 0), but those cells
        are invisible: the kernels' valid masks exclude v > plens, and
        the walk's match-run scan is capped at min(vcur, hcur) before
        any such bit is consumed (same argument that already covers the
        raw builder's pad-vs-pad matches).
    """
    n = pk_pats.shape[0]
    B = 2 * C + 1
    W32 = (R + 31) // 32
    Wq = (R + 15) // 16          # 16-base i32 words covering h < R
    NQ = C // 16 + 1             # left pad words (p_idx down to -C)

    def words32(pk, left_pad, right_need):
        """[n, bytes] u8 (4 bases/byte) -> [n, words] i32, 16 bases/word,
        base 16m+j at bits 2j; zero-padded both sides."""
        nb = pk.shape[1]
        need_b = 4 * (left_pad + right_need)
        width = 4 * left_pad + nb
        target = -(-max(width, need_b) // 4) * 4   # multiple of 4 bytes
        pkp = jnp.pad(pk, ((0, 0), (4 * left_pad, target - width)))
        w = pkp[:, 0::4].astype(I32)
        w = w | (pkp[:, 1::4].astype(I32) << 8)
        w = w | (pkp[:, 2::4].astype(I32) << 16)
        w = w | (pkp[:, 3::4].astype(I32) << 24)
        return w

    # pattern words padded so column slices [NQ+q16, NQ+q16+Wq+1) exist
    # for q16 in [-NQ, (B-1-C)//16]; +1 for the funnel's next word
    PW = words32(pk_pats, NQ, NQ + Wq + (B - 1 - C) // 16 + 2)
    TW = words32(pk_txts, 0, Wq)[:, :Wq]

    # static per-column force masks (i32 per h-word), precomputed host-side
    import numpy as np
    force1 = np.zeros((B, Wq), np.int64)
    keep = np.zeros((B, Wq), np.int64)
    hio = np.arange(16)
    for b in range(B):
        lo = max(0, C - b)            # h-1 < lo  -> p_idx < 0 -> mismatch
        hi = R - max(0, b - C)        # h-1 >= hi -> p_idx >= R -> mismatch
        for m in range(Wq):
            hm = 16 * m + hio
            f1 = (hm < lo) | (hm >= hi)
            k0 = hm < R               # bits beyond R stay 0 (raw pads 0)
            force1[b, m] = int(((f1 & k0).astype(np.int64)
                                << hio).sum())
            keep[b, m] = int((k0.astype(np.int64) << hio).sum())

    M5, M3, MF, MFF, MFFFF = 0x55555555, 0x33333333, 0x0F0F0F0F, \
        0x00FF00FF, 0x0000FFFF

    cols = []
    for b in range(B):
        d = b - C
        q16, s = d // 16, d % 16      # python floor-div/mod: 0 <= s < 16
        pw = PW[:, NQ + q16:NQ + q16 + Wq + 1]
        if s:
            # int32 >> is arithmetic: mask off the sign-extension of
            # words whose base-15 code sets bit 31
            pal = (((pw[:, :Wq] >> (2 * s)) & ((1 << (32 - 2 * s)) - 1))
                   | (pw[:, 1:Wq + 1] << (32 - 2 * s)))
        else:
            pal = pw[:, :Wq]
        xw = pal ^ TW
        t = (xw | (xw >> 1)) & M5     # per-base mismatch at even bits
        t = (t | (t >> 1)) & M3
        t = (t | (t >> 2)) & MF
        t = (t | (t >> 4)) & MFF
        t = (t | (t >> 8)) & MFFFF    # compacted: bit j = base 16m+j
        f1 = jnp.asarray(force1[b].astype(np.int32))[None, :]
        kp = jnp.asarray(keep[b].astype(np.int32))[None, :]
        t = (t | f1) & kp
        cols.append(t)
    mm16 = jnp.stack(cols, axis=2)                   # [n, Wq, B]
    if Wq % 2:
        mm16 = jnp.pad(mm16, ((0, 0), (0, 1), (0, 0)))
    mm16 = mm16.reshape(n, (Wq + 1) // 2, 2, B)
    mm = mm16[:, :, 0, :] | (mm16[:, :, 1, :] << 16)  # [n, W32, B]
    mm = jnp.pad(mm, ((0, 0), (0, W32 - mm.shape[1]), (0, L - B)))
    mm = mm.reshape(T, G, P, W32, L).transpose(0, 3, 2, 1, 4)
    return mm.reshape(T, W32, P, 128)


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
    NRL = runs_lanes_nw(cfg)
    P = 128
    L, G = group_geom(cfg)
    PT = P * G          # pairs per tile (G pairs share each lane row)
    W32 = (R + 31) // 32
    Q16 = (R + 15) // 16
    DS = (1 << scan_rounds(cfg, cfg.gap_d)) - 1
    # int16-wrap fidelity (NW_W16): no cell can exceed (2R+2)*maxcost,
    # so the per-row check is elided when that bound fits int16
    check_ovf = (2 * R + 2) * max(cfg.gap_i, cfg.gap_d, cfg.mismatch) \
        > INT16_MAX

    n_orig = n
    if n % PT:
        padn = round_up(n, PT) - n
        pats = jnp.pad(pats, ((0, padn), (0, 0)))
        txts = jnp.pad(txts, ((0, padn), (0, 0)))
        plens = jnp.pad(plens, (0, padn))
        tlens = jnp.pad(tlens, (0, padn))
        n += padn

    T = n // PT
    # packed inputs feed the packed-domain builder directly — no
    # device-side unpack (its computed-operand fusion cost a measured
    # +0.023 us/pair on this marginal)
    mm = (_mismatch_bitplanes_packed if packed
          else _mismatch_bitplanes)(pats, txts, R, C, L, G, P, T)

    kernel = functools.partial(_nw_kernel, cfg, P, NRL, C, L, G,
                               W32, Q16, DS, check_ovf)
    runs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((None, W32, P, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PT, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PT, NRL), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, NRL), I16),
        scratch_shapes=[
            # direction codes (16 per word) and descending is-match bits;
            # dummy single planes in score-only mode — never written
            pltpu.VMEM((Q16 if cfg.backtrace else 1, P, 128), I32),
            pltpu.VMEM((W32 if cfg.backtrace else 1, P, 128), I32),
        ],
        interpret=interpret,
    )(mm, plens.astype(I32).reshape(n, 1), tlens.astype(I32).reshape(n, 1))
    return {"packed_runs": runs[:n_orig]}


def vmem_fit_nw(cfg: AlignConfig) -> bool:
    """Codes (16/word) + is-match (32/word) + mismatch bitplanes are the
    dominant VMEM users; 2 MB slack for block buffers + the kernel body's
    spill stack.  Covers the reference's long-read tier (NW-MRAM default
    READ_SIZE 1120, ref: NW/DPU-MRAM/common/common.h:84)."""
    R = cfg.read_size
    plane = 128 * 128 * 4
    need = ((R + 15) // 16 + 2 * ((R + 31) // 32)) * plane
    return (need + 4 * 1024 * 1024 < 16 * 1024 * 1024
            and R <= 2047 and band_half(cfg) >= 2)

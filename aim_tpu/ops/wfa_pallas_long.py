"""WFA / WFA-adaptive — Pallas TPU long-read kernel (HBM-spill tier).

The TPU analogue of the reference's DPU-MRAM WFA variant: alignment state
no longer fits the scratchpad, so each completed score's wavefronts are
serialized to big memory and the (three) predecessor scores are re-read
per iteration (ref: WFA/DPU-MRAM/dpu/wfa.c:356-407,
dpu_allocator_mram.c:128-347).  Here:

  * wavefront rows live in a small VMEM ring (the last max(x, o+e)+1
    scores — exactly the predecessor window) and every completed row is
    async-DMA'd to an HBM history buffer (a pl.ANY output reused across
    grid steps), replacing the reference's 2048-byte chunked MRAM stores;
  * the backtrace walks score levels descending and double-buffers the
    five history rows each level needs back from HBM, replacing the
    reference's per-step MRAM reloads (wfa_backtracing.c:262-265);
  * the extend stage needs no O(K*R) table at all (the round-1 blocker):
    sequences stay resident in VMEM as 14-base 2-bit-packed words
    (28-bit values — this runtime degrades on materialized int32 buffers
    holding values >= ~2^29, PERFNOTES.md §1).  Each 128-lane k-chunk
    runs its own while-loop of _CW-word scan rounds: per round it
    fetches the text words raw and the pattern words through a
    lane-constant funnel shift onto the text word grid (the paired
    pattern base of text base t on diagonal k is t - k), XORs, and
    advances each lane to its first mismatch; a chunk's loop continues
    only while one of its lanes matched a full window.  Chunk/block
    ranges are bounded per step by the live [klo, khi] band and offset
    window, so WFA-adaptive's reduced band keeps the gather count
    proportional to live work.

Layout: pairs in SUBLANES (P=64 rows), diagonals in LANES (Kp =
roundup(2*smax+1, 128)) — the transpose of ops/wfa_pallas2.py, because
the per-lane gather hardware indexes along lanes and the gather source
(the pair's sequence words) must therefore be lane-addressed per pair
row.  Outputs use the same step-record encoding as v2 (rows 0..smax =
levels, +1/+2 final strokes, +3 scores; native.wfa_steps_to_ops).
Semantics (reference quirks included) are identical to ops/wfa_pallas2.py
and the native oracle.
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
BIG = 2 ** 20

OP_M, OP_X, OP_I, OP_D = 0, 1, 2, 3
_ABLATE = set()  # dev-only stage kill-switches (tools/dev_long_ablate.py)
# Extend scan-window words per round.  TPU-tuned (tools/dev_cw_sweep.py,
# round 4): the chunk while-loop rides the MAX match run over P*128
# lanes (~5.3 rounds/step at l=10 kbp with CW=8, tools/dev_long_diag.py),
# so the per-round fixed cost (scalar-sync reductions + loop overhead)
# matters; 8 words = 112 bases/round halves the rounds: ~90 vs ~110
# us/pair steady-state against 4 words at l=10 kbp (62 best-observed;
# CW=10 measured equal to 8 in an interleaved A/B; records bit-identical
# at CW in 4..12 — CW is purely a performance knob).  Two measured-WORSE
# variants, kept OUT (round-4/5 negative results):
#   * scalar-ratchet (no per-round window reductions): shrinking windows
#     as lanes finish saves more gather blocks than the reductions cost;
#   * escalating tail schedule (round 1 at CW, continuation rounds at
#     2*CW, round-5): 3.6x WORSE at 10 kbp (325 vs 85 us/pair, compile
#     12 s -> 39 s) — the 2*CWT+1 live gather planes blow Mosaic's
#     register budget, and even a flat unrolled-round-1 + while variant
#     (identical schedule, body traced twice) measured 205 us/pair.
#     The while-only single-width body is load-bearing.
_CW = 8
WB = 14         # bases per packed word, 2-bit mode (28 bits: relay-safe)
WB_BYTES = 3    # bases per word, byte mode (24 bits — arbitrary alphabets;
#                 the reference kernels compare raw bytes everywhere,
#                 ref: WFA/DPU-MRAM/dpu/wfa.c:193-215)
MASK28 = (1 << 28) - 1


def record_cols(smax: int) -> int:
    return _round_up(smax + 4, 128)


def _wb_of(bytes_mode: bool) -> tuple:
    """(bases per word, bits per base) for the two extend word layouts."""
    return (WB_BYTES, 8) if bytes_mode else (WB, 2)


def _div_wb(x, wb=WB):
    """floor(x / wb) for 0 <= x < ~2^15 via exact-enough f32 multiply
    (the +0.5 nudge keeps the product away from integers; the f32
    relative error ~1e-7 cannot cross the 0.5/wb gap)."""
    q = jnp.floor((x.astype(F32) + 0.5) * (1.0 / wb)).astype(I32)
    return q


def _wfa_long_kernel(cfg: AlignConfig, P: int, Kp: int, Wp: int, SRp: int,
                     WRM: int, WRE: int, bytes_mode: bool,
                     patw_ref, txtw_ref, lens_ref,
                     recs_ref, hist_ref,
                     ring_m, ring_i, ring_d, btb_ref, side_ref,
                     semm, semie, semb):
    smax = cfg.max_score
    R = cfg.read_size
    x, go, ge = cfg.mismatch, cfg.gap_o, cfg.gap_e
    NB = Wp // 128
    NC = Kp // 128
    # Extend word layout: wb bases per word, bpb bits per base (2-bit
    # packed DNA or raw bytes — identical machinery, different widths).
    wb, bpb = _wb_of(bytes_mode)
    bsh = bpb.bit_length() - 1          # log2(bpb): bit index -> base index
    wbits = bpb * wb                    # payload bits per word (28 / 24)
    wmask = (1 << wbits) - 1

    plens = lens_ref[:, 0:1]                # [P, 1]
    tlens = lens_ref[:, 1:2]
    ak = tlens - plens
    kio = jax.lax.broadcasted_iota(I32, (P, Kp), 1)
    kvec = kio - smax
    lane_valid = kvec <= smax

    nullk = jnp.full((P, Kp), NULL, I16)

    def ctz28(z):
        """Count trailing zeros of z in (0, 2^wbits); wbits for z == 0."""
        lsb = (z & (0 - z)).astype(F32)
        e = (jax.lax.bitcast_convert_type(lsb, I32) >> 23) - 127
        return jnp.where(z != 0, e, wbits)

    lio128 = jax.lax.broadcasted_iota(I32, (P, 128), 1)

    def gather_chunk(seq_ref, q0c, nwords, b_lo, b_hi):
        """Per-lane word fetch for ONE k-chunk: out[d][p, j] =
        seq[p, q0c[p, j] + d], offsets clamped to [0, Wp).  Word blocks
        outside the scalar [b_lo, b_hi] window are skipped — the analogue
        of the reference's band-proportional MRAM traffic.  The low clamp
        matters: pattern word indices go negative for k > 14*q_text; the
        clamped fetch only feeds bits that the caller masks out (they map
        to pattern bases < 0, which sit behind the current offset)."""
        idx = [jnp.clip(q0c + d, 0, Wp - 1) for d in range(nwords)]
        bsel = [ix >> 7 for ix in idx]
        r = [ix & 127 for ix in idx]

        def one_block(b, accs):
            blkref = seq_ref[:, 128 * b:128 * (b + 1)]
            if "gather" in _ABLATE:  # dev ablation: index math minus gather
                return tuple(acc + jnp.where(bsel[d] == b, r[d], 0)
                             for d, acc in enumerate(accs))
            return tuple(
                acc + jnp.where(bsel[d] == b,
                                jnp.take_along_axis(blkref, r[d], axis=1),
                                0)
                for d, acc in enumerate(accs))

        accs = tuple(jnp.zeros((P, 128), I32) for _ in range(nwords))
        for b in range(NB):
            accs = jax.lax.cond((b >= b_lo) & (b <= b_hi),
                                functools.partial(one_block, b),
                                lambda a: a, accs)
        return list(accs)

    CW = _CW  # scan window: CW words = wb*CW bases per round
    C0 = smax // wb + 1  # offset making wb*C0 - k >= 0 for all diagonals

    def extend(slot_m, act_nm, kl, kh, c_lo, c_hi, any_act):
        """First-mismatch extension of offsets m on each live diagonal
        (ref: wfa.c:193-215), as one while-loop of CW-word scan rounds
        PER 128-lane k-chunk (no cross-chunk lockstep state: the old
        global round loop rebuilt four full-Kp planes per round).

        One-sided alignment: only the PATTERN stream is funnel-shifted,
        onto the text word grid.  The shift is lane-constant — the paired
        pattern base of text base t on diagonal k is t - k, so the word
        offset is floor(-k/14) and the bit shift 2*((-k) mod 14) — which
        halves the per-word funnel work and lets the text words be
        compared raw.  Bits behind the current offset are masked in the
        first word; they are guaranteed matches on this diagonal anyway
        (extension is contiguous; X steps consume their mismatch), and
        the mask also covers clamped fetches of pattern words < 0.
        After the first round every continuing lane is word-aligned
        (sh2 == 0) and the last pattern word seeds the next round.

        Chunks are static Python slices gated by lax.cond on occupancy;
        kv/do_c stay chunk-local — slicing sublane-replicated broadcast
        iotas inside scf.while SIGABRTs Mosaic's layout pass."""

        def chunk_body(c, st):
            mc, cont_i, pwl, nr = st
            act = cont_i > 0
            # lane constants rebuilt per round from the iota — capturing
            # computed sublane-replicated planes into scf.while risks the
            # Mosaic layout-pass aborts documented above
            kv = lio128 + (128 * c - smax)
            u = wb * C0 - kv
            nq = _div_wb(u, wb)
            qoff = nq - C0
            shp = bpb * (u - wb * nq)
            pmask = (1 << shp) - 1
            mcc = jnp.clip(mc, 0, R + 1)
            qt = _div_wb(mcc, wb)
            sh2 = bpb * (mcc - wb * qt)
            qp = qt + qoff
            t_lo = jnp.min(jnp.where(act, qt, BIG))
            t_hi = jnp.max(jnp.where(act, qt, -BIG)) + CW - 1
            # pattern window derived from the text window: qoff is
            # lane-constant with a STATIC per-chunk range, so the p
            # reductions (one scalar-sync group per round) are free.
            # Superset windows only widen block fetches; fetched words
            # for non-active lanes are masked, records unchanged.
            kv_lo, kv_hi = 128 * c - smax, 128 * c - smax + 127
            qo_min = (-kv_hi) // wb   # python // floors: == floor(-kv/wb)
            qo_max = (-kv_lo) // wb
            p_lo = t_lo + qo_min + 1
            p_hi = (t_hi - (CW - 1)) + qo_max + CW
            tws = gather_chunk(txtw_ref, qt, CW,
                               jnp.clip(t_lo >> 7, 0, NB - 1),
                               jnp.clip(t_hi >> 7, 0, NB - 1))
            pws = [pwl] + gather_chunk(patw_ref, qp + 1, CW,
                                       jnp.clip(p_lo >> 7, 0, NB - 1),
                                       jnp.clip(p_hi >> 7, 0, NB - 1))
            # one ctz on the first nonzero word (selection chain only)
            zsel = jnp.zeros((P, 128), I32)
            base = jnp.full((P, 128), CW, I32)
            for d in range(CW - 1, -1, -1):
                pal = ((pws[d] >> shp)
                       | ((pws[d + 1] & pmask) << (wbits - shp))) & wmask
                z = tws[d] ^ pal
                if d == 0:
                    z = z & ~((1 << sh2) - 1)
                nz = z != 0
                zsel = jnp.where(nz, z, zsel)
                base = jnp.where(nz, d, base)
            shh = sh2 >> bsh
            cov = wb * CW - shh
            jm = jnp.where(base < CW,
                           wb * base + (ctz28(zsel) >> bsh) - shh, cov)
            lim_raw = jnp.minimum(plens - (mc - kv), tlens - mc)
            j = jnp.minimum(jm, jnp.clip(lim_raw, 0, cov))
            m2 = jnp.where(act, mc + j, mc)
            cont2 = act & (j == cov) & (lim_raw > cov)
            pwl2 = jnp.where(act, pws[CW], pwl)
            return m2, cont2.astype(I32), pwl2, nr + 1

        if "extend_cont" in _ABLATE:   # timing-only: single round, WRONG
            def wcond(st):
                return (jnp.max(st[1]) > 0) & (st[3] < 1)
        else:
            def wcond(st):
                return jnp.max(st[1]) > 0

        def chunk_loop(slot_m, do_c, c):
            sel = slice(128 * c, 128 * (c + 1))
            mc0 = ring_m[slot_m, :, sel].astype(I32)
            kv = lio128 + (128 * c - smax)
            # pattern-alignment constants (lane-fixed): u >= 0 keeps
            # _div_wb in domain; qoff = floor(-kv/wb), shp = bpb*((-kv)%wb)
            u = wb * C0 - kv
            nq = _div_wb(u, wb)
            qoff = nq - C0
            mcc0 = jnp.clip(mc0, 0, R + 1)
            qp0 = _div_wb(mcc0, wb) + qoff
            p_lo = jnp.min(jnp.where(do_c, qp0, BIG))
            p_hi = jnp.max(jnp.where(do_c, qp0, -BIG))
            (pwl0,) = gather_chunk(patw_ref, qp0, 1,
                                   jnp.clip(p_lo >> 7, 0, NB - 1),
                                   jnp.clip(p_hi >> 7, 0, NB - 1))
            m2, _, _, nr = jax.lax.while_loop(
                wcond, functools.partial(chunk_body, c),
                (mc0, do_c.astype(I32), pwl0, jnp.int32(0)))
            # extended offsets land straight in the ring slot (no
            # full-width concat/copy; untouched chunks keep their values)
            ring_m[slot_m, :, sel] = m2.astype(I16)
            return nr

        # Chunk gating by the precomputed scalar band window (the same
        # [c_lo, c_hi] the reduce/exit passes use) — the old per-chunk
        # occupancy check cost a fresh (P,128)->scalar max + cond sync
        # for ALL NC chunks every step.  A windowed chunk with no truly
        # active lane still runs chunk_loop, but its while-loop body
        # never executes (cont starts all-zero) and the ring write-back
        # is an identity, so records are unchanged.
        def ext_chunk(c):
            sel = slice(128 * c, 128 * (c + 1))
            mc0 = ring_m[slot_m, :, sel].astype(I32)
            kv = lio128 + (128 * c - smax)
            do_c = act_nm & (kl <= kv) & (kv <= kh) \
                & (mc0 >= 0) & (mc0 < R + 2)
            return chunk_loop(slot_m, do_c, c)

        nround_tot = jnp.int32(0)
        for c in range(NC):
            if NC == 1:
                nr = ext_chunk(c)
            else:
                nr = jax.lax.cond(
                    any_act & (c >= c_lo) & (c <= c_hi),
                    functools.partial(ext_chunk, c),
                    lambda: jnp.int32(0))
            nround_tot = nround_tot + nr
        return nround_tot

    # ---------------- side (klo/khi/flags) ----------------
    lio8 = jax.lax.broadcasted_iota(I32, (P, 8), 1)

    def side_pack(kl, kh, fl):
        row = jnp.where(lio8 == 0, kl, 0)
        row = jnp.where(lio8 == 1, kh, row)
        return jnp.where(lio8 == 2, fl, row).astype(I16)

    def side_read(s):
        row = side_ref[jnp.maximum(s, 0)].astype(I32)
        neg = s < 0
        kl = jnp.where(neg, 1, row[:, 0:1])
        kh = jnp.where(neg, -1, row[:, 1:2])
        fl = jnp.where(neg, 0, row[:, 2:3])
        return kl, kh, fl

    # ---------------- init: score 0 ----------------
    ring_m[0] = jnp.where(kvec == 0, 0, NULL).astype(I16)
    ring_i[0] = nullk
    ring_d[0] = nullk
    side_ref[0] = side_pack(jnp.zeros((P, 1), I32), jnp.zeros((P, 1), I32),
                            jnp.full((P, 1), 1 | (1 << 2) | (1 << 3), I32))

    # ---------------- forward ----------------
    def fwd_body(state):
        s, active_i, scores, diag = state
        active = active_i > 0
        slot_m1 = jax.lax.rem(s, WRM)
        slot_e1 = jax.lax.rem(s, WRE)
        kl, kh, fl = side_read(s)
        exists = (fl & 1) == 1
        m_null = ~exists | (((fl >> 1) & 1) == 1)

        # Live chunk window of the CURRENT band [kl, kh] (union over
        # non-null pairs), shared by extend and the reduce/exit passes.
        kl_u = jnp.min(jnp.where(m_null, BIG,
                                 jnp.broadcast_to(kl, (P, 128))))
        kh_u = jnp.max(jnp.where(m_null, -BIG,
                                 jnp.broadcast_to(kh, (P, 128))))
        c_lo1 = jnp.clip((kl_u + smax) >> 7, 0, NC - 1)
        c_hi1 = jnp.clip((kh_u + smax) >> 7, 0, NC - 1)
        band_nonempty = kl_u <= kh_u

        # extend masks per chunk internally (active & ~m_null & in-band
        # & offset-in-range) and writes the extended offsets straight
        # back into ring_m[slot_m1]; untouched lanes keep their values
        if "extend" in _ABLATE:
            ext_rounds = jnp.int32(0)
        else:
            ext_rounds = extend(slot_m1, active & ~m_null, kl, kh,
                                c_lo1, c_hi1, band_nonempty)
        # spill score s to the HBM history (post-extend m; i/d unchanged)
        if "spill" not in _ABLATE:
            pltpu.make_async_copy(ring_m.at[slot_m1], hist_ref.at[0, s],
                                  semm.at[slot_m1]).start()
            pltpu.make_async_copy(ring_i.at[slot_e1], hist_ref.at[1, s],
                                  semie.at[slot_e1, 0]).start()
            pltpu.make_async_copy(ring_d.at[slot_e1], hist_ref.at[2, s],
                                  semie.at[slot_e1, 1]).start()

        def chunk_dist(c):
            """Chunk-local (kv, offset, distance-to-go, in-band mask)."""
            kv = lio128 + (128 * c - smax)
            oc = ring_m[slot_m1, :, 128 * c:128 * (c + 1)].astype(I32)
            inr_c = (kl <= kv) & (kv <= kh)
            dist = jnp.maximum(plens - (oc - kv), tlens - oc)
            return kv, oc, inr_c, dist

        def gated(fn, acc):
            out = acc
            for c in range(NC):
                if NC == 1:
                    out = fn(c, out)
                else:
                    out = jax.lax.cond((c >= c_lo1) & (c <= c_hi1),
                                       functools.partial(fn, c),
                                       lambda a: a, out)
            return out

        # pass A: min distance-to-go over the band (adaptive heuristic)
        # and the offset at the arrival diagonal (exit check), fused
        def pass_a(c, acc):
            mind_acc, mak_acc = acc
            kv, oc, inr_c, dist = chunk_dist(c)
            mind_c = jnp.min(jnp.where(inr_c, dist, BIG), axis=1,
                             keepdims=True)
            at_ak_c = (kv == ak) & (kv <= smax)
            mak_c = jnp.sum(jnp.where(at_ak_c, oc, 0), axis=1,
                            keepdims=True)
            return jnp.minimum(mind_acc, mind_c), mak_acc + mak_c

        if "reduce_full" in _ABLATE:   # dev A/B: ungated full-width passes
            def gated(fn, acc):
                for c in range(NC):
                    acc = fn(c, acc)
                return acc

        mind_raw, m_at_ak = gated(pass_a, (jnp.full((P, 1), BIG, I32),
                                           jnp.zeros((P, 1), I32)))

        if cfg.adaptive and "reduce" not in _ABLATE:
            width = kh - kl + 1
            do_red = active & ~m_null & (width >= 10)
            mind = jnp.minimum(mind_raw, jnp.maximum(plens, tlens))
            top_limit = jnp.minimum(ak - 1, kh)

            # pass B: outermost kept diagonals.  lk is a max over the
            # SUPERSET (ak < kv <= kh) of the reference's
            # (bottom_limit < kv <= kh) — extras lie in (ak,
            # bottom_limit], so max(lk, bottom_limit) is unchanged and
            # one pass suffices (bottom_limit depends on the global fk).
            def pass_b(c, acc):
                fk_acc, lk_acc = acc
                kv, oc, inr_c, dist = chunk_dist(c)
                keep = (dist - mind) <= 50
                cand_lo = jnp.where((kv >= kl) & (kv < top_limit) & keep,
                                    kv, BIG)
                cand_hi = jnp.where((kv <= kh) & (kv > ak) & keep,
                                    kv, -BIG)
                return (jnp.minimum(fk_acc,
                                    jnp.min(cand_lo, axis=1,
                                            keepdims=True)),
                        jnp.maximum(lk_acc,
                                    jnp.max(cand_hi, axis=1,
                                            keepdims=True)))

            fk, lk = gated(pass_b, (jnp.full((P, 1), BIG, I32),
                                    jnp.full((P, 1), -BIG, I32)))
            klo_new = jnp.maximum(kl, jnp.minimum(fk, top_limit))
            bottom_limit = jnp.maximum(ak + 1, klo_new)
            khi_new = jnp.minimum(kh, jnp.maximum(lk, bottom_limit))
            nullify = do_red & (klo_new > khi_new)
            shrink = do_red & ~nullify
            kl = jnp.where(shrink, klo_new, kl)
            kh = jnp.where(shrink, khi_new, kh)
            fl = jnp.where(nullify, fl | 0b1110, fl)
            side_ref[s] = side_pack(kl, kh, fl)
            m_null = m_null | nullify

        er = active & ~m_null & (kl <= ak) & (ak <= kh) & (m_at_ak >= tlens)
        scores = jnp.where(er, s, scores)
        active = active & ~er

        # ---- compute score s+1 (ring reads within the window) ----
        s2 = s + 1
        slot2m = jax.lax.rem(s2, WRM)
        slot2e = jax.lax.rem(s2, WRE)
        # a ring slot about to be overwritten must have finished its
        # spill (of score s2 - depth)
        if "spill" not in _ABLATE:
            @pl.when(s2 >= WRM)
            def _():
                pltpu.make_async_copy(
                    ring_m.at[slot2m],
                    hist_ref.at[0, jnp.maximum(s2 - WRM, 0)],
                    semm.at[slot2m]).wait()

            @pl.when(s2 >= WRE)
            def _():
                for c in range(2):
                    pltpu.make_async_copy(
                        (ring_i if c == 0 else ring_d).at[slot2e],
                        hist_ref.at[c + 1, jnp.maximum(s2 - WRE, 0)],
                        semie.at[slot2e, c]).wait()

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

        slot_sub = jax.lax.rem(jnp.maximum(s2 - x, 0), WRM)
        slot_o = jax.lax.rem(jnp.maximum(s2 - go - ge, 0), WRM)
        slot_e = jax.lax.rem(jnp.maximum(s2 - ge, 0), WRE)

        # Scalar chunk bounds of the NEW band [lo, hi] (union over pairs;
        # empty when every pair is allnull) — only those 128-lane chunks
        # get plane work and ring stores this step.  Stale lanes outside
        # a score's stored [klo, khi] band are never consulted: every
        # read below and in extend/backtrace is band-guarded.
        # (reduce over a lane-wide broadcast: Mosaic's layout pass miscompiles
        # reductions of (P, 1) vectors inside scf.while — observed SIGABRT
        # "limits[i] <= dim(i) (8 vs. 1)" in vector_extract_strided_slice)
        lo_u = jnp.min(jnp.where(allnull, BIG,
                                 jnp.broadcast_to(lo, (P, 128))))
        hi_u = jnp.max(jnp.where(allnull, -BIG,
                                 jnp.broadcast_to(hi_, (P, 128))))
        c_lo2 = jnp.clip((lo_u + smax) >> 7, 0, NC - 1)
        c_hi2 = jnp.clip((hi_u + smax) >> 7, 0, NC - 1)

        def compute_chunk(c):
            sel = slice(128 * c, 128 * (c + 1))
            # fresh chunk-local iota — slicing kvec (sublane-replicated
            # layout) inside scf.while SIGABRTs Mosaic's layout pass
            kv = lio128 + (128 * c - smax)
            mw_sub = ring_m[slot_sub, :, sel].astype(I32)
            mw_o = ring_m[slot_o, :, sel].astype(I32)
            iw_e = ring_i[slot_e, :, sel].astype(I32)
            dw_e = ring_d[slot_e, :, sel].astype(I32)
            # halo exchange at the chunk edges: diagonal k-1 of lane 0
            # lives in the left neighbor chunk (global lane 0 reads NULL,
            # as the full-width roll did), k+1 of lane 127 in the right
            nullc = jnp.full((P, 1), NULL, I32)
            mo_l = ring_m[slot_o, :, 128 * c - 1:128 * c] \
                .astype(I32) if c > 0 else nullc
            ie_l = ring_i[slot_e, :, 128 * c - 1:128 * c] \
                .astype(I32) if c > 0 else nullc
            mo_r = ring_m[slot_o, :,
                          128 * (c + 1):128 * (c + 1) + 1] \
                .astype(I32) if c < NC - 1 else nullc
            de_r = ring_d[slot_e, :,
                          128 * (c + 1):128 * (c + 1) + 1] \
                .astype(I32) if c < NC - 1 else nullc

            def sl_c(w, wl):
                return jnp.where(lio128 == 0, wl, pltpu.roll(w, 1, 1))

            def sr_c(w, wr):
                return jnp.where(lio128 == 127, wr, pltpu.roll(w, 127, 1))

            km1 = kv - 1
            kp1 = kv + 1
            ins_g = jnp.where(~m_o_null & (o_lo <= km1) & (km1 <= o_hi),
                              sl_c(mw_o, mo_l), NULL)
            ins_i = jnp.where(~i_e_null & (e_lo <= km1) & (km1 <= e_hi),
                              sl_c(iw_e, ie_l), NULL)
            both_null = (ins_g == NULL) & (ins_i == NULL)
            ins = jnp.where(both_null, NULL, jnp.maximum(ins_g, ins_i) + 1)
            del_g = jnp.where(~m_o_null & (o_lo <= kp1) & (kp1 <= o_hi),
                              sr_c(mw_o, mo_r), NULL)
            del_d = jnp.where(~d_e_null & (e_lo <= kp1) & (kp1 <= e_hi),
                              sr_c(dw_e, de_r), NULL)
            dl = jnp.maximum(del_g, del_d)
            sub = jnp.where((sub_lo <= kv) & (kv <= sub_hi),
                            mw_sub + 1, NULL)
            ins_m = jnp.where(i_out_null, -10, ins)
            del_m = jnp.where(d_out_null, -10, dl)
            sub_m = jnp.where(m_sub_null, -10, sub)
            m_new = jnp.maximum(del_m, jnp.maximum(sub_m, ins_m))

            inr_new = (lo <= kv) & (kv <= hi_)
            write = ~allnull & inr_new
            ring_m[slot2m, :, sel] = \
                jnp.where(write, m_new, NULL).astype(I16)
            ring_i[slot2e, :, sel] = \
                jnp.where(write & ~i_out_null, ins, NULL).astype(I16)
            ring_d[slot2e, :, sel] = \
                jnp.where(write & ~d_out_null, dl, NULL).astype(I16)

        if "compute" not in _ABLATE:
            for c in range(NC):
                if NC == 1:
                    compute_chunk(c)
                else:
                    @pl.when((c >= c_lo2) & (c <= c_hi2))
                    def _(c=c):
                        compute_chunk(c)

        newf = jnp.where(allnull, 0,
                         1 | (i_out_null.astype(I32) << 2)
                         | (d_out_null.astype(I32) << 3))
        side_ref[s2] = side_pack(jnp.where(allnull, 1, lo),
                                 jnp.where(allnull, -1, hi_), newf)
        if "diag" in _ABLATE:
            # [3]: max live band width over pairs+steps (sizes the
            # sliding-window kernel's lane budget); [4]: sum of widths
            # (mean width = [4]/[0])
            w_now = jnp.max(jnp.where(
                jnp.broadcast_to(m_null, (P, 128)), 0,
                jnp.broadcast_to(kh - kl + 1, (P, 128))))
            w_sum = jnp.max(jnp.where(
                jnp.broadcast_to(m_null, (P, 128)), 0,
                jnp.broadcast_to(kh - kl + 1, (P, 128))))
            diag = diag + jnp.stack(
                [jnp.int32(1), ext_rounds,
                 jnp.maximum(c_hi2 - c_lo2 + 1, 0),
                 jnp.maximum(w_now - diag[3], 0),  # running max via +delta
                 w_sum])
        return s2, active.astype(I32), scores, diag

    def fwd_cond(state):
        s, active_i, _, _ = state
        return (s <= smax) & (jnp.max(active_i) > 0)

    s_end, active_i, scores, diag = jax.lax.while_loop(
        fwd_cond, fwd_body,
        (jnp.int32(0), jnp.ones((P, 1), I32), jnp.zeros((P, 1), I32),
         jnp.zeros((5,), I32)))
    scores = jnp.where(active_i > 0, smax + 1, scores)
    # Drain outstanding spills before the backtrace reads the history.
    # (dev ablation: no spills were started, so nothing to drain)
    # Spills were issued for scores 0..s_end-1; the loop body already
    # waited scores <= s_end-depth, so the unwaited ones per ring are the
    # (at most depth-1) scores in [max(0, s_end+1-depth), s_end-1].
    if "spill" not in _ABLATE:
        for d in range(WRM - 1):
            sd = s_end - 1 - d

            @pl.when((sd >= 0) & (sd >= s_end + 1 - WRM))
            def _(sd=sd):
                pltpu.make_async_copy(
                    ring_m.at[0], hist_ref.at[0, 0],
                    semm.at[jax.lax.rem(sd, WRM)]).wait()
        for d in range(WRE - 1):
            sd = s_end - 1 - d

            @pl.when((sd >= 0) & (sd >= s_end + 1 - WRE))
            def _(sd=sd):
                for c in range(2):
                    pltpu.make_async_copy(
                        ring_i.at[0], hist_ref.at[c + 1, 0],
                        semie.at[jax.lax.rem(sd, WRE), c]).wait()

    # ---------------- step records ----------------
    cio = jax.lax.broadcasted_iota(I32, (P, SRp), 1)
    recs = jnp.zeros((P, SRp), I32)
    recs = jnp.where(cio == smax + 3, scores, recs)
    if "diag" in _ABLATE:
        # rows 0..2 of pair 0: steps, extend rounds, live compute chunks
        pio = jax.lax.broadcasted_iota(I32, (P, SRp), 0)
        for j in range(5):
            recs = jnp.where((pio == 0) & (cio == j), diag[j], recs)

    if not cfg.backtrace or "backtrace" in _ABLATE or "diag" in _ABLATE:
        recs_ref[:, :] = recs
        return

    # ---------------- backtrace over score levels ----------------
    bt_ok = scores <= smax
    lvl0 = jnp.max(jnp.where(bt_ok, scores, 0))

    def prefetch(lvl, buf):
        rows = (jnp.maximum(lvl, 0),                 # hm[s] (pair starts)
                jnp.maximum(lvl - go - ge, 0),       # hm[s-o-e]
                jnp.maximum(lvl - x, 0))             # hm[s-x]
        for j, r in enumerate(rows):
            pltpu.make_async_copy(hist_ref.at[0, r], btb_ref.at[buf, j],
                                  semb.at[buf, j]).start()
        pltpu.make_async_copy(hist_ref.at[1, jnp.maximum(lvl - ge, 0)],
                              btb_ref.at[buf, 3], semb.at[buf, 3]).start()
        pltpu.make_async_copy(hist_ref.at[2, jnp.maximum(lvl - ge, 0)],
                              btb_ref.at[buf, 4], semb.at[buf, 4]).start()

    def wait_buf(buf):
        for j in range(5):
            pltpu.make_async_copy(btb_ref.at[buf, j], btb_ref.at[buf, j],
                                  semb.at[buf, j]).wait()

    prefetch(lvl0, 0)

    def bt_body(i, st):
        score, k, offset, btype, valid_i, started_i, recs = st
        s = lvl0 - i
        buf = jax.lax.rem(i, 2)
        wait_buf(buf)

        @pl.when(i + 1 <= lvl0)
        def _():
            prefetch(s - 1, jax.lax.rem(i + 1, 2))

        hm_s = btb_ref[buf, 0].astype(I32)
        mo = btb_ref[buf, 1].astype(I32)
        mx = btb_ref[buf, 2].astype(I32)
        ie = btb_ref[buf, 3].astype(I32)
        de = btb_ref[buf, 4].astype(I32)
        kl_o, kh_o, fl_o = side_read(s - go - ge)
        kl_e, kh_e, fl_e = side_read(s - ge)
        kl_x, kh_x, fl_x = side_read(s - x)

        start = bt_ok & (scores == s) & ~(started_i > 0)
        off0 = jnp.sum(jnp.where((kio == ak + smax) & lane_valid & start,
                                 hm_s, 0), axis=1, keepdims=True)
        offset = jnp.where(start, off0, offset)
        k = jnp.where(start, ak, k)
        btype = jnp.where(start, 0, btype)
        started = (started_i > 0) | start
        v = offset - k
        h = offset
        valid0 = (v > 0) & (v <= plens) & (h > 0) & (h <= tlens)
        valid = jnp.where(start, valid0.astype(I32), valid_i) > 0

        act = started & (score == s) & (s > 0)
        pre = act & (v > 0) & (h > 0)

        now_valid = (v > 0) & (v <= plens) & (h > 0) & (h <= tlens)
        newly = pre & ~valid & now_valid
        gap_len = jnp.where(newly & (k != ak), jnp.abs(ak - k), 0)
        gap_d = (newly & (k > ak)).astype(I32)
        valid = valid | newly

        cm1 = kio == (k - 1 + smax)
        cp0 = kio == (k + smax)
        cp1 = kio == (k + 1 + smax)

        def gat(plane, cols):
            return jnp.sum(jnp.where(cols, plane, 0), axis=1, keepdims=True)

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
        del_ext = jnp.where(pre & not_i
                            & ok_bit(kl_e, kh_e, fl_e, k + 1, s_e, 3),
                            gat(de, cp1), NULL)
        del_open = jnp.where(pre & not_i & ok(kl_o, kh_o, fl_o, k + 1, s_o),
                             gat(mo, cp1), NULL)
        ins_ext = jnp.where(pre & not_d
                            & ok_bit(kl_e, kh_e, fl_e, k - 1, s_e, 2),
                            gat(ie, cm1) + 1, NULL)
        ins_open = jnp.where(pre & not_d & ok(kl_o, kh_o, fl_o, k - 1, s_o),
                             gat(mo, cm1) + 1, NULL)
        misms = jnp.where(pre & is_m & ok(kl_x, kh_x, fl_x, k, s_x),
                          gat(mx, cp0) + 1, NULL)
        max_all = jnp.maximum(misms, jnp.maximum(
            jnp.maximum(ins_ext, ins_open), jnp.maximum(del_ext, del_open)))

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
        recs = jnp.where(cio == s, rec, recs)

        score = jnp.where(b0 | b2, s_e,
                          jnp.where(b1 | b3, s_o,
                                    jnp.where(b4, s_x, score)))
        k = k + jnp.where(b0 | b1, 1, 0) - jnp.where(b2 | b3, 1, 0)
        offset = offset - jnp.where(b2 | b3 | b4, 1, 0)
        btype = jnp.where(b0, 2, jnp.where(b2, 1,
                          jnp.where(b1 | b3, 0, btype)))
        return (score, k, offset, btype, valid.astype(I32),
                started.astype(I32), recs)

    zeros = jnp.zeros((P, 1), I32)
    score, k, offset, btype, valid_i, started_i, recs = jax.lax.fori_loop(
        0, lvl0 + 1, bt_body,
        (scores, zeros, zeros, zeros, zeros, zeros, recs))

    v = offset - k
    h = offset
    fin_m = bt_ok & (score == 0)
    fin_g = bt_ok & ~fin_m
    rec1 = jnp.where(
        fin_m, jnp.minimum(jnp.maximum(offset, 0), 0x3FFF) | (OP_M << 14),
        jnp.where(fin_g,
                  jnp.minimum(jnp.maximum(v, 0), 0x3FFF) | (OP_D << 14), 0))
    rec2 = jnp.where(
        fin_g, jnp.minimum(jnp.maximum(h, 0), 0x3FFF) | (OP_I << 14), 0)
    recs = jnp.where(cio == smax + 1, rec1, recs)
    recs = jnp.where(cio == smax + 2, rec2, recs)
    recs_ref[:, :] = recs


def ring_depths(cfg: AlignConfig):
    """(WRM, WRE): ring slots for the m plane (read at lags x and o+e)
    and the i/d planes (read at lag e).  Depth >= 2 keeps a slot's spill
    DMA disjoint from the next step's writes."""
    WRM = max(cfg.mismatch, cfg.gap_o + cfg.gap_e, 1) + 1
    WRE = max(cfg.gap_e, 1) + 1
    return WRM, WRE


def long_tile_pairs(cfg: AlignConfig, bytes_mode: bool = False):
    """Largest pair tile whose buffers + estimated compiler stack fit the
    16 MB VMEM budget (the stack term is calibrated against measured
    scoped-vmem OOMs: the backtrace keeps ~15 [P, Kp] i32 planes live;
    the chunked forward adds ~40 [P, 128] ones), or None."""
    smax = cfg.max_score
    R = cfg.read_size
    if smax > 1023 or R + 2 > 0x3FFF or R + smax + 2 >= 32767:
        return None
    wb, _ = _wb_of(bytes_mode)
    Kp = _round_up(2 * smax + 1, 128)
    Wp = _round_up(-(-(R + 2) // wb), 128)
    WRM, WRE = ring_depths(cfg)
    for P in (64, 48, 32, 16, 8):
        ring = (WRM + 2 * WRE) * P * Kp * 2
        btb = 2 * 5 * P * Kp * 2
        seqs = 2 * P * Wp * 4
        side = (smax + 2) * P * 8 * 2
        recs = 2 * P * record_cols(smax) * 4
        # the chunked forward's [P, 128] term scales with the extend
        # window (2*_CW+1 gather planes live at once, plus ~40 others)
        stack = 15 * P * Kp * 4 + (40 + 2 * _CW + 1) * P * 128 * 4
        # 3 MiB compiler reserve: at the envelope edge (smax=800,
        # Kp=1664) the 2 MiB reserve admitted P=64 but Mosaic's real
        # stack came to 16.59 MiB vs the 16 MiB scoped-vmem limit
        # (round-5, l=16 kbp probe) — P=48 runs it.
        if ring + btb + seqs + side + recs + stack + 3 * 1024 * 1024 \
                < 16 * 1024 * 1024:
            return P
    return None


def long_fit(cfg: AlignConfig, bytes_mode: bool = False) -> bool:
    return long_tile_pairs(cfg, bytes_mode) is not None


def wfa_forward_pallas_long(pats, txts, plens, tlens, *, cfg: AlignConfig,
                            interpret: bool = False, packed: bool = False):
    """Long-read WFA forward (+ on-device backtrace), HBM-spill tier.

    Same contract as wfa_forward_pallas2: returns {"step_records":
    [n, record_rows] i32} for native.wfa_steps_to_ops.  Packed (2-bit,
    14-base-word) inputs take the dense extend; raw-byte batches that
    cannot 2-bit-pack (>4-symbol alphabets) run the SAME kernel with
    3-byte words — the reference kernels compare raw bytes everywhere
    (ref: WFA/DPU-MRAM/dpu/wfa.c:193-215), so no alphabet falls off the
    device past the VMEM tier.
    """
    if not packed:
        import numpy as np
        from aim_tpu.ops.common import pack_seqs
        pp, tt, ok = pack_seqs(np.asarray(pats, np.uint8),
                               np.asarray(txts, np.uint8),
                               np.asarray(plens), np.asarray(tlens),
                               cfg.read_size)
        if not ok:
            # Byte-comparing extend variant: raw bytes, 3 per word.
            return _wfa_long_jit(pats, txts, plens, tlens, cfg=cfg,
                                 interpret=interpret, bytes_mode=True)
        pats, txts, packed = pp, tt, True
    return _wfa_long_jit(pats, txts, plens, tlens, cfg=cfg,
                         interpret=interpret)


wfa_forward_pallas_long.requires_packed = True


def wfa_forward_pallas_long_bytes(pats, txts, plens, tlens, *,
                                  cfg: AlignConfig,
                                  interpret: bool = False):
    """Byte-comparing long-read WFA: raw uint8 sequences in (device
    arrays fine — nothing touches the host), 3-byte extend words.  The
    api dispatches here for batches whose alphabet cannot 2-bit-pack."""
    return _wfa_long_jit(pats, txts, plens, tlens, cfg=cfg,
                         interpret=interpret, bytes_mode=True)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "interpret", "bytes_mode"))
def _wfa_long_jit(pats, txts, plens, tlens, *, cfg: AlignConfig,
                  interpret: bool = False, bytes_mode: bool = False):
    smax = cfg.max_score
    R = cfg.read_size
    n = pats.shape[0]
    wb, bpb = _wb_of(bytes_mode)
    Kp = _round_up(2 * smax + 1, 128)
    Wp = _round_up(-(-(R + 2) // wb), 128)
    SRp = record_cols(smax)
    S2 = smax + 2
    WRM, WRE = ring_depths(cfg)
    P = long_tile_pairs(cfg, bytes_mode)
    if P is None:
        raise ValueError("config exceeds the long-read tier's budget")

    if not bytes_mode:
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
    base_len = Wp * wb
    if pats.shape[1] < base_len:
        pats = jnp.pad(pats, ((0, 0), (0, base_len - pats.shape[1])))
        txts = jnp.pad(txts, ((0, 0), (0, base_len - txts.shape[1])))
    pats = pats[:, :base_len].astype(I32)
    txts = txts[:, :base_len].astype(I32)

    # wb-base words (2-bit: 14 bases = 28 bits; bytes: 3 bases = 24 bits;
    # both < 2**28: relay-safe).
    def words_of(seq):
        w = jnp.zeros((n, Wp), I32)
        s3 = seq.reshape(n, Wp, wb)
        for j in range(wb):
            w = w + (s3[:, :, j] << (bpb * j))
        return w

    patw = words_of(pats)
    txtw = words_of(txts)

    T = n // P
    patw = patw.reshape(T, P, Wp)
    txtw = txtw.reshape(T, P, Wp)
    lens = jnp.stack([plens.astype(I32).reshape(T, P),
                      tlens.astype(I32).reshape(T, P)], axis=2)  # [T, P, 2]
    lens = jnp.pad(lens, ((0, 0), (0, 0), (0, 126)))

    kernel = functools.partial(_wfa_long_kernel, cfg, P, Kp, Wp, SRp,
                               WRM, WRE, bytes_mode)
    recs, _hist = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((None, P, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, Wp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, P, SRp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, P, SRp), I32),
            # HBM history, reused across grid steps (per-tile temporary)
            jax.ShapeDtypeStruct((3, S2, P, Kp), I16),
        ),
        scratch_shapes=[
            pltpu.VMEM((WRM, P, Kp), I16),     # m wavefront ring
            pltpu.VMEM((WRE, P, Kp), I16),     # i wavefront ring
            pltpu.VMEM((WRE, P, Kp), I16),     # d wavefront ring
            pltpu.VMEM((2, 5, P, Kp), I16),    # backtrace row buffers
            pltpu.VMEM((S2, P, 8), I16),       # klo/khi/flags per score
            pltpu.SemaphoreType.DMA((WRM,)),
            pltpu.SemaphoreType.DMA((WRE, 2)),
            pltpu.SemaphoreType.DMA((2, 5)),
        ],
        interpret=interpret,
    )(patw, txtw, lens)
    return {"step_records": recs.reshape(n, SRp)[:n_orig, :smax + 4]}

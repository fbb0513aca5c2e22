"""NW / SWG — banded Pallas TPU kernels, HBM-streamed long-read tier.

The VMEM tier (ops/nw_pallas.py, ops/swg_pallas.py) keeps every
direction-code word resident, capping READ_SIZE near 2 kbp.  This tier is
the TPU analogue of the reference's DPU-MRAM variants, which stream the
DP row window through WRAM while the direction table lives in MRAM
(ref: NW/DPU-MRAM/dpu/nw.c:151-237, SWG/DPU-MRAM/dpu/swg.c:151-218):

  * the FORWARD kernel runs the same banded recurrence but over a grid of
    row blocks — the mismatch bitplanes stream in and the direction-code
    / is-match words stream out through the Pallas pipeline (XLA-managed
    double-buffered HBM DMA, the role of the reference's MRAM
    read/write_row calls), with only the previous-row carry in VMEM;
  * the WALK kernel consumes the code blocks in DESCENDING row order
    (reversed BlockSpec index map = prefetch of the next-lower block
    while the current one is walked) and runs the same event-driven
    run-emitting traceback; pairs whose cursor has left the current
    block simply wait for the next grid step.

Differences from the VMEM tier (everything else matches it, and through
it the reference semantics):
  * fixed geometry — one pair per 128-lane row (G=1), band half-width
    C = 63 (npl=1) or C = 127 (npl=2, see below);
  * the deletion min-plus scan runs full depth (B-1 >= any in-band
    chain), so the VMEM tier's truncated-chain flag is unnecessary: an
    in-row chain cannot exceed the band width, and paths leaving the
    band are already caught by the band flag;
  * records carry up to NRL - 3 runs, NRL in {256, 512, 1024} sized by
    the config's worst-case certified run count (runs_lanes_long) — at
    16 kbp e=1% alignments run ~320 runs, past the old fixed-256
    capacity; the cursor's high bits ride lane0 bits 10+ so flag
    readers at bits 8/9 are layout-independent;
  * SWG serves the int16-cell (MRAM-variant) configs only: the int8
    WRAM tier does not exist at these sizes in the reference either, and
    the full-width XLA tier keeps the genuine int8 wrap semantics.

Exactness: per-pair band/alias/sentinel/overflow/capacity conditions set
needs_fallback exactly as in the VMEM tier; flagged pairs re-run on the
host oracle.

Certified-score envelope (when pairs DON'T flag): the band argument
needs |kend| + dmax + 1 <= C, i.e. roughly
  NW:  score <= 2*(C-1) * min(gap_i, gap_d)
  SWG: score <= 2*gap_o + 2*(C-1)*gap_e
The kernel runs at C = 63 (npl=1: one 128-lane band row per pair) or
C = 127 (npl=2: TWO band planes per pair; the +-1 band shifts exchange
their seam lanes and the prefix min/max scans combine across the seam —
doubling the envelope: SWG x=3/o=4/e=1 certifies e=1% to ~9 kbp instead
of ~4.5).  npl=1 is the primary tier; api.align retries its band-flagged
pairs on npl=2 before the host oracle (fn.retry_fn), so in-envelope
pairs never pay the 2x plane cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aim_tpu.config import ALGO_NW, AlignConfig
from aim_tpu.ops.band import ctz32 as _ctz32, round_up as _round_up

I32 = jnp.int32
I16 = jnp.int16
F32 = jnp.float32
INF = 2 ** 20
INT16_MAX = 32767

OP_M, OP_X, OP_I, OP_D = 0, 1, 2, 3
C_D, C_I, C_M, C_X = 0, 1, 2, 3          # NW 2-bit codes
CH_D, CH_I, CH_M, CH_X = 0, 1, 2, 3      # SWG choice bits
L_M, L_I, L_D = 0, 1, 2                  # SWG walk layers

P = 128          # pairs per tile (one per sublane row)
CL = 63          # npl=1 band half-width; B = 2*CL + 1 = 127 <= 128 lanes
BL = 2 * CL + 1
NRL = 256        # default record lanes (see runs_lanes_long)
FLAG_FALLBACK = 1


def runs_lanes_long(cfg: AlignConfig) -> int:
    """Record lanes for this config's streamed-tier records: the
    smallest of {256, 512, 1024} that covers the TRUE worst-case run
    count of a certified score (every edit event single-base and
    isolated costs 2 runs and at least the cheapest event cost, so
    runs <= 2 * max_score / min_event + tails).  256 was a hard
    ceiling before round 5, binding exactly where the wide bands are
    supposed to win: NW 16 kbp e=1% pairs past the C=63 band (the
    measured 23% tail — at unit mismatch cost the band bound score>=126
    and the run bound nsub>=127 coincide) re-flagged on CAPACITY at
    npl>=2 (they need ~255+ runs > 253), and SWG 16 kbp e=1%
    indel-bearing data (~160 planted events, ~320 runs) could never fit
    a record at any band width.  Past 1024 lanes the capacity flag
    still catches the tail honestly (rc < 1 -> needs_fallback).

    Record grammar stays decode-compatible at every size: lane0 keeps
    the cursor's low 8 bits at bits 0-7 and the flags at bits 8-9;
    sizes > 256 put the cursor's HIGH bits at bits 10+ (encode:
    _pack_lane0 here; decode: oracle.cpp aim_wfa_runs_to_ops), so
    every existing (lane0 >> 8) & 1 flag reader is unchanged."""
    if cfg.algo == ALGO_NW:
        min_event = min(cfg.mismatch, cfg.gap_i, cfg.gap_d)
    else:
        min_event = min(cfg.mismatch, cfg.gap_o + cfg.gap_e)
    need = 2 * cfg.max_score // max(min_event, 1) + 8
    for nrl in (256, 512):
        if need <= nrl - 3:
            return nrl
    return 1024


def _pack_lane0(rc, flag_i32, meta_i32, NRL):
    """lane0 = cursor_lo8 | needs_fallback<<8 | score_unc<<9
    | cursor_hi<<10 (hi bits zero at NRL <= 256 — the historical
    layout is the same encoding)."""
    rcc = jnp.clip(rc, 0, NRL - 1)
    return (rcc & 255) | (flag_i32 << 8) | (meta_i32 << 9) \
        | ((rcc >> 8) << 10)


def band_c(npl: int) -> int:
    """Band half-width at npl planes: B = 2*C+1 <= 128*npl lanes."""
    return 64 * npl - 1


def block_rows(algo: str, npl: int = 1) -> int:
    """Rows per streamed block (multiple of 32; SWG's 4-bit codes double
    the code-plane footprint, so it uses half the rows; each extra band
    plane scales every plane buffer, so rows shrink ~1/npl to keep the
    double-buffered block set inside VMEM).  Rounded DOWN to a multiple
    of 32 — the bit-packing reshapes (_mm_blocks, the walk's Q/W specs)
    require exact 32/16/8 divisibility."""
    return max(32, (512 if algo == ALGO_NW else 256) // npl // 32 * 32)


def long_fit_nwswg(cfg: AlignConfig) -> bool:
    """Admission: beyond the VMEM tier, up to 16 kbp reads.  SWG int8
    (WRAM-variant) configs keep the XLA tier (genuine wrap semantics)."""
    if cfg.algo != ALGO_NW and cfg.cell_width == 1:
        return False
    if cfg.algo == ALGO_NW:
        if min(cfg.gap_i, cfg.gap_d) <= 0:
            return False
    else:
        # negative match voids the band-exactness cost argument
        # (ops/pallas_kernels.py rationale), same as the VMEM tier
        if cfg.gap_e <= 0 or cfg.match < 0:
            return False
    return 2 <= cfg.read_size <= 16352


def route_planes(cfg: AlignConfig, max_planes: int = 8) -> int:
    """Admission routing for the streamed tier: the smallest plane count
    whose certified envelope covers the PREDICTED p90 score, so a config
    whose e*l puts most pairs past the C=63 primary band skips the
    doomed npl=1 pass (round-4 data: SWG 8 kbp e=1% flagged 98% of
    pairs on npl=1 and paid that dispatch before every npl=2 retry).

    Prediction model = the reference dataset generator's planted-error
    semantics (aim_tpu.datagen, mirroring the WFA generate_dataset):
    exactly wrong = ceil(e*l) edits, type uniform over {mismatch,
    insertion, deletion}.  The launcher derives MAX_SCORE =
    ceil(wrong * max_cost) (config.derive_config), so wrong =
    max_score / max_cost and the expected score is wrong * avg planted
    cost — measured: SWG 8 kbp e=1% median 345 vs predicted 347.  A
    1.1x margin covers the p90, and |kend| ~ skellam spread of the
    planted indels.  Mis-prediction is performance-only: every plane
    count re-derives its own exactness flags, so outputs are
    byte-identical regardless of the route (flagged pairs escalate up
    the ladder / host oracle exactly as before).

    AIM_TPU_ROUTE=0 disables routing (primary stays npl=1)."""
    import math
    import os
    if os.environ.get("AIM_TPU_ROUTE", "1") == "0":
        return 1
    if cfg.algo == ALGO_NW:
        max_cost = max(cfg.mismatch, cfg.gap_i + cfg.gap_d)
        avg_cost = (cfg.mismatch + cfg.gap_i + cfg.gap_d) / 3.0
    else:
        max_cost = max(cfg.mismatch, cfg.gap_o + cfg.gap_e)
        avg_cost = (cfg.mismatch + 2 * (cfg.gap_o + cfg.gap_e)) / 3.0
    wrong = cfg.max_score / max(max_cost, 1)
    s_p90 = int(math.ceil(1.1 * wrong * avg_cost))
    kend_est = int(math.ceil(2.5 * math.sqrt(2.0 * wrong / 3.0)))
    for p in (1, 2, 4, 8):
        if p > max_planes:
            break
        C = band_c(p)
        if cfg.algo == ALGO_NW:
            dmax = s_p90 // (cfg.gap_i + cfg.gap_d)
        else:
            dmax = max(0, s_p90 - 2 * cfg.gap_o) // (2 * cfg.gap_e) + 1
        if dmax + kend_est + 1 <= C:
            return p
    return min(8, max_planes)


def hbm_per_pair(cfg: AlignConfig) -> int:
    """Per-pair HBM bytes while a batch is in flight: the streamed
    mismatch planes (16R), code blocks (32R NW / 64R SWG), is-match
    planes (16R), plus XLA temporaries building the planes (~2x mm).
    api._memory_batch_cap uses this instead of the VMEM-tier constant.
    (The npl=2 retry tier doubles the plane terms but runs on the small
    flagged subset, so the npl=1 figure governs the batch cap.)
    Score-only runs declare no code/is-match outputs, so those terms
    vanish and the admissible batch roughly doubles."""
    R = cfg.read_size
    codes = 32 * R if cfg.algo == ALGO_NW else 64 * R
    if not cfg.backtrace:
        return 16 * R + 48 * R + 4 * R + 1024
    return 16 * R + codes + 16 * R + 48 * R + 4 * R + 1024


# ===================== forward kernel =====================

def _fwd_kernel(cfg: AlignConfig, NBK: int, RB: int, npl: int, *refs):
    """One row-block of the banded forward.  Band state lives in npl
    plane lists (plane k covers band positions 128k..128k+127); car_ref
    rows (plane-major, r*npl+k): 0..2 carry planes (NW uses row 0),
    3 score_acc, 4 ovf_acc, 5 cacc, 6 iacc.  Score-only runs declare no
    cb/ism outputs at all (every write is backtrace-guarded), so the
    grid pipeline never streams the unwritten blocks to HBM."""
    if cfg.backtrace:
        mm_ref, lens_ref, cb_ref, ism_ref, meta_ref, car_ref = refs
    else:
        mm_ref, lens_ref, meta_ref, car_ref = refs
        cb_ref = ism_ref = None
    algo = cfg.algo
    R = cfg.read_size
    C = band_c(npl)
    B = 2 * C + 1
    b = pl.program_id(1)
    h0 = b * RB
    W32B = RB // 32
    RBQ = RB // 16 if algo == ALGO_NW else RB // 8

    lane = jax.lax.broadcasted_iota(I32, (P, 128), 1)
    bg = [lane + 128 * k for k in range(npl)]        # global band position
    in_band = [bg[k] < B for k in range(npl)]
    plens = lens_ref[:, 0:1]
    tlens = lens_ref[:, 1:2]
    kend = plens - tlens
    aliased = plens == tlens + 1
    ramp_g = cfg.gap_d if algo == ALGO_NW else cfg.gap_e
    ramp = [bg[k] * ramp_g for k in range(npl)]
    hitmask = [(bg[k] == kend + C) & in_band[k] for k in range(npl)]
    hmax = jnp.minimum(jnp.max(jnp.broadcast_to(tlens, (P, 128))), R)

    def car(r, k):
        return car_ref[r * npl + k]

    # Plane-seam lane broadcasts, Mosaic-safe: extracting a single lane
    # (x[:, j:j+1]) and broadcasting it inside an scf loop SIGABRTs
    # Mosaic's layout pass at npl >= 2 geometries
    # (vector_extract_strided_slice: "limits[i] <= dim(i)"); these paths
    # are dead code at npl=1 (DCE'd before Mosaic), which is why the
    # primary band never hit it.  A masked log-step rotation all-reduce
    # produces the same all-lanes value without any strided extract.
    def _allred(x, op):
        s_ = 1
        while s_ <= 64:
            x = op(x, pltpu.roll(x, s_, 1))
            s_ *= 2
        return x

    def _lane_bcast(x, j):
        """All lanes <- x[:, j] (values bounded well inside +-2^24)."""
        return _allred(jnp.where(lane == j, x, 1 << 24), jnp.minimum)

    def sr1p(ws, fill):          # read band position b+1 (plane-seam aware)
        out = []
        for k in range(npl):
            r = pltpu.roll(ws[k], 127, 1)
            nxt = (_lane_bcast(ws[k + 1], 0)
                   if k + 1 < npl else jnp.full((P, 128), fill, I32))
            out.append(jnp.where(lane <= 126, r, nxt))
        return out

    def sl1p(ws, fill):          # read band position b-1
        out = []
        for k in range(npl):
            r = pltpu.roll(ws[k], 1, 1)
            prv = (_lane_bcast(ws[k - 1], 127)
                   if k > 0 else jnp.full((P, 128), fill, I32))
            out.append(jnp.where(lane >= 1, r, prv))
        return out

    def minplus_scan(zs):
        """Global prefix-min over band positions (inputs ramp-subtracted):
        full-depth masked scan per plane, then the seam carry (plane k's
        total min == all-lane min of its prefix-min plane) folds into
        plane k+1."""
        outs = []
        carry = None
        for k in range(npl):
            x = zs[k]
            s_ = 1
            while s_ <= 64:
                rolled = pltpu.roll(x, s_, 1)
                x = jnp.minimum(x, jnp.where(lane >= s_, rolled, INF))
                s_ *= 2
            if carry is not None:
                x = jnp.minimum(x, carry)
            if k + 1 < npl:
                carry = _allred(x, jnp.minimum)
            outs.append(x)
        return outs

    # ---- row-0 / block-0 init ----
    @pl.when(b == 0)
    def _():
        zero = jnp.zeros((P, 128), I32)
        for k in range(npl):
            v0 = bg[k] - C
            if algo == ALGO_NW:
                gi, gd = cfg.gap_i, cfg.gap_d
                row0 = jnp.where((v0 >= 0) & (v0 <= plens) & in_band[k],
                                 v0 * gd, INF)
                row0 = jnp.where(aliased & (v0 == plens) & in_band[k]
                                 & (v0 >= 0), gi, row0)
                car_ref[0 * npl + k] = row0
            else:
                go, ge, ms = cfg.gap_o, cfg.gap_e, cfg.max_score
                r0_valid = (v0 >= 0) & (v0 <= plens) & in_band[k]
                d0 = jnp.where(v0 == 0, ms, go + v0 * ge)
                i0 = jnp.full((P, 128), ms, I32)
                m0 = jnp.where(v0 == 0, 0, d0)
                at_alias = aliased & (v0 == plens) & (v0 > 0)
                d0 = jnp.where(at_alias, ms, d0)
                i0 = jnp.where(at_alias, go + ge, i0)
                m0 = jnp.where(at_alias, go + ge, m0)
                car_ref[0 * npl + k] = jnp.where(r0_valid, m0, INF)
                car_ref[1 * npl + k] = jnp.where(r0_valid, i0, INF)
                car_ref[2 * npl + k] = jnp.where(r0_valid, d0, INF)
            for j in (3, 4, 5, 6):
                car_ref[j * npl + k] = zero

    local_rows = jnp.clip(hmax - h0, 0, RB)

    if algo == ALGO_NW:
        gi, gd, x = cfg.gap_i, cfg.gap_d, cfg.mismatch

        def fwd_body(i, carry):
            prev, score_acc, ovf_acc, cacc, iacc = carry
            h = h0 + i + 1
            sub = [((mm_ref[k * W32B + (i >> 5)] >> (i & 31)) & 1) * x
                   for k in range(npl)]
            v = [bg[k] + (h - C) for k in range(npl)]
            upper = jnp.minimum(plens, tlens + C)
            valid = [(v[k] >= 1) & (v[k] <= upper) & in_band[k]
                     for k in range(npl)]
            insv = [w + gi for w in sr1p(prev, INF)]
            diav = [prev[k] + sub[k] for k in range(npl)]
            indep = [jnp.minimum(insv[k], diav[k]) for k in range(npl)]
            z = [jnp.where(valid[k], indep[k], INF) for k in range(npl)]
            z = [jnp.where((v[k] == 0) & in_band[k], h * gi, z[k])
                 for k in range(npl)]
            mscan = minplus_scan([z[k] - ramp[k] for k in range(npl)])
            cur = [mscan[k] + ramp[k] for k in range(npl)]
            cur = [jnp.where(valid[k] | ((v[k] == 0) & in_band[k]),
                             cur[k], INF) for k in range(npl)]

            live = [valid[k] & (h <= tlens) for k in range(npl)]
            ovf_acc = tuple(
                jnp.maximum(ovf_acc[k],
                            (live[k] & (jnp.abs(cur[k]) > INT16_MAX))
                            .astype(I32)) for k in range(npl))

            if cfg.backtrace:
                slc = sl1p(cur, INF)
                code = []
                for k in range(npl):
                    del_eq = cur[k] == slc[k] + gd
                    ins_eq = cur[k] == insv[k]
                    x_eq = cur[k] == prev[k] + x
                    code.append(jnp.where(del_eq, C_D,
                                          jnp.where(ins_eq, C_I,
                                                    jnp.where(x_eq, C_X,
                                                              C_M))))
                shc = 2 * (i & 15)
                cacc = tuple(jnp.where((i & 15) == 0, code[k] << shc,
                                       cacc[k] | (code[k] << shc))
                             for k in range(npl))
                shi = 31 - (i & 31)
                iacc = tuple(
                    jnp.where((i & 31) == 0,
                              (code[k] == C_M).astype(I32) << shi,
                              iacc[k] | ((code[k] == C_M).astype(I32)
                                         << shi)) for k in range(npl))

                @pl.when(((i & 15) == 15) | (i + 1 == local_rows))
                def _():
                    for k in range(npl):
                        cb_ref[k * RBQ + (i >> 4)] = cacc[k]

                @pl.when(((i & 31) == 31) | (i + 1 == local_rows))
                def _():
                    for k in range(npl):
                        ism_ref[k * W32B + (i >> 5)] = iacc[k]

            score_acc = tuple(
                jnp.where(hitmask[k] & (h == tlens), cur[k], score_acc[k])
                for k in range(npl))
            return tuple(cur), score_acc, ovf_acc, cacc, iacc

        carry = (tuple(car(0, k) for k in range(npl)),
                 tuple(car(3, k) for k in range(npl)),
                 tuple(car(4, k) for k in range(npl)),
                 tuple(car(5, k) for k in range(npl)),
                 tuple(car(6, k) for k in range(npl)))
        prev, score_acc, ovf_acc, cacc, iacc = jax.lax.fori_loop(
            0, local_rows, fwd_body, carry)
        for k in range(npl):
            car_ref[0 * npl + k] = prev[k]
    else:
        mat, mis = cfg.match, cfg.mismatch
        go, ge, ms = cfg.gap_o, cfg.gap_e, cfg.max_score
        cmax = INT16_MAX
        margin = go + ge + max(mis, abs(mat), ge)

        def fwd_body(i, carry):
            pm, pi, pd, score_acc, ovf_acc, cacc, iacc = carry
            h = h0 + i + 1
            sub = [mat + ((mm_ref[k * W32B + (i >> 5)] >> (i & 31)) & 1)
                   * (mis - mat) for k in range(npl)]
            v = [bg[k] + (h - C) for k in range(npl)]
            valid = [(v[k] >= 1) & (v[k] <= plens) & in_band[k]
                     for k in range(npl)]
            mb = go + h * ge
            db = jnp.where(aliased & (h >= 2), INF, ms)
            srpm = sr1p(pm, INF)
            i_open_v = [srpm[k] + go + ge for k in range(npl)]
            srpi = sr1p(pi, INF)
            i_cur = [jnp.minimum(i_open_v[k], srpi[k] + ge)
                     for k in range(npl)]
            i_cur = [jnp.where(valid[k], i_cur[k], INF) for k in range(npl)]
            i_cur = [jnp.where((v[k] == 0) & in_band[k], mb, i_cur[k])
                     for k in range(npl)]
            c = [jnp.minimum(pm[k] + sub[k], i_cur[k]) for k in range(npl)]
            c = [jnp.where(valid[k], c[k], INF) for k in range(npl)]
            c_s = sl1p(c, INF)
            m_left = sl1p([jnp.where((v[k] == 0) & in_band[k], mb, INF)
                           for k in range(npl)], INF)
            z = [jnp.where((v[k] == 0) & in_band[k], db,
                           jnp.where(v[k] == 1, m_left[k] + go + ge,
                                     c_s[k] + go + ge)) for k in range(npl)]
            z = [jnp.where(valid[k] | ((v[k] == 0) & in_band[k]),
                           z[k], INF) for k in range(npl)]
            mscan = minplus_scan([z[k] - ramp[k] for k in range(npl)])
            d_cur = [mscan[k] + ramp[k] for k in range(npl)]
            d_cur = [jnp.where(valid[k] | ((v[k] == 0) & in_band[k]),
                               d_cur[k], INF) for k in range(npl)]
            m_cur = [jnp.minimum(c[k], d_cur[k]) for k in range(npl)]
            m_cur = [jnp.where((v[k] == 0) & in_band[k], mb, m_cur[k])
                     for k in range(npl)]
            m_cur = [jnp.where(valid[k] | ((v[k] == 0) & in_band[k]),
                               m_cur[k], INF) for k in range(npl)]

            live = [valid[k] & (h <= tlens) for k in range(npl)]
            ovf_acc = tuple(
                jnp.maximum(
                    ovf_acc[k],
                    (live[k]
                     & (jnp.maximum(jnp.abs(m_cur[k]),
                                    jnp.maximum(jnp.abs(i_cur[k]),
                                                jnp.abs(d_cur[k])))
                        > cmax - margin)
                     & (jnp.maximum(jnp.abs(m_cur[k]),
                                    jnp.maximum(jnp.abs(i_cur[k]),
                                                jnp.abs(d_cur[k])))
                        < INF // 2)).astype(I32)) for k in range(npl))

            if cfg.backtrace:
                m_cur_s = sl1p(m_cur, INF)
                code = []
                for k in range(npl):
                    choice = jnp.where(
                        m_cur[k] == d_cur[k], CH_D,
                        jnp.where(m_cur[k] == i_cur[k], CH_I,
                                  jnp.where(m_cur[k] == pm[k] + mat,
                                            CH_M, CH_X)))
                    d_open = (d_cur[k] == m_cur_s[k] + go + ge).astype(I32)
                    i_open = (i_cur[k] == i_open_v[k]).astype(I32)
                    code.append(jnp.where(valid[k],
                                          choice | (d_open << 2)
                                          | (i_open << 3), CH_M))
                shc = 4 * (i & 7)
                cacc = tuple(jnp.where((i & 7) == 0, code[k] << shc,
                                       cacc[k] | (code[k] << shc))
                             for k in range(npl))
                shi = 31 - (i & 31)
                iacc = tuple(
                    jnp.where((i & 31) == 0,
                              (valid[k] & ((code[k] & 3) == CH_M))
                              .astype(I32) << shi,
                              iacc[k] | ((valid[k]
                                          & ((code[k] & 3) == CH_M))
                                         .astype(I32) << shi))
                    for k in range(npl))

                @pl.when(((i & 7) == 7) | (i + 1 == local_rows))
                def _():
                    for k in range(npl):
                        cb_ref[k * RBQ + (i >> 3)] = cacc[k]

                @pl.when(((i & 31) == 31) | (i + 1 == local_rows))
                def _():
                    for k in range(npl):
                        ism_ref[k * W32B + (i >> 5)] = iacc[k]

            score_acc = tuple(
                jnp.where(hitmask[k] & (h == tlens), m_cur[k],
                          score_acc[k]) for k in range(npl))
            return (tuple(m_cur), tuple(i_cur), tuple(d_cur), score_acc,
                    ovf_acc, cacc, iacc)

        carry = (tuple(car(0, k) for k in range(npl)),
                 tuple(car(1, k) for k in range(npl)),
                 tuple(car(2, k) for k in range(npl)),
                 tuple(car(3, k) for k in range(npl)),
                 tuple(car(4, k) for k in range(npl)),
                 tuple(car(5, k) for k in range(npl)),
                 tuple(car(6, k) for k in range(npl)))
        pm, pi, pd, score_acc, ovf_acc, cacc, iacc = jax.lax.fori_loop(
            0, local_rows, fwd_body, carry)
        for k in range(npl):
            car_ref[0 * npl + k] = pm[k]
            car_ref[1 * npl + k] = pi[k]
            car_ref[2 * npl + k] = pd[k]

    for k in range(npl):
        car_ref[3 * npl + k] = score_acc[k]
        car_ref[4 * npl + k] = ovf_acc[k]
        car_ref[5 * npl + k] = cacc[k]
        car_ref[6 * npl + k] = iacc[k]

    # ---- per-pair score + fallback flag (final at the last block) ----
    score = jnp.zeros((P, 1), I32)
    for k in range(npl):
        score = score + jnp.sum(score_acc[k], axis=1, keepdims=True)
    score = jnp.where((plens == 0) | (tlens == 0), 0, score)
    overflow = jnp.zeros((P, 1), I32)
    for k in range(npl):
        overflow = jnp.maximum(overflow,
                               jnp.max(ovf_acc[k], axis=1, keepdims=True))
    overflow = overflow > 0
    multi_alias = plens > tlens + 1
    if algo == ALGO_NW:
        gi, gd = cfg.gap_i, cfg.gap_d
        dmax = score // (gi + gd)
        bad_band = (jnp.abs(kend) + dmax + 1) > C
        hs = C + dmax + 3
        bad_alias = aliased & (hs * gi > (plens - hs) * gd)
        flag = (multi_alias | bad_band | bad_alias | overflow
                | (plens > tlens + C) | (tlens > plens + C))
    else:
        go, ge, ms = cfg.gap_o, cfg.gap_e, cfg.max_score
        mat, mis = cfg.match, cfg.mismatch
        cmax = INT16_MAX
        margin = go + ge + max(mis, abs(mat), ge)
        dmax = jnp.maximum(0, score - 2 * go) // (2 * ge) + 1
        bad_band = (jnp.abs(kend) + dmax + 1) > C
        # out-of-band MS-sentinel chains (ops/swg_pallas.py rationale)
        bad_sentinel = ((score - ms) // ge + dmax) > C
        hs = C + dmax + 3
        bad_alias = aliased & (
            ((2 * go + (hs + 1) * ge) > (plens - hs - 1) * ge) | (mat < 0))
        # boundary-sourced int16 wrap (candidates are cast pre-min)
        bad_wrap = ((go + jnp.maximum(plens, tlens) * ge + margin) > cmax) \
            | (ms + margin > cmax)
        flag = (multi_alias | bad_band | bad_sentinel | bad_alias
                | overflow | bad_wrap | (plens > tlens + C)
                | (tlens > plens + C) | (score < 0))
    meta = jnp.where(lane == 0, score, 0)
    meta = jnp.where(lane == 1, flag.astype(I32), meta)
    meta_ref[:, :] = meta


# ===================== walk kernel =====================

def _walk_kernel(cfg: AlignConfig, NBK: int, RB: int, npl: int, NRL: int,
                 cb_ref, ism_ref, meta_ref, lens_ref,
                 runs_ref, st_ref, racc_ref):
    """One descending row-block of the event-driven traceback.
    st_ref rows: 0 hcur, 1 vcur, 2 top_op, 3 top_len, 4 rc, 5 it,
    6 layer (SWG) — per-pair scalars broadcast over lanes, so they do
    NOT grow with npl; only the band-indexed code/is-match reads do."""
    algo = cfg.algo
    R = cfg.read_size
    C = band_c(npl)
    b = pl.program_id(1)
    blk = NBK - 1 - b
    blk_lo = blk * RB

    lane = jax.lax.broadcasted_iota(I32, (P, 128), 1)
    bg = [lane + 128 * k for k in range(npl)]
    rl_iota = jax.lax.broadcasted_iota(I32, (P, NRL), 1)
    plens = lens_ref[:, 0:1]
    tlens = lens_ref[:, 1:2]
    RBQ = RB // 16 if algo == ALGO_NW else RB // 8
    W32B = RB // 32
    it_cap = (2 * R + 2) if algo == ALGO_NW else (3 * R + 4)

    @pl.when(b == 0)
    def _():
        # Forward-flagged pairs (meta flag => score uncertified => bit
        # 8+9 set on the record regardless) never walk: their codes may
        # be garbage (e.g. mrun=0 cycles that would burn the shared
        # iteration budget and starve the tile's good pairs), and their
        # walk output is discarded anyway.
        live = jnp.broadcast_to(meta_ref[:, 1:2] == 0, (P, 128))
        st_ref[0] = jnp.where(live, jnp.broadcast_to(tlens, (P, 128)), 0)
        st_ref[1] = jnp.where(live, jnp.broadcast_to(plens, (P, 128)), 0)
        zero = jnp.zeros((P, 128), I32)
        st_ref[2] = zero
        st_ref[3] = zero
        st_ref[4] = jnp.full((P, 128), NRL - 1, I32)
        st_ref[5] = zero
        st_ref[6] = zero
        racc_ref[:, :] = jnp.zeros((P, NRL), I32)

    def seg_planes(planes, pos):
        """Read per-pair band position pos (0..B-1) across the planes."""
        acc = jnp.take_along_axis(planes[0], jnp.clip(pos, 0, 127), axis=1)
        for k in range(1, npl):
            val = jnp.take_along_axis(planes[k],
                                      jnp.clip(pos - 128 * k, 0, 127),
                                      axis=1)
            acc = jnp.where(pos >= 128 * k, val, acc)
        return acc

    def ladder(ref, nq, qvec, off=0):
        out = jnp.zeros((P, 128), I32)
        for q in range(nq):
            out = jnp.where(qvec == q, ref[off + q], out)
        return out

    def maxscan_planes(ps):
        """Global prefix-max over band positions; seam carry (plane k's
        running max == all-lane max of its prefix-max plane) folds into
        plane k+1.  The carry is a rotation all-reduce, NOT a lane-127
        extract+broadcast: strided lane extracts inside the walk's scf
        loop SIGABRT Mosaic's layout pass at npl >= 2 (dead code at
        npl=1, hence invisible on the primary band)."""
        outs = []
        carry = None
        for k in range(npl):
            x = ps[k]
            s_ = 1
            while s_ <= 64:
                rolled = pltpu.roll(x, s_, 1)
                x = jnp.maximum(x, jnp.where(lane >= s_, rolled, -1))
                s_ *= 2
            if carry is not None:
                x = jnp.maximum(x, carry)
            if k + 1 < npl:
                s_ = 1
                y = x
                while s_ <= 64:
                    y = jnp.maximum(y, pltpu.roll(y, s_, 1))
                    s_ *= 2
                carry = y
            outs.append(x)
        return outs

    def emit_merge(st, mask, op, length):
        runs, rc, top_op, top_len = st
        do = mask & (length > 0)
        can = do & (top_len > 0) & (top_op == op) \
            & (top_len + length <= 4095) & (rc < NRL - 1)
        top_len2 = jnp.where(can, top_len + length, top_len)
        push = do & ~can
        val_old = (top_op << 12) | top_len
        # broadcast the push decision + value to the record plane
        runs = jnp.where((rl_iota == seg_at_r(rc, push) + 1)
                         & bmask(push & (top_len > 0) & (rc + 1 >= 2)
                                 & (rc + 1 <= NRL - 1)),
                         bval(val_old), runs)
        top_op = jnp.where(push, op, top_op)
        top_len2 = jnp.where(push, jnp.minimum(length, 4095), top_len2)
        rc = jnp.where(push, rc - 1, rc)
        return runs, rc, top_op, top_len2

    # The record plane is (P, NRL) while the walk state planes are
    # (P, 128) broadcast; emit decisions/values are uniform per pair, so
    # lane 0 carries them across.
    def bmask(m):            # (P, 128) bool -> (P, NRL) bool via lane 0
        return jnp.broadcast_to(m[:, 0:1], (P, NRL))

    def bval(v):             # (P, 128) i32 -> (P, NRL) broadcast
        return jnp.broadcast_to(v[:, 0:1], (P, NRL))

    def seg_at_r(v, _m):     # per-pair scalar -> (P, NRL) broadcast
        return jnp.broadcast_to(v[:, 0:1], (P, NRL))

    def emit_flush(st):
        runs, rc, top_op, top_len = st
        val = (top_op << 12) | top_len
        runs = jnp.where((rl_iota == seg_at_r(rc, None) + 1)
                         & bmask((top_len > 0) & (rc + 1 >= 2)
                                 & (rc + 1 <= NRL - 1)),
                         bval(val), runs)
        return runs, rc

    if cfg.backtrace:
        if algo == ALGO_NW:
            def bt_cond(st):
                it, hcur, vcur = st[0], st[1], st[2]
                act = (hcur > 0) & (vcur > 0) & (hcur > blk_lo)
                return (jnp.max((it < it_cap).astype(I32) *
                                act.astype(I32)) > 0)

            def bt_body(st):
                it, hcur, vcur, layer, runs, rc, top_op, top_len = st
                act = (hcur > 0) & (vcur > 0) & (hcur > blk_lo)
                hm1 = jnp.maximum(hcur - 1 - blk_lo, 0)   # block-local
                crow = [(ladder(cb_ref, RBQ, hm1 >> 4, off=k * RBQ)
                         >> (2 * (hm1 & 15))) & 3 for k in range(npl)]
                pm = maxscan_planes(
                    [jnp.where(crow[k] != C_D, bg[k], -1)
                     for k in range(npl)])
                bb = vcur - hcur + C
                pm_b = seg_planes(pm, bb)
                dlen = jnp.where(act, jnp.minimum(bb - pm_b, vcur), 0)
                st2 = emit_merge((runs, rc, top_op, top_len), act, OP_D,
                                 dlen)
                vcur = vcur - dlen
                act2 = act & (vcur > 0)
                b2 = vcur - hcur + C
                code2 = seg_planes(crow, b2)
                is_i = act2 & (code2 == C_I)
                is_x = act2 & (code2 == C_X)
                is_m = act2 & (code2 == C_M)
                pos = hm1 & 31
                iw = seg_planes(
                    [ladder(ism_ref, W32B, hm1 >> 5, off=k * W32B)
                     for k in range(npl)], b2)
                u = (~(iw >> (31 - pos))) & \
                    jnp.where(pos == 31, -1, (1 << (pos + 1)) - 1)
                mrun = jnp.where(u == 0, pos + 1, _ctz32(u))
                mrun = jnp.where(is_m,
                                 jnp.minimum(mrun,
                                             jnp.minimum(vcur, hcur)), 0)
                one = jnp.ones((P, 128), I32)
                op_sel = jnp.where(is_i, OP_I,
                                   jnp.where(is_m, OP_M, OP_X))
                length = jnp.where(is_m, mrun, one)
                runs, rc, top_op, top_len = emit_merge(
                    st2, is_i | is_m | is_x, op_sel, length)
                hcur = hcur - jnp.where(is_i | is_x, 1, mrun)
                vcur = vcur - jnp.where(is_x, 1, mrun)
                return (it + 1, hcur, vcur, layer, runs, rc, top_op,
                        top_len)
        else:
            def bt_cond(st):
                it, hcur, vcur = st[0], st[1], st[2]
                act = (hcur > 0) & (vcur > 0) & (hcur > blk_lo)
                return (jnp.max((it < it_cap).astype(I32) *
                                act.astype(I32)) > 0)

            def bt_body(st):
                it, hcur, vcur, layer, runs, rc, top_op, top_len = st
                act = (hcur > 0) & (vcur > 0) & (hcur > blk_lo)
                hm1 = jnp.maximum(hcur - 1 - blk_lo, 0)
                crow = [(ladder(cb_ref, RBQ, hm1 >> 3, off=k * RBQ)
                         >> (4 * (hm1 & 7))) & 0xF for k in range(npl)]
                choice = [crow[k] & 3 for k in range(npl)]
                dopen = [(crow[k] >> 2) & 1 for k in range(npl)]
                iopen = [(crow[k] >> 3) & 1 for k in range(npl)]
                bb = vcur - hcur + C
                one = jnp.ones((P, 128), I32)

                in_i = act & (layer == L_I)
                runs, rc, top_op, top_len = emit_merge(
                    (runs, rc, top_op, top_len), in_i, OP_I, one)
                io_here = seg_planes(iopen, bb)
                layer = jnp.where(in_i & (io_here == 1), L_M, layer)

                in_m = act & (layer == L_M) & ~in_i
                ch = seg_planes(choice, bb)
                is_d = in_m & (ch == CH_D)
                pmd = maxscan_planes(
                    [jnp.where(dopen[k] == 1, bg[k], -1)
                     for k in range(npl)])
                pmd_b = seg_planes(pmd, bb)
                dlen = jnp.where(is_d, bb - pmd_b + 1, 0)
                capped = is_d & (dlen >= vcur)
                dlen = jnp.minimum(dlen, vcur)
                runs, rc, top_op, top_len = emit_merge(
                    (runs, rc, top_op, top_len), is_d, OP_D, dlen)
                layer = jnp.where(capped, L_D, layer)

                is_i = in_m & (ch == CH_I)
                is_x = in_m & (ch == CH_X)
                is_m = in_m & (ch == CH_M)
                pos = hm1 & 31
                iw = seg_planes(
                    [ladder(ism_ref, W32B, hm1 >> 5, off=k * W32B)
                     for k in range(npl)], bb)
                u = (~(iw >> (31 - pos))) & \
                    jnp.where(pos == 31, -1, (1 << (pos + 1)) - 1)
                mrun = jnp.where(u == 0, pos + 1, _ctz32(u))
                mrun = jnp.where(is_m,
                                 jnp.minimum(mrun,
                                             jnp.minimum(vcur, hcur)), 0)
                op_sel = jnp.where(is_i, OP_I,
                                   jnp.where(is_m, OP_M, OP_X))
                length = jnp.where(is_m, mrun, one)
                runs, rc, top_op, top_len = emit_merge(
                    (runs, rc, top_op, top_len), is_i | is_m | is_x,
                    op_sel, length)
                io_h = seg_planes(iopen, bb)
                layer = jnp.where(is_i,
                                  jnp.where(io_h == 1, L_M, L_I), layer)
                hcur = hcur - jnp.where(in_i | is_i | is_x, 1, mrun)
                vcur = vcur - jnp.where(is_x, 1, dlen + mrun)
                return (it + 1, hcur, vcur, layer, runs, rc, top_op,
                        top_len)

        # Fresh iteration budget PER BLOCK: it_cap bounds any single
        # pair's legitimate steps (every active pair advances each
        # iteration), but different pairs walk different row blocks —
        # a tile-global budget could exhaust on one block's work and
        # falsely flag pairs still waiting for lower blocks.
        st0 = (jnp.zeros((P, 128), I32), st_ref[0], st_ref[1], st_ref[6],
               racc_ref[:, :], st_ref[4], st_ref[2], st_ref[3])
        it, hcur, vcur, layer, runs, rc, top_op, top_len = \
            jax.lax.while_loop(bt_cond, bt_body, st0)
        st_ref[0] = hcur
        st_ref[1] = vcur
        st_ref[2] = top_op
        st_ref[3] = top_len
        st_ref[4] = rc
        st_ref[5] = it
        st_ref[6] = layer
        racc_ref[:, :] = runs

    @pl.when(b == NBK - 1)
    def _():
        hcur = st_ref[0]
        vcur = st_ref[1]
        top_op = st_ref[2]
        top_len = st_ref[3]
        rc = st_ref[4]
        runs = racc_ref[:, :]
        score = jnp.broadcast_to(meta_ref[:, 0:1], (P, 128))
        flag = meta_ref[:, 1:2] > 0
        if cfg.backtrace:
            flag = flag | ((hcur[:, 0:1] > 0) & (vcur[:, 0:1] > 0))
            # tails can exceed the 12-bit run length at long reads:
            # emit them in <=4095 chunks (each chunk pushes its own run)
            st2 = (runs, rc, top_op, top_len)
            hrem, vrem = hcur, vcur
            for _ in range(-(-16352 // 4095)):
                hc = jnp.clip(hrem, 0, 4095)
                st2 = emit_merge(st2, hc > 0, OP_I, hc)
                hrem = hrem - hc
            for _ in range(-(-16352 // 4095)):
                vc = jnp.clip(vrem, 0, 4095)
                st2 = emit_merge(st2, vc > 0, OP_D, vc)
                vrem = vrem - vc
            runs, rc = emit_flush(st2)
            flag = flag | (rc[:, 0:1] < 1)
        # bit 8 = needs_fallback (score OR cigar uncertified); bit 9 =
        # score-only uncertainty (the forward's meta flag).  A pair with
        # bit 8 set but bit 9 clear has an EXACT score whose CIGAR
        # overflowed the record/walk — genasm_long uses this to apply
        # its >k overflow rewrite (which discards the CIGAR anyway).
        metaf = jnp.broadcast_to(meta_ref[:, 1:2] > 0, (P, 128))
        flagb = jnp.broadcast_to(flag, (P, 128))
        lane0 = _pack_lane0(rc, flagb.astype(I32), metaf.astype(I32), NRL)
        out = runs
        out = jnp.where(rl_iota == 0, bval(lane0), out)
        out = jnp.where(rl_iota == 1,
                        bval(jnp.clip(score, -32768, 32767)), out)
        runs_ref[:, :] = out.astype(I16)


# ===================== host glue =====================

def _mm_blocks(pats, txts, R, RB, NBK, T, npl):
    """Banded mismatch bitplanes: [T, NBK, (RB//32)*npl, P, 128] i32
    (plane-major), bit j of word w at (block k, plane p, lane b) =
    pat[(128p + b) - C + h - 1] != txt[h - 1] for h = k*RB + 32*w + j + 1.

    Built per row block to bound the XLA intermediates, with the block
    loop as a lax.fori_loop so the emitted module is CONSTANT in NBK —
    the old per-block Python unroll (128 slices x npl planes x NBK
    blocks) was the l*npl^2 compile-size bomb that put npl=2 SWG 6 kbp
    at a 570 s compile and npl=4 beyond the toolchain entirely
    (BASELINE.md round-4 npl=4 row; measured lowered sizes
    tools note: l=8k npl=4 24.5 MB -> ~constant after this change)."""
    n = pats.shape[0]
    C = band_c(npl)
    B = 2 * C + 1
    Rp = NBK * RB
    if pats.shape[1] < Rp:
        pats = jnp.pad(pats, ((0, 0), (0, Rp - pats.shape[1])))
        txts = jnp.pad(txts, ((0, 0), (0, Rp - txts.shape[1])))
    patp = jnp.pad(pats.astype(I32), ((0, 0), (C, 128 * npl)),
                   constant_values=-1)
    txtc = txts.astype(I32)
    W = (RB // 32) * npl
    shifts = jnp.arange(32, dtype=I32)[None, None, :, None]

    def body(k, out):
        t_blk = jax.lax.dynamic_slice(txtc, (0, k * RB), (n, RB))
        planes = []
        for p in range(npl):
            nb = min(128, B - 128 * p)
            # window covering rows k*RB..k*RB+RB-1, lanes 0..nb-1
            pat_blk = jax.lax.dynamic_slice(
                patp, (0, k * RB + 128 * p), (n, RB + 127))
            cols = [(pat_blk[:, b:b + RB] != t_blk) for b in range(nb)]
            mm = jnp.stack(cols, axis=2)             # [n, RB, nb]
            mm = jnp.pad(mm, ((0, 0), (0, 0), (0, 128 - nb)))
            mm = mm.astype(I32).reshape(n, RB // 32, 32, 128)
            mm = (mm << shifts).sum(axis=2)          # [n, RB//32, 128]
            planes.append(mm)
        blk = jnp.concatenate(planes, axis=1)        # [n, W, 128]
        return jax.lax.dynamic_update_slice(
            out, blk[:, None], (0, k, 0, 0))

    out = jax.lax.fori_loop(
        0, NBK, body, jnp.zeros((n, NBK, W, 128), I32))
    return out.reshape(T, P, NBK, W, 128).transpose(0, 2, 3, 1, 4)


def _unpack2(seq, R):
    shifts = jnp.arange(4, dtype=jnp.uint8) * 2
    u = ((seq[:, :, None] >> shifts) & 3).reshape(seq.shape[0], -1)
    return u[:, :R]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "interpret", "packed", "npl"))
def _nwswg_long_jit(pats, txts, plens, tlens, *, cfg: AlignConfig,
                    interpret: bool = False, packed: bool = False,
                    npl: int = 1):
    algo = cfg.algo
    R = cfg.read_size
    RB = block_rows(algo, npl)
    NBK = _round_up(R, RB) // RB
    RBQ = RB // 16 if algo == ALGO_NW else RB // 8
    NRL = runs_lanes_long(cfg)
    n = pats.shape[0]
    if packed:
        pats = _unpack2(pats, R)
        txts = _unpack2(txts, R)

    n_orig = n
    if n % P:
        padn = _round_up(n, P) - n
        pats = jnp.pad(pats, ((0, padn), (0, 0)))
        txts = jnp.pad(txts, ((0, padn), (0, 0)))
        plens = jnp.pad(plens, (0, padn))
        tlens = jnp.pad(tlens, (0, padn))
        n = n + padn
    T = n // P

    mm = _mm_blocks(pats, txts, R, RB, NBK, T, npl)
    lens = jnp.stack([plens.astype(I32).reshape(T, P),
                      tlens.astype(I32).reshape(T, P)], axis=2)
    lens = jnp.pad(lens, ((0, 0), (0, 0), (0, 126)))

    W = (RB // 32) * npl
    Q = RBQ * npl
    fwd = functools.partial(_fwd_kernel, cfg, NBK, RB, npl)
    meta_spec = pl.BlockSpec((None, P, 128), lambda t, b: (t, 0, 0),
                             memory_space=pltpu.VMEM)
    meta_shape = jax.ShapeDtypeStruct((T, P, 128), I32)
    bt_specs = (
        pl.BlockSpec((None, None, Q, P, 128),
                     lambda t, b: (t, b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((None, None, W, P, 128),
                     lambda t, b: (t, b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    bt_shapes = (
        jax.ShapeDtypeStruct((T, NBK, Q, P, 128), I32),
        jax.ShapeDtypeStruct((T, NBK, W, P, 128), I32),
    )
    outs = pl.pallas_call(
        fwd,
        grid=(T, NBK),
        in_specs=[
            pl.BlockSpec((None, None, W, P, 128),
                         lambda t, b: (t, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, 128), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # score-only runs emit ONLY the meta plane: the cb/ism history
        # blocks are neither allocated nor streamed (hbm_per_pair drops
        # their terms accordingly)
        out_specs=(bt_specs + (meta_spec,)) if cfg.backtrace
        else (meta_spec,),
        out_shape=(bt_shapes + (meta_shape,)) if cfg.backtrace
        else (meta_shape,),
        scratch_shapes=[pltpu.VMEM((7 * npl, P, 128), I32)],
        # npl=8's working set (7*npl carry scratch + double-buffered
        # Q-plane code blocks) overflows the default 16 MiB scoped-VMEM
        # budget by ~0.6 MiB; v5e VMEM is physically larger, so raise
        # the limit for the widest ladder stage only (measured: 16.56 M
        # needed at SWG R=576 npl=8).
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            **({"vmem_limit_bytes": 24 * 1024 * 1024}
               if npl >= 8 else {})),
        interpret=interpret,
    )(mm, lens)
    cb, ism, meta = outs if cfg.backtrace else (None, None, outs[0])

    if not cfg.backtrace:
        scores = meta[:, :, 0].reshape(n)
        flags = meta[:, :, 1].reshape(n)
        lane0 = _pack_lane0(jnp.full((n,), NRL - 1, I32),
                            (flags > 0).astype(I32),
                            (flags > 0).astype(I32), NRL)
        runs = jnp.zeros((n, NRL), I32)
        runs = runs.at[:, 0].set(lane0)
        runs = runs.at[:, 1].set(jnp.clip(scores, -32768, 32767))
        return {"packed_runs": runs[:n_orig].astype(I16)}

    walk = functools.partial(_walk_kernel, cfg, NBK, RB, npl, NRL)
    runs = pl.pallas_call(
        walk,
        grid=(T, NBK),
        in_specs=[
            pl.BlockSpec((None, None, Q, P, 128),
                         lambda t, b: (t, NBK - 1 - b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, W, P, 128),
                         lambda t, b: (t, NBK - 1 - b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, 128), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, P, 128), lambda t, b: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, P, NRL), lambda t, b: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, P, NRL), I16),
        scratch_shapes=[
            pltpu.VMEM((7, P, 128), I32),
            pltpu.VMEM((P, NRL), I32),
        ],
        # same raised scoped-VMEM budget as the forward at npl=8 (the
        # walk streams the same Q-plane code blocks back in)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            **({"vmem_limit_bytes": 24 * 1024 * 1024}
               if npl >= 8 else {})),
        interpret=interpret,
    )(cb, ism, meta, lens)
    return {"packed_runs": runs.reshape(n, NRL)[:n_orig]}


def nwswg_forward_pallas_long(pats, txts, plens, tlens, *,
                              cfg: AlignConfig, interpret: bool = False,
                              packed: bool = False, planes: int = 1):
    """NW/SWG long-read forward (+ on-device traceback), HBM-streamed
    tier.  Same record contract as the VMEM kernels: {"packed_runs":
    [n, NRL] i16}, lane0 = cursor | flags << 8, lane1 = score, runs in
    lanes cursor+1..NRL-1 (host: native.wfa_runs_to_ops).  planes=2
    selects the wide band (C=127) — the retry tier for pairs the
    primary band flags."""
    return _nwswg_long_jit(pats, txts, plens, tlens, cfg=cfg,
                           interpret=interpret, packed=packed, npl=planes)


nwswg_forward_pallas_long.supports_packed = True

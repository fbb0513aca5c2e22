"""GenASM — bitvector bounded-edit-distance Pallas TPU kernel.

Implements the GenASM-DC/TB scheme specified executably in
golden/genasm.py (the reference ships GenASM only as an empty submodule;
semantics are anchored to the NW walker at unit costs).  One fused
kernel per 128-pair tile runs the whole job on-chip:

  * state: bitvectors B_d (bit j <=> edit distance of (pattern[:j],
    text[:i]) <= d) packed 28 bits per word (values < 2^28 — the
    relay-safe bound, PERFNOTES.md §1), d-major rows of a [DW, 128]
    plane with pairs in lanes;
  * per-symbol pattern-match masks are packed ONCE per tile with an MXU
    matmul (a constant [2*Wg, R] selector matrix against the 0/1 compare
    plane, split into two 14-bit halves so the f32 accumulation stays
    exact), so each text step only selects one of four mask planes;
  * the 'D' term references the current step's lower-d vector — a prefix
    dependency along d resolved with log-doubling shifted ORs instead of
    a sequential d loop (the GenASM paper's DC iteration unrolled);
  * the traceback walks text levels i = tlen..0: the NW D -> I ->
    diagonal priority folds into one D-run (an anti-diagonal ones-run of
    the per-level bit volume, counted with an exact binary search) plus
    exactly one text-consuming op per level, each level writing one step
    record expanded by the SAME native expander as the WFA kernels
    (native.wfa_steps_to_ops with max_score = READ_SIZE level rows).

Score-only runs skip the history walk; distances above MAX_SCORE report
MAX_SCORE+1 with the oracle's default "M" CIGAR.
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
F32 = jnp.float32
BIG = 2 ** 20
WBITS = 28
MASK28 = (1 << WBITS) - 1

OP_M, OP_X, OP_I, OP_D = 0, 1, 2, 3
P = 128


def _divc(x, c: int):
    """floor(x / c) for 0 <= x < ~2^15 via exact-enough f32 multiply
    (Mosaic integer division support is uncertain; the +0.5 nudge keeps
    the product away from integers — same argument as wfa_pallas_long)."""
    return jnp.floor((x.astype(jnp.float32) + 0.5) * (1.0 / c)).astype(I32)


def genasm_record_rows(read_size: int) -> int:
    """Level rows 0..read_size + 2 final strokes + scores row."""
    return _round_up(read_size + 4, 8)


def _geom(cfg: AlignConfig):
    R = cfg.read_size
    k = cfg.max_score
    Wg = -(-(R + 2) // WBITS)
    DW = (k + 1) * Wg
    return R, k, Wg, DW


def vmem_fit_genasm(cfg: AlignConfig) -> bool:
    """Gate: ones-run masks need k < 28; the bit-volume history plus the
    working planes must fit VMEM with compiler-stack slack."""
    R, k, Wg, DW = _geom(cfg)
    if k >= WBITS - 1 or R + 2 > 0x3FFF:
        return False
    DWp = _round_up(DW, 8)
    hist = (R + 1) * DWp * P * 4
    seqs = 2 * _round_up(R + 2, 8) * P * 4
    recs = genasm_record_rows(R) * P * 4
    stack = 24 * DWp * P * 4
    return hist + seqs + recs + stack + 2 * 1024 * 1024 < 16 * 1024 * 1024


def _sel_matrix(Rp: int, Wg: int):
    """Constant selector routing pattern position r (bit j = r+1) into
    two 14-bit half-words per 28-bit word; f32-exact accumulation."""
    sel = []
    for half in range(2):
        for w in range(Wg):
            row = []
            for r in range(Rp):
                j = r + 1
                b = j - WBITS * w
                row.append(float(1 << (b - 14 * half))
                           if (0 <= b < WBITS
                               and half == (1 if b >= 14 else 0)) else 0.0)
            sel.append(row)
    import numpy as np
    out = np.zeros((_round_up(2 * Wg, 8), Rp), np.float32)
    out[:2 * Wg] = np.asarray(sel, np.float32)
    return out


def _genasm_kernel(cfg: AlignConfig, Rp: int, Wg: int, DW: int, DWp: int,
                   SR: int,
                   sel_ref, pats_ref, txts_ref, lens_ref,
                   rec_ref,
                   hist_ref):
    R, k, _, _ = _geom(cfg)

    plens = lens_ref[0:1, :]
    tlens = lens_ref[1:2, :]
    rio = jax.lax.broadcasted_iota(I32, (DWp, P), 0)
    g_row = _divc(rio, Wg)               # d-group of each row
    w_row = rio - g_row * Wg             # word index within the group
    live = rio < DW

    # ---- per-symbol pattern-match masks, packed via one MXU matmul ----
    # sel_ref routes pattern position r+1 into two 14-bit half-words per
    # 28-bit word (see _sel_matrix); the f32 accumulation is exact.
    selM = sel_ref[0:2 * Wg, :]

    pat = pats_ref[:]                    # [Rp, P] i32 codes
    txt = txts_ref[:]
    pms = []
    for sym in range(4):
        cmp_ = (pat == sym).astype(F32)
        halves = jnp.dot(selM, cmp_, preferred_element_type=F32).astype(I32)
        pms.append(halves[:Wg, :] + (halves[Wg:2 * Wg, :] << 14))

    def pm_full(ti_row):
        """[DWp, P] PM plane for this step's text symbols (one per lane),
        bit 0 of word 0 cleared (the empty-pattern state)."""
        pm = jnp.zeros((Wg, P), I32)
        for sym in range(4):
            pm = jnp.where(ti_row == sym, pms[sym], pm)
        out = jnp.zeros((DWp, P), I32)
        for w in range(Wg):
            out = jnp.where(w_row == w, pm[w:w + 1, :], out)
        return out

    def shl_bits(x, s):
        """Bitvector shift-left by s bits across word rows (s < 2*WBITS)."""
        wq, rb = divmod(s, WBITS)
        y = x
        if wq:
            y = pltpu.roll(y, wq, 0)
            y = jnp.where(w_row >= wq, y, 0)
        lo = (y << rb) & MASK28
        if rb:
            c = pltpu.roll(y, 1, 0) >> (WBITS - rb)
            lo = lo | jnp.where(w_row >= wq + 1, c, 0)
        return lo

    def prevd(x, levels=1):
        """Rows of the (d - levels) group aligned onto group d."""
        y = pltpu.roll(x, levels * Wg, 0)
        return jnp.where(g_row >= levels, y, 0)

    # ---- init: B_d^0 bit j = (j <= d) ----
    jlo = w_row * WBITS                  # lowest bit index of this row
    nbits = jnp.clip(g_row - jlo + 1, 0, WBITS)
    b0 = jnp.where(live, (1 << nbits) - 1, 0)
    hist_ref[0] = b0

    tmax = jnp.max(tlens)

    # ---- forward over text positions ----
    def fwd(i, B):
        ti = jnp.sum(jnp.where(
            jax.lax.broadcasted_iota(I32, (Rp, P), 0) == i - 1, txt, 0),
            axis=0, keepdims=True)
        pm = pm_full(ti)
        sh = shl_bits(B, 1)
        u = (sh & pm) | prevd(sh) | prevd(B)
        u = u | jnp.where((rio == g_row * Wg) & (g_row >= i), 1, 0)
        s = 1
        while s <= k:
            u = u | shl_bits(prevd(u, s), s)
            s *= 2
        u = jnp.where(live, u, 0)
        hist_ref[i] = u
        return u

    B = jax.lax.fori_loop(1, tmax + 1, fwd, b0)

    # ---- scores: lowest d with bit plen set in B^{tlen} ----
    # extracted per step would cost R reductions; instead one pass over
    # the stored history rows at each pair's own tlen via a fori that
    # only touches the needed row per level (levels are global).
    wp = _divc(plens, WBITS)
    bp = plens - wp * WBITS

    def bit_at(plane, j_w, j_b, grp):
        """bit j of group grp (per-lane) -> [1, P] 0/1."""
        hit = (w_row == j_w) & (g_row == grp) & live
        return jnp.sum(jnp.where(hit, (plane >> j_b) & 1, 0), axis=0,
                       keepdims=True)

    def lowest_d(plane):
        hit = (w_row == wp) & live
        bits = jnp.where(hit, (plane >> bp) & 1, 0)
        cand = jnp.where(hit & (bits > 0), g_row, BIG)
        return jnp.min(cand, axis=0, keepdims=True)

    def score_body(i, sc):
        d = lowest_d(hist_ref[i])
        here = tlens == i
        return jnp.where(here, jnp.where(d > k, k + 1, d), sc)

    scores = jax.lax.fori_loop(0, tmax + 1, score_body,
                               jnp.full((1, P), k + 1, I32))

    rec_ref[:, :] = jnp.zeros((SR, P), I32)
    rec_ref[R + 3:R + 4, :] = scores

    over = scores > k
    if not cfg.backtrace:
        # overflow pairs still need the oracle's default "M" record
        rec_ref[R + 1:R + 2, :] = jnp.where(over, (OP_M << 14) | 1, 0)
        return

    # ---- traceback over text levels ----
    ok = ~over
    lvl0 = jnp.max(jnp.where(ok, tlens, 0))

    def bt_body(it, st):
        jj, dd, ti, started_i = st
        i = lvl0 - it
        Bi = hist_ref[i]
        Bprev = hist_ref[jnp.maximum(i - 1, 0)]

        start = ok & (tlens == i) & ~(started_i > 0)
        jj = jnp.where(start, plens, jj)
        dd = jnp.where(start, scores, dd)
        ti = jnp.where(start, tlens, ti)
        started = (started_i > 0) | start

        act = started & (ti == i) & (jj > 0) & (i > 0)

        # D-run: anti-diagonal ones-run of B^i from (d-1, j-1) downward.
        # anti bit for group g = bit (jj - dd + g) of group g.
        bpos = jj - dd + g_row
        v_ok = (bpos >= 0) & (bpos <= R + 1) & live
        wq = _divc(jnp.clip(bpos, 0, R + 1), WBITS)
        rb = jnp.clip(bpos, 0, R + 1) - wq * WBITS
        hit = v_ok & (w_row == wq)
        anti = jnp.sum(jnp.where(hit, ((Bi >> rb) & 1) << g_row, 0),
                       axis=0, keepdims=True)
        # leading-ones of anti starting at bit dd-1 going down
        x = jnp.where(dd >= 1, (anti << (WBITS - 1 - (dd - 1))) & MASK28, 0)
        z = (~x) & MASK28
        hb = jnp.zeros((1, P), I32)
        for s in (16, 8, 4, 2, 1):
            step = (z >> (hb + s)) > 0
            hb = hb + jnp.where(step, s, 0)
        run = jnp.where(z > 0, WBITS - 1 - hb, WBITS)
        L = jnp.where(act, jnp.minimum(jnp.minimum(run, dd),
                                       jnp.maximum(jj, 0)), 0)
        jj = jj - L
        dd = dd - L

        act2 = act & (jj > 0)
        # I-check: bit jj of group dd-1 in B^{i-1}
        jw = _divc(jj, WBITS)
        i_ok = (act2 & (dd >= 1)
                & (bit_at(Bprev, jw, jj - jw * WBITS, dd - 1) > 0))
        # diagonal: match iff pattern[jj-1] == text[i-1]
        pio = jax.lax.broadcasted_iota(I32, (Rp, P), 0)
        pj = jnp.sum(jnp.where(pio == jj - 1, pat, 0), axis=0, keepdims=True)
        tc = jnp.sum(jnp.where(pio == i - 1, txt, 0), axis=0, keepdims=True)
        diag = act2 & ~i_ok
        is_m = diag & (pj == tc)
        is_x = diag & (pj != tc)

        opv = jnp.where(i_ok, OP_I, jnp.where(is_x, OP_X, 0))
        rec = (jnp.where(is_m, 1, 0)
               | (opv << 14)
               | (jnp.minimum(L, 0x7FF) << 16)
               | (1 << 27) * (L > 0).astype(I32))
        rec_ref[pl.ds(i, 1), :] = rec

        jj = jj - jnp.where(diag, 1, 0)
        dd = dd - jnp.where(i_ok | is_x, 1, 0)
        ti = ti - jnp.where(act2, 1, 0)
        return jj, dd, ti, started.astype(I32)

    zeros = jnp.zeros((1, P), I32)
    jj, dd, ti, started_i = jax.lax.fori_loop(
        0, lvl0 + 1, bt_body, (plens, zeros, tlens, zeros))

    # final strokes: leftover pattern (D) / text (I); overflow pairs get
    # the oracle's default single-'M' record.
    fin_d = jnp.where(ok, jnp.maximum(jj, 0), 0)
    fin_i = jnp.where(ok, jnp.maximum(ti, 0), 0)
    rec1 = jnp.where(fin_d > 0,
                     jnp.minimum(fin_d, 0x3FFF) | (OP_D << 14), 0)
    rec1 = jnp.where(over, (OP_M << 14) | 1, rec1)
    rec_ref[R + 1:R + 2, :] = rec1
    rec_ref[R + 2:R + 3, :] = jnp.where(
        fin_i > 0, jnp.minimum(fin_i, 0x3FFF) | (OP_I << 14), 0)


def genasm_forward_pallas(pats, txts, plens, tlens, *, cfg: AlignConfig,
                          interpret: bool = False, packed: bool = False):
    """GenASM forward (+ on-device traceback), one fused dispatch.

    Returns {"genasm_records": [n, genasm_record_rows(R)] i32} — level
    rows 0..R, final strokes R+1/R+2, scores R+3; expanded by
    native.wfa_steps_to_ops(max_score=R).  Inputs must be 2-bit packable
    (api falls back to the host tier otherwise)."""
    if not packed:
        import numpy as np
        from aim_tpu.ops.common import pack_seqs
        pp, tt, ok = pack_seqs(np.asarray(pats, np.uint8),
                               np.asarray(txts, np.uint8),
                               np.asarray(plens), np.asarray(tlens),
                               cfg.read_size)
        if not ok:
            raise ValueError("genasm kernel requires a <=4-symbol alphabet "
                             "(the host tier serves the rest)")
        pats, txts = pp, tt
    return _genasm_jit(pats, txts, plens, tlens, cfg=cfg,
                       interpret=interpret)


genasm_forward_pallas.requires_packed = True


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def _genasm_jit(pats, txts, plens, tlens, *, cfg: AlignConfig,
                interpret: bool = False):
    R, k, Wg, DW = _geom(cfg)
    DWp = _round_up(DW, 8)
    Rp = _round_up(R + 2, 8)
    SR = genasm_record_rows(R)
    n = pats.shape[0]

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
    pats = pats[:, :Rp].astype(I32)
    txts = txts[:, :Rp].astype(I32)

    T = n // P
    pat3 = pats.reshape(T, P, Rp).transpose(0, 2, 1)
    txt3 = txts.reshape(T, P, Rp).transpose(0, 2, 1)
    lens = jnp.stack([plens.astype(I32).reshape(T, P),
                      tlens.astype(I32).reshape(T, P)], axis=1)
    lens = jnp.pad(lens, ((0, 0), (0, 6), (0, 0)))

    selM = jnp.asarray(_sel_matrix(Rp, Wg))
    SELR = selM.shape[0]
    kernel = functools.partial(_genasm_kernel, cfg, Rp, Wg, DW, DWp, SR)
    rec = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((SELR, Rp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Rp, P), lambda i: (i, 0, 0),
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
            pltpu.VMEM((R + 2, DWp, P), I32),  # bit-volume history
        ],
        interpret=interpret,
    )(selM, pat3, txt3, lens)
    # drop the pad rows before D2H (relay pulls are ~60-90 ms/MB)
    recs = rec.transpose(0, 2, 1).reshape(n, SR)[:n_orig, :R + 4]
    return {"genasm_records": recs}

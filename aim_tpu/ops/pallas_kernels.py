"""Backend dispatch for the hand-written Pallas TPU kernels.

forward_fn(cfg) returns a kernel callable with the same signature as the
XLA implementations, or None when no Pallas kernel covers the config
(the caller falls back to XLA).

Tier note: the banded NW/SWG kernels serve BOTH memory tiers — the
variants differ only in cell width (SWG) and the WFA overflow divergence,
which the kernels parameterize — but an SWG 'vmem' (int8-cell) config is
only accepted within the reference WRAM launcher's feasibility envelope:
outside it the reference short-read tier does not exist, int8 wrap at
far-from-band cells becomes possible, and the full-width XLA path (whose
wrap flags see every cell) is the exact fallback.
"""

from __future__ import annotations

from aim_tpu.config import (ALGO_GENASM, ALGO_NW, ALGO_SWG, ALGO_WFA,
                            AlignConfig, wram_feasible)


def forward_fn(cfg: AlignConfig, packed_ok: bool = True):
    """packed_ok=False means the batch alphabet cannot 2-bit-pack
    (>4 symbols — data-dependent, so api.align re-dispatches with it
    after pack_seqs fails): tiers whose KERNEL needs packed codes (WFA
    long extend's packed-word XOR, GenASM's 2-bit PM masks) are skipped
    so a byte-comparing tier can serve instead."""
    if cfg.algo == ALGO_WFA:
        from aim_tpu.ops.wfa_pallas2 import vmem_fit2, wfa_forward_pallas2

        # Short-read kernel: all state in VMEM (the DPU-WRAM analogue);
        # step-record bit fields cap max_score at 1023 and the fused
        # scratch must fit VMEM (PERFNOTES.md §3) — vmem_fit2 checks both.
        # Symbols are compared as int32 planes by equality, so ANY byte
        # alphabet works (packing is transport-only here).
        if vmem_fit2(cfg):
            def fn(*args, **kw):
                return wfa_forward_pallas2(*args, **kw)

            return fn

        # Long-read kernel: wavefront ring in VMEM, history spilled to
        # HBM (the DPU-MRAM analogue).  2-bit-packable batches take the
        # 14-base-word extend; >4-symbol batches run the same kernel
        # with 3-byte words (the reference compares raw bytes everywhere,
        # ref: WFA/DPU-MRAM/dpu/wfa.c:193-215 — no alphabet restriction).
        from aim_tpu.ops.wfa_pallas_long import (long_fit,
                                                 wfa_forward_pallas_long)

        if packed_ok and long_fit(cfg):
            def fn(*args, **kw):
                return wfa_forward_pallas_long(*args, **kw)

            fn.requires_packed = True
            return fn
        if not packed_ok and long_fit(cfg, bytes_mode=True):
            from aim_tpu.ops.wfa_pallas_long import (
                wfa_forward_pallas_long_bytes)

            def fn(*args, **kw):
                kw.pop("packed", None)  # raw bytes straight to the kernel
                return wfa_forward_pallas_long_bytes(*args, **kw)

            return fn
    if cfg.algo == ALGO_GENASM:
        from aim_tpu.ops.genasm_pallas import (genasm_forward_pallas,
                                               vmem_fit_genasm)

        if packed_ok and vmem_fit_genasm(cfg):
            def fn(*args, **kw):
                return genasm_forward_pallas(*args, **kw)

            fn.requires_packed = True
            return fn

        # Long-read tier: GenASM == NW at unit costs here, served by the
        # HBM-streamed banded kernel through an overflow-rewrite adapter.
        from aim_tpu.ops.genasm_long import (genasm_forward_pallas_long,
                                             hbm_per_pair as genasm_hbm,
                                             long_fit_genasm)

        if long_fit_genasm(cfg):
            def fn(*args, **kw):
                return genasm_forward_pallas_long(*args, **kw)

            # No requires_packed: the underlying streamed NW kernel
            # compares raw bytes, so this tier serves ANY byte alphabet
            # (2-bit packing is a transport optimization only).
            fn.out_key = "packed_runs"
            fn.hbm_per_pair = genasm_hbm(cfg)

            def genasm_retry(*args, planes=2, **kw):
                return genasm_forward_pallas_long(*args, planes=planes,
                                                  **kw)
            fn.retry_fn = genasm_retry
            # k > 124 already runs the npl=2 band as its PRIMARY tier;
            # _retry_stages drops ladder stages that are not wider.
            from aim_tpu.ops.genasm_long import _npl
            fn.primary_planes = _npl(cfg)
            return fn
    if cfg.algo == ALGO_NW:
        from aim_tpu.ops.nw_pallas import (nw_forward_pallas, vmem_fit_nw,
                                           vmem_tier_hbm_per_pair)

        if vmem_fit_nw(cfg):
            def fn(*args, **kw):
                return nw_forward_pallas(*args, **kw)

            fn.hbm_per_pair = vmem_tier_hbm_per_pair(cfg)
            _attach_wide_retry(fn, cfg)
            return fn

        # Long-read tier: direction codes streamed through HBM by the
        # grid pipeline (the DPU-MRAM analogue, NW/DPU-MRAM/dpu/nw.c).
        fn = long_fit_nwswg_routed(cfg)
        if fn is not None:
            return fn
    if cfg.algo == ALGO_SWG:
        from aim_tpu.ops.swg_pallas import (swg_forward_pallas, swg_int8_sound,
                                            vmem_fit_swg)

        int8_ok = cfg.cell_width != 1 or (wram_feasible(cfg)
                                          and swg_int8_sound(cfg))
        # Negative match costs void the band-exactness cost argument
        # (excursions can be funded by negative-cost matches, invisible
        # to any per-pair flag) — the full-width XLA tier is exact there.
        if vmem_fit_swg(cfg) and int8_ok and cfg.match >= 0:
            from aim_tpu.ops.nw_pallas import vmem_tier_hbm_per_pair

            def fn(*args, **kw):
                return swg_forward_pallas(*args, **kw)

            fn.hbm_per_pair = vmem_tier_hbm_per_pair(cfg)
            _attach_wide_retry(fn, cfg)
            return fn

        # Long-read tier (int16 cells only — the MRAM-variant widths,
        # SWG/DPU-MRAM/dpu/swg.c; int8 wrap semantics stay on XLA).
        fn = long_fit_nwswg_routed(cfg)
        if fn is not None:
            return fn
    return None


def long_fit_nwswg_routed(cfg: AlignConfig):
    """NW/SWG streamed long tier with admission routing: the primary
    pass runs at route_planes(cfg) planes, so configs whose e*l
    prediction puts the median pair past the C=63 band (round-4 data:
    98% of SWG 8 kbp e=1% pairs) skip the doomed npl=1 dispatch.
    primary_planes makes api._retry_stages drop ladder stages that are
    not wider.  Outputs are route-invariant: every plane count
    re-derives its own exactness flags."""
    from aim_tpu.ops.nwswg_pallas_long import (hbm_per_pair,
                                               long_fit_nwswg,
                                               nwswg_forward_pallas_long,
                                               route_planes)

    if not long_fit_nwswg(cfg):
        return None
    p0 = route_planes(cfg)

    def fn(*args, **kw):
        kw.setdefault("planes", p0)
        return nwswg_forward_pallas_long(*args, **kw)

    # plane buffers scale with npl; score/flag terms don't — scale the
    # conservative per-pair figure by the routed plane count
    fn.hbm_per_pair = p0 * hbm_per_pair(cfg)
    fn.primary_planes = p0
    _attach_wide_retry(fn, cfg)
    return fn


def _attach_wide_retry(fn, cfg):
    """Give an NW/SWG tier the wide-band (npl=2, C=127) retry when the
    streamed kernel admits the config: api.align re-runs the tier's
    flagged pairs there before the host oracle.  The wide kernel
    re-derives its own exactness flags, so ANY pair it certifies is
    exact regardless of why the first tier flagged.  int8-cell SWG
    configs are excluded by long_fit (genuine wrap semantics live only
    in the XLA tier).  ONE admission rule for all four attachment
    sites (NW/SWG x vmem/long)."""
    from aim_tpu.ops.nwswg_pallas_long import long_fit_nwswg
    if long_fit_nwswg(cfg):
        fn.retry_fn = _nwswg_wide_retry


def _nwswg_wide_retry(*args, planes=2, **kw):
    """Wider-band retry for pairs the primary streamed band flags —
    api.align._retry_wide routes band-flagged pairs here before the
    host oracle.  planes=2 (C=127) is the default wide stage; the
    AIM_TPU_RETRY_PLANES ladder may escalate further (the kernel is
    plane-generic)."""
    from aim_tpu.ops.nwswg_pallas_long import nwswg_forward_pallas_long
    return nwswg_forward_pallas_long(*args, planes=planes, **kw)

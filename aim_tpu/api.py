"""High-level alignment API: batches, backends, fallback, traceback.

This is the framework's equivalent of the reference host orchestrator
(ref: WFA/DPU-MRAM/host/host.c:136-377): pack pairs -> push to device ->
run the batch kernel -> pull results -> reconstruct CIGARs -> emit.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import sys
import time
from dataclasses import dataclass

import jax
import numpy as np

from aim_tpu.config import (ALGO_GENASM, ALGO_NW, ALGO_SWG, ALGO_WFA,
                            AlignConfig)
from aim_tpu import native

# Persistent compilation cache (compiles are expensive on this host; a
# config re-derivation re-jits, the cache makes that cheap across runs).
try:
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/aim_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass


@dataclass
class AlignResult:
    scores: np.ndarray                 # [n] int32
    ops: np.ndarray | None = None      # [n, 2R] uint8 (backtrace only)
    begin: np.ndarray | None = None    # [n] int32
    end: np.ndarray | None = None      # [n] int32
    # phase timings (seconds), mirroring the reference's CPU-DPU /
    # DPU Kernel / DPU-CPU phases (ref: host.c:272,299,330)
    t_load: float = 0.0
    t_kernel: float = 0.0
    t_retrieve: float = 0.0
    n_fallback: int = 0
    n_retry: int = 0     # pairs served by an on-device retry tier
    # Measured host-side energy over the whole align() span (J), from
    # RAPL powercap counters when the host exposes them; None otherwise
    # (containers and relay-attached hosts typically expose none).
    energy_measured_j: float | None = None


_EAGER_DONE = False
_BUDGET_LOGGED = False


def _ensure_eager_dispatch():
    """Flip this process's runtime into the eager dispatch mode once.

    On this relay runtime, a process that has completed one device->host
    transfer executes all subsequent work eagerly-synchronously, which is
    the FASTER steady state for bulk upload->execute->pull pipelines (the
    deferred mode serializes everything into the final pull at a worse
    rate — measured, PERFNOTES.md §4).  The first D2H the relay ever
    serves can stall (the "lottery", PERFNOTES.md §2) — that cost exists
    on either path; paying it up front on 64 bytes keeps it out of the
    bulk transfers.
    """
    global _EAGER_DONE
    if _EAGER_DONE:
        return
    _EAGER_DONE = True
    b = jax.device_put(np.zeros(64, np.uint8))
    jax.block_until_ready(b)
    np.asarray(b)


def _forward_fn(cfg: AlignConfig, device_sharding=None, packed_ok=True):
    """packed_ok=False re-dispatches AFTER pack_seqs found a >4-symbol
    batch alphabet: packing-requiring Pallas tiers are skipped so a
    byte-comparing tier (or the exact XLA/host path) serves instead."""
    backend = cfg.backend
    if backend == "auto":
        # The Pallas kernels are TPU-only (Mosaic); any other platform
        # (CPU meshes, GPU installs) takes the XLA tier.
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        backend = "pallas" if on_tpu else "xla"
    if backend == "pallas":
        try:
            from aim_tpu.ops import pallas_kernels
            fn = pallas_kernels.forward_fn(cfg, packed_ok=packed_ok)
            if fn is not None:
                if device_sharding is not None:
                    # Pallas kernels don't auto-partition under SPMD jit;
                    # run one kernel instance per shard via shard_map (pairs
                    # are embarrassingly parallel — no collectives needed).
                    from jax.sharding import PartitionSpec as P
                    shard_map = jax.shard_map
                    mesh = device_sharding.mesh
                    inner = fn

                    out_key = getattr(fn, "out_key", None) or {
                        ALGO_WFA: "step_records",
                        ALGO_GENASM: "genasm_records"}.get(
                            cfg.algo, "packed_runs")

                    def smfn(pats, txts, plens, tlens, *, cfg, **kw):
                        def one(*args):
                            return inner(*args, cfg=cfg, **kw)
                        return shard_map(
                            one, mesh=mesh,
                            in_specs=(P("pairs"), P("pairs"),
                                      P("pairs"), P("pairs")),
                            out_specs={out_key: P("pairs", None)},
                            check_vma=False)(pats, txts, plens, tlens)

                    smfn.supports_packed = True
                    smfn.requires_packed = getattr(fn, "requires_packed",
                                                   False)
                    smfn.hbm_per_pair = getattr(fn, "hbm_per_pair", None)
                    smfn.primary_planes = getattr(fn, "primary_planes", 1)
                    rfn = getattr(fn, "retry_fn", None)
                    if rfn is not None:
                        # retry batches shard the same way (_retry_wide
                        # pads them to a multiple of the mesh alignment)
                        def smretry(pats, txts, plens, tlens, *, cfg, **kw):
                            def one(*args):
                                return rfn(*args, cfg=cfg, **kw)
                            return shard_map(
                                one, mesh=mesh,
                                in_specs=(P("pairs"), P("pairs"),
                                          P("pairs"), P("pairs")),
                                out_specs={"packed_runs": P("pairs", None)},
                                check_vma=False)(pats, txts, plens, tlens)
                        smfn.retry_fn = smretry
                    return smfn
                fn.supports_packed = True
                return fn
        except ImportError:
            pass
    if cfg.algo == ALGO_GENASM:
        # No XLA tier: GenASM runs on the Pallas kernel or the exact
        # multi-threaded host oracle (align() handles fwd=None).
        return None
    if cfg.algo == ALGO_NW:
        from aim_tpu.ops.nw_xla import nw_forward
        return nw_forward
    if cfg.algo == ALGO_SWG:
        from aim_tpu.ops.swg_xla import swg_forward
        return swg_forward
    from aim_tpu.ops.wfa_xla import wfa_forward
    return wfa_forward


def _pad_batch(arrs, size):
    n = arrs[0].shape[0]
    if n == size:
        return arrs
    out = []
    for a in arrs:
        pad = [(0, size - n)] + [(0, 0)] * (a.ndim - 1)
        out.append(np.pad(a, pad))
    return out


def _oracle_align(pats, txts, plens, tlens, cfg: AlignConfig):
    """Exact-semantics host path (used for flagged-pair fallback);
    threads=0 sizes a pool from the host — flagged batches can be large
    and the per-pair work is embarrassingly parallel."""
    if cfg.algo == ALGO_NW:
        return native.nw_align(pats, txts, plens, tlens,
                               mismatch=cfg.mismatch, gap_i=cfg.gap_i,
                               gap_d=cfg.gap_d, backtrace=cfg.backtrace,
                               threads=0)
    if cfg.algo == ALGO_SWG:
        return native.swg_align(pats, txts, plens, tlens, match=cfg.match,
                                mismatch=cfg.mismatch, gap_o=cfg.gap_o,
                                gap_e=cfg.gap_e, max_score=cfg.max_score,
                                cell_width=cfg.cell_width,
                                backtrace=cfg.backtrace, threads=0)
    if cfg.algo == ALGO_GENASM:
        return native.genasm_align(pats, txts, plens, tlens,
                                   max_score=cfg.max_score,
                                   backtrace=cfg.backtrace, threads=0)
    return native.wfa_align(pats, txts, plens, tlens, mismatch=cfg.mismatch,
                            gap_o=cfg.gap_o, gap_e=cfg.gap_e,
                            max_score=cfg.max_score, adaptive=cfg.adaptive,
                            backtrace=cfg.backtrace, threads=0)


def _device_memory_budget(default_bytes=2 << 30) -> int:
    """Per-device HBM budget for alignment state: half of the device's
    reported memory limit (leaves room for XLA temporaries, double
    buffering, and the framework's own outputs), with a conservative
    fallback when the runtime exposes no stats (CPU meshes report none).
    The analogue of the reference's 64 MB MRAM capacity constant
    (ref: common/mram-management.h:27 DPU_CAPACITY).

    Logs (once) which budget was chosen: the HBM-tier batch cap silently
    means something different on a stats-less CPU mesh vs a real TPU."""
    global _BUDGET_LOGGED
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit and limit > 0:
            if not _BUDGET_LOGGED:
                _BUDGET_LOGGED = True
                print(f"device memory budget: {int(limit) // 2 >> 20} MiB "
                      "(half the runtime-reported limit)", file=sys.stderr)
            return int(limit) // 2
    except Exception:
        pass
    if not _BUDGET_LOGGED:
        _BUDGET_LOGGED = True
        print(f"device memory budget: {default_bytes >> 20} MiB "
              "(no runtime memory stats — conservative default)",
              file=sys.stderr)
    return default_bytes


def _memory_batch_cap(cfg: AlignConfig, pallas_active=False,
                      budget_bytes=None, per_pair=None) -> int:
    """Cap the device batch by per-pair state footprint — the HBM-tier
    analogue of the reference launchers' MRAM-fit shrink loops
    (ref: run-nw-pim-mram.py:87-96).  The Pallas VMEM tier keeps
    alignment state in per-tile VMEM scratch, so its HBM footprint is
    just the packed sequences and the runs record; HBM-streaming kernels
    declare their real footprint via fn.hbm_per_pair (per_pair here)."""
    if budget_bytes is None:
        budget_bytes = _device_memory_budget()
    R = cfg.read_size
    if per_pair is not None:
        per = per_pair
    elif pallas_active:
        per = 4 * R + 512
    elif cfg.algo == ALGO_WFA:
        K = 2 * cfg.max_score + 1
        per = (cfg.max_score + 2) * K * 3 * 2 + K * (R + 2) * 2 + 4 * R
    else:
        per = (R + 1) * (R + 1) * (1 if cfg.backtrace else 0) + 8 * (R + 1)
    per = max(per, 1)
    return max(256, budget_bytes // per)


@functools.lru_cache(maxsize=64)
def _make_unfuse(bs, p_cols, t_cols):
    """Device-side splitter for the fused-upload layout: one uint8 host
    buffer [pats | txts | plens | tlens] per chunk becomes the four
    kernel inputs via static slices + a bitcast for the int32 lengths.
    One jit specialization per align() call (chunk shapes are constant).
    Rationale: the relay charges a fixed ~25-30 ms per H2D transfer
    (PERFNOTES.md §2); 1 transfer + 1 cheap device dispatch beats 4
    transfers when tools/dev_upload_fuse.py confirms it on the live TPU.
    """
    import jax.numpy as jnp

    psz = bs * p_cols
    tsz = bs * t_cols
    lsz = bs * 4

    @jax.jit
    def unfuse(buf):
        o = 0
        pats = buf[o:o + psz].reshape(bs, p_cols); o += psz
        txts = buf[o:o + tsz].reshape(bs, t_cols); o += tsz
        plens = jax.lax.bitcast_convert_type(
            buf[o:o + lsz].reshape(bs, 4), jnp.int32); o += lsz
        tlens = jax.lax.bitcast_convert_type(
            buf[o:o + lsz].reshape(bs, 4), jnp.int32)
        return pats, txts, plens, tlens

    return unfuse


def _fuse_chunk(cp, ct, cpl, ctl):
    return np.concatenate([
        np.ascontiguousarray(cp).reshape(-1),
        np.ascontiguousarray(ct).reshape(-1),
        np.ascontiguousarray(cpl.astype(np.int32, copy=False))
        .view(np.uint8).reshape(-1),
        np.ascontiguousarray(ctl.astype(np.int32, copy=False))
        .view(np.uint8).reshape(-1)])


_RETRY_DISABLED = set()      # plane counts whose retry tier failed


def _retry_stages(fwd) -> tuple:
    """Escalation ladder for the band-retry tier: plane counts tried in
    ascending order on still-flagged pairs (band half-width
    C = 64*planes - 1).  Default "2,4,8": all three stages are
    TPU-validated exact (npl=4 SWG l=12 kbp certifies after the round-5
    _mm_blocks compile-size fix; npl=8 / C=511 certifies at SWG l=4 kbp
    with scores past the npl=4 envelope — the widest stage exists for
    pairs whose alternative is the ~35 ms/pair-per-4kbp host oracle).
    AIM_TPU_RETRY_PLANES overrides.  Stages not wider
    than the PRIMARY tier's band (fwd.primary_planes — GenASM k>124 and
    admission-routed NW/SWG configs already start wider) are dropped:
    re-running the width that just flagged the pair is a
    guaranteed-futile device dispatch.  Malformed tokens are warned
    about, not silently swallowed."""
    if getattr(fwd, "retry_fn", None) is None:
        return ()
    raw = os.environ.get("AIM_TPU_RETRY_PLANES", "2,4,8")
    stages = set()
    for tok in raw.split(","):
        tok = tok.strip()
        if not tok:
            continue
        try:
            p = int(tok)
        except ValueError:
            print(f"AIM_TPU_RETRY_PLANES: ignoring malformed token "
                  f"{tok!r}", file=sys.stderr)
            continue
        if 1 < p <= 8:
            stages.add(p)
        else:
            print(f"AIM_TPU_RETRY_PLANES: ignoring out-of-range plane "
                  f"count {p} (need 2..8)", file=sys.stderr)
    if not stages and raw.strip() != "":
        stages = {2}
    primary = getattr(fwd, "primary_planes", 1)
    return tuple(sorted(p for p in stages if p > primary))


def _retry_wide(retry, cfg, cpats, ctxts, cplens, ctlens, sel, scores,
                ops, begin, end, lo, max_ops, put, res, planes=2,
                pad_align=8):
    """Re-run a chunk's flagged pairs through the kernel's wide-band
    retry tier (on-device, band half-width C = 64*planes - 1).
    Successful (unflagged) retries land their scores/CIGARs directly;
    returns the still-flagged subset of sel for the next ladder stage /
    host-oracle fallback.  The retry batch is padded to a power of two
    (>= 128) so repeated retries share a handful of jit specializations
    instead of one per flag count."""
    if planes in _RETRY_DISABLED:
        return sel
    from aim_tpu.ops.nwswg_pallas_long import band_c

    # Pairs this band width flags unconditionally skip the device
    # retry (their flag conditions are host-computable from lengths and
    # cfg alone): tape-aliasing beyond plen == tlen+1, length skew past
    # the band, and SWG's length-only int16 wrap bound.  When a
    # chunk's flags are ALL unfixable, no wide dispatch is paid.
    unfix = (cplens[sel] > ctlens[sel] + 1) \
        | (ctlens[sel].astype(np.int64) > cplens[sel] + band_c(planes))
    if cfg.algo == ALGO_SWG:
        margin = cfg.gap_o + cfg.gap_e + max(cfg.mismatch, abs(cfg.match),
                                             cfg.gap_e)
        if cfg.max_score + margin > 32767:
            return sel
        unfix = unfix | ((cfg.gap_o + np.maximum(cplens[sel], ctlens[sel])
                          .astype(np.int64) * cfg.gap_e + margin) > 32767)
    if unfix.any():
        keep = sel[~unfix]
        if not len(keep):
            return sel
        left = _retry_wide(retry, cfg, cpats, ctxts, cplens, ctlens,
                           keep, scores, ops, begin, end, lo, max_ops,
                           put, res, planes, pad_align)
        return np.sort(np.concatenate([sel[unfix], left]))

    # Cap the retry batch so the band's ~planes-x per-pair HBM footprint
    # stays inside the same budget the main batch cap enforces (at the
    # largest admitted R the cap itself is the binding limit, not 8192).
    # GenASM retries dispatch the NW unit-cost kernel, so its footprint
    # is the NW one (ops/genasm_long.hbm_per_pair), not the raw-algo
    # figure (which would take the SWG 64R branch and halve the cap).
    if cfg.algo == ALGO_GENASM:
        from aim_tpu.ops.genasm_long import hbm_per_pair as _retry_hpp
    else:
        from aim_tpu.ops.nwswg_pallas_long import hbm_per_pair as _retry_hpp
    cap = 128
    budget_cap = _memory_batch_cap(cfg, True,
                                   per_pair=planes * _retry_hpp(cfg))
    while cap * 2 <= min(8192, budget_cap):
        cap *= 2
    if len(sel) > cap:
        out_sel = []
        for s0 in range(0, len(sel), cap):
            out_sel.append(_retry_wide(retry, cfg, cpats, ctxts, cplens,
                                       ctlens, sel[s0:s0 + cap], scores,
                                       ops, begin, end, lo, max_ops, put,
                                       res, planes, pad_align))
        return np.concatenate(out_sel)

    m = len(sel)
    pad = 128
    while pad < m:
        pad *= 2
    # shard_map partitions the 'pairs' axis, so sharded retries must pad
    # to a multiple of the mesh alignment too (a bare power of two is NOT
    # divisible by e.g. a 6-device mesh)
    pad = -(-pad // pad_align) * pad_align

    def padto(a):
        return np.pad(a, ((0, pad - m),) + ((0, 0),) * (a.ndim - 1))

    rpl = cplens[sel].astype(np.int32)
    rtl = ctlens[sel].astype(np.int32)
    try:
        out = retry(put(padto(cpats[sel])), put(padto(ctxts[sel])),
                    put(padto(rpl)), put(padto(rtl)), cfg=cfg,
                    planes=planes)
        pr = np.ascontiguousarray(jax.device_get(out["packed_runs"]))[:m]
    except Exception as e:  # pragma: no cover - degrade, don't die:
        # a retry-tier failure (e.g. a compile limit on some config)
        # must leave the flagged pairs on the exact host-oracle path —
        # and DISABLE this stage so later chunks don't re-pay the
        # failed compile/alloc (jit does not cache failures)
        _RETRY_DISABLED.add(planes)
        print(f"band retry (planes={planes}) unavailable "
              f"({type(e).__name__}); flagged pairs use the host oracle",
              file=sys.stderr)
        return sel
    sc2 = pr[:, 1].astype(np.int32)
    fb2 = ((pr[:, 0].astype(np.int32) >> 8) & 1).astype(bool)
    good = ~fb2
    if good.any():
        g = sel[good]
        res.n_retry += len(g)
        scores[lo + g] = sc2[good]
        if ops is not None:
            o, b, e = native.wfa_runs_to_ops(pr, sc2, rpl, rtl,
                                             max_score=(1 << 30),
                                             max_ops=max_ops)
            ops[lo + g] = o[good]
            begin[lo + g] = b[good]
            end[lo + g] = e[good]
    return sel[fb2]


def _plan_bs(cfg: AlignConfig, fwd, n: int, ndev: int):
    """Device chunk size + alignment: one jit specialization per run,
    capped by the per-pair HBM footprint (the reference launchers'
    MRAM-fit shrink-loop analogue) and rounded to the mesh alignment."""
    align_to = max(8, 8 * ndev)
    bs = min(cfg.batch_pairs,
             _memory_batch_cap(cfg, getattr(fwd, "supports_packed", False),
                               per_pair=getattr(fwd, "hbm_per_pair", None)),
             -(-n // align_to) * align_to)
    return max(-(-bs // align_to) * align_to, align_to), align_to


def _deal_order(order, n: int, bs: int, ndev: int):
    """Shard-aware dealing of a difficulty-sorted order (VERDICT r3 item
    5): within each device chunk, sorted pairs are dealt round-robin
    across the ndev contiguous device blocks, so every shard gets a
    balanced difficulty mix (a contiguously sharded globally-sorted
    batch would hand one device all the hardest pairs and the dispatch
    would wait on it) while each block stays internally sorted — the
    tile-grouping win the sort exists for (SURVEY §7.3)."""
    perm = np.empty(n, dtype=order.dtype)
    blk = max(1, bs // ndev)
    for c0 in range(0, n, bs):
        m = min(bs, n - c0)
        band = order[c0:c0 + m]
        pos = np.arange(m)
        # Dealing order: visit chunk positions by (slot-within-block,
        # block) so turn j lands in block j % ndev at slot j // ndev.
        deal = np.lexsort((pos // blk, pos % blk))
        perm[c0 + deal] = band
    return perm


def _difficulty_order(pats, txts, plens, tlens):
    """Stable ascending sort order by a cheap edit-distance proxy
    (subsampled diagonal Hamming count + length skew).  Grouping
    similar-difficulty pairs into the same kernel tile lets each tile's
    while-loop exit at ITS hardest pair instead of the batch-wide tail —
    the mitigation SURVEY §7.3 names for per-pair termination divergence
    ("sort pairs by estimated difficulty within a batch; keep output
    order via idx").  Column subsampling (<= 512 sampled positions)
    keeps the host pass cheap at long read lengths."""
    pl = np.asarray(plens).astype(np.int64)
    tl = np.asarray(tlens).astype(np.int64)
    step = max(1, pats.shape[1] // 512)
    pos = np.arange(0, pats.shape[1], step)
    valid = pos[None, :] < np.minimum(pl, tl)[:, None]
    ham = ((pats[:, pos] != txts[:, pos]) & valid).sum(1).astype(np.int64)
    return np.argsort(ham * step + np.abs(pl - tl), kind="stable")


def align(pats, txts, plens, tlens, cfg: AlignConfig,
          device_sharding=None) -> AlignResult:
    """Align a packed pair batch.  Returns scores (+ ops buffers when
    cfg.backtrace).  Device work runs in cfg.batch_pairs chunks.

    AIM_TPU_SORT=1 runs the device work in estimated-difficulty order
    (output order is restored — the pair idx contract is unchanged).
    Default: ON for long-read configs (read_size >= 1024, where each
    64-pair tile's while-loop rides to the tile max and grouping
    similar scores measurably helps — +4.4% e2e / ~7% kernel at
    l=10 kbp, round-4 sweep), OFF for short reads (measured noise).
    AIM_TPU_SORT=0 force-disables, =1 force-enables.
    Under sharding the sorted order is dealt round-robin across the
    device blocks of each chunk (see _deal_order): every shard keeps a
    balanced difficulty mix, every block stays internally sorted."""
    sort_env = os.environ.get("AIM_TPU_SORT", "")
    sort_on = sort_env == "1" if sort_env in ("0", "1") \
        else cfg.read_size >= 1024
    sort = sort_on and len(np.asarray(plens)) > 128
    if sort:
        t0 = time.perf_counter()
        order = _difficulty_order(pats, txts, plens, tlens)
        ndev = getattr(device_sharding, "num_devices", None) or 1
        if ndev > 1:
            n = len(order)
            bs, _ = _plan_bs(cfg, _forward_fn(cfg, device_sharding), n,
                             ndev)
            order = _deal_order(order, n, bs, ndev)
        t_sort = time.perf_counter() - t0
        res = _align_impl(pats[order], txts[order],
                          np.asarray(plens)[order],
                          np.asarray(tlens)[order], cfg, device_sharding)
        inv = np.empty_like(order)
        inv[order] = np.arange(len(order))
        return AlignResult(
            res.scores[inv],
            res.ops[inv] if res.ops is not None else None,
            res.begin[inv] if res.begin is not None else None,
            res.end[inv] if res.end is not None else None,
            t_load=res.t_load + t_sort, t_kernel=res.t_kernel,
            t_retrieve=res.t_retrieve, n_fallback=res.n_fallback,
            n_retry=res.n_retry)
    return _align_impl(pats, txts, plens, tlens, cfg, device_sharding)


def _align_impl(pats, txts, plens, tlens, cfg: AlignConfig,
                device_sharding=None) -> AlignResult:
    cfg.validate()
    _ensure_eager_dispatch()
    n = pats.shape[0]
    R = cfg.read_size
    max_ops = 2 * R
    fwd = _forward_fn(cfg, device_sharding)

    scores = np.zeros(n, np.int32)
    ops = np.zeros((n, max_ops), np.uint8) if cfg.backtrace else None
    begin = np.zeros(n, np.int32) if cfg.backtrace else None
    end = np.zeros(n, np.int32) if cfg.backtrace else None
    res = AlignResult(scores, ops, begin, end)

    # 2-bit-pack the sequence uploads when the batch alphabet allows it
    # and the backend can unpack on device (H2D is the dominant cost on
    # this relay; PERFNOTES.md §2).  Decided BEFORE the batch cap: a
    # >4-symbol batch may re-dispatch to a tier with a different
    # per-pair HBM footprint.
    up_pats, up_txts, packed = pats, txts, False
    fwd_kw = {}
    if getattr(fwd, "supports_packed", False):
        from aim_tpu.ops.common import pack_seqs
        up_pats, up_txts, packed = pack_seqs(pats, txts, plens, tlens, R)
        fwd_kw["packed"] = packed
        if not packed and getattr(fwd, "requires_packed", False):
            # >4-symbol alphabet on a packing-requiring kernel (rare;
            # DNA always packs): re-dispatch with packed tiers off the
            # table.  GenASM falls to its byte-comparing streamed long
            # tier when admitted (ops/genasm_long.py), WFA to the exact
            # XLA tier; fwd=None (GenASM outside the long tier's
            # admission) falls through to the host-oracle branch below.
            fwd = _forward_fn(cfg, device_sharding, packed_ok=False)
            fwd_kw = {"packed": False} \
                if getattr(fwd, "supports_packed", False) else {}

    if fwd is None:
        # Host tier (GenASM beyond the Pallas gates / non-TPU platforms):
        # the exact multi-threaded native oracle IS the compute path.
        t0 = time.perf_counter()
        osc, oops, ob, oe = _oracle_align(pats, txts, plens, tlens, cfg)
        res.t_kernel = time.perf_counter() - t0
        scores[:] = osc
        if cfg.backtrace:
            ops[:], begin[:], end[:] = oops, ob, oe
        return _overflow_bt_pass(pats, txts, plens, tlens, cfg, res)

    # Constant per-chunk shape (one jit specialization); padded tail pairs
    # have zero lengths and finish immediately.
    ndev = getattr(device_sharding, "num_devices", None) or 1
    bs, align_to = _plan_bs(cfg, fwd, n, ndev)
    def put(a):
        return jax.device_put(a) if device_sharding is None \
            else jax.device_put(a, device_sharding)

    # This runtime (TPU behind the axon tunnel) punishes async overlap:
    # queued/chained dispatches fall into a ~20-30 ms/dispatch slow path,
    # while upload-everything -> execute-and-block-each -> one batched
    # device_get stays on the fast path (measured; see PERFNOTES.md).  The
    # reference is strictly sequential too (one push, one launch, one
    # pull - host.c:246-326).
    starts = list(range(0, n, bs))

    # Fused-upload transport (opt-in): one uint8 H2D buffer per chunk,
    # split on device — trades 3 fixed per-transfer relay costs for one
    # device dispatch.  Single-device only (a flat byte buffer has no
    # meaningful "pairs" sharding); default decided by the live-TPU
    # measurement in tools/dev_upload_fuse.py.
    fuse = (os.environ.get("AIM_TPU_FUSED_UPLOAD", "0") == "1"
            and device_sharding is None)
    unfuse = _make_unfuse(bs, up_pats.shape[1], up_txts.shape[1]) \
        if fuse else None

    # Overlapped transport (opt-in, AIM_TPU_OVERLAP=1): on a
    # direct-attached TPU the XLA runtime pipelines H2D copies with
    # kernel execution when the host never blocks between dispatches,
    # so the wave loop dispatches wave w+1 while wave w computes and
    # only blocks to pull results (2-wave backpressure bounds device
    # memory to the same scale as the sequential path).  NEVER the
    # default on this relay: queued async work lands in a permanent
    # ~20-30 ms/dispatch slow path (measured, PERFNOTES.md §1) — which
    # is exactly why the default path blocks after every step.
    overlap = os.environ.get("AIM_TPU_OVERLAP", "0") == "1"

    # Rolling waves bound host+device memory on very large runs while
    # keeping the per-wave upload-all -> execute-each -> pull-once shape.
    WAVE = 8
    hosts = []

    def upload_chunk(lo):
        chunk = slice(lo, min(lo + bs, n))
        cp, ct, cpl, ctl = _pad_batch(
            [up_pats[chunk], up_txts[chunk], plens[chunk], tlens[chunk]],
            bs)
        if fuse:
            return unfuse(put(_fuse_chunk(cp, ct, cpl, ctl)))
        return (put(cp), put(ct), put(cpl), put(ctl))

    if overlap:
        # Dispatch every chunk without blocking — the runtime pipelines
        # H2D with compute — and pull wave w-1 while wave w runs.
        # The three phases genuinely overlap here, so there is no honest
        # per-phase split: the WHOLE pipelined span is booked to t_kernel
        # (the device is busy throughout — also what the energy estimate
        # and device log should see), t_load/t_retrieve stay 0.
        t0 = time.perf_counter()
        pending = []
        for w0 in range(0, len(starts), WAVE):
            outs = []
            for lo in starts[w0:w0 + WAVE]:
                args = upload_chunk(lo)
                outs.append(fwd(*args, cfg=cfg, **fwd_kw))
            pending.append(outs)
            if len(pending) > 1:
                flat, tree = jax.tree.flatten(pending.pop(0))
                hosts.extend(jax.tree.unflatten(tree, jax.device_get(flat)))
        for done in pending:
            flat, tree = jax.tree.flatten(done)
            hosts.extend(jax.tree.unflatten(tree, jax.device_get(flat)))
        res.t_kernel += time.perf_counter() - t0
    else:
        for w0 in range(0, len(starts), WAVE):
            wave = starts[w0:w0 + WAVE]
            t0 = time.perf_counter()
            uploads = []
            for lo in wave:
                if fuse:
                    # split immediately (eager mode executes synchronously,
                    # so this never queues async work — PERFNOTES.md §1)
                    # and drop the fused buffer before the next upload.
                    four = upload_chunk(lo)
                    jax.block_until_ready(four)
                    uploads.append(four)
                else:
                    uploads.append(upload_chunk(lo))
            jax.block_until_ready(uploads)
            res.t_load += time.perf_counter() - t0

            outs = []
            for (dp, dt, dpl, dtl) in uploads:
                t1 = time.perf_counter()
                out = fwd(dp, dt, dpl, dtl, cfg=cfg, **fwd_kw)
                jax.block_until_ready(out)
                res.t_kernel += time.perf_counter() - t1
                outs.append(out)
            del uploads

            t2 = time.perf_counter()
            flat, tree = jax.tree.flatten(outs)
            host_flat = jax.device_get(flat)
            hosts.extend(jax.tree.unflatten(tree, host_flat))
            res.t_retrieve += time.perf_counter() - t2
            del outs

    # parse the ladder env once per align() call (also: one warning per
    # malformed token, not one per flagged chunk)
    retry_stages = _retry_stages(fwd)
    for lo, out in zip(starts, hosts):
        hi = min(lo + bs, n)
        chunk = slice(lo, hi)
        csize = hi - lo
        host = {k: np.ascontiguousarray(v)[:csize] for k, v in out.items()}
        if "genasm_records" in host:
            host["scores"] = host["genasm_records"][:, cfg.read_size + 3] \
                .astype(np.int32)
        elif "step_records" in host:
            # WFA v2 record: row smax+3 = scores (no fallback conditions).
            host["scores"] = host["step_records"][:, cfg.max_score + 3] \
                .astype(np.int32)
        elif "packed_runs" in host:
            lane0 = host["packed_runs"][:, 0].astype(np.int32)
            # NW/SWG record: lane 0 = cursor | flags << 8 (bit 0 =
            # needs_fallback), lane 1 = score.
            host["scores"] = host["packed_runs"][:, 1].astype(np.int32)
            host["needs_fallback"] = ((lane0 >> 8) & 1).astype(bool)

        scores[chunk] = host["scores"]
        fb = host.get("needs_fallback")
        if cfg.backtrace:
            if "genasm_records" in host:
                # GenASM: same record grammar, level rows = text positions
                _, o, b, e = native.wfa_steps_to_ops(
                    host["genasm_records"], plens[chunk], tlens[chunk],
                    max_score=cfg.read_size, max_ops=max_ops)
            elif "step_records" in host:
                # WFA v2: expand the per-score-level step records.
                _, o, b, e = native.wfa_steps_to_ops(
                    host["step_records"], plens[chunk], tlens[chunk],
                    max_score=cfg.max_score, max_ops=max_ops)
            elif "packed_runs" in host:
                # NW/SWG: expand the run-length records.
                o, b, e = native.wfa_runs_to_ops(
                    host["packed_runs"], host["scores"], plens[chunk],
                    tlens[chunk], max_score=(1 << 30), max_ops=max_ops)
            elif cfg.algo == ALGO_WFA:
                # Unpack the two transfer arrays into strided views (the
                # walker takes element strides; no host copies of the hist).
                ph, pm = host["packed_hist"], host["packed_meta"]
                K = 2 * cfg.max_score + 1
                o, b, e = native.wfa_backtrace_batch(
                    ph[:, :, :K], ph[:, :, K:2 * K], ph[:, :, 2 * K:3 * K],
                    pm[:, :, 0].astype(np.int32),
                    pm[:, :, 1].astype(np.int32),
                    pm[:, :, 2].astype(np.uint8), host["scores"],
                    pats[chunk], txts[chunk], plens[chunk], tlens[chunk],
                    mismatch=cfg.mismatch, gap_o=cfg.gap_o, gap_e=cfg.gap_e,
                    max_score=cfg.max_score)
            else:
                walker = (native.nw_traceback_bits if cfg.algo == ALGO_NW
                          else native.swg_traceback_bits)
                o, b, e = walker(host["bits"], plens[chunk], tlens[chunk], max_ops)
            ops[chunk], begin[chunk], end[chunk] = o, b, e
        # Flagged pairs: first retry on the kernel's wide-band device
        # tier when it declares one (fn.retry_fn — e.g. the NW/SWG
        # streamed kernel's npl=2 band, C=127: pairs whose score exceeds
        # the primary C=63 envelope stay on-device), then re-run the
        # remainder through the exact host oracle (tape-aliasing beyond
        # plen==tlen+1, potential cell-type wrap, or past-wide scores).
        if fb is not None and fb.any():
            sel = np.nonzero(fb)[0]
            retry = getattr(fwd, "retry_fn", None)
            for p in retry_stages:
                if not len(sel):
                    break
                sel = _retry_wide(retry, cfg, pats[chunk], txts[chunk],
                                  plens[chunk], tlens[chunk], sel, scores,
                                  ops, begin, end, lo, max_ops, put, res,
                                  planes=p, pad_align=align_to)
            if not len(sel):
                continue
            res.n_fallback += len(sel)
            osc, oops, ob, oe = _oracle_align(
                pats[chunk][sel], txts[chunk][sel], plens[chunk][sel],
                tlens[chunk][sel], cfg)
            scores[lo + sel] = osc
            if cfg.backtrace:
                ops[lo + sel] = oops
                begin[lo + sel] = ob
                end[lo + sel] = oe
    return _overflow_bt_pass(pats, txts, plens, tlens, cfg, res)


def _overflow_bt_pass(pats, txts, plens, tlens, cfg: AlignConfig,
                      res: AlignResult) -> AlignResult:
    """Opt-in WFA WRAM-variant overflow-backtrace compat
    (cfg.overflow_backtrace): overflowed pairs (score > MAX_SCORE, which
    every tier leaves CIGAR-less per the MRAM behavior) get a defined
    best-effort CIGAR from the host oracle's compat rendition.  Scores
    are unchanged; launcher-derived configs overflow rarely by design,
    so this pass is host-cheap."""
    if not (cfg.algo == ALGO_WFA and cfg.backtrace
            and cfg.overflow_backtrace):
        return res
    sel = np.nonzero(res.scores > cfg.max_score)[0]
    if not len(sel):
        return res
    plens = np.asarray(plens)
    tlens = np.asarray(tlens)
    _, oops, ob, oe = native.wfa_align(
        pats[sel], txts[sel], plens[sel], tlens[sel],
        mismatch=cfg.mismatch, gap_o=cfg.gap_o, gap_e=cfg.gap_e,
        max_score=cfg.max_score, adaptive=cfg.adaptive, backtrace=True,
        threads=0, overflow_backtrace=True)
    res.ops[sel] = oops
    res.begin[sel] = ob
    res.end[sel] = oe
    return res


def _read_energy_uj():
    """Best-effort host energy counters (RAPL powercap, package+DRAM
    domains summed).  Returns None when the host exposes none — true in
    containers and behind the TPU relay, where the estimate below is the
    only option.  The closest reachable analogue of the reference's
    UPMEM dpu_probe DIMM-rank counters (ref: host.c:62-67,285-296)."""
    import glob
    total, found = 0, False
    try:
        for p in glob.glob("/sys/class/powercap/*/energy_uj"):
            with open(p) as f:
                total += int(f.read().strip())
            found = True
    except Exception:
        return None
    return total if found else None


def energy_estimate_joules(res: AlignResult) -> float:
    """Energy-probe substitute (ref: host.c:62-67,285-296 -DENERGY uses
    UPMEM dpu_probe counters).  This runtime exposes no power counters,
    so the analogue is device-seconds x nominal chip power — an estimate,
    clearly labeled as such.  Override the wattage with AIM_TPU_WATTS
    (default 200 W nominal for a v5e-class accelerator board)."""
    watts = float(os.environ.get("AIM_TPU_WATTS", "200"))
    return res.t_kernel * watts


def write_device_log(path: str, cfg: AlignConfig, res: AlignResult, n: int):
    """The dpu-out analogue (ref: host.c:355-362 harvests per-DPU logs):
    one line per device with its share of the run."""
    devs = jax.devices()
    with open(path, "w") as f:
        for i, d in enumerate(devs):
            f.write(f"TPU {i}: {d.device_kind} | algo={cfg.algo} "
                    f"max_score={cfg.max_score} read_size={cfg.read_size} "
                    f"backtrace={cfg.backtrace} adaptive={cfg.adaptive} "
                    f"pairs={n} load_s={res.t_load:.6f} "
                    f"kernel_s={res.t_kernel:.6f} "
                    f"retrieve_s={res.t_retrieve:.6f} "
                    f"fallback={res.n_fallback} "
                    f"energy_est_J={energy_estimate_joules(res):.3f}\n")


def align_file(input_path: str, output_path: str, n_reads: int,
               cfg: AlignConfig, device_sharding=None, verbose=True,
               device_log: str | None = None, energy: bool = False,
               profile_dir: str | None = None):
    """Full file-to-file pipeline (the reference host main(), host.c:136).

    n_reads follows the reference CLI meaning: number of PAIRS requested;
    fewer are aligned if the file is shorter (get_reads tolerates EOF,
    ref: host.c:104-110).

    profile_dir: when set, a jax.profiler trace of the device phases is
    written there (TensorBoard-loadable) — the TPU-native analogue of the
    reference's -DENERGY/probe instrumentation (SURVEY §5.1).
    """
    t0 = time.perf_counter()
    # threads=0: one parse window per core (parse is the host-pipeline
    # floor at ~4.7 cores/chip, PERFNOTES §5; single-core hosts take the
    # sequential path unchanged).
    pats, txts, plens, tlens = native.parse_pairs(input_path, n_reads,
                                                  cfg.read_size, threads=0)
    t_parse = time.perf_counter() - t0
    e0 = _read_energy_uj() if energy else None
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            res = align(pats, txts, plens, tlens, cfg, device_sharding)
    else:
        res = align(pats, txts, plens, tlens, cfg, device_sharding)
    if e0 is not None:
        e1 = _read_energy_uj()
        if e1 is not None and e1 >= e0:  # ignore counter wraparound
            res.energy_measured_j = (e1 - e0) / 1e6
    n = len(res.scores)
    idx = np.arange(n, dtype=np.int32)
    native.emit_output(output_path, idx, res.scores, res.ops, res.begin,
                       res.end, cfg.backtrace)
    if device_log:
        write_device_log(device_log, cfg, res, n)
    if verbose:
        # Phase prints mirroring the reference (ref: host.c:272,299,330).
        print(f"Parsed {n} pairs in {t_parse * 1e3:.3f} ms")
        print(f"CPU-TPU: {res.t_load * 1e3:f} ms")
        print(f"TPU Kernel: {res.t_kernel * 1e3:f} ms")
        print(f"TPU-CPU: {res.t_retrieve * 1e3:f} ms")
        total = res.t_load + res.t_kernel + res.t_retrieve
        if total > 0:
            print(f"pairs/s (device phases): {n / total:.1f}")
        if energy:
            # ref: host.c:285-296 prints "DPU Kernel Energy (J): ..."
            print(f"TPU Kernel Energy (J, estimated): "
                  f"{energy_estimate_joules(res):f}")
            if res.energy_measured_j is not None:
                print(f"Host Energy (J, measured, RAPL package+DRAM over "
                      f"the align span): {res.energy_measured_j:f}")
        if res.n_retry:
            print(f"wide-band device retry pairs: {res.n_retry}")
        if res.n_fallback:
            print(f"host-oracle fallback pairs: {res.n_fallback}")
    return res

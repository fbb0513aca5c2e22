"""Benchmark: WFA-adaptive pairs/s/chip on the canonical AIM workload
(100bp, e=1%, backtrace on) — the BASELINE.json north-star metric.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N, ...}

value / vs_baseline keep the round-1 definition (end-to-end align() rate
vs the single-thread host CPU oracle, mirroring the reference's "speedup
vs CPU including transfer time" framing, README.md:11-12).  The extra
keys make the perf claims auditable artifacts:
  marginal_us_per_pair  — honest per-pair device cost of the fused WFA
                          kernel, from the batch-size-scaling slope
                          between two large batches in eager mode (the
                          only honest kernel timing on this relay,
                          PERFNOTES.md §1);
  marginal_pairs_s_chip — its reciprocal (pairs/s/chip compute rate);
  cpu_1t_pairs_s / cpu_mt_pairs_s — single-thread and full-pool oracle
                          rates on this host;
  vs_cpu_mt_marginal    — chip compute rate vs the multi-threaded CPU,
                          the closest analogue of the reference's
                          "2.56x vs full-scale CPU" headline.

LIVENESS CONTRACT (VERDICT r3 item 1): this script emits its JSON line
within a HARD wall-clock budget no matter what the TPU relay does.
Structure: the parent process never touches the device; all device work
runs in a measurement child (`bench.py --measure`) that checkpoints
every completed metric to a partial-results file.  If the child
outlives its budget the parent kills it and emits the partial results
with `"degraded": true` (or an explicit error object if nothing was
measured).  Worst-case wall time:
  warm probe (default 180 s) + measure budget (default 420 s)
  + CPU-mesh scaling side artifact (120 s, after the JSON line)
— all knobs overridable via AIM_TPU_BENCH_{WARM_TIMEOUT,BUDGET}.

Runtime quirks this bench routes around (measured; see PERFNOTES.md):
  * the FIRST device->host transfer seen by the TPU relay can stall
    60-160 s (a relay-side init lottery), but a completed transfer warms
    the relay across processes for a while — so a throwaway child process
    absorbs it before the timed region;
  * any D2H in a process permanently degrades that process's subsequent
    dispatches ~500x, so the timed run is structured upload -> execute ->
    one final batched pull (api.align does exactly this), and the warmup
    execution deliberately never retrieves;
  * when the relay is DOWN, backend init blocks FOREVER in any process
    with the axon hook in its env (PERFNOTES.md §6) — hence the
    parent/child split: only children can hang, and they get killed.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tools import _timing as T  # noqa: E402

DATASET = "/root/reference/Datasets/sample-l100-e1-40K"
N_PAIRS = 20000
_REPO = os.path.dirname(os.path.abspath(__file__))

WARM_TIMEOUT = float(os.environ.get("AIM_TPU_BENCH_WARM_TIMEOUT", "180"))
MEASURE_BUDGET = float(os.environ.get("AIM_TPU_BENCH_BUDGET", "420"))
# Test-only hook: replaces every child command so the guard test can
# exercise the real wall-clock kill path with a hanging child.
_TEST_CHILD = os.environ.get("AIM_TPU_BENCH_TEST_CHILD_CMD")

_WARM_CHILD = """
import time, numpy as np, jax
b = jax.device_put(np.ones(1024, np.uint8)); jax.block_until_ready(b)
t0 = time.perf_counter(); np.asarray(b)
print("warm child D2H: %.1fms" % ((time.perf_counter()-t0)*1e3), flush=True)
"""

_HEADLINE = "WFA-adaptive pairs aligned/s/chip (100bp, e=1%, backtrace)"


def load_pairs(read_size: int):
    import aim_tpu.native as nat
    if os.path.exists(DATASET):
        return nat.parse_pairs(DATASET, N_PAIRS, read_size)
    # Self-contained fallback: the in-repo generator synthesizes the
    # same workload shape (100bp, e=1%) when the reference mount is
    # absent (VERDICT r3 item 6).
    from aim_tpu.datagen import generate_pairs
    return generate_pairs(N_PAIRS, 100, 0.01, read_size=read_size, seed=0)


def marginal_us_per_pair(cfg, pats, txts, plens, tlens):
    """Batch-size-scaling slope of the fused WFA kernel: replicate the
    dataset to two large sizes, time the kernel dispatch alone (inputs
    resident, block each call), slope = device cost per pair."""
    import jax
    from aim_tpu.ops.common import pack_seqs
    from aim_tpu.ops.wfa_pallas2 import wfa_forward_pallas2

    up, ut, packed = pack_seqs(pats, txts, plens, tlens, cfg.read_size)
    reps_small, reps_big = 8, 48  # 160k / 960k pairs
    rp = np.tile(up, (reps_big, 1))
    rt = np.tile(ut, (reps_big, 1))
    rpl = np.tile(plens.astype(np.int32), reps_big)
    rtl = np.tile(tlens.astype(np.int32), reps_big)
    n_small = len(plens) * reps_small
    n_big = len(plens) * reps_big

    def timed(m):
        dp = jax.device_put(rp[:m])
        dt = jax.device_put(rt[:m])
        dpl = jax.device_put(rpl[:m])
        dtl = jax.device_put(rtl[:m])
        jax.block_until_ready((dp, dt, dpl, dtl))
        best = T.best_of(
            lambda: wfa_forward_pallas2(dp, dt, dpl, dtl, cfg=cfg,
                                        packed=packed),
            repeats=3)
        del dp, dt, dpl, dtl
        return best

    t_small = timed(n_small)
    t_big = timed(n_big)
    return (t_big - t_small) / (n_big - n_small) * 1e6


def _aux_metrics(part, save, time_left, pats, txts, plens, tlens, n):
    """Capability artifacts: per-family kernel marginals + CPU
    denominators, each individually guarded by the remaining budget.
    Skipped stages are recorded in part["skipped"]."""
    import jax
    from aim_tpu.config import derive_config
    from aim_tpu.ops.common import pack_seqs
    import aim_tpu.native as nat

    def gate(name, need):
        if time_left() < need:
            part.setdefault("skipped", []).append(name)
            save()
            return False
        return True

    def slope(fn, cfg_, reps=(8, 32)):
        gp, gt, okp = pack_seqs(pats, txts, plens, tlens, cfg_.read_size)
        ts = []
        for r in reps:
            dp = jax.device_put(np.tile(gp, (r, 1)))
            dt = jax.device_put(np.tile(gt, (r, 1)))
            dpl = jax.device_put(np.tile(plens.astype(np.int32), r))
            dtl = jax.device_put(np.tile(tlens.astype(np.int32), r))
            jax.block_until_ready((dp, dt, dpl, dtl))
            best = T.best_of(
                lambda: fn(dp, dt, dpl, dtl, cfg=cfg_, packed=okp),
                repeats=3)
            ts.append(best)
            del dp, dt, dpl, dtl
        return round((ts[1] - ts[0]) / (n * (reps[1] - reps[0])) * 1e6, 4)

    # Per-algorithm single-thread CPU denominators (same pairs, same
    # costs, exact oracle) so every marginal has its own honest
    # per-CPU-thread comparison.  This host has os.cpu_count() cores
    # (emitted as host_cpu_cores): a server-class CPU multiplies the
    # CPU side by its core count.
    def cpu_1t_rate(fn_kwargs, m=4000):
        m = min(m, n)
        best = T.best_of(
            lambda: fn_kwargs["fn"](pats[:m], txts[:m], plens[:m],
                                    tlens[:m], threads=1, backtrace=True,
                                    **{k: v for k, v in fn_kwargs.items()
                                       if k != "fn"}),
            repeats=3, block=False, warmup=False, min_anchor_s=0)
        return round(m / best, 1)

    if gate("cpu_denominators", 20):
        try:
            ncfg = derive_config("nw", 100, 0.01, backtrace=True)
            part["nw_cpu_1t_pairs_s"] = cpu_1t_rate(
                dict(fn=nat.nw_align, mismatch=ncfg.mismatch,
                     gap_i=ncfg.gap_i, gap_d=ncfg.gap_d))
            scfg = derive_config("swg", 100, 0.01, backtrace=True)
            part["swg_cpu_1t_pairs_s"] = cpu_1t_rate(
                dict(fn=nat.swg_align, match=scfg.match,
                     mismatch=scfg.mismatch, gap_o=scfg.gap_o,
                     gap_e=scfg.gap_e, max_score=scfg.max_score,
                     cell_width=scfg.cell_width))
            gcfg0 = derive_config("genasm", 100, 0.01, backtrace=True)
            part["genasm_cpu_1t_pairs_s"] = cpu_1t_rate(
                dict(fn=nat.genasm_align, max_score=gcfg0.max_score))
            save()
        except Exception as e:  # pragma: no cover
            print(f"# cpu denominators failed: {e}", file=sys.stderr)

    if gate("nw_marginal", 60):
        try:
            from aim_tpu.ops.nw_pallas import nw_forward_pallas
            part["nw_marginal_us_per_pair"] = slope(
                nw_forward_pallas,
                derive_config("nw", 100, 0.01, backtrace=True))
            save()
        except Exception as e:  # pragma: no cover
            print(f"# nw metric failed: {e}", file=sys.stderr)
    if gate("swg_marginal", 60):
        try:
            from aim_tpu.ops.swg_pallas import swg_forward_pallas
            part["swg_marginal_us_per_pair"] = slope(
                swg_forward_pallas,
                derive_config("swg", 100, 0.01, backtrace=True))
            save()
        except Exception as e:  # pragma: no cover
            print(f"# swg metric failed: {e}", file=sys.stderr)
    if gate("genasm_marginal", 60):
        try:
            from aim_tpu.ops.genasm_pallas import genasm_forward_pallas
            part["genasm_marginal_us_per_pair"] = slope(
                genasm_forward_pallas,
                derive_config("genasm", 100, 0.01, backtrace=True))
            save()
        except Exception as e:  # pragma: no cover
            print(f"# genasm metric failed: {e}", file=sys.stderr)

    if gate("longread_10kbp", 90):
        try:
            from aim_tpu.ops.wfa_pallas_long import wfa_forward_pallas_long
            lcfg = derive_config("wfa", 10000, 0.01, backtrace=True,
                                 adaptive=True, variant="hbm")
            rng = np.random.default_rng(7)
            bases = np.frombuffer(b"ACGT", np.uint8)
            nl, ll = 256, 10000
            lp = np.zeros((nl, lcfg.read_size), np.uint8)
            lp[:, :ll] = bases[rng.integers(0, 4, (nl, ll))]
            lt = lp.copy()
            mut = rng.random((nl, ll)) < 0.01
            lt[:, :ll] = np.where(mut, bases[rng.integers(0, 4, (nl, ll))],
                                  lt[:, :ll])
            lpl = np.full(nl, ll, np.int32)
            ltl = np.full(nl, ll, np.int32)
            pp, pt, ok = pack_seqs(lp, lt, lpl, ltl, lcfg.read_size)
            ts = []
            for m in (64, 256):
                dp = jax.device_put(pp[:m])
                dt = jax.device_put(pt[:m])
                dpl = jax.device_put(lpl[:m])
                dtl = jax.device_put(ltl[:m])
                jax.block_until_ready((dp, dt, dpl, dtl))
                best = T.best_of(
                    lambda: wfa_forward_pallas_long(dp, dt, dpl, dtl,
                                                    cfg=lcfg, packed=True),
                    repeats=3)
                ts.append(best)
                del dp, dt, dpl, dtl
            part["longread_10kbp_marginal_us_per_pair"] = round(
                (ts[1] - ts[0]) / 192 * 1e6, 1)
            import aim_tpu.native as nat2
            mcpu = 16
            best = T.best_of(
                lambda: nat2.wfa_align(
                    lp[:mcpu], lt[:mcpu], lpl[:mcpu], ltl[:mcpu],
                    mismatch=lcfg.mismatch, gap_o=lcfg.gap_o,
                    gap_e=lcfg.gap_e, max_score=lcfg.max_score,
                    adaptive=True, backtrace=True, threads=1),
                repeats=3, block=False, warmup=False, min_anchor_s=0)
            part["longread_cpu_1t_us_per_pair"] = round(best / mcpu * 1e6, 1)
            save()
        except Exception as e:  # pragma: no cover
            print(f"# longread metric failed: {e}", file=sys.stderr)

    # NW long-read (HBM-streamed banded tier, ops/nwswg_pallas_long):
    # the reference MRAM analogue past the VMEM tier's ~2 kbp limit.
    if gate("nw_long_4kbp", 90):
        try:
            from aim_tpu.ops.nwswg_pallas_long import (
                long_fit_nwswg, nwswg_forward_pallas_long)
            ncfg = derive_config("nw", 4000, 0.01, backtrace=True,
                                 variant="hbm")
            assert long_fit_nwswg(ncfg)
            rng = np.random.default_rng(11)
            bases = np.frombuffer(b"ACGT", np.uint8)
            nl, ll = 256, 4000
            lp = np.zeros((nl, ncfg.read_size), np.uint8)
            lp[:, :ll] = bases[rng.integers(0, 4, (nl, ll))]
            lt = lp.copy()
            mut = rng.random((nl, ll)) < 0.01
            lt[:, :ll] = np.where(mut, bases[rng.integers(0, 4, (nl, ll))],
                                  lt[:, :ll])
            lpl = np.full(nl, ll, np.int32)
            ltl = np.full(nl, ll, np.int32)
            pp, pt, ok = pack_seqs(lp, lt, lpl, ltl, ncfg.read_size)
            ts = []
            for m in (64, 256):
                dp = jax.device_put(pp[:m])
                dt = jax.device_put(pt[:m])
                dpl = jax.device_put(lpl[:m])
                dtl = jax.device_put(ltl[:m])
                jax.block_until_ready((dp, dt, dpl, dtl))
                best = T.best_of(
                    lambda: nwswg_forward_pallas_long(dp, dt, dpl, dtl,
                                                      cfg=ncfg, packed=ok),
                    repeats=3)
                ts.append(best)
                del dp, dt, dpl, dtl
            part["nw_long_4kbp_marginal_us_per_pair"] = round(
                (ts[1] - ts[0]) / 192 * 1e6, 1)
            import aim_tpu.native as nat3
            mcpu = 8
            best = T.best_of(
                lambda: nat3.nw_align(
                    lp[:mcpu], lt[:mcpu], lpl[:mcpu], ltl[:mcpu],
                    mismatch=ncfg.mismatch, gap_i=ncfg.gap_i,
                    gap_d=ncfg.gap_d, backtrace=True, threads=1),
                repeats=3, block=False, warmup=False, min_anchor_s=0)
            part["nw_long_4kbp_cpu_1t_us_per_pair"] = round(
                best / mcpu * 1e6, 1)
            save()
        except Exception as e:  # pragma: no cover
            print(f"# nw long metric failed: {e}", file=sys.stderr)


def measure(partial_path: str, budget: float):
    """Measurement child: all device work lives here.  Checkpoints every
    completed metric to partial_path (atomic replace) so the parent can
    emit a degraded-but-real JSON line if this process is killed."""
    from aim_tpu.config import derive_config
    from aim_tpu.api import align
    import aim_tpu.native as nat

    t_start = time.perf_counter()

    def time_left():
        return budget - (time.perf_counter() - t_start)

    part = {"metric": _HEADLINE, "value": 0.0, "unit": "pairs/s",
            "vs_baseline": 0.0, "host_cpu_cores": os.cpu_count()}

    def save():
        tmp = partial_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(json.dumps(part))
        os.replace(tmp, partial_path)

    save()

    # One chunk for the whole dataset: fewest dispatches, fewest transfers.
    cfg = derive_config("wfa", 100, 0.01, backtrace=True, adaptive=True,
                        batch_pairs=32768)
    pats, txts, plens, tlens = load_pairs(cfg.read_size)
    n = len(plens)

    # CPU baselines FIRST (device-independent, cheap): even a fully
    # stalled device run leaves honest denominators in the partial.
    # Best of 3 — the shared host's CPU timings are noisy.  Single
    # thread AND full pool, the reference's "server-grade multi-threaded
    # CPU at full scale" framing.
    def cpu_rate(threads, m=4000):
        m = min(m, n)
        best = T.best_of(
            lambda: nat.wfa_align(
                pats[:m], txts[:m], plens[:m], tlens[:m],
                mismatch=cfg.mismatch, gap_o=cfg.gap_o,
                gap_e=cfg.gap_e, max_score=cfg.max_score,
                adaptive=True, backtrace=True, threads=threads),
            repeats=3, block=False, warmup=False, min_anchor_s=0)
        return m / best

    cpu_1t = cpu_rate(1)
    cpu_mt = cpu_rate(0, m=n)
    part["cpu_1t_pairs_s"] = round(cpu_1t, 1)
    part["cpu_mt_pairs_s"] = round(cpu_mt, 1)
    save()

    # Warmup: full-shape run compiles the executables, and its device_get
    # deliberately switches this process into the eager dispatch mode —
    # the FASTER steady state for bulk upload->execute->pull work on this
    # relay (PERFNOTES.md §4).
    align(pats, txts, plens, tlens, cfg)

    # Timed: the full pipeline minus file I/O (transfers + kernel + host
    # traceback), matching the reference's "including transfer time"
    # accounting.  Best of 3 = reproducible steady state.
    t_tpu = T.best_of(lambda: align(pats, txts, plens, tlens, cfg),
                      repeats=3, block=False, warmup=False)
    res = align(pats, txts, plens, tlens, cfg)
    tpu_pairs_s = n / t_tpu
    part["value"] = round(tpu_pairs_s, 1)
    part["vs_baseline"] = round(tpu_pairs_s / cpu_1t, 3)
    part["vs_cpu_mt_e2e"] = round(tpu_pairs_s / cpu_mt, 3)
    save()
    print(f"# n={n} tpu_s={t_tpu:.3f} load={res.t_load:.3f} "
          f"kernel={res.t_kernel:.3f} retrieve={res.t_retrieve:.3f} "
          f"fallback={res.n_fallback}", file=sys.stderr)

    # Same pipeline through the fused-upload transport (one H2D buffer
    # per chunk + device-side split): quantifies the relay's fixed
    # per-transfer cost against the extra split dispatch, either way.
    if time_left() > 60:
        try:
            os.environ["AIM_TPU_FUSED_UPLOAD"] = "1"
            align(pats, txts, plens, tlens, cfg)   # compile the split
            t_fused = T.best_of(
                lambda: align(pats, txts, plens, tlens, cfg),
                repeats=3, block=False, warmup=False)
            part["e2e_fused_upload_pairs_s"] = round(n / t_fused, 1)
            save()
        except Exception as e:  # pragma: no cover - bench must always emit
            print(f"# fused-upload e2e failed: {e}", file=sys.stderr)
        finally:
            os.environ["AIM_TPU_FUSED_UPLOAD"] = "0"
    else:
        part.setdefault("skipped", []).append("fused_upload")

    # Honest device-side marginal cost (batch-size-scaling slope).
    if time_left() > 90:
        try:
            marg_us = marginal_us_per_pair(cfg, pats, txts, plens, tlens)
            marg_rate = 1e6 / marg_us if marg_us > 0 else 0
            part["marginal_us_per_pair"] = round(marg_us, 4)
            part["marginal_pairs_s_chip"] = round(marg_rate, 1)
            part["vs_cpu_mt_marginal"] = round(marg_rate / cpu_mt, 3)
            save()
        except Exception as e:  # pragma: no cover - bench must always emit
            print(f"# marginal sweep failed: {e}", file=sys.stderr)
    else:
        part.setdefault("skipped", []).append("marginal")

    # Modeled direct-attach e2e (VERDICT r4 item 7): the relay number
    # above is dominated by a ~30 MB/s tunnel (PERFNOTES §2) no
    # production deployment would have.  Model the same pipeline on a
    # locally attached chip from MEASURED parts: the chip compute rate
    # (marginal slope), the actual bytes moved (from the real arrays),
    # and this run's own host-stage time (everything in t_tpu that is
    # neither transfer nor kernel — pack, record expansion,
    # bookkeeping; transport-independent).  Transfer bandwidth and
    # dispatch cost are the only assumed constants, both conservative
    # for a PCIe-attached TPU host: 2 GB/s and 0.5 ms/dispatch.
    if "marginal_us_per_pair" in part:
        try:
            from aim_tpu.ops.common import pack_seqs as _ps
            from aim_tpu.ops.wfa_pallas2 import record_rows
            up, ut, _okp = _ps(pats, txts, plens, tlens, cfg.read_size)
            h2d_bytes = up.nbytes + ut.nbytes + plens.nbytes + tlens.nbytes
            d2h_bytes = n * record_rows(cfg.max_score) * 4
            bw = 2e9           # B/s, conservative PCIe direct attach
            disp = 5e-4        # s per dispatch, conservative
            n_chunks = max(1, -(-n // cfg.batch_pairs))
            t_host_other = max(0.0, t_tpu - res.t_load - res.t_kernel
                               - res.t_retrieve)
            t_kernel_m = n * part["marginal_us_per_pair"] * 1e-6 \
                + n_chunks * disp
            t_xfer_m = (h2d_bytes + d2h_bytes) / bw + 2 * n_chunks * disp
            t_direct = t_kernel_m + t_xfer_m + t_host_other
            part["e2e_modeled_direct_pairs_s"] = round(n / t_direct, 1)
            # upper variant: host stages scaled out across cores (the
            # window-parallel host path exists; PERFNOTES §5 gives
            # cores-per-chip to keep up) so the chip+wire is the limit
            part["e2e_modeled_direct_hostpar_pairs_s"] = round(
                n / (t_kernel_m + t_xfer_m), 1)
            part["direct_model_inputs"] = {
                "h2d_bytes": int(h2d_bytes), "d2h_bytes": int(d2h_bytes),
                "assumed_bw_B_per_s": bw, "assumed_dispatch_s": disp,
                "n_chunks": n_chunks,
                "t_host_other_s": round(t_host_other, 4),
                "marginal_us_per_pair": part["marginal_us_per_pair"],
                "modeled": True,
            }
            save()
        except Exception as e:  # pragma: no cover - bench must always emit
            print(f"# direct-attach model failed: {e}", file=sys.stderr)

    _aux_metrics(part, save, time_left, pats, txts, plens, tlens, n)
    save()
    print(json.dumps(part))


def _emit_from_partial(partial_path: str, why: str):
    """Parent-side fallback: emit whatever the killed child managed to
    measure, marked degraded — or an explicit error object."""
    part = None
    try:
        with open(partial_path) as f:
            part = json.loads(f.read())
    except Exception:
        part = None
    if part and part.get("value", 0) > 0:
        part["degraded"] = True
        part["error"] = why
        print(json.dumps(part))
    else:
        print(json.dumps({
            "metric": _HEADLINE, "value": 0.0, "unit": "pairs/s",
            "vs_baseline": 0.0,
            "error": f"tpu relay unreachable ({why}); partial metrics: "
                     f"{json.dumps(part) if part else 'none'}",
        }))


def main():
    # Absorb the relay's first-D2H lottery in a throwaway child process
    # (a completed D2H warms the relay across processes for a while).
    # The child doubles as a liveness probe; ONE attempt, small timeout
    # (VERDICT r3: the old 2x900 s ladder outlived the driver's budget).
    warm_ok = False
    cmd = ([sys.executable, "-c", _WARM_CHILD] if not _TEST_CHILD
           else _TEST_CHILD.split())
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=WARM_TIMEOUT, cwd=_REPO)
        print(f"# {r.stdout.strip()}", file=sys.stderr)
        if r.returncode != 0:
            # A FAST nonzero exit is not outage evidence (e.g. a
            # transient backend error the main run would absorb): show
            # the child's diagnostic and proceed — the measurement child
            # pays any stall itself, under its own budget.
            print(f"# warm child rc={r.returncode}: "
                  f"{r.stderr.strip()[-400:]}", file=sys.stderr)
        warm_ok = True
    except subprocess.TimeoutExpired:
        print(f"# warm child timed out (relay stall > {WARM_TIMEOUT:g}s); "
              "trying the measurement child with a reduced budget",
              file=sys.stderr)

    # All device work runs in the measurement child under a hard budget;
    # a cold relay gets a shorter one so the total stays in the driver's
    # window either way.
    budget = MEASURE_BUDGET if warm_ok else min(MEASURE_BUDGET, 240.0)
    fd, partial_path = tempfile.mkstemp(prefix="aim_bench_", suffix=".json")
    os.close(fd)
    cmd = ([sys.executable, os.path.abspath(__file__), "--measure",
            partial_path, str(budget)] if not _TEST_CHILD
           else _TEST_CHILD.split())
    # Small grace on top of the child's own deadline so a child that is
    # mid-save still finishes cleanly; scaled down for tiny test budgets.
    grace = min(30.0, budget * 0.1 + 5.0)
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=budget + grace, cwd=_REPO)
        sys.stderr.write(r.stderr)
        lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if r.returncode == 0 and lines:
            print(lines[-1])
        else:
            _emit_from_partial(
                partial_path,
                f"measure child rc={r.returncode}, no JSON; stderr tail: "
                f"{r.stderr.strip()[-300:]}")
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            sys.stderr.write(e.stderr if isinstance(e.stderr, str)
                             else e.stderr.decode(errors="replace"))
        _emit_from_partial(
            partial_path,
            f"measure child exceeded {budget + grace:g}s budget")
    finally:
        try:
            os.unlink(partial_path)
        except OSError:
            pass

    # Side artifact: the pair-sharded scaling sweep (virtual CPU mesh
    # here — caveat is inside the JSON; on a real pod slice the same
    # harness measures the BASELINE.md >=85% efficiency target).  Runs
    # AFTER the JSON line, so it can never block the headline emit.
    if _TEST_CHILD:
        return
    try:
        env = dict(os.environ)
        # Drop the axon-relay hook: with it present, backend init blocks
        # on the relay even under JAX_PLATFORMS=cpu when it is down.
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.update(JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
                   XLA_FLAGS=(env.get("XLA_FLAGS", "") +
                              " --xla_force_host_platform_device_count=8"
                              ).strip())
        r = subprocess.run(
            [sys.executable, os.path.join(_REPO, "bench_scaling.py"),
             "2048"],
            env=env, capture_output=True, text=True, timeout=120)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        if line.startswith("{"):
            with open(os.path.join(_REPO, "SCALING.json"), "w") as f:
                f.write(line + "\n")
    except Exception as e:  # pragma: no cover
        print(f"# scaling artifact failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--measure":
        measure(sys.argv[2], float(sys.argv[3]))
    else:
        main()

"""Benchmark: WFA-adaptive pairs/s/chip on the canonical AIM workload
(100bp, e=1%, backtrace on) — the BASELINE.json north-star metric.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N}

vs_baseline is the speedup over the single-thread host CPU oracle measured
on the same machine and workload, mirroring the reference's headline
"speedup vs CPU including transfer time" framing (README.md:11-12; the repo
publishes no absolute PIM pairs/s).

Runtime quirks this bench routes around (measured; see PERFNOTES.md):
  * the FIRST device->host transfer seen by the TPU relay can stall
    60-160 s (a relay-side init lottery), but a completed transfer warms
    the relay across processes for a while — so a throwaway child process
    absorbs it before the timed region;
  * any D2H in a process permanently degrades that process's subsequent
    dispatches ~500x, so the timed run is structured upload -> execute ->
    one final batched pull (api.align does exactly this), and the warmup
    execution deliberately never retrieves.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

DATASET = "/root/reference/Datasets/sample-l100-e1-40K"
N_PAIRS = 20000

_WARM_CHILD = """
import time, numpy as np, jax
b = jax.device_put(np.ones(1024, np.uint8)); jax.block_until_ready(b)
t0 = time.perf_counter(); np.asarray(b)
print("warm child D2H: %.1fms" % ((time.perf_counter()-t0)*1e3), flush=True)
"""


def load_pairs(read_size: int):
    import aim_tpu.native as nat
    if os.path.exists(DATASET):
        return nat.parse_pairs(DATASET, N_PAIRS, read_size)
    # Synthesize an equivalent workload if the dataset is absent.
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    n, l = N_PAIRS, 100
    pats = np.zeros((n, read_size), np.uint8)
    pats[:, :l] = bases[rng.integers(0, 4, (n, l))]
    txts = pats.copy()
    mut = rng.random((n, l)) < 0.01
    txts[:, :l] = np.where(mut, bases[rng.integers(0, 4, (n, l))], txts[:, :l])
    return pats, txts, np.full(n, l, np.int32), np.full(n, l, np.int32)


def main():
    from aim_tpu.config import derive_config
    from aim_tpu.api import align
    import aim_tpu.native as nat

    # One chunk for the whole dataset: fewest dispatches, fewest transfers.
    cfg = derive_config("wfa", 100, 0.01, backtrace=True, adaptive=True,
                        batch_pairs=32768)
    pats, txts, plens, tlens = load_pairs(cfg.read_size)
    n = len(plens)

    # Absorb the relay's first-D2H lottery in a throwaway child process
    # (a completed D2H warms the relay across processes for a while).
    # Capped: if the relay is badly wedged the warmup run below simply
    # pays the stall itself — the timed region stays clean either way.
    try:
        r = subprocess.run([sys.executable, "-c", _WARM_CHILD],
                           capture_output=True, text=True, timeout=900,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        print(f"# {r.stdout.strip()}", file=sys.stderr)
    except subprocess.TimeoutExpired:
        print("# warm child timed out (relay stall > 900s)", file=sys.stderr)

    # Warmup: full-shape run compiles the executables, and its device_get
    # deliberately switches this process into the eager dispatch mode —
    # the FASTER steady state for bulk upload->execute->pull work on this
    # relay (PERFNOTES.md §4).
    align(pats, txts, plens, tlens, cfg)

    # Timed: the full pipeline minus file I/O (transfers + kernel + host
    # traceback), matching the reference's "including transfer time"
    # accounting.  Best of 3 = reproducible steady state.
    t_tpu = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = align(pats, txts, plens, tlens, cfg)
        t_tpu = min(t_tpu, time.perf_counter() - t0)
    tpu_pairs_s = n / t_tpu

    # CPU baseline: single-thread exact oracle on a subset, extrapolated
    # (best of 3 — the shared host's CPU timings are noisy).
    m = min(2000, n)
    t_cpu = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        nat.wfa_align(pats[:m], txts[:m], plens[:m], tlens[:m],
                      mismatch=cfg.mismatch, gap_o=cfg.gap_o,
                      gap_e=cfg.gap_e, max_score=cfg.max_score,
                      adaptive=True, backtrace=True)
        t_cpu = min(t_cpu, (time.perf_counter() - t0) * (n / m))
    cpu_pairs_s = n / t_cpu

    print(json.dumps({
        "metric": "WFA-adaptive pairs aligned/s/chip (100bp, e=1%, backtrace)",
        "value": round(tpu_pairs_s, 1),
        "unit": "pairs/s",
        "vs_baseline": round(tpu_pairs_s / cpu_pairs_s, 3),
    }))
    print(f"# n={n} tpu_s={t_tpu:.3f} cpu_oracle_pairs_s={cpu_pairs_s:.1f} "
          f"load={res.t_load:.3f} kernel={res.t_kernel:.3f} "
          f"retrieve={res.t_retrieve:.3f} fallback={res.n_fallback}",
          file=sys.stderr)


if __name__ == "__main__":
    main()

#!/bin/bash
# Post-outage TPU validation sweep: run everything that needs the real
# chip, in dependency order, logging to /tmp/relay_return/.
# Usage: bash tools/relay_return.sh   (assumes relay is back up)
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/relay_return

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3000 "$@" > "/tmp/relay_return/$name.log" 2>&1
  echo "$name rc=$? (log /tmp/relay_return/$name.log)"
}

# 1. kernel fuzz (all families x cost models vs oracle) — post-refactor
#    equality on the real backend
run fuzz python tools/fuzz_kernels.py 11 1
# 2. WFA long-read exactness + rates (1 kbp, 10 kbp)
run wfa_long python tools/dev_long_tpu.py
# 3. NW/SWG streamed tier exactness + marginals at 4 kbp
run nwswg_4k python tools/dev_nwswg_long.py tpu 4000
# 4. NW 8 kbp rate (SWG e=1% exceeds the primary band past ~4.5 kbp)
run nwswg_8k python tools/dev_nwswg_long.py tpu 8000
# 4b. WIDE band (npl=2) Mosaic compile + exactness + marginal
run wide python tools/dev_nwswg_long.py tpu-wide 6000
# 4c. npl=4 ladder stage: compile + exactness at l=12000 (SWG e=1%
#     score ~360 needs C=255); decides the AIM_TPU_RETRY_PLANES default
run wide4 python tools/dev_nwswg_long.py tpu-wide 12000 4
# 4d. admission-cap substantiation: l=16000 (R near the 16352 gate) on
#     the npl=4 band — the documented "to ~16 kbp / ~18 kbp" envelope
#     is measured, not inferred.  Skipped automatically if wide4 FAILs.
#     (e=0.7%: SWG scores ~340 — certified npl=4 work, not overflow)
run wide4_16k python tools/dev_nwswg_long.py tpu-wide 16000 4 0.007
# 5. upload-fusion experiment (decides an api.align transport change)
run upload_fuse python tools/dev_upload_fuse.py
# 5b. WFA long-kernel stage ablation (ranks the remaining 97 us/pair:
#     extend probes vs ring bookkeeping vs plane ops) — informs the
#     next optimization, no pass/fail
run ablate python tools/dev_long_ablate.py
# 5c. difficulty-sort gain at 10 kbp (tile-max effect) — decides the
#     AIM_TPU_SORT recommendation for long-read runs
run sort_gain python tools/dev_sort_gain.py
# 6. headline bench (also rewrites SCALING.json)
run bench python bench.py

echo "=== summary ==="
grep -h "marginal\|OK\|FAIL\|pairs/s" /tmp/relay_return/*.log | tail -40

# ---- Decision rules for the results (apply + commit) -----------------
# wide (npl=2) compiles + exact ........ keep retry default "2"; update
#   BASELINE.md/README with the measured wide marginal.
# wide4 (npl=4) compiles + exact ....... flip _retry_stages default to
#   "2,4" (api.py) so >C127 pairs stay on-device; add the 12 kbp SWG
#   row to BASELINE.md.  If it OOMs VMEM, keep "2" and note the limit.
# upload_fuse: align fused=1 beats fused=0 by >10% ... flip the
#   AIM_TPU_FUSED_UPLOAD default to "1" in api.align (single-device),
#   re-run bench, update README/PERFNOTES.  Within noise: keep "0".
# ablate ............................... rank extend/spill/reduce/
#   compute shares; open the next ROADMAP perf item from the top one.
# sort_gain: >=3% at 10 kbp ............ flip AIM_TPU_SORT default to
#   on for single-device long-read runs (api.align gate: read_size
#   threshold), re-run bench, record in BASELINE.md.  Within noise:
#   keep "0" (the README row already documents the knob).
# wide4_16k compiles + exact ........... update the certified envelope
#   rows (README/PARITY/BASELINE) from "inferred ~16-18 kbp" to
#   "measured at 16 kbp"; FAIL => record the real ceiling instead.
# bench ................................ copy the JSON line numbers into
#   BASELINE.md round-3 table (incl. e2e_fused_upload_pairs_s).
# Any FAIL ............................. fix before touching defaults;
#   tests + fuzz gate every kernel change (ROADMAP testing recipe).

#!/bin/bash
# Round-5c probes: remat placement x source_unroll=4 interactions.
# The unroll promotion (docs/PERF.md) re-schedules remat regions per source
# body, so the rolled-loop verdicts (partial encoder remat dead, remat_field
# regression) may not transfer. One long-lived job; serializes device claims
# (CLAUDE.md pitfalls).
set -u
cd "$(dirname "$0")/.."
run() {
  echo "=== probe $* $(date -u +%H:%M:%S) ==="
  timeout 3600 python scripts/probe_step.py --steps 6 "$@" 2> >(grep -v cpu_aot_loader >&2)
  echo "=== rc=$? ==="
}
# partial encoder remat k=4 under full unroll (rolled verdict: dead +/-1.3%)
run --sources 4 --remat_encoder 4 --remat_decoder 0 --source_unroll 4
# no encoder remat at all under full unroll (rolled verdict: OOM by 191 MB
# pre-unroll; unroll re-schedules, worth one compile to know)
run --sources 4 --remat_decoder 0 --source_unroll 4
# remat_field under full unroll (recompute the featurize+field MLP inside
# render blocks; more overlap fodder for the unrolled scheduler)
run --sources 4 --remat_encoder --remat_decoder 0 --source_unroll 4 --remat_field
echo "ALLDONE rc=0"

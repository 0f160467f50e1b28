#!/bin/bash
# Round-5 source_unroll probes: run AFTER the bench warm-up releases the TPU.
# One long-lived job; serializes the device claims (CLAUDE.md pitfalls).
set -u
cd "$(dirname "$0")/.."
for u in 2 4; do
  echo "=== probe source_unroll=$u $(date -u +%H:%M:%S) ==="
  timeout 3600 python scripts/probe_step.py --sources 4 --remat_encoder \
      --remat_decoder 0 --source_unroll "$u" --steps 6
  echo "=== rc=$? ==="
done

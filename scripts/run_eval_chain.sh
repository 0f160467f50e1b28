#!/bin/bash
# Full train->eval->recon chain on a synthetic KITTI tree (one command).
#
# Generates the fixture, trains a short smoke checkpoint via the real CLI,
# then runs every eval/recon stage through scripts/smoke_eval_chain.py
# (save_depth_metrics -> agg -> render_colors -> eval_color ->
# generate_novel_depths -> depth2tsdf -> eval_sr), printing per-stage
# wall-clock. Run on the TPU to record the whole pipeline's hardware cost
# (docs/PERF.md "eval-chain wall-clock"); runs on CPU too (slow).
#
# ref pipeline: SURVEY.md section 3.3-3.5 (the reference's eval README flow).
set -u
cd "$(dirname "$0")/.."
export SMOKE_ROOT=${SMOKE_ROOT:-/tmp/fk_chain}
export SMOKE_PREP=${SMOKE_PREP:-/tmp/fk_chain_prep}
export SMOKE_RUN=${SMOKE_RUN:-/tmp/fk_chain_run}
export SMOKE_EVAL=${SMOKE_EVAL:-/tmp/fk_chain_eval}
export SMOKE_RECON=${SMOKE_RECON:-/tmp/fk_chain_recon}
rm -rf "$SMOKE_ROOT" "$SMOKE_PREP" "$SMOKE_RUN" "$SMOKE_EVAL" "$SMOKE_RECON"
python scripts/make_fake_kitti.py --root "$SMOKE_ROOT" --frames 24 --sequence 00
python scripts/make_fake_kitti.py --root "$SMOKE_ROOT" --frames 24 --sequence 08
echo "=== train stage ==="
T0=$(date +%s)
# --sequences 00: the fixture only materializes sequence 00 for train
# (the default train split walks 00-07+09/10, ref train_kitti.py data split)
scenerf-train-kitti --root "$SMOKE_ROOT" --preprocess_root "$SMOKE_PREP" \
  --logdir "$SMOKE_RUN" --n_epochs 1 --max_steps_per_epoch 25 \
  --sequence_distance 2.0 --frames_interval 0.4 --enable_log True \
  --compute_dtype bfloat16 --n_sources 4 --exp_prefix smoke \
  --sequences 00 || { echo "CHAIN TRAIN FAILED"; exit 1; }
echo "=== train stage took $(( $(date +%s) - T0 ))s ==="
python scripts/smoke_eval_chain.py
rc=$?
echo "CHAIN SCRIPT DONE rc=$rc"
exit $rc

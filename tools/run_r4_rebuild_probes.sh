#!/bin/bash
# Round-4 session restart recovery + queued flywheel probes.
# The machine restart wiped processed_data/ (packs are not committed);
# rebuild it from the committed artifacts, then run the two queued
# counter-measure probes from STATUS_r4.md:
#   v3geom — geometry-NLL-filtered distillation corpus
#   v2mix  — distill-v2 corpus with the real pack pinned at 25% batch share
# Each probe: train 100k iters -> sample 100 targets (unguided + guided)
# -> evaluate. Serial, single chip.
set -euo pipefail
cd "$(dirname "$0")/.."
S1=logs_real/shape_ae_2026_08_16__21_14_54_real/checkpoints

echo "=== [1/5] ingest (own stage-1 encoder directly - no torch double-pass)"
python -u -m shapemol_tpu.cli.ingest_reference \
    --se_model "$S1" --out_dir ./processed_data \
    2>&1 | tee runlogs/ingest_r4d.log

echo "=== [2/5] distill v3geom pack (pooled, geometry-NLL filter)"
python -u tools/make_distill_pack.py \
    --src results_full_ema,results_distill_full \
    --keep 7200 --geom_filter --workers 1 \
    --out processed_data/moses2_distill_v3geom \
    2>&1 | tee runlogs/distill_v3geom_pack.log

echo "=== [3/5] distill v2 pack (oracle filter, for the v2mix probe)"
python -u tools/make_distill_pack.py \
    --src results_distill_full --keep 14400 --workers 1 \
    --out processed_data/moses2_distill_v2 \
    2>&1 | tee runlogs/distill_v2_pack_r4d.log

ls processed_data/moses2_distill_v3geom.*.npz >/dev/null || { echo "FATAL: v3geom pack missing" >&2; exit 1; }
ls processed_data/moses2_distill_v2.*.npz >/dev/null || { echo "FATAL: v2 pack missing" >&2; exit 1; }

echo "=== [4/5] v3geom probe chain"
tools/run_train_eval_chain.sh 0 configs/training/moses2_distill_v3geom.yml \
    v3geom results_distill_v3geom 100000

echo "=== [5/5] v2mix probe chain"
tools/run_train_eval_chain.sh 0 configs/training/moses2_distill_v2mix.yml \
    v2mix results_distill_v2mix 100000

echo "=== r4 rebuild+probes done"

#!/bin/bash
# Real-MOSES2 end-to-end pipeline (after stage-1 training finishes):
#   re-encode pack latents -> train stage-2 diffusion -> sample 100 targets
#   -> evaluate on host CPU.
# Usage: tools/run_real_pipeline.sh <stage1_ckpt_dir> [s2_iters] [n_targets]
set -euo pipefail
cd "$(dirname "$0")/.."

S1_CKPT=${1:?stage-1 checkpoints dir}
S2_ITERS=${2:-50000}
N_TARGETS=${3:-100}
STAMP=$(date +%H%M%S)

echo "=== [1/4] re-encode packs with $S1_CKPT"
python -u -m shapemol_tpu.cli.reencode_packs \
    --pack "processed_data/moses2_*_v1.*.npz" --shape_ckpt "$S1_CKPT" \
    2>&1 | tee runlogs/reencode_$STAMP.log

echo "=== [2/4] train stage-2 diffusion ($S2_ITERS iters)"
python -u -m shapemol_tpu.cli.train_diffusion configs/training/moses2_real.yml \
    --logdir logs_real --tag real --max_iters "$S2_ITERS" --val_freq 2000 \
    2>&1 | tee runlogs/s2_train_$STAMP.log

S2_DIR=$(ls -dt logs_real/diffusion_*real* | head -1)
echo "=== [3/4] sample $N_TARGETS targets from $S2_DIR"
python -u -m shapemol_tpu.cli.sample_sweep configs/sampling/moses2_real.yml \
    --ckpt "$S2_DIR/checkpoints" \
    --test_pack processed_data/moses2_test_v1.shard000_00000.npz \
    --atomnum_prior /root/reference/data/MOSES2_training_val_shape_atomnum_dict.pkl \
    --start 0 --end "$N_TARGETS" --result_path results_real \
    2>&1 | tee runlogs/sample_$STAMP.log

echo "=== [4/4] evaluate (host CPU)"
PALLAS_AXON_POOL_IPS= python -u -m shapemol_tpu.cli.evaluate results_real \
    --testset /root/reference/data/MOSES2_test_mol.pkl \
    --index_map /root/reference/data/index_map.txt \
    --num_workers 8 --out results_real/metrics_real.json \
    2>&1 | tee runlogs/eval_$STAMP.log

echo "=== pipeline done; metrics in results_real/metrics_real.json"

#!/bin/bash
# Voxel-conditioned end-to-end proof run (VERDICT r2 item 8):
#   train voxel AE -> re-encode packs with voxel latents -> train stage-2
#   -> sample N targets -> evaluate.
# Usage: tools/run_voxel_pipeline.sh [s1_iters] [s2_iters] [n_targets]
set -euo pipefail
cd "$(dirname "$0")/.."

S1_ITERS=${1:-6000}
S2_ITERS=${2:-30000}
N_TARGETS=${3:-10}
STAMP=$(date +%H%M%S)

echo "=== [1/5] train voxel AE ($S1_ITERS iters)"
python -u -m shapemol_tpu.cli.train_shape_ae configs/shape/voxel_ae_real.yml \
    --logdir logs_real --tag voxr3 --max_iters "$S1_ITERS" --val_freq 1000 \
    --num_workers 8 2>&1 | tee runlogs/voxel_s1_$STAMP.log
VOX_CKPT=$(ls -dt logs_real/voxel_ae_*voxr3*/checkpoints | head -1)

echo "=== [2/5] re-encode packs with $VOX_CKPT (voxel latents)"
python -u -m shapemol_tpu.cli.reencode_packs \
    --pack "processed_data/moses2_*_v1.shard000_00000.npz" \
    --shape_ckpt "$VOX_CKPT" --mode voxelAE --out_suffix _voxel \
    2>&1 | tee runlogs/voxel_reencode_$STAMP.log

echo "=== [3/5] train voxel-conditioned stage-2 ($S2_ITERS iters)"
python -u -m shapemol_tpu.cli.train_diffusion \
    configs/training/moses2_real_voxel.yml \
    --logdir logs_real --tag voxs2 --max_iters "$S2_ITERS" --val_freq 2000 \
    2>&1 | tee runlogs/voxel_s2_$STAMP.log
S2_DIR=$(ls -dt logs_real/diffusion_*voxs2* | head -1)

echo "=== [4/5] sample $N_TARGETS targets"
python -u -m shapemol_tpu.cli.sample_sweep configs/sampling/moses2_real.yml \
    --ckpt "$S2_DIR/checkpoints" \
    --test_pack "processed_data/moses2_test_v1.shard000_00000_voxel.npz" \
    --atomnum_prior /root/reference/data/MOSES2_training_val_shape_atomnum_dict.pkl \
    --start 0 --end "$N_TARGETS" --result_path results_voxel \
    2>&1 | tee runlogs/voxel_sample_$STAMP.log

echo "=== [5/5] evaluate (host CPU)"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u -m shapemol_tpu.cli.evaluate \
    results_voxel \
    --testset /root/reference/data/MOSES2_test_mol.pkl \
    --index_map /root/reference/data/index_map.txt \
    --num_workers 8 --out results_voxel/metrics_voxel.json \
    2>&1 | tee runlogs/voxel_eval_$STAMP.log

echo "=== voxel pipeline done; metrics in results_voxel/metrics_voxel.json"

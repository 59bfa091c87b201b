#!/bin/bash
# Generic serial chain: wait for a PID to exit, then train a stage-2
# config, then sample 100 targets (unguided + pc-guided) and evaluate.
# Keeps the single chip busy across queued experiments.
# Usage: tools/run_train_eval_chain.sh <wait_pid|0> <config> <tag> <result_prefix> [max_iters]
set -euo pipefail
cd "$(dirname "$0")/.."

WAIT=${1:?pid to wait on (0 = none)}
CFG=${2:?training config}
TAG=${3:?run tag}
PREFIX=${4:?result prefix}
ITERS=${5:-100000}

if [ "$WAIT" != "0" ]; then
  # tail --pid survives EPERM and is immune to PID-reuse races that a
  # kill -0 poll is not (ADVICE r4)
  tail --pid="$WAIT" -f /dev/null || true
fi

python -u -m shapemol_tpu.cli.train_diffusion "$CFG" \
    --logdir logs_real --tag "$TAG" --max_iters "$ITERS" --val_freq 2000 \
    2>&1 | tee "runlogs/s2_${TAG}.log"

S2=$(ls -dt logs_real/diffusion_*"${TAG}" | head -1)
[ -d "$S2/checkpoints" ] || { echo "FATAL: no checkpoints under $S2" >&2; exit 1; }
echo "=== training done; sampling from $S2"

for MODE in "" "_guided"; do
  CFG_S=configs/sampling/moses2_real${MODE:+_guided}.yml
  python -u -m shapemol_tpu.cli.sample_sweep "$CFG_S" \
      --ckpt "$S2/checkpoints" \
      --test_pack processed_data/moses2_test_v1.shard000_00000.npz \
      --atomnum_prior /root/reference/data/MOSES2_training_val_shape_atomnum_dict.pkl \
      --start 0 --end 100 --result_path "${PREFIX}${MODE}" \
      2>&1 | tee "runlogs/sample_$(basename ${PREFIX}${MODE}).log"
  python -u -m shapemol_tpu.cli.evaluate "${PREFIX}${MODE}" \
      --testset /root/reference/data/MOSES2_test_mol.pkl \
      --index_map /root/reference/data/index_map.txt \
      --num_workers 8 --out "${PREFIX}${MODE}/metrics.json" \
      2>&1 | tee "runlogs/eval_$(basename ${PREFIX}${MODE}).log"
done
echo "=== chain done ($TAG)"

#!/bin/bash
# Complete reference protocol for one checkpoint: 1000 targets x 50
# samples = 50,000 molecules (scripts/sample_diffusion.py:168-175 +
# data/index_map.txt semantics), then host evaluation with the
# held-out/in-train split disclosure (r5 by_split).
# Usage: tools/run_full_protocol.sh <ckpt_dir> <result_dir> [sampling_cfg] [wait_pid]
set -euo pipefail
cd "$(dirname "$0")/.."

CKPT=${1:?checkpoint dir}
DIR=${2:?result dir}
SCFG=${3:-configs/sampling/moses2_real_guided.yml}
WAIT=${4:-0}
if [ "$WAIT" != "0" ]; then
  tail --pid="$WAIT" -f /dev/null || true
fi

python -u -m shapemol_tpu.cli.sample_sweep "$SCFG" \
    --ckpt "$CKPT" \
    --test_pack processed_data/moses2_test_v1.shard000_00000.npz \
    --atomnum_prior /root/reference/data/MOSES2_training_val_shape_atomnum_dict.pkl \
    --start 0 --end 1000 --result_path "$DIR" \
    2>&1 | tee "runlogs/sample_$(basename "$DIR")_full.log"

nice -n 15 python -u -m shapemol_tpu.cli.evaluate "$DIR" \
    --testset /root/reference/data/MOSES2_test_mol.pkl \
    --index_map /root/reference/data/index_map.txt \
    --num_workers 1 --out "$DIR/metrics_full.json" \
    2>&1 | tee "runlogs/eval_$(basename "$DIR")_full.log"
echo "=== full protocol done ($DIR)"

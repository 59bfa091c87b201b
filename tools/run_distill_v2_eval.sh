#!/bin/bash
# Post-training eval chain for the distill-v2 flywheel checkpoint:
# wait for the training PID to exit, then sample 100 targets unguided +
# pc-guided and evaluate both (host CPU workers).
# Usage: tools/run_distill_v2_eval.sh <train_pid> <ckpt_glob> <result_prefix>
set -uo pipefail
cd "$(dirname "$0")/.."

PID=${1:?train pid}
GLOB=${2:?ckpt dir glob (e.g. 'logs_real/diffusion_*distillv2')}
PREFIX=${3:?result prefix (e.g. results_distill_v2)}

while kill -0 "$PID" 2>/dev/null; do sleep 30; done

S2=$(ls -dt $GLOB | head -1)
echo "=== training done; sampling from $S2"

python -u -m shapemol_tpu.cli.sample_sweep configs/sampling/moses2_real.yml \
    --ckpt "$S2/checkpoints" \
    --test_pack processed_data/moses2_test_v1.shard000_00000.npz \
    --atomnum_prior /root/reference/data/MOSES2_training_val_shape_atomnum_dict.pkl \
    --start 0 --end 100 --result_path "$PREFIX" \
    2>&1 | tee "runlogs/sample_$(basename $PREFIX).log"

python -u -m shapemol_tpu.cli.sample_sweep configs/sampling/moses2_real_guided.yml \
    --ckpt "$S2/checkpoints" \
    --test_pack processed_data/moses2_test_v1.shard000_00000.npz \
    --atomnum_prior /root/reference/data/MOSES2_training_val_shape_atomnum_dict.pkl \
    --start 0 --end 100 --result_path "${PREFIX}_guided" \
    2>&1 | tee "runlogs/sample_$(basename $PREFIX)_guided.log"

for D in "$PREFIX" "${PREFIX}_guided"; do
  python -u -m shapemol_tpu.cli.evaluate "$D" \
      --testset /root/reference/data/MOSES2_test_mol.pkl \
      --index_map /root/reference/data/index_map.txt \
      --num_workers 8 --out "$D/metrics.json" \
      2>&1 | tee "runlogs/eval_$(basename $D).log"
done
echo "=== eval chain done"

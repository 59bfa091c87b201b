#!/bin/bash
# Round-5 tail: after the main probe chain, train the v4strat corpus
# (composition-stratified geometry filter) and sample/eval it at 100
# held-out targets. Champion full-protocol run is kicked manually after
# comparing v4strat vs v3geom.
# Usage: tools/run_r5_tail.sh <wait_pid|0>
set -euo pipefail
cd "$(dirname "$0")/.."
WAIT=${1:?pid}
if [ "$WAIT" != "0" ]; then tail --pid="$WAIT" -f /dev/null || true; fi

PRIOR=/root/reference/data/MOSES2_training_val_shape_atomnum_dict.pkl
TEST_PACK=processed_data/moses2_test_v1.shard000_00000.npz

python -u -m shapemol_tpu.cli.train_diffusion \
    configs/training/moses2_distill_v4strat.yml \
    --logdir logs_real --tag v4strat --max_iters 100000 --val_freq 2000 \
    2>&1 | tee runlogs/s2_v4strat.log
S2=$(ls -dt logs_real/diffusion_*v4strat | head -1)
[ -d "$S2/checkpoints" ] || { echo "no ckpt" >&2; exit 1; }

for MODE in "" "_guided"; do
  CFG_S=configs/sampling/moses2_real${MODE:+_guided}.yml
  python -u -m shapemol_tpu.cli.sample_sweep "$CFG_S" \
      --ckpt "$S2/checkpoints" --test_pack "$TEST_PACK" \
      --atomnum_prior "$PRIOR" --start 0 --end 100 \
      --result_path "results_distill_v4strat${MODE}" \
      2>&1 | tee "runlogs/sample_results_distill_v4strat${MODE}.log"
  nohup nice -n 19 python -u -m shapemol_tpu.cli.evaluate \
      "results_distill_v4strat${MODE}" \
      --testset /root/reference/data/MOSES2_test_mol.pkl \
      --index_map /root/reference/data/index_map.txt \
      --num_workers 1 --out "results_distill_v4strat${MODE}/metrics.json" \
      > "runlogs/eval_results_distill_v4strat${MODE}.log" 2>&1 &
done
wait
echo "=== r5 tail done"

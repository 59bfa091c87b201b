#!/bin/bash
# Third queued probe: jitter->anneal recipe on the distillation corpus
# (STATUS_r4 "jitter-anneal x distill composition").
# Waits for the main rebuild+probes pipeline to finish, then:
#   1. build the v1 distill pack (results_full_ema, plain oracle filter)
#   2. train 80k iters with pos_jitter 0.02 (moses2_distill_jitter.yml)
#   3. resume jitter-free for 20k (moses2_distill.yml) - the anneal
#   4. sample 100 targets unguided + pc-guided, evaluate both
# Usage: tools/run_distill_jitter_chain.sh <wait_pid|0>
set -euo pipefail
cd "$(dirname "$0")/.."

WAIT=${1:?pid to wait on (0 = none)}
if [ "$WAIT" != "0" ]; then
  tail --pid="$WAIT" -f /dev/null || true
fi

echo "=== [1/4] distill v1 pack (oracle filter)"
if ls processed_data/moses2_distill_v1.*.npz >/dev/null 2>&1; then
  echo "pack exists; skipping build"
else
  python -u tools/make_distill_pack.py --cpu \
      --src results_full_ema --keep 7200 --workers 1 \
      --out processed_data/moses2_distill_v1 \
      2>&1 | tee runlogs/distill_v1_pack_r4d.log
fi

echo "=== [2/4] train 80k @ jitter 0.02 on the distill corpus"
python -u -m shapemol_tpu.cli.train_diffusion \
    configs/training/moses2_distill_jitter.yml \
    --logdir logs_real --tag dja --max_iters 80000 --val_freq 2000 \
    2>&1 | tee runlogs/s2_distill_jitter.log

S2=$(ls -dt logs_real/diffusion_*dja | head -1)
[ -d "$S2/checkpoints" ] || { echo "FATAL: no checkpoints under $S2" >&2; exit 1; }
echo "=== [3/4] 20k jitter-free anneal resuming $S2"
python -u -m shapemol_tpu.cli.train_diffusion \
    configs/training/moses2_distill.yml \
    --logdir logs_real --tag dja_anneal --resume "$S2/checkpoints" \
    --max_iters 100000 --val_freq 2000 \
    2>&1 | tee runlogs/s2_distill_jitter_anneal.log

S2A=$(ls -dt logs_real/diffusion_*dja_anneal | head -1)
[ -d "$S2A/checkpoints" ] || { echo "FATAL: no checkpoints under $S2A" >&2; exit 1; }
echo "=== [4/4] sample+eval from $S2A"
for MODE in "" "_guided"; do
  CFG_S=configs/sampling/moses2_real${MODE:+_guided}.yml
  python -u -m shapemol_tpu.cli.sample_sweep "$CFG_S" \
      --ckpt "$S2A/checkpoints" \
      --test_pack processed_data/moses2_test_v1.shard000_00000.npz \
      --atomnum_prior /root/reference/data/MOSES2_training_val_shape_atomnum_dict.pkl \
      --start 0 --end 100 --result_path "results_distill_ja${MODE}" \
      2>&1 | tee "runlogs/sample_results_distill_ja${MODE}.log"
  python -u -m shapemol_tpu.cli.evaluate "results_distill_ja${MODE}" \
      --testset /root/reference/data/MOSES2_test_mol.pkl \
      --index_map /root/reference/data/index_map.txt \
      --num_workers 4 --out "results_distill_ja${MODE}/metrics.json" \
      2>&1 | tee "runlogs/eval_results_distill_ja${MODE}.log"
done
echo "=== distill-jitter-anneal chain done"

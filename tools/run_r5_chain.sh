#!/bin/bash
# Round-5 probe queue (VERDICT r4 items 1, 3, 4): keeps the single TPU
# chip busy across the queued experiments; host evals run nice'd in the
# background so the chip never idles on CPU work.
#
#   phase A (item 1)  v3geom sample+eval (training already done),
#                     v2mix train+sample+eval,
#                     distill-jitter-anneal train(80k+20k)+sample+eval
#   phase B (item 3)  geometry-loss dose-response: geom1/geom10/geom100
#                     train 100k + unguided sample+eval each
#   phase C (item 4)  CFG on the distill corpus: train 100k, sweep
#                     s in {0, 0.5, 1, 2} (rescale) at 100 targets
#
# Each probe runs in its own guarded subshell: a failure is logged loudly
# to runlogs/r5_chain_failures.log and later probes still run (ADVICE r4
# fail-fast INSIDE a probe, isolation BETWEEN probes).
# Usage: tools/run_r5_chain.sh <wait_pid|0>
set -euo pipefail
cd "$(dirname "$0")/.."

WAIT=${1:?pid to wait on (0 = none)}
if [ "$WAIT" != "0" ]; then
  tail --pid="$WAIT" -f /dev/null || true
fi

FAIL_LOG=runlogs/r5_chain_failures.log
PRIOR=/root/reference/data/MOSES2_training_val_shape_atomnum_dict.pkl
TEST_PACK=processed_data/moses2_test_v1.shard000_00000.npz
TESTSET=/root/reference/data/MOSES2_test_mol.pkl
INDEX_MAP=/root/reference/data/index_map.txt

probe_failed() { echo "[r5-chain] PROBE FAILED: $1" | tee -a "$FAIL_LOG"; }

# sample on the chip, then evaluate in the background (nice'd, 1 worker)
sample_eval() {  # ckpt result_dir sampling_cfg [extra sweep args...]
  local CKPT=$1 DIR=$2 SCFG=$3; shift 3
  python -u -m shapemol_tpu.cli.sample_sweep "$SCFG" \
      --ckpt "$CKPT" --test_pack "$TEST_PACK" --atomnum_prior "$PRIOR" \
      --start 0 --end 100 --result_path "$DIR" "$@" \
      2>&1 | tee "runlogs/sample_$(basename "$DIR").log"
  nohup nice -n 19 python -u -m shapemol_tpu.cli.evaluate "$DIR" \
      --testset "$TESTSET" --index_map "$INDEX_MAP" \
      --num_workers 1 --out "$DIR/metrics.json" \
      > "runlogs/eval_$(basename "$DIR").log" 2>&1 &
}

train_one() {  # config tag max_iters [resume_dir]
  local CFG=$1 TAG=$2 ITERS=$3 RESUME=${4:-}
  local ARGS=(--logdir logs_real --tag "$TAG" --max_iters "$ITERS"
              --val_freq 2000)
  [ -n "$RESUME" ] && ARGS+=(--resume "$RESUME")
  python -u -m shapemol_tpu.cli.train_diffusion "$CFG" "${ARGS[@]}" \
      2>&1 | tee "runlogs/s2_${TAG}.log"
  S2=$(ls -dt logs_real/diffusion_*"${TAG}" | head -1)
  [ -d "$S2/checkpoints" ] || { echo "no checkpoints under $S2" >&2; return 1; }
  echo "$S2"
}

# ---------- phase A: finish the queued r4 probes ----------
if ! (
  set -e
  S2=$(ls -dt logs_real/diffusion_*v3geom | head -1)
  [ -d "$S2/checkpoints" ]
  sample_eval "$S2/checkpoints" results_distill_v3geom configs/sampling/moses2_real.yml
  sample_eval "$S2/checkpoints" results_distill_v3geom_guided configs/sampling/moses2_real_guided.yml
); then probe_failed v3geom; fi

if ! (
  set -e
  S2=$(train_one configs/training/moses2_distill_v2mix.yml v2mix 100000 | tail -1)
  sample_eval "$S2/checkpoints" results_distill_v2mix configs/sampling/moses2_real.yml
  sample_eval "$S2/checkpoints" results_distill_v2mix_guided configs/sampling/moses2_real_guided.yml
); then probe_failed v2mix; fi

if ! (
  set -e
  ls processed_data/moses2_distill_v1.*.npz >/dev/null
  S2=$(train_one configs/training/moses2_distill_jitter.yml dja 80000 | tail -1)
  S2A=$(train_one configs/training/moses2_distill.yml dja_anneal 100000 "$S2/checkpoints" | tail -1)
  sample_eval "$S2A/checkpoints" results_distill_ja configs/sampling/moses2_real.yml
  sample_eval "$S2A/checkpoints" results_distill_ja_guided configs/sampling/moses2_real_guided.yml
); then probe_failed distill-jitter-anneal; fi

# ---------- phase B: geometry-loss dose-response ----------
for W in 1 10 100; do
  if ! (
    set -e
    S2=$(train_one "configs/training/moses2_distill_geom${W}.yml" "geom${W}" 100000 | tail -1)
    sample_eval "$S2/checkpoints" "results_geom${W}" configs/sampling/moses2_real.yml
  ); then probe_failed "geom${W}"; fi
done

# ---------- phase C: CFG at distill-corpus scale ----------
if ! (
  set -e
  S2=$(train_one configs/training/moses2_distill_cfg.yml dcfg 100000 | tail -1)
  sample_eval "$S2/checkpoints" results_dcfg_s0 configs/sampling/moses2_real.yml
  for S in 0.5 1 2; do
    sample_eval "$S2/checkpoints" "results_dcfg_s${S}" configs/sampling/moses2_real.yml \
        --guide_stren "$S" --threshold_type rescale
  done
); then probe_failed cfg-distill; fi

wait   # let the last background evals finish
echo "=== r5 chain done (failures: $( [ -f $FAIL_LOG ] && wc -l < $FAIL_LOG || echo 0 ))"

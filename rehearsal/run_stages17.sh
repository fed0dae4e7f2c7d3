# Rehearsal continuation #17 (2026-08-19).  Another machine reset wiped the
# untracked artifacts again (dataset, shards, checkpoints, queue-16's
# in-flight DPM curve logs).  This queue regenerates the seeded dataset's
# dependent chain and re-runs a TRIMMED DPM-Solver++(2M) vs DDIM curve —
# both samplers over the SAME fresh stage-1 checkpoint / protocol (64 test
# tracks, scale 2.0 always-on CFG = the reference eval protocol), ordered
# so the highest-value cells land first, each cell bounded by timeout.
# Launch from repo root AFTER /tmp/make_data.sh has been started:
#   nohup sh rehearsal/run_stages17.sh > /tmp/stages17.log 2>&1 &
# ADVICE r3 closure: the `timeout`-orphans-python finding is fixed globally —
# every script/*.sh wrapper now `exec python`s, so timeout signals the real
# chip client, here and in every later queue.

cd "$(dirname "$0")/.." || exit 1

run() {
  name=$1; tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- 0. wait for the synthetic dataset + shards -----------------------------
while ! grep -q DATA_DONE /tmp/make_data.log 2>/dev/null; do sleep 15; done
mkdir -p data/greatest-hits
[ -e data/greatest-hits/mic-mp4-processed ] || \
  ln -s ../rehearsal/processed data/greatest-hits/mic-mp4-processed
echo "=== data ready $(date -u +%H:%M:%S) ==="

# -- 1. stage-1 diffusion retrain (reference recipe, 2500 steps) ------------
run stage1_retrain 3600 sh script/train_diffusion_model_gh.sh \
  model.embedder_checkpoint=null \
  max_steps=2500 log_every_n_steps=500

RUN_DIR=$(ls -d logs/runs/*/ 2>/dev/null | tail -1)
if [ -z "$RUN_DIR" ] || [ -z "$(ls -A "${RUN_DIR}ckpts" 2>/dev/null)" ]; then
  echo "RETRAIN left no checkpoint in '${RUN_DIR}ckpts' — aborting queue"
  exit 1
fi
echo "STAGE1_RUN=$RUN_DIR"

# -- 2. GT prep --------------------------------------------------------------
run stage2_gt 900 sh script/run_prepare_gh_gt.sh

# -- 3. curve cells, highest-value first -------------------------------------
cell() {
  sampler=$1; ns=$2; shift 2
  run "curve_${sampler}_${ns}" 1200 sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="${RUN_DIR}ckpts" \
    experiment.num_steps=$ns "+experiment.sampler=$sampler" "$@" \
    experiment_path=./output/experiments/gh-gen-${sampler}-${ns}
  run "curve_onset_${sampler}_${ns}" 600 sh script/evaluate_onset.sh \
    --gen_dir output/experiments/gh-gen-${sampler}-${ns}
}

cell dpm 32
cell ddim 32
cell dpm 16
cell ddim 16

# full serving stack: dpm + scale 1.5 + band [0.2, 0.8] at 32 steps
run curve_dpm32_s15_band 1200 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="${RUN_DIR}ckpts" \
  experiment.num_steps=32 "+experiment.sampler=dpm" \
  experiment.embedding_scale=1.5 "+experiment.guidance_interval=[0.2,0.8]" \
  experiment_path=./output/experiments/gh-gen-dpm32-s15-band
run curve_onset_dpm32_s15_band 600 sh script/evaluate_onset.sh \
  --gen_dir output/experiments/gh-gen-dpm32-s15-band

cell dpm 50
cell ddim 100
cell dpm 100

echo "STAGES17 DONE $(date -u)"

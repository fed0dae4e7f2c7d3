# Rehearsal queue 26 (round 4, post-reset): a machine reset wiped every
# untracked artifact (dataset, shards, checkpoints, .jax_cache, and the
# queue-24/25 result logs) BEFORE the DeepCache serving-default decision
# cells were recorded in docs.  This queue regenerates the chain and
# re-runs the decision cells, highest-value first:
#   0. seeded synthetic dataset + shards (idempotent make_data)
#   1. GT prep for FAD
#   2. stage-1 diffusion retrain, literal wrapper, 2500 steps (the proven
#      ~30 min post-reset recipe of queue 15/17; FAD absolutes are NOT
#      comparable to the soak-checkpoint numbers in REHEARSAL §11 — only
#      the same-checkpoint A/B contrasts matter here)
#   3. A: exact serving composition at 150 steps — band alone vs band+dc3
#      (the quality gate for flipping the bench default), then band+dc2
#   4. B: seed-1 replication of the band-vs-band+dc3 pair
#   5. C: perf rows lost with queue 23/24: band_dc2/3/4 + always-on dc3
# All cells run the literal `exec python` wrappers so timeout signals the
# real chip client; every dependent cell checks its checkpoint first.
# Launch: nohup sh rehearsal/run_stages26.sh > /tmp/stages26.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1

# NOTE: run() must not reuse cell()'s variable names — POSIX sh has no
# locals, and an earlier version's shared `name` meant the second run()
# inside cell() expanded ${name} to the FIRST run's name (onset cells
# scored an empty --gen_dir; queue 26 re-scored them manually).
run() {
  rname=$1; tmo=$2; shift 2
  echo "=== [$rname] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$rname.log" 2>&1
  echo "=== [$rname] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- 0. data (idempotent) -----------------------------------------------------
sh rehearsal/make_data.sh > rehearsal/make_data.log 2>&1 || {
  echo "DATA GENERATION FAILED — aborting queue"; exit 1; }
mkdir -p data/greatest-hits
[ -e data/greatest-hits/mic-mp4-processed ] || \
  ln -s ../rehearsal/processed data/greatest-hits/mic-mp4-processed
echo "=== data ready $(date -u +%H:%M:%S) ==="

# -- 1. GT prep ---------------------------------------------------------------
run stage2_gt 900 sh script/run_prepare_gh_gt.sh

# -- 2. stage-1 retrain (2500 steps, reference recipe) --------------------------
run stage1_retrain 5400 sh script/train_diffusion_model_gh.sh \
  model.embedder_checkpoint=null max_steps=2500 log_every_n_steps=500
RUN1=$(sed -n 's/.*run dir: //p' rehearsal/stage1_retrain.log | head -1)
if [ -z "$RUN1" ] || [ -z "$(ls -A "$RUN1/ckpts" 2>/dev/null)" ]; then
  echo "RETRAIN left no checkpoint in '${RUN1}/ckpts' — aborting queue"
  exit 1
fi
echo "RETRAIN DONE run=$RUN1"

# -- 3. decision cells: 150-step serving composition ---------------------------
cell() {
  name=$1; shift
  run "curve_ddim150_${name}" 2700 sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="${RUN1}/ckpts" \
    experiment.num_steps=150 "+experiment.guidance_interval=[0.2,0.8]" \
    "$@" \
    experiment_path=./output/experiments/gh-gen-ddim150-${name}
  # ADVICE r4: only score onset metrics if the gen cell actually produced
  # output — an empty --gen_dir silently scores garbage.
  gdir=output/experiments/gh-gen-ddim150-${name}
  if [ -d "$gdir" ] && [ -n "$(ls -A "$gdir" 2>/dev/null)" ]; then
    run "curve_onset_ddim150_${name}" 600 sh script/evaluate_onset.sh \
      --gen_dir "$gdir"
  else
    echo "=== [curve_onset_ddim150_${name}] SKIPPED: empty gen dir ==="
  fi
}

cell band
cell band_dc3 "+experiment.deep_cache_interval=3"
cell band_dc2 "+experiment.deep_cache_interval=2"

# -- 4. seed-1 replication of the gate pair ------------------------------------
cell band_seed1 "+experiment.seed=1"
cell band_dc3_seed1 "+experiment.deep_cache_interval=3" "+experiment.seed=1"

# -- 5. perf rows lost with queues 23/24 (full-size flagship, real chip) -------
run perf_deepcache 2400 python script/perf_sweep.py \
  folded256_b8_band_dc3 folded256_b8_band_dc2 folded256_b8_band_dc4 \
  folded256_b8_dc3

echo "STAGES26 DONE $(date -u)"

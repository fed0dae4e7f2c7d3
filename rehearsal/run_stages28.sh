# Rehearsal queue 28 (round 5): the VERDICT-r4 headline items that need the
# chip, freshest evidence first:
#   0-2. post-reset bootstrap: seeded data + shards, GT prep, stage-1
#        diffusion retrain (2500 steps, the proven queue-15/26 recipe).
#        FAD absolutes are NOT comparable across checkpoints — every table
#        below is a same-checkpoint A/B.
#   3.   DeepCache K=4 quality gate at the exact serving composition
#        (ddim@150 + band [0.2,0.8]), two seeds, with band and band+dc3
#        anchors re-run on THIS checkpoint (VERDICT r4 next #1).
#   4.   Non-uniform cadence probe: K=3-equivalent refresh count, denser at
#        low sigma (deep_cache_pow=2.0, models/diffusion.deep_cache_refresh_mask),
#        two seeds (VERDICT r4 next #1, second half).
#   5.   Fast-point composition: dpm@32 + scale 1.5 + band x {none, dc2, dc3},
#        two seeds (VERDICT r4 next #2).
#   6.   Perf rows for every new cell variant (same-chip, perf_sweep.py).
# All cells run the literal `exec python` wrappers so timeout signals the
# real chip client; every dependent cell checks its inputs first (ADVICE r4:
# onset eval only runs if the gen dir is non-empty).
# Launch: nohup sh rehearsal/run_stages28.sh > /tmp/stages28.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1

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

# cell NAME TIMEOUT [overrides...]: generation + (guarded) onset eval.
cell() {
  cname=$1; ctmo=$2; shift 2
  run "curve_${cname}" "$ctmo" sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="${RUN1}/ckpts" \
    "$@" \
    experiment_path=./output/experiments/gh-gen-${cname}
  gdir=output/experiments/gh-gen-${cname}
  if [ -d "$gdir" ] && [ -n "$(ls -A "$gdir" 2>/dev/null)" ]; then
    run "curve_onset_${cname}" 600 sh script/evaluate_onset.sh \
      --gen_dir "$gdir"
  else
    echo "=== [curve_onset_${cname}] SKIPPED: empty gen dir ==="
  fi
}

BAND150='experiment.num_steps=150 +experiment.guidance_interval=[0.2,0.8]'

# -- 3. K=4 gate + same-checkpoint anchors, two seeds ---------------------------
cell ddim150_band        2700 $BAND150
cell ddim150_band_dc3    2700 $BAND150 "+experiment.deep_cache_interval=3"
cell ddim150_band_dc4    2700 $BAND150 "+experiment.deep_cache_interval=4"
cell ddim150_band_seed1  2700 $BAND150 "+experiment.seed=1"
cell ddim150_band_dc3_seed1 2700 $BAND150 \
  "+experiment.deep_cache_interval=3" "+experiment.seed=1"
cell ddim150_band_dc4_seed1 2700 $BAND150 \
  "+experiment.deep_cache_interval=4" "+experiment.seed=1"

# -- 4. non-uniform cadence probe (K=3-equivalent count, dense at low sigma) ----
cell ddim150_band_nu3    2700 $BAND150 \
  "+experiment.deep_cache_interval=3" "+experiment.deep_cache_pow=2.0"
cell ddim150_band_nu3_seed1 2700 $BAND150 \
  "+experiment.deep_cache_interval=3" "+experiment.deep_cache_pow=2.0" \
  "+experiment.seed=1"

# -- 5. fast-point composition: dpm@32 + s1.5 + band x cache, two seeds ---------
DPMFAST='experiment.num_steps=32 experiment.embedding_scale=1.5 +experiment.sampler=dpm +experiment.guidance_interval=[0.2,0.8]'
cell dpm32_s15_band          1500 $DPMFAST
cell dpm32_s15_band_dc2      1500 $DPMFAST "+experiment.deep_cache_interval=2"
cell dpm32_s15_band_dc3      1500 $DPMFAST "+experiment.deep_cache_interval=3"
cell dpm32_s15_band_seed1    1500 $DPMFAST "+experiment.seed=1"
cell dpm32_s15_band_dc2_seed1 1500 $DPMFAST \
  "+experiment.deep_cache_interval=2" "+experiment.seed=1"
cell dpm32_s15_band_dc3_seed1 1500 $DPMFAST \
  "+experiment.deep_cache_interval=3" "+experiment.seed=1"

# -- 6. perf rows for the new variants (full-size flagship, real chip) ----------
run perf_r5 3600 python script/perf_sweep.py \
  folded256_b8_band_dc3 folded256_b8_band_dc4 folded256_b8_band_nu3 \
  folded256_b8_dpm32_s15_band folded256_b8_dpm32_s15_band_dc2 \
  folded256_b8_dpm32_s15_band_dc3

echo "STAGES28 DONE $(date -u)"

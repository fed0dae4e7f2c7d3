# Rehearsal queue 33 (round 5, final boot): a machine reset again wiped all
# untracked artifacts before queues 30-32 could run.  Remaining wall clock
# does not fit the wire A/B re-measure (2x ~1 h trainings) or the
# distill-at-scale chain (~4 h), so this queue spends the chip on the
# highest-value open item: the DeepCache K=5/6 asymptote gates (queue 31's
# goal; projected ~135 / ~141 clips/min/chip from the s + d/K fit vs the
# validated K=4 default at 126.4).  Order is risk-aware for a hard round
# end: dc5 both seeds first (enough evidence for a K=5 flip on its own,
# same two-seed rule as the K=3/K=4 flips), then the perf rows, then dc6.
# Anchors are the committed queue-28 values (band 23.61/25.68,
# dc4 20.96/22.48) — full-pipeline determinism reproduced them to the
# printed digit across two independent boots (REHEARSAL §12); cells whose
# band-relative deltas land wildly outside the known +-3 range indicate a
# broken bootstrap, not a real quality shift.
# Launch: nohup sh rehearsal/run_stages33.sh > /tmp/stages33.log 2>&1 &
# (make_data.sh already running separately; this queue waits for it)

cd "$(dirname "$0")/.." || exit 1

# -- 0. wait for data (bounded; make_data.sh launched separately) -------------
i=0
until grep -q "DATA_DONE" rehearsal/make_data.log 2>/dev/null; do
  i=$((i+1)); [ $i -gt 240 ] && { echo "make_data never finished"; exit 1; }
  sleep 20
done
mkdir -p data/greatest-hits
[ -e data/greatest-hits/mic-mp4-processed ] || \
  ln -s ../rehearsal/processed data/greatest-hits/mic-mp4-processed
echo "=== data ready $(date -u +%H:%M:%S) ==="

run() {
  rname=$1; tmo=$2; shift 2
  echo "=== [$rname] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$rname.log" 2>&1
  echo "=== [$rname] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- 1. GT prep (uses the chip backend — keep serialized) ---------------------
run stage2_gt 900 sh script/run_prepare_gh_gt.sh

# -- 2. stage-1 retrain: the EXACT queue-26/28 recipe (determinism anchor) ----
run stage1_retrain 5400 sh script/train_diffusion_model_gh.sh \
  model.embedder_checkpoint=null max_steps=2500 log_every_n_steps=500
RUN1=$(sed -n 's/.*run dir: //p' rehearsal/stage1_retrain.log | head -1)
if [ -z "$RUN1" ] || [ -z "$(ls -A "$RUN1/ckpts" 2>/dev/null)" ]; then
  echo "RETRAIN left no checkpoint in '${RUN1}/ckpts' — aborting queue"
  exit 1
fi
echo "RETRAIN DONE run=$RUN1"

# cell NAME [overrides...]: 64-track serving-composition gen + guarded onset eval
cell() {
  cname=$1; shift
  run "curve_${cname}" 2700 sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="${RUN1}/ckpts" \
    experiment.num_steps=150 "+experiment.guidance_interval=[0.2,0.8]" \
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

# -- 3. K=5 decision pair (sufficient for a flip by itself) -------------------
cell ddim150_band_dc5       "+experiment.deep_cache_interval=5"
cell ddim150_band_dc5_seed1 "+experiment.deep_cache_interval=5" "+experiment.seed=1"
echo "DC5 CELLS DONE $(date -u)"

# -- 4. perf rows (no checkpoint needed, but chip-exclusive) ------------------
run perf_dc56 2400 python script/perf_sweep.py \
  folded256_b8_band_dc5 folded256_b8_band_dc6
echo "PERF DONE $(date -u)"

# -- 5. K=6 pair (if the round is still alive) --------------------------------
cell ddim150_band_dc6       "+experiment.deep_cache_interval=6"
cell ddim150_band_dc6_seed1 "+experiment.deep_cache_interval=6" "+experiment.seed=1"

echo "STAGES33 DONE $(date -u)"

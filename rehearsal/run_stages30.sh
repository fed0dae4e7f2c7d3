# Rehearsal queue 30 (round 5, after queue 29): clean-host re-measures.
#   A. Wire A/B, clean conditions: queue 29's yuv420 15-epoch augment run
#      overlapped a full pytest suite on this 1-CPU host, contaminating the
#      step-time half of the A/B (quality half passed: test AP 0.9422 /
#      Acc 0.9603 / OnsNumAcc 0.9504 vs RGB anchors 0.935/0.960/0.950).
#      Re-run BOTH wires back to back with nothing else on the host; the
#      train driver now logs synced s/step per epoch directly.  Gate:
#      yuv steady-state s/step <= 0.6 (RGB anchor 0.95, yuv tunnel bound
#      ~0.36 s at 9 MB/batch over ~25 MB/s).
#   B. The queue-28 cell lost to a wedged tunnel: dpm32+s1.5+band+dc3
#      seed 1 (same 2.5k checkpoint as the rest of the queue-28 fast-point
#      table; decision already made — dc2 — this completes the table).
# Launch: nohup sh rehearsal/run_stages30.sh > /tmp/stages30.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1

# -- 0. wait for queue 29 (bounded) ------------------------------------------
i=0
until grep -q "STAGES29 DONE" /tmp/stages29.log 2>/dev/null; do
  i=$((i+1)); [ $i -gt 2160 ] && { echo "queue 29 never finished"; exit 1; }
  sleep 20
done
echo "=== queue 29 done, starting 30 $(date -u +%H:%M:%S) ==="

run() {
  rname=$1; tmo=$2; shift 2
  echo "=== [$rname] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$rname.log" 2>&1
  echo "=== [$rname] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- A. wire A/B on a quiet host ---------------------------------------------
run wire_rgb_train 3600 sh script/train_onset_model_gh_augment.sh \
  -c cfg/trainer/trainer-onset-rehearsal.yaml
run wire_yuv_train 3600 sh script/train_onset_model_gh_augment.sh \
  -c cfg/trainer/trainer-onset-rehearsal.yaml -c cfg/data/wire-yuv420.yaml
grep "s/step" rehearsal/wire_rgb_train.log rehearsal/wire_yuv_train.log

# -- B. complete the queue-28 fast-point table (2.5k checkpoint) -------------
RUN1=$(sed -n 's/.*run dir: //p' rehearsal/stage1_retrain.log 2>/dev/null | head -1)
if [ -n "$RUN1" ] && [ -n "$(ls -A "$RUN1/ckpts" 2>/dev/null)" ]; then
  cname=dpm32_s15_band_dc3_seed1
  run "curve_${cname}" 1800 sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="$RUN1/ckpts" \
    experiment.num_steps=32 experiment.embedding_scale=1.5 \
    +experiment.sampler=dpm "+experiment.guidance_interval=[0.2,0.8]" \
    "+experiment.deep_cache_interval=3" "+experiment.seed=1" \
    experiment_path=./output/experiments/gh-gen-${cname}
  gdir=output/experiments/gh-gen-${cname}
  if [ -d "$gdir" ] && [ -n "$(ls -A "$gdir" 2>/dev/null)" ]; then
    run "curve_onset_${cname}" 600 sh script/evaluate_onset.sh --gen_dir "$gdir"
  else
    echo "=== [curve_onset_${cname}] SKIPPED: empty gen dir ==="
  fi
else
  echo "=== [B] SKIPPED: no queue-28 2.5k checkpoint on disk ==="
fi

echo "STAGES30 DONE $(date -u)"

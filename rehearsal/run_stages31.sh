# Rehearsal queue 31 (round 5, after queue 30): map the DeepCache headline
# asymptote.  The per-batch cost of the 150-step band composition fits
# s + d/K (s=1.77 s shallow, d=3.29 s deep; from the measured K=2/3/4 rows)
# so K=5 -> ~135 and K=6 -> ~141 clips/min/chip vs the 126.4 K=4 default.
# The K=4 gate IMPROVED proxy FAD in both seeds, so deeper caching may
# still gate clean.  Decision cells: dc5 + dc6, two seeds, against the
# queue-28 same-checkpoint anchors (band 23.61/25.68, dc4 20.96/22.48);
# gate = FAD within-or-better both seeds AND onset metrics
# identical-or-within-the-known-seed-noise in BOTH seeds (same rule as the
# K=3 and K=4 flips).  Then perf rows for dc5/dc6.
# Launch: nohup sh rehearsal/run_stages31.sh > /tmp/stages31.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1

# -- 0. wait for queue 30 (bounded) ------------------------------------------
i=0
until grep -q "STAGES30 DONE" /tmp/stages30.log 2>/dev/null; do
  i=$((i+1)); [ $i -gt 2160 ] && { echo "queue 30 never finished"; exit 1; }
  sleep 20
done
echo "=== queue 30 done, starting 31 $(date -u +%H:%M:%S) ==="

RUN1=$(sed -n 's/.*run dir: //p' rehearsal/stage1_retrain.log 2>/dev/null | head -1)
if [ -z "$RUN1" ] || [ -z "$(ls -A "$RUN1/ckpts" 2>/dev/null)" ]; then
  echo "no queue-28 2.5k checkpoint on disk — aborting"; exit 1
fi

run() {
  rname=$1; tmo=$2; shift 2
  echo "=== [$rname] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$rname.log" 2>&1
  echo "=== [$rname] exit=$? $(date -u +%H:%M:%S) ==="
}

cell() {
  cname=$1; ctmo=$2; shift 2
  run "curve_${cname}" "$ctmo" sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="$RUN1/ckpts" \
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

# -- 1. decision cells --------------------------------------------------------
cell ddim150_band_dc5       2700 "+experiment.deep_cache_interval=5"
cell ddim150_band_dc5_seed1 2700 "+experiment.deep_cache_interval=5" "+experiment.seed=1"
cell ddim150_band_dc6       2700 "+experiment.deep_cache_interval=6"
cell ddim150_band_dc6_seed1 2700 "+experiment.deep_cache_interval=6" "+experiment.seed=1"

# -- 2. perf rows -------------------------------------------------------------
run perf_dc56 3600 python script/perf_sweep.py \
  folded256_b8_band_dc5 folded256_b8_band_dc6

echo "STAGES31 DONE $(date -u)"

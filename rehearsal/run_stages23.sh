# Rehearsal queue 23 (round 4): DeepCache deep-feature reuse, on-chip.
#   A. perf_sweep rows for the new deep_cache_interval variants (bf16
#      serving path).  The lax.cond-in-scan structure only pays off if XLA
#      keeps a real conditional (cost_analysis can't tell — it sums both
#      branches); this measures it.
#   B. ONLY IF dc3 actually beats the no-cache row: quality cells on the
#      64-track protocol (f32 eval recipe, soak checkpoint) — the
#      reference-protocol point (ddim@100 scale 2.0) at dc2/dc3 and the
#      fast-serving point (dpm@32+s1.5+band) at dc2, each with onset
#      metrics.
#   C. bench.py warm-up so the driver's end-of-round bench stays warm.
# Launch: nohup sh rehearsal/run_stages23.sh [Q22_PID] > /tmp/stages23.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
Q22_PID=${1:-}

deadline=$(( $(date +%s) + 14400 ))
while ! grep -q "STAGES22 DONE" /tmp/stages22.log 2>/dev/null; do
  if [ -n "$Q22_PID" ] && ! kill -0 "$Q22_PID" 2>/dev/null; then
    echo "queue 22 (pid $Q22_PID) exited without DONE — proceeding anyway"
    break
  fi
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "queue 22 never finished within 4h — giving up"; exit 1
  fi
  sleep 60
done
echo "=== queue 23 starting $(date -u) ==="

run() {
  name=$1; tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- A. throughput ----------------------------------------------------------
run perf_deepcache 5400 python script/perf_sweep.py \
  folded256_b8_band_dc2 folded256_b8_band_dc3 \
  folded256_b8_dc3 folded256_b8_dc3_s3 \
  folded256_b8_dpm32_s15_band_dc2

# gate: does band+dc3 beat the no-cache band row (66.4 clips/min)?
DC3=$(sed -n 's/.*folded256_b8_band_dc3", "clips_per_min_per_chip": \([0-9.]*\).*/\1/p' \
      rehearsal/perf_deepcache.log | head -1)
echo "band_dc3 clips/min = ${DC3:-none}"
GO=$(python -c "print(1 if float('${DC3:-0}') > 70.0 else 0)" 2>/dev/null)

# -- B. quality cells (soak ckpt, 64-track protocol) ------------------------
RUN2=$(sed -n 's/.*run dir: //p' rehearsal/soak_part2.log | head -1)
if [ "$GO" = "1" ] && [ -n "$RUN2" ] && [ -n "$(ls -A "$RUN2/ckpts" 2>/dev/null)" ]; then
  run curve_ddim100_dc2 2700 sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
    experiment.num_steps=100 "+experiment.deep_cache_interval=2" \
    experiment_path=./output/experiments/gh-gen-ddim100-dc2
  run curve_onset_ddim100_dc2 600 sh script/evaluate_onset.sh \
    --gen_dir output/experiments/gh-gen-ddim100-dc2
  run curve_ddim100_dc3 2700 sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
    experiment.num_steps=100 "+experiment.deep_cache_interval=3" \
    experiment_path=./output/experiments/gh-gen-ddim100-dc3
  run curve_onset_ddim100_dc3 600 sh script/evaluate_onset.sh \
    --gen_dir output/experiments/gh-gen-ddim100-dc3
  run curve_dpm32_s15_band_dc2 1800 sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
    experiment.num_steps=32 "+experiment.sampler=dpm" \
    experiment.embedding_scale=1.5 "+experiment.guidance_interval=[0.2,0.8]" \
    "+experiment.deep_cache_interval=2" \
    experiment_path=./output/experiments/gh-gen-dpm32-s15-band-dc2
  run curve_onset_dpm32_s15_band_dc2 600 sh script/evaluate_onset.sh \
    --gen_dir output/experiments/gh-gen-dpm32-s15-band-dc2
else
  echo "deep-cache quality cells skipped (GO=$GO, RUN2=$RUN2)"
fi

# -- C. keep the driver bench warm ------------------------------------------
run bench_warm23 1200 python bench.py

echo "STAGES23 DONE $(date -u)"

# Rehearsal queue 21 (round 4, runs after queue 20 releases the chip).
# One open cell from the REHEARSAL §7 sampler study: the SYMMETRIC
# ddim@32 + scale 1.5 + band point, so the serving-stack comparison
# attributes the dpm32_s15_band result (FAD 65.2) to band+scale vs the
# sampler itself. Plus its perf row and a bench.py warm-up so the
# driver's end-of-round bench run hits a warm compile cache.
# Launch: nohup sh rehearsal/run_stages21.sh [Q20_PID] > /tmp/stages21.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
Q20_PID=${1:-}

deadline=$(( $(date +%s) + 28800 ))
while ! grep -q "STAGES20 DONE" /tmp/stages20.log 2>/dev/null; do
  if [ -n "$Q20_PID" ] && ! kill -0 "$Q20_PID" 2>/dev/null; then
    echo "queue 20 (pid $Q20_PID) exited without DONE — proceeding anyway"
    break
  fi
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "queue 20 never finished within 8h — giving up"; exit 1
  fi
  sleep 60
done
echo "=== queue 21 starting $(date -u) ==="

run() {
  name=$1; tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

# Augment test CLI on the completed 15-epoch run (queue 20's own test cell
# was skipped: a duplicate queue-20 instance left over from the previous
# session created a decoy newest run dir at ONSET_RUN-selection time; the
# duplicate was killed by PID and this re-runs the test cleanly).
ONSET_RUN=logs/onset-augment/2026-08-19-14-00-48/
if [ -n "$(ls -A "${ONSET_RUN}ckpts" 2>/dev/null)" ]; then
  run stage3c_augment_test 1800 sh script/test_onset_model.sh \
    "${ONSET_RUN}config.yaml" "${ONSET_RUN}ckpts"
else
  echo "augment run dir missing — skipping test"
fi

# the 20k-step soak checkpoint queue 19's curve used
RUN2=$(sed -n 's/.*run dir: //p' rehearsal/soak_part2.log | head -1)
if [ -z "$RUN2" ] || [ -z "$(ls -A "$RUN2/ckpts" 2>/dev/null)" ]; then
  echo "soak checkpoint missing — skipping the quality cell"
else
  run curve_ddim32_s15_band 1500 sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
    experiment.num_steps=32 \
    experiment.embedding_scale=1.5 "+experiment.guidance_interval=[0.2,0.8]" \
    experiment_path=./output/experiments/gh-gen-ddim32-s15-band
  run curve_onset_ddim32_s15_band 600 sh script/evaluate_onset.sh \
    --gen_dir output/experiments/gh-gen-ddim32-s15-band
fi

run perf_ddim_band 1200 python script/perf_sweep.py folded256_b8_ddim32_s15_band

# warm the persistent TPU compile cache for the driver's bench run
run bench_warm 1200 python bench.py

echo "STAGES21 DONE $(date -u)"

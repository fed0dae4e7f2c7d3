# Rehearsal queue 25 (round 4): final DeepCache default-flip evidence.
# Queue 24 measured the 150-step serving composition at seed 0:
# band 18.05 vs band+dc3 18.98 proxy FAD (identical onset metrics).  The
# +0.9 is headline-defining, so: seed-1 replication of BOTH cells (is the
# gap noise?) and the dc2 composition (the conservative default if not).
# Launch: nohup sh rehearsal/run_stages25.sh [Q24_PID] > /tmp/stages25.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
Q24_PID=${1:-}

deadline=$(( $(date +%s) + 14400 ))
while ! grep -q "STAGES24 DONE" /tmp/stages24.log 2>/dev/null; do
  if [ -n "$Q24_PID" ] && ! kill -0 "$Q24_PID" 2>/dev/null; then
    echo "queue 24 (pid $Q24_PID) exited without DONE — proceeding anyway"
    break
  fi
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "queue 24 never finished within 4h — giving up"; exit 1
  fi
  sleep 60
done
echo "=== queue 25 starting $(date -u) ==="

run() {
  name=$1; tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

RUN2=$(sed -n 's/.*run dir: //p' rehearsal/soak_part2.log | head -1)
if [ -z "$RUN2" ] || [ -z "$(ls -A "$RUN2/ckpts" 2>/dev/null)" ]; then
  echo "soak checkpoint missing — cannot run the quality cells"; exit 1
fi

for CELL in "band_seed1:+experiment.seed=1" "band_dc3_seed1:+experiment.seed=1 +experiment.deep_cache_interval=3" "band_dc2:+experiment.deep_cache_interval=2"; do
  NAME=${CELL%%:*}; EXTRA=${CELL#*:}
  run "curve_ddim150_${NAME}" 2700 sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
    experiment.num_steps=150 "+experiment.guidance_interval=[0.2,0.8]" \
    $EXTRA \
    experiment_path=./output/experiments/gh-gen-ddim150-${NAME}
  run "curve_onset_ddim150_${NAME}" 600 sh script/evaluate_onset.sh \
    --gen_dir output/experiments/gh-gen-ddim150-${NAME}
done

echo "STAGES25 DONE $(date -u)"

# Rehearsal queue 24 (round 4): DeepCache serving-default decision cells.
# Queue 23 measured: band+dc2 96.5 / band+dc3 114.4 8s-clips/min (vs 66.4
# no-cache band) and dc2/dc3 quality at the reference protocol NEUTRAL OR
# BETTER (FAD 33.9/32.4 vs 36.4 baseline; onset metrics identical).  Before
# flipping the bench serving default to band+dc3 this queue measures:
#   A. the EXACT serving composition at 150 steps on the soak ckpt —
#      band alone vs band+dc3 (the quality gate for the default flip);
#   B. seed-1 replication of the dc3 quality-neutrality claim;
#   C. K=4 quality probe + the two perf rows queue 23 lost to a transient
#      tunnel error (now survivable: perf_sweep continues past variant
#      failures), plus a dc4 perf row.
# Launch: nohup sh rehearsal/run_stages24.sh [Q23_PID] > /tmp/stages24.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
Q23_PID=${1:-}

deadline=$(( $(date +%s) + 14400 ))
while ! grep -q "STAGES23 DONE" /tmp/stages23.log 2>/dev/null; do
  if [ -n "$Q23_PID" ] && ! kill -0 "$Q23_PID" 2>/dev/null; then
    echo "queue 23 (pid $Q23_PID) exited without DONE — proceeding anyway"
    break
  fi
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "queue 23 never finished within 4h — giving up"; exit 1
  fi
  sleep 60
done
echo "=== queue 24 starting $(date -u) ==="

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

# -- A. serving composition at 150 steps: band alone vs band+dc3 ------------
run curve_ddim150_band 2700 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
  experiment.num_steps=150 "+experiment.guidance_interval=[0.2,0.8]" \
  experiment_path=./output/experiments/gh-gen-ddim150-band
run curve_onset_ddim150_band 600 sh script/evaluate_onset.sh \
  --gen_dir output/experiments/gh-gen-ddim150-band
run curve_ddim150_band_dc3 2700 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
  experiment.num_steps=150 "+experiment.guidance_interval=[0.2,0.8]" \
  "+experiment.deep_cache_interval=3" \
  experiment_path=./output/experiments/gh-gen-ddim150-band-dc3
run curve_onset_ddim150_band_dc3 600 sh script/evaluate_onset.sh \
  --gen_dir output/experiments/gh-gen-ddim150-band-dc3

# -- B. seed-1 replication of dc3 quality neutrality -------------------------
run curve_ddim100_dc3_seed1 2700 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
  experiment.num_steps=100 "+experiment.deep_cache_interval=3" \
  "+experiment.seed=1" \
  experiment_path=./output/experiments/gh-gen-ddim100-dc3-seed1
run curve_onset_ddim100_dc3_seed1 600 sh script/evaluate_onset.sh \
  --gen_dir output/experiments/gh-gen-ddim100-dc3-seed1
run curve_ddim100_seed1 2700 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
  experiment.num_steps=100 "+experiment.seed=1" \
  experiment_path=./output/experiments/gh-gen-ddim100-seed1
run curve_onset_ddim100_seed1 600 sh script/evaluate_onset.sh \
  --gen_dir output/experiments/gh-gen-ddim100-seed1

# -- C. K=4 probe + lost perf rows ------------------------------------------
run curve_ddim100_dc4 2700 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
  experiment.num_steps=100 "+experiment.deep_cache_interval=4" \
  experiment_path=./output/experiments/gh-gen-ddim100-dc4
run curve_onset_ddim100_dc4 600 sh script/evaluate_onset.sh \
  --gen_dir output/experiments/gh-gen-ddim100-dc4
run perf_deepcache2 5400 python script/perf_sweep.py \
  folded256_b8_dpm32_s15_band_dc2 folded256_b8_dc3_s3 folded256_b8_band_dc4

echo "STAGES24 DONE $(date -u)"

# Rehearsal queue 27 (round 4): quality-validate DeepCache K=4 at the exact
# serving composition, two seeds, against queue 26's same-checkpoint band
# cells (band 23.61/25.68, band+dc3 21.73/23.41).  Perf row already
# measured: band_dc4 = 126.35 clips/min/chip (rehearsal/perf_deepcache.log).
# Gate (same as the K=3 flip): FAD delta within the seed-to-seed band
# spread AND onset metrics identical-or-within-noise in BOTH seeds.
# Also measures the K=6 perf point to map the asymptote (NOT a flip
# candidate unless separately quality-validated).
# Launch: nohup sh rehearsal/run_stages27.sh > /tmp/stages27.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1

# Rediscover the queue-26 run dir from its retrain log (ADVICE r4: the
# hardcoded path is gitignored and wiped on machine reset); fall back to the
# path this queue originally ran against.
RUN1=$(sed -n 's/.*run dir: //p' rehearsal/stage1_retrain.log 2>/dev/null | head -1)
[ -n "$RUN1" ] || RUN1=logs/runs/2026-08-19-20-15-18
if [ -z "$(ls -A "$RUN1/ckpts" 2>/dev/null)" ]; then
  echo "checkpoint dir $RUN1/ckpts missing — aborting"; exit 1
fi

run() {
  rname=$1; tmo=$2; shift 2
  echo "=== [$rname] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$rname.log" 2>&1
  echo "=== [$rname] exit=$? $(date -u +%H:%M:%S) ==="
}

cell() {
  cname=$1; shift
  run "curve_ddim150_${cname}" 2700 sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="${RUN1}/ckpts" \
    experiment.num_steps=150 "+experiment.guidance_interval=[0.2,0.8]" \
    "$@" \
    experiment_path=./output/experiments/gh-gen-ddim150-${cname}
  run "curve_onset_ddim150_${cname}" 600 sh script/evaluate_onset.sh \
    --gen_dir output/experiments/gh-gen-ddim150-${cname}
}

cell band_dc4 "+experiment.deep_cache_interval=4"
cell band_dc4_seed1 "+experiment.deep_cache_interval=4" "+experiment.seed=1"

run perf_dc6 1200 python script/perf_sweep.py folded256_b8_band_dc6

echo "STAGES27 DONE $(date -u)"

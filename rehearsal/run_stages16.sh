# Rehearsal continuation #16 (2026-08-18): DPM-Solver++(2M) quality curve.
# Both samplers over the same checkpoint / protocol (64 test tracks,
# scale 2.0 always-on CFG — the reference eval protocol), sweeping step
# count; plus one "full serving stack" point (dpm + scale1.5 + band).
# Launch from repo root: nohup sh rehearsal/run_stages16.sh > /tmp/stages16.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1

RUN_DIR=$(ls -d logs/runs/*/ | tail -1)
echo "RUN_DIR=$RUN_DIR"

run() {
  name=$1; shift
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

for ns in 16 32 50 100; do
  for sampler in dpm ddim; do
    run "curve_${sampler}_${ns}" sh script/run_evaluate_gh_gen.sh \
      model.embedder_checkpoint=null model_path="${RUN_DIR}ckpts" \
      experiment.num_steps=$ns "+experiment.sampler=$sampler" \
      experiment_path=./output/experiments/gh-gen-${sampler}-${ns}
    run "curve_onset_${sampler}_${ns}" sh script/evaluate_onset.sh \
      --gen_dir output/experiments/gh-gen-${sampler}-${ns}
  done
done

# full serving stack: dpm + scale 1.5 + band [0.2, 0.8] at 32 steps
run curve_dpm32_s15_band sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="${RUN_DIR}ckpts" \
  experiment.num_steps=32 "+experiment.sampler=dpm" \
  experiment.embedding_scale=1.5 "+experiment.guidance_interval=[0.2,0.8]" \
  experiment_path=./output/experiments/gh-gen-dpm32-s15-band
run curve_onset_dpm32_s15_band sh script/evaluate_onset.sh \
  --gen_dir output/experiments/gh-gen-dpm32-s15-band

echo "STAGES16 DONE $(date -u)"

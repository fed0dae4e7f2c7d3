# Rehearsal queue 22 (round 4).  Seed-2 replication of the two SYMMETRIC
# serving-stack cells (REHEARSAL §7): the new "DPM++ wins under the banded
# scale-1.5 stack" claim currently rests on one generation seed per
# sampler; re-drawing the noise (+experiment.seed=1) checks the ordering
# is not a seed artifact.  Chip is free (queue 21 DONE 16:27).
# Launch: nohup sh rehearsal/run_stages22.sh > /tmp/stages22.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
echo "=== queue 22 starting $(date -u) ==="

run() {
  name=$1; tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

RUN2=$(sed -n 's/.*run dir: //p' rehearsal/soak_part2.log | head -1)
if [ -z "$RUN2" ] || [ -z "$(ls -A "$RUN2/ckpts" 2>/dev/null)" ]; then
  echo "soak checkpoint missing — cannot run the seed-2 cells"; exit 1
fi

for S in ddim dpm; do
  run "curve_${S}32_s15_band_seed1" 1500 sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
    experiment.num_steps=32 "+experiment.sampler=$S" "+experiment.seed=1" \
    experiment.embedding_scale=1.5 "+experiment.guidance_interval=[0.2,0.8]" \
    experiment_path=./output/experiments/gh-gen-${S}32-s15-band-seed1
  run "curve_onset_${S}32_s15_band_seed1" 600 sh script/evaluate_onset.sh \
    --gen_dir output/experiments/gh-gen-${S}32-s15-band-seed1
done

echo "STAGES22 DONE $(date -u)"

# Rehearsal queue 19 (round 4).  Closes VERDICT r3 items #2 and #4 in one
# serialized chip queue:
#   A. SOAK — 20k-step diffusion train (val + async ckpt + sample logging
#      every 1000 steps), one FORCED kill at ~step 8k + `+ckpt=` resume to
#      20k.  Per-step timing lands in metrics.jsonl (sec_per_step every 10
#      steps → p50/p99 per 1k-window via script/soak_report.py).
#   B. DPM-Solver++(2M) vs DDIM FAD-vs-steps curve {100,32,16,8} over the
#      soak checkpoint + the full-serving point (dpm@32 + scale1.5 + band).
#   C. perf_sweep DPM serving-throughput rows.
# ADVICE r3 fixes applied: script/*.sh wrappers now `exec python`, so every
# `timeout` here signals the real python process (no orphaned chip clients);
# checkpoint existence is checked before dependent cells; no unbounded waits.
# Launch: nohup sh rehearsal/run_stages19.sh > /tmp/stages19.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1

run() {
  name=$1; tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- 0. data (idempotent; shards usually survive within a session) -----------
sh rehearsal/make_data.sh > rehearsal/make_data.log 2>&1 || {
  echo "DATA GENERATION FAILED — aborting queue"; exit 1; }
mkdir -p data/greatest-hits
[ -e data/greatest-hits/mic-mp4-processed ] || \
  ln -s ../rehearsal/processed data/greatest-hits/mic-mp4-processed
echo "=== data ready $(date -u +%H:%M:%S) ==="

SOAK_ARGS="model.embedder_checkpoint=null max_steps=20000 log_every_n_steps=1000"

# -- A1. soak part 1: train until forced kill at ~step 8k --------------------
echo "=== [soak_part1] start $(date -u +%H:%M:%S) ==="
sh script/train_diffusion_model_gh.sh $SOAK_ARGS \
  > rehearsal/soak_part1.log 2>&1 &   # wrapper execs python → $! IS python
SOAK_PID=$!
deadline=$(( $(date +%s) + 14400 ))
step=0
while kill -0 "$SOAK_PID" 2>/dev/null; do
  RUN1=$(sed -n 's/.*run dir: //p' rehearsal/soak_part1.log | head -1)
  if [ -n "$RUN1" ] && [ -e "$RUN1/metrics.jsonl" ]; then
    step=$(tail -c 2000 "$RUN1/metrics.jsonl" | sed -n 's/.*"step": \([0-9]*\).*/\1/p' | tail -1)
  fi
  [ "${step:-0}" -ge 8050 ] && break
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "=== soak part1 deadline hit at step ${step:-0} ==="; break
  fi
  sleep 30
done
if kill -0 "$SOAK_PID" 2>/dev/null; then
  echo "=== FORCED KILL at step ${step:-?} $(date -u +%H:%M:%S) ==="
  kill "$SOAK_PID"
fi
wait "$SOAK_PID" 2>/dev/null
echo "=== [soak_part1] ended, step=${step:-?} $(date -u +%H:%M:%S) ==="
RUN1=$(sed -n 's/.*run dir: //p' rehearsal/soak_part1.log | head -1)
if [ -z "$RUN1" ] || [ -z "$(ls -A "$RUN1/ckpts" 2>/dev/null)" ]; then
  echo "SOAK part1 left no checkpoint in '${RUN1}/ckpts' — aborting queue"
  exit 1
fi

# -- A2. soak part 2: resume from the kill point, run to 20k -----------------
run soak_part2 14400 sh script/train_diffusion_model_gh.sh $SOAK_ARGS \
  "+ckpt=$RUN1/ckpts"
RUN2=$(sed -n 's/.*run dir: //p' rehearsal/soak_part2.log | head -1)
if [ -z "$RUN2" ] || [ -z "$(ls -A "$RUN2/ckpts" 2>/dev/null)" ]; then
  echo "SOAK part2 left no checkpoint in '${RUN2}/ckpts' — aborting queue"
  exit 1
fi
python script/soak_report.py "$RUN1" "$RUN2" > rehearsal/soak_report.log 2>&1
echo "SOAK DONE run1=$RUN1 run2=$RUN2"

# -- B. GT prep + quality curve ----------------------------------------------
run stage2_gt 900 sh script/run_prepare_gh_gt.sh

cell() {
  sampler=$1; ns=$2; shift 2
  run "curve_${sampler}_${ns}" 1500 sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
    experiment.num_steps=$ns "+experiment.sampler=$sampler" "$@" \
    experiment_path=./output/experiments/gh-gen-${sampler}-${ns}
  run "curve_onset_${sampler}_${ns}" 600 sh script/evaluate_onset.sh \
    --gen_dir output/experiments/gh-gen-${sampler}-${ns}
}

# highest-value cells first (32-step serving regime), then tails
cell dpm 32
cell ddim 32
cell dpm 16
cell ddim 16

# full serving stack: dpm @32 + scale 1.5 + guidance band [0.2, 0.8]
run curve_dpm32_s15_band 1500 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="${RUN2}/ckpts" \
  experiment.num_steps=32 "+experiment.sampler=dpm" \
  experiment.embedding_scale=1.5 "+experiment.guidance_interval=[0.2,0.8]" \
  experiment_path=./output/experiments/gh-gen-dpm32-s15-band
run curve_onset_dpm32_s15_band 600 sh script/evaluate_onset.sh \
  --gen_dir output/experiments/gh-gen-dpm32-s15-band

cell dpm 8
cell ddim 8
cell ddim 100
cell dpm 100

# -- C. DPM serving-throughput rows (real chip, full-size flagship) ----------
run perf_dpm 1800 python script/perf_sweep.py \
  folded256_b8_ddim32 folded256_b8_dpm32 folded256_b8_dpm32_s15_band

echo "STAGES19 DONE $(date -u)"

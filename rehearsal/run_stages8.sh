# Rehearsal continuation #8 (2026-08-18).  Why: round wall-clock risk —
# stages7 put the 3.5 h GPT resume before the stats-kernel perf retest and
# the bench decision; if the round ends mid-GPT those never run.  Reorder:
# wait for the in-flight guided distill (PID arg 1), bank every short job
# (distilled-student eval, teacher 16/32 FAD curve points, perf_stats2 on
# the FIXED kernel, bench), THEN the long stage-4 completion.
# Launch from repo root:  sh rehearsal/run_stages8.sh <distill_pid>

cd "$(dirname "$0")/.." || exit 1
DISTILL_PID=${1:?usage: run_stages8.sh <distill_pid>}
STAGE1_CKPTS=${STAGE1_CKPTS:-logs/runs/2026-08-17-14-14-51/ckpts}
DISTILLED_CFG=${DISTILLED_CFG:-logs/runs/2026-08-17-14-14-51/distilled_8step_cfg}
VQ_RUN=${VQ_RUN:-logs/specvqgan/2026-08-17-20-36-21/}
GPT_PREV=${GPT_PREV:-logs/transformer/2026-08-17-22-22-37/}

run() {
  name=$1; shift
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- 0. wait for the in-flight guided distill to release the TPU tunnel ----
while kill -0 "$DISTILL_PID" 2>/dev/null; do sleep 20; done
echo "=== distill (pid $DISTILL_PID) done $(date -u +%H:%M:%S) ==="

# -- 1. eval the CFG-baked student single-forward at 8 steps ----------------
run stage5_eval_studentcfg8 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="$DISTILLED_CFG" \
  experiment.num_steps=8 experiment.embedding_scale=1.0 \
  experiment_path=./output/experiments/gh-gen-studentcfg8

# -- 2. teacher FAD-vs-steps curve: 16 and 32 (8 and 100 already measured) --
run stage5_eval_teacher16 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="$STAGE1_CKPTS" \
  experiment.num_steps=16 experiment_path=./output/experiments/gh-gen-teacher16

run stage5_eval_teacher32 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="$STAGE1_CKPTS" \
  experiment.num_steps=32 experiment_path=./output/experiments/gh-gen-teacher32

# -- 3. retest the FIXED stats kernel on the chip (Mosaic fix e57e37f) ------
run perf_stats2 python script/perf_sweep.py folded256_b4 folded256_b4_stats

# -- 4. headline bench with current defaults --------------------------------
run bench_post python bench.py

echo "STAGES8 SHORT JOBS DONE $(date -u)"

# -- 5. stage 4 completion: GPT resume (3 epochs), generate, baseline eval --
run stage4_transformer_resume sh script/train_transformer.sh "${VQ_RUN}ckpts" \
  -c cfg/condfoleygen/greatesthit_transformer_rehearsal.yaml \
  -c rehearsal/transformer_resume.yaml \
  --ckpt_path "${GPT_PREV}ckpts"

GPT_RUN=$(ls -d logs/transformer/*/ | tail -1)
run stage4_generate sh script/generate_audio_gh.sh \
  "${GPT_RUN}ckpts" "${VQ_RUN}ckpts" --data_to_use 0.13 --batch_size 4

run stage4_eval_baseline sh script/evaluate_onset_baseline.sh \
  --gt_root data/rehearsal/processed

echo "STAGES8 DONE $(date -u)"

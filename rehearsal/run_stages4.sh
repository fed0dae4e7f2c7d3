# Rehearsal final queue: stage 3 (onset, restarted with uint8 wire + decode
# cache), stage 4 (baseline stack, after the Griffin-Lim fix), and the
# stage-5 FAD-vs-steps evals for the distilled student.

cd "$(dirname "$0")/.." || exit 1
STAGE1_CKPTS=${STAGE1_CKPTS:-logs/runs/2026-08-17-14-14-51/ckpts}
DISTILLED=${DISTILLED:-logs/runs/2026-08-17-14-14-51/distilled_8step}

run() {
  name=$1; shift
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- stage 3: onset model f32 vs bf16 (+ test CLI) --------------------------
run stage3_onset_f32 sh script/train_onset_model_gh.sh \
  -c cfg/trainer/trainer-onset-rehearsal.yaml

ONSET_F32_RUN=$(ls -d logs/onset/*/ | tail -1)

run stage3_onset_bf16 sh script/train_onset_model_gh.sh \
  -c cfg/trainer/trainer-onset-rehearsal.yaml \
  -c cfg/model/model-onset-bf16.yaml

run stage3_onset_test sh script/test_onset_model.sh \
  "${ONSET_F32_RUN}config.yaml" "${ONSET_F32_RUN}ckpts"

# -- stage 4: baseline codebook + transformer + generation ------------------
run stage4_codebook sh script/train_codebook.sh \
  -c cfg/condfoleygen/greatesthit_codebook_rehearsal.yaml

VQ_RUN=$(ls -d logs/specvqgan/*/ 2>/dev/null | tail -1)
run stage4_transformer sh script/train_transformer.sh "${VQ_RUN}ckpts" \
  -c cfg/condfoleygen/greatesthit_transformer_rehearsal.yaml

GPT_RUN=$(ls -d logs/transformer/*/ 2>/dev/null | tail -1)
run stage4_generate sh script/generate_audio_gh.sh \
  "${GPT_RUN}ckpts" "${VQ_RUN}ckpts" --data_to_use 0.13 --batch_size 4

run stage4_eval_baseline sh script/evaluate_onset_baseline.sh

# -- stage 5 evals: FAD vs sampler steps (teacher vs distilled student) -----
run stage5_eval_teacher8 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="$STAGE1_CKPTS" \
  experiment.num_steps=8 experiment_path=./output/experiments/gh-gen-teacher8

run stage5_eval_student8 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="$DISTILLED" \
  experiment.num_steps=8 experiment_path=./output/experiments/gh-gen-student8

echo "ALL STAGES DONE $(date -u)"

# Rehearsal continuation #2: stage 4 (third attempt — after the real-math
# Griffin-Lim fix, media try/except, and wrapper flag-parsing fix) and the
# stage-3 onset rerun.  Launch AFTER stage5_distill exits.

cd "$(dirname "$0")/.." || exit 1

run() {
  name=$1; shift
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

run stage4_codebook sh script/train_codebook.sh \
  -c cfg/condfoleygen/greatesthit_codebook_rehearsal.yaml

VQ_RUN=$(ls -d logs/specvqgan/*/ 2>/dev/null | tail -1)
run stage4_transformer sh script/train_transformer.sh "${VQ_RUN}ckpts" \
  -c cfg/condfoleygen/greatesthit_transformer_rehearsal.yaml

GPT_RUN=$(ls -d logs/transformer/*/ 2>/dev/null | tail -1)
run stage4_generate sh script/generate_audio_gh.sh \
  "${GPT_RUN}ckpts" "${VQ_RUN}ckpts" --data_to_use 0.13 --batch_size 4

run stage4_eval_baseline sh script/evaluate_onset_baseline.sh

echo "ALL STAGES DONE $(date -u)"

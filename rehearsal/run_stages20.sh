# Rehearsal queue 20 (round 4, runs after queue 19 releases the chip).
#   A. Augment onset recipe at full length — 15 epochs through the literal
#      wrapper, now with the ON-DEVICE ColorJitter (VERDICT r3 #3: the host
#      jitter ran ~5 s/step and stage 3b had to stop at epoch 5) — then the
#      test CLI.  Done-criterion: completes 15 epochs, step time within ~2×
#      of the 164 ms non-augment step.
#   B. Stage-4 tail re-run to produce the FULL baseline artifact set
#      (VERDICT r3 #1): short codebook + transformer retrain (artifacts were
#      reset-wiped; quality numbers were already recorded in round 3), then
#      generate_audio_gh.sh (now writes gen/orig/cond wavs + three muxed
#      mp4s + spectrogram jpgs) and evaluate_onset_baseline.sh scoring the
#      mp4s directly.
# Launch: nohup sh rehearsal/run_stages20.sh [Q19_PID] > /tmp/stages20.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1
Q19_PID=${1:-}

# bounded wait for queue 19 (ADVICE r3: no unbounded waits — deadline +
# break if the queue process itself is gone)
deadline=$(( $(date +%s) + 28800 ))
while ! grep -q "STAGES19 DONE" /tmp/stages19.log 2>/dev/null; do
  if [ -n "$Q19_PID" ] && ! kill -0 "$Q19_PID" 2>/dev/null; then
    echo "queue 19 (pid $Q19_PID) exited without DONE — proceeding anyway"
    break
  fi
  if [ "$(date +%s)" -gt "$deadline" ]; then
    echo "queue 19 never finished within 8h — giving up"; exit 1
  fi
  sleep 60
done
echo "=== queue 20 starting $(date -u) ==="

run() {
  name=$1; tmo=$2; shift 2
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- A. augment onset recipe, full 15 epochs + test -------------------------
run stage3c_augment_train 7200 sh script/train_onset_model_gh_augment.sh \
  -c cfg/trainer/trainer-onset-rehearsal.yaml
ONSET_RUN=$(ls -dt logs/onset-augment/*/ 2>/dev/null | head -1)
if [ -n "$ONSET_RUN" ] && [ -n "$(ls -A "${ONSET_RUN}ckpts" 2>/dev/null)" ]; then
  run stage3c_augment_test 1800 sh script/test_onset_model.sh \
    "${ONSET_RUN}config.yaml" "${ONSET_RUN}ckpts"
else
  echo "augment train left no checkpoint — skipping test"
fi

# -- B. baseline stage-4 tail: short retrain → full artifact generation -----
run stage4b_codebook 3600 sh script/train_codebook.sh \
  -c cfg/condfoleygen/greatesthit_codebook_rehearsal.yaml \
  -c rehearsal/codebook4.yaml
VQ_RUN=$(ls -dt logs/specvqgan/*/ 2>/dev/null | head -1)
if [ -z "$VQ_RUN" ] || [ -z "$(ls -A "${VQ_RUN}ckpts" 2>/dev/null)" ]; then
  echo "codebook retrain left no checkpoint — aborting stage 4 tail"; exit 1
fi
run stage4b_transformer 3600 sh script/train_transformer.sh "${VQ_RUN}ckpts" \
  -c cfg/condfoleygen/greatesthit_transformer_rehearsal.yaml \
  -c rehearsal/transformer_epoch0.yaml
GPT_RUN=$(ls -dt logs/transformer/*/ 2>/dev/null | head -1)
if [ -z "$GPT_RUN" ] || [ -z "$(ls -A "${GPT_RUN}ckpts" 2>/dev/null)" ]; then
  echo "transformer retrain left no checkpoint — aborting stage 4 tail"; exit 1
fi
run stage4b_generate 3600 sh script/generate_audio_gh.sh \
  "${GPT_RUN}ckpts" "${VQ_RUN}ckpts" --batch_size 4
run stage4b_eval_baseline 1800 sh script/evaluate_onset_baseline.sh --multi_delta --delta 0.15
# artifact inventory for the rehearsal doc
find output/condfoleygen -type f | sed 's|.*/output/|output/|' | \
  awk -F/ '{print $2"/"$3}' | sort | uniq -c > rehearsal/stage4b_artifacts.txt 2>/dev/null

echo "STAGES20 DONE $(date -u)"

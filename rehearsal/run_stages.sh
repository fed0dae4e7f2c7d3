# Rehearsal stages 2-5 (docs/REHEARSAL.md), serialized on the single chip.
# Launch AFTER the stage-1 trainer exits:  sh rehearsal/run_stages.sh
# Each stage logs to rehearsal/<stage>.log and failures don't cascade.

cd "$(dirname "$0")/.." || exit 1
STAGE1_CKPTS=${STAGE1_CKPTS:-logs/runs/2026-08-17-14-14-51/ckpts}

run() { # run <name> <cmd...>
  name=$1; shift
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- tunnel characterization (cheap, informs perf docs) ---------------------
run tunnel_bench python script/tunnel_bench.py

# -- stage 2: GT prep + generation eval + FAD + onset metrics ---------------
run stage2_gt sh script/run_prepare_gh_gt.sh

run stage2_gen sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null \
  model_path="$STAGE1_CKPTS" \
  experiment.num_steps=100

run stage2_onset sh script/evaluate_onset.sh

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

# -- stage 5: distillation at scale from the stage-1 checkpoint -------------
run stage5_distill python script/distill_diffusion.py \
  exp=train_diffusion_gh model.embedder_checkpoint=null \
  datamodule.batch_size=2 \
  "datamodule.train_dataset.path=data/greatest-hits/webdataset/train_shard_{1..3}.tar" \
  "datamodule.val_dataset.path=data/greatest-hits/webdataset/val_shard_1.tar" \
  +ckpt="$STAGE1_CKPTS" \
  +distill.steps_per_round=300

echo "ALL STAGES DONE $(date -u)"

# Rehearsal continuation #15 (2026-08-18).  The machine reset between
# sessions wiped every untracked artifact (checkpoints, shards, synthetic
# dataset, rehearsal logs), so this queue regenerates what the two open
# items need and finishes them:
#   A. stage 4 tail: codebook retrain -> GPT train (1 epoch) -> --ckpt_path
#      resume (3 epochs) -> generate_audio_gh.sh -> evaluate_onset_baseline.sh
#   B. the lost (scale 1.5 + band [0.2,0.8]) combo eval: stage-1 diffusion
#      retrain (2500 steps) -> GT prep -> combo generation eval.
# Launch from repo root AFTER /tmp/make_data.sh has been started:
#   nohup sh rehearsal/run_stages15.sh > /tmp/stages15.log 2>&1 &

cd "$(dirname "$0")/.." || exit 1

run() {
  name=$1; shift
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- 0. wait for the synthetic dataset + shards -----------------------------
while ! grep -q DATA_DONE /tmp/make_data.log 2>/dev/null; do sleep 15; done
mkdir -p data/greatest-hits
[ -e data/greatest-hits/mic-mp4-processed ] || \
  ln -s ../rehearsal/processed data/greatest-hits/mic-mp4-processed
echo "=== data ready $(date -u +%H:%M:%S) ==="

# -- A1. SpecVQGAN codebook (12 epochs, disc phase exercised) ----------------
run stage4_codebook sh script/train_codebook.sh \
  -c cfg/condfoleygen/greatesthit_codebook_rehearsal.yaml

VQ_RUN=$(ls -d logs/specvqgan/*/ | tail -1)
echo "VQ_RUN=$VQ_RUN"

# -- A2. GPT stage 2: 1 epoch, then a real --ckpt_path resume for 3 more ----
run stage4_transformer_e0 sh script/train_transformer.sh "${VQ_RUN}ckpts" \
  -c cfg/condfoleygen/greatesthit_transformer_rehearsal.yaml \
  -c rehearsal/transformer_epoch0.yaml

GPT_PREV=$(ls -d logs/transformer/*/ | tail -1)
run stage4_transformer_resume sh script/train_transformer.sh "${VQ_RUN}ckpts" \
  -c cfg/condfoleygen/greatesthit_transformer_rehearsal.yaml \
  -c rehearsal/transformer_resume.yaml \
  --ckpt_path "${GPT_PREV}ckpts"

GPT_RUN=$(ls -d logs/transformer/*/ | tail -1)
echo "GPT_RUN=$GPT_RUN"

# -- A3. baseline generation (sliding-window sampler) + onset eval -----------
run stage4_generate sh script/generate_audio_gh.sh \
  "${GPT_RUN}ckpts" "${VQ_RUN}ckpts" --data_to_use 0.13 --batch_size 4

run stage4_eval_baseline sh script/evaluate_onset_baseline.sh \
  --gt_root data/rehearsal/processed

echo "STAGE4 DONE $(date -u)"

# -- B1. stage-1 diffusion retrain (reference recipe, 2500 steps) ------------
run stage1_retrain sh script/train_diffusion_model_gh.sh \
  model.embedder_checkpoint=null \
  max_steps=2500 log_every_n_steps=500

RUN_DIR=$(ls -d logs/runs/*/ | tail -1)
echo "STAGE1_RUN=$RUN_DIR"

# -- B2. GT prep + the lost combo eval (scale 1.5 + band) --------------------
run stage2_gt sh script/run_prepare_gh_gt.sh

run ctrl_gi_s15 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="${RUN_DIR}ckpts" \
  experiment.num_steps=100 experiment.embedding_scale=1.5 \
  "+experiment.guidance_interval=[0.2,0.8]" \
  experiment_path=./output/experiments/gh-gen-gi-s15

run ctrl_onset_s15 sh script/evaluate_onset.sh \
  --gen_dir output/experiments/gh-gen-gi-s15

echo "STAGES15 DONE $(date -u)"

# Rehearsal continuation #9 (2026-08-18).  Adds the two reference eval
# variants the rehearsal never exercised at scale — pred_augment (augmented
# onset model chain) and text conditioning — plus a longer guided-distill
# attempt (300 steps/round gave studentcfg8 FAD 454.9 vs plain student 328.7
# under real CFG; test whether 1000 steps/round closes the gap), ordered
# short-jobs-first; the 3.5 h GPT resume stays last.
# Launch from repo root:  sh rehearsal/run_stages9.sh <teacher16_pid>

cd "$(dirname "$0")/.." || exit 1
WAIT_PID=${1:?usage: run_stages9.sh <running_eval_pid>}
STAGE1_CKPTS=${STAGE1_CKPTS:-logs/runs/2026-08-17-14-14-51/ckpts}
DISTILLED_CFG2=${DISTILLED_CFG2:-logs/runs/2026-08-17-14-14-51/distilled_8step_cfg2}
VQ_RUN=${VQ_RUN:-logs/specvqgan/2026-08-17-20-36-21/}
GPT_PREV=${GPT_PREV:-logs/transformer/2026-08-17-22-22-37/}

run() {
  name=$1; shift
  echo "=== [$name] start $(date -u +%H:%M:%S) ==="
  "$@" > "rehearsal/$name.log" 2>&1
  echo "=== [$name] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- 0. wait for the in-flight teacher16 eval to release the TPU tunnel -----
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "=== waited pid $WAIT_PID done $(date -u +%H:%M:%S) ==="

# -- 1. teacher FAD-vs-steps curve: 32 (8/16/100 measured elsewhere) --------
run stage5_eval_teacher32 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="$STAGE1_CKPTS" \
  experiment.num_steps=32 experiment_path=./output/experiments/gh-gen-teacher32

# -- 2. retest the FIXED stats kernel on the chip (Mosaic fix e57e37f) ------
run perf_stats2 python script/perf_sweep.py folded256_b4 folded256_b4_stats

# -- 3. headline bench with current defaults --------------------------------
run bench_post python bench.py

# -- 4. augmented onset model chain (reference Table-3 'augment' column):
#       train w/ ColorJitter/RandomCrop recipe -> test CLI pred CSVs ->
#       test_onset_augment_preds.tar -> pred_augment diffusion eval ---------
run stage3b_onset_augment sh script/train_onset_model_gh_augment.sh \
  -c cfg/trainer/trainer-onset-rehearsal.yaml

AUG_RUN=$(ls -d logs/onset/*/ | tail -1)
run stage3b_onset_augment_test sh script/test_onset_model.sh \
  "${AUG_RUN}config.yaml" "${AUG_RUN}ckpts"

AUG_TEST_RUN=$(ls -d logs/onset/*/ | tail -1)
run stage3b_augment_pred_shards python script/gh_make_shards.py \
  --root data/rehearsal/processed \
  --split data/rehearsal/processed/test.txt \
  --output "data/greatest-hits/webdataset/test_onset_augment_preds_%d.tar" \
  --pred_csv_dir "${AUG_TEST_RUN}media/annotations/pred"
mv -f data/greatest-hits/webdataset/test_onset_augment_preds_1.tar \
      data/greatest-hits/webdataset/test_onset_augment_preds.tar

run stage3b_gen_pred_augment sh script/run_evaluate_gh_gen_pred_augment.sh \
  model.embedder_checkpoint=null \
  model_path="$STAGE1_CKPTS" \
  experiment.num_steps=100

run stage3b_onset_pred_augment sh script/evaluate_onset_pred_augment.sh

# -- 5. text-conditioning variant (reference Table-2 text column) -----------
run stage2b_gen_text sh script/run_evaluate_gh_gen_text.sh \
  model.embedder_checkpoint=null \
  model_path="$STAGE1_CKPTS" \
  experiment.num_steps=100

echo "STAGES9 SHORT JOBS DONE $(date -u)"

# -- 6. guided distill, 1000 steps/round ------------------------------------
run stage5_distill_cfg2 python script/distill_diffusion.py \
  exp=train_diffusion_gh model.embedder_checkpoint=null \
  datamodule.batch_size=2 \
  "datamodule.train_dataset.path=data/greatest-hits/webdataset/train_shard_{1..3}.tar" \
  "datamodule.val_dataset.path=data/greatest-hits/webdataset/val_shard_1.tar" \
  +ckpt="$STAGE1_CKPTS" \
  +distill.steps_per_round=1000 \
  +distill.cfg_scale=2.0 \
  +out="$DISTILLED_CFG2"

run stage5_eval_studentcfg2_8 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="$DISTILLED_CFG2" \
  experiment.num_steps=8 experiment.embedding_scale=1.0 \
  experiment_path=./output/experiments/gh-gen-studentcfg2-8

# -- 7. stage 4 completion: GPT resume (3 epochs), generate, baseline eval --
run stage4_transformer_resume sh script/train_transformer.sh "${VQ_RUN}ckpts" \
  -c cfg/condfoleygen/greatesthit_transformer_rehearsal.yaml \
  -c rehearsal/transformer_resume.yaml \
  --ckpt_path "${GPT_PREV}ckpts"

GPT_RUN=$(ls -d logs/transformer/*/ | tail -1)
run stage4_generate sh script/generate_audio_gh.sh \
  "${GPT_RUN}ckpts" "${VQ_RUN}ckpts" --data_to_use 0.13 --batch_size 4

run stage4_eval_baseline sh script/evaluate_onset_baseline.sh \
  --gt_root data/rehearsal/processed

echo "STAGES9 DONE $(date -u)"

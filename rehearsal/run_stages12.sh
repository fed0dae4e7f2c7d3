# Rehearsal continuation #12 (2026-08-18).  perf_gi showed the guidance-
# interval bands SLOWER at b4 (52-54 vs 56.9 clips/min) — the cond-only
# half-batch step appears not to cost half.  Diagnose (pure cond-only b4
# timing = step-cost floor test; interval at b6/b8 where the CFG forward is
# b12/b16) after banking the gi quality evals, then the augment chain,
# text variant, longer guided distill, GPT resume last.
# Launch from repo root:  sh rehearsal/run_stages12.sh <gi0107_eval_pid>

cd "$(dirname "$0")/.." || exit 1
WAIT_PID=${1:?usage: run_stages12.sh <running_eval_pid>}
AUG_RUN=${AUG_RUN:-$(ls -d logs/onset-augment/*/ | tail -1)}
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

while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "=== waited pid $WAIT_PID done $(date -u +%H:%M:%S) ==="

# -- 1. second guidance-interval quality eval -------------------------------
run stage2c_gen_gi0208 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="$STAGE1_CKPTS" \
  experiment.num_steps=100 "+experiment.guidance_interval=[0.2,0.8]" \
  experiment_path=./output/experiments/gh-gen-gi0208

# -- 2. guidance-interval perf diagnostics ----------------------------------
run perf_gi2 python script/perf_sweep.py \
  folded256_b4_s1 folded256_b8_gi0107 folded256_b6_gi0107

# -- 3. augment chain completion: test CLI -> pred shards -> eval -----------
run stage3b_onset_augment_test sh script/test_onset_model.sh \
  "${AUG_RUN}config.yaml" "${AUG_RUN}ckpts"

AUG_TEST_RUN=$(ls -d logs/onset-augment/*/ | tail -1)
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

# -- 4. text-conditioning variant (reference Table-2 text column) -----------
run stage2b_gen_text sh script/run_evaluate_gh_gen_text.sh \
  model.embedder_checkpoint=null \
  model_path="$STAGE1_CKPTS" \
  experiment.num_steps=100

echo "STAGES12 SHORT JOBS DONE $(date -u)"

# -- 5. guided distill, 1000 steps/round ------------------------------------
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

# -- 6. stage 4 completion: GPT resume (3 epochs), generate, baseline eval --
run stage4_transformer_resume sh script/train_transformer.sh "${VQ_RUN}ckpts" \
  -c cfg/condfoleygen/greatesthit_transformer_rehearsal.yaml \
  -c rehearsal/transformer_resume.yaml \
  --ckpt_path "${GPT_PREV}ckpts"

GPT_RUN=$(ls -d logs/transformer/*/ | tail -1)
run stage4_generate sh script/generate_audio_gh.sh \
  "${GPT_RUN}ckpts" "${VQ_RUN}ckpts" --data_to_use 0.13 --batch_size 4

run stage4_eval_baseline sh script/evaluate_onset_baseline.sh \
  --gt_root data/rehearsal/processed

echo "STAGES12 DONE $(date -u)"

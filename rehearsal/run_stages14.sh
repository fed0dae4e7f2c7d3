# Rehearsal continuation #14 (2026-08-18).  Adds the (scale 1.5 + band)
# combo eval — scale-1.5 full-trajectory matched the band's FAD, so the
# combo may be the quality optimum at band speed — then the long tail:
# guided distill @1000 steps/round, its eval, GPT resume + stage-4
# generate + baseline eval.
# Launch from repo root:  sh rehearsal/run_stages14.sh <bench_pid>

cd "$(dirname "$0")/.." || exit 1
WAIT_PID=${1:?usage: run_stages14.sh <running_job_pid>}
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

# -- 1. batch curve completion at the new operating point -------------------
run perf_gi3 python script/perf_sweep.py folded256_b16_gi0107

# -- 2. quality: scale 1.5 + band combo -------------------------------------
run ctrl_gi_s15 sh script/run_evaluate_gh_gen.sh \
  model.embedder_checkpoint=null model_path="$STAGE1_CKPTS" \
  experiment.num_steps=100 experiment.embedding_scale=1.5 \
  "+experiment.guidance_interval=[0.2,0.8]" \
  experiment_path=./output/experiments/gh-gen-gi-s15

echo "STAGES14 SHORT JOBS DONE $(date -u)"

# -- 3. guided distill, 1000 steps/round ------------------------------------
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

# -- 4. stage 4 completion: GPT resume (3 epochs), generate, baseline eval --
run stage4_transformer_resume sh script/train_transformer.sh "${VQ_RUN}ckpts" \
  -c cfg/condfoleygen/greatesthit_transformer_rehearsal.yaml \
  -c rehearsal/transformer_resume.yaml \
  --ckpt_path "${GPT_PREV}ckpts"

GPT_RUN=$(ls -d logs/transformer/*/ | tail -1)
run stage4_generate sh script/generate_audio_gh.sh \
  "${GPT_RUN}ckpts" "${VQ_RUN}ckpts" --data_to_use 0.13 --batch_size 4

run stage4_eval_baseline sh script/evaluate_onset_baseline.sh \
  --gt_root data/rehearsal/processed

echo "STAGES14 DONE $(date -u)"

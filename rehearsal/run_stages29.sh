# Rehearsal queue 29 (round 5, after queue 28): the two remaining VERDICT-r4
# chip items.
#   A. 4:2:0 onset frame wire (VERDICT r4 #6): full 15-epoch augment recipe
#      with data.wire=yuv420 — measure steady-state s/step against the §9
#      RGB-wire number (0.95 s/step, 18 MB/batch over the ~25 MB/s tunnel;
#      the yuv wire is 9 MB → bound 0.36 s) and require unchanged val/test
#      AP (same seeded dataset, §9 anchor: test AP 0.935 / Acc 0.960 /
#      OnsNumAcc 0.950).
#   B. Distillation at scale (VERDICT r4 #5): the r4 conclusion was drawn
#      from a 2.5k-step toy-regime teacher.  The 20k soak checkpoint was
#      wiped by the machine reset, so: extend queue-28's 2.5k teacher to
#      10k steps, re-distill (64->8 progressive, 600 steps/round), and
#      evaluate students @16/@8 (eval w/ CFG 2.0 + band) against
#      SAME-CHECKPOINT anchors — teacher ddim@150+band and the fast point
#      dpm@32+s1.5+band — two seeds.  FAD absolutes are not comparable
#      across checkpoints; every row below shares the 10k checkpoint.
# Launch: nohup sh rehearsal/run_stages29.sh > /tmp/stages29.log 2>&1 &
# (waits for queue 28 to release the exclusive TPU tunnel)

cd "$(dirname "$0")/.." || exit 1

# -- 0. wait for queue 28 (bounded) ------------------------------------------
i=0
until grep -q "STAGES28 DONE" /tmp/stages28.log 2>/dev/null; do
  i=$((i+1)); [ $i -gt 1440 ] && { echo "queue 28 never finished"; exit 1; }
  sleep 20
done
echo "=== queue 28 done, starting 29 $(date -u +%H:%M:%S) ==="

run() {
  rname=$1; tmo=$2; shift 2
  echo "=== [$rname] start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "rehearsal/$rname.log" 2>&1
  echo "=== [$rname] exit=$? $(date -u +%H:%M:%S) ==="
}

# -- 0b. smoke the new two-row bench format on the chip (it was rewritten
#        after the last on-chip run; the driver's round-end bench must not be
#        its first execution) ---------------------------------------------------
run bench_smoke 1800 python bench.py

# -- A. augment recipe on the 4:2:0 wire + test ------------------------------
run augment_yuv_train 5400 sh script/train_onset_model_gh_augment.sh \
  -c cfg/trainer/trainer-onset-rehearsal.yaml -c cfg/data/wire-yuv420.yaml
ONSET_RUN=$(ls -dt logs/onset-augment/*/ 2>/dev/null | head -1)
if [ -n "$ONSET_RUN" ] && [ -n "$(ls -A "${ONSET_RUN}ckpts" 2>/dev/null)" ]; then
  run augment_yuv_test 1800 sh script/test_onset_model.sh \
    "${ONSET_RUN}config.yaml" "${ONSET_RUN}ckpts"
else
  echo "=== [augment_yuv_test] SKIPPED: no checkpoint ==="
fi

# -- B1. extend the queue-28 teacher 2.5k -> 10k steps ------------------------
RUN1=$(sed -n 's/.*run dir: //p' rehearsal/stage1_retrain.log | head -1)
if [ -z "$RUN1" ] || [ -z "$(ls -A "$RUN1/ckpts" 2>/dev/null)" ]; then
  echo "no queue-28 teacher checkpoint — aborting B"; exit 1
fi
run stage1_extend 7200 sh script/train_diffusion_model_gh.sh \
  model.embedder_checkpoint=null max_steps=10000 log_every_n_steps=1000 \
  +ckpt="$RUN1/ckpts"
RUN10K=$(sed -n 's/.*run dir: //p' rehearsal/stage1_extend.log | head -1)
if [ -z "$RUN10K" ] || [ -z "$(ls -A "$RUN10K/ckpts" 2>/dev/null)" ]; then
  echo "teacher extension left no checkpoint — aborting B"; exit 1
fi
echo "EXTEND DONE run=$RUN10K"

# -- B2. progressive distill 64->8 from the 10k teacher ----------------------
run distill10k 3600 python script/distill_diffusion.py \
  exp=train_diffusion_gh model.embedder_checkpoint=null \
  datamodule.batch_size=2 \
  "datamodule.train_dataset.path=data/greatest-hits/webdataset/train_shard_{1..3}.tar" \
  "datamodule.val_dataset.path=data/greatest-hits/webdataset/val_shard_1.tar" \
  +ckpt="$RUN10K/ckpts" \
  +distill.start_steps=64 +distill.final_steps=8 \
  +distill.steps_per_round=600 +out="$RUN10K/distilled_8step"
if [ -z "$(ls -A "$RUN10K/distilled_8step" 2>/dev/null)" ]; then
  echo "distill left no checkpoint — skipping student cells"
  SKIP_STUDENTS=1
fi

# cell NAME TIMEOUT MODEL_PATH [overrides...]: generation + guarded onset eval
cell() {
  cname=$1; ctmo=$2; cmodel=$3; shift 3
  run "curve_${cname}" "$ctmo" sh script/run_evaluate_gh_gen.sh \
    model.embedder_checkpoint=null model_path="$cmodel" \
    "$@" \
    experiment_path=./output/experiments/gh-gen-${cname}
  gdir=output/experiments/gh-gen-${cname}
  if [ -d "$gdir" ] && [ -n "$(ls -A "$gdir" 2>/dev/null)" ]; then
    run "curve_onset_${cname}" 600 sh script/evaluate_onset.sh \
      --gen_dir "$gdir"
  else
    echo "=== [curve_onset_${cname}] SKIPPED: empty gen dir ==="
  fi
}

BAND='+experiment.guidance_interval=[0.2,0.8]'
DPMFAST='experiment.num_steps=32 experiment.embedding_scale=1.5 +experiment.sampler=dpm'

# -- B3. same-checkpoint anchors on the 10k teacher, two seeds ----------------
cell t10k_ddim150_band      2700 "$RUN10K/ckpts" experiment.num_steps=150 $BAND
cell t10k_dpm32_s15_band    1500 "$RUN10K/ckpts" $DPMFAST $BAND
cell t10k_ddim150_band_seed1 2700 "$RUN10K/ckpts" experiment.num_steps=150 $BAND \
  "+experiment.seed=1"
cell t10k_dpm32_s15_band_seed1 1500 "$RUN10K/ckpts" $DPMFAST $BAND \
  "+experiment.seed=1"

# -- B4. students at the serving operating point, two seeds ------------------
if [ -z "$SKIP_STUDENTS" ]; then
  D="$RUN10K/distilled_8step"
  cell student16_band       1500 "$D" experiment.num_steps=16 $BAND
  cell student8_band        1500 "$D" experiment.num_steps=8 $BAND
  cell student16_band_seed1 1500 "$D" experiment.num_steps=16 $BAND \
    "+experiment.seed=1"
  cell student8_band_seed1  1500 "$D" experiment.num_steps=8 $BAND \
    "+experiment.seed=1"
fi

echo "STAGES29 DONE $(date -u)"

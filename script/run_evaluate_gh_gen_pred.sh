# FAD for diffusion with audio conditioning + GT onsets
exec python script/evaluate_diffusion.py \
exp=evaluate_gh_gen_pred \
experiment_path=./output/experiments/gh-gen-pred \
evaluation.gt_dir=./output/experiments/gh-gt-pred \
experiment.dataset.path="data/greatest-hits/webdataset/test_onset_preds.tar" \
model.embedder_checkpoint="checkpoints/630k-audioset-best.pt" \
model_path="checkpoints/diffusion-run/ckpts" \
"$@"

# FAD for diffusion with audio conditioning + GT onsets
exec python script/evaluate_diffusion.py \
exp=evaluate_gh_gen_text \
experiment_path=./output/experiments/gh-gen-text \
evaluation.gt_dir=./output/experiments/gh-gt \
experiment.dataset.path="data/greatest-hits/webdataset/test_shard_1.tar" \
model.embedder_checkpoint="checkpoints/630k-audioset-best.pt" \
model_path="checkpoints/diffusion-run/ckpts" \
"$@"

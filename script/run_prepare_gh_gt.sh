exec python script/evaluate_diffusion.py \
exp=prepare_gh_gt \
dataset_path="data/greatest-hits/webdataset/test_shard_1.tar" \
"$@"

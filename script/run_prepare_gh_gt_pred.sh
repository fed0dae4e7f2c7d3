exec python script/evaluate_diffusion.py \
exp=prepare_gh_gt_pred \
dataset_path="data/greatest-hits/webdataset/test_onset_preds.tar" \
"$@"

exec python script/evaluate_onset.py --gen_dir ./output/experiments/gh-gen --tar_dir ./output/experiments/gh-gt \
"$@"

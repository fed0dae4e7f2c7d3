exec python script/evaluate_onset.py --gen_dir ./output/experiments/gh-gen-text --tar_dir ./output/experiments/gh-gt \
"$@"

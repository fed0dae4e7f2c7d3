exec python script/evaluate_onset.py --gen_dir ./output/experiments/gh-gen-pred-augment --tar_dir ./output/experiments/gh-gt-pred \
"$@"

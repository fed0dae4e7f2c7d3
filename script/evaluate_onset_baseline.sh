python script/evaluate_onset_baseline.py --gen_dir output/condfoleygen --gt_root data/greatest-hits/mic-mp4-processed \
"$@"

exec python script/evaluate_onset_baseline.py \
  --gen_dir output/condfoleygen/generated_video \
  --tar_dir output/condfoleygen/orig_video \
"$@"

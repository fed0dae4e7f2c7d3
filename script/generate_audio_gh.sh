# usage: sh script/generate_audio_gh.sh TRANSFORMER_CKPT VQ_CKPT [MELGAN_CKPT]
python script/generate_audio.py --gh_testset \
  -c cfg/condfoleygen/greatesthit_transformer.yaml \
  --transformer_ckpt_path ${1:?transformer ckpt} --vq_ckpt ${2:?vq ckpt} \
  ${3:+--melgan_ckpt $3} --output_dir output/condfoleygen \
"$@"

# usage: sh script/generate_audio_gh.sh TRANSFORMER_CKPT VQ_CKPT [MELGAN_CKPT] [flags...]
tck=${1:?transformer ckpt}; vck=${2:?vq ckpt}; mck=
# the third positional is the optional melgan ckpt ONLY if it isn't a flag
if [ $# -ge 3 ] && [ "${3#--}" = "$3" ]; then mck=$3; shift 3; else shift 2; fi
exec python script/generate_audio.py --gh_testset \
  -c cfg/condfoleygen/greatesthit_transformer.yaml \
  --transformer_ckpt_path "$tck" --vq_ckpt "$vck" \
  ${mck:+--melgan_ckpt $mck} --output_dir output/condfoleygen \
"$@"

# usage: sh script/test_onset_model.sh LOGDIR CKPTDIR
cfg=${1:?run config.yaml}; ckpt=${2:?ckpt dir}; shift 2
exec python script/test_onset_model.py test --config "$cfg" --ckpt_path "$ckpt" \
"$@"

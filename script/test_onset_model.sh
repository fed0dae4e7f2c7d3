# usage: sh script/test_onset_model.sh LOGDIR CKPTDIR
python script/test_onset_model.py test --config ${1:?run config.yaml} --ckpt_path ${2:?ckpt dir} \
"$@"

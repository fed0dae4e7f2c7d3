# usage: sh script/train_transformer.sh VQ_CKPT_DIR
vq=${1:?codebook ckpt dir}; shift
exec python script/train_transformer.py -c cfg/condfoleygen/greatesthit_transformer.yaml --vq_ckpt "$vq" \
"$@"

# usage: sh script/train_transformer.sh VQ_CKPT_DIR
python script/train_transformer.py -c cfg/condfoleygen/greatesthit_transformer.yaml --vq_ckpt ${1:?codebook ckpt dir} \
"$@"

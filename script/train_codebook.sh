exec python script/train_codebook.py -c cfg/condfoleygen/greatesthit_codebook.yaml \
"$@"

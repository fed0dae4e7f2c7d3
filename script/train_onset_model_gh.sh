exec python script/train_onset_model.py fit \
-c cfg/data/data-onset-greatesthit.yaml \
-c cfg/model/model-onset.yaml \
-c cfg/trainer/trainer-onset.yaml \
"$@"

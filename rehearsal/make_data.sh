#!/bin/sh
# Regenerate the seeded synthetic GH dataset + webdataset shards (CPU only).
# Tracked in-repo because machine resets wipe /tmp (queues 15-17 each lost
# their untracked copy).  Idempotent: skips work whose outputs exist.
set -x
cd "$(dirname "$0")/.." || exit 1
[ -e data/rehearsal/processed/test.txt ] || \
  python script/gh_make_synthetic.py --output_dir data/rehearsal/processed \
    --n_videos 320 --num_workers 8 || exit 1
mkdir -p data/greatest-hits/webdataset
[ -e data/greatest-hits/webdataset/train_shard_1.tar ] || \
  python script/gh_make_shards.py --root data/rehearsal/processed \
    --split data/rehearsal/processed/train.txt \
    --output "data/greatest-hits/webdataset/train_shard_%d.tar" --shard_size 75 || exit 1
[ -e data/greatest-hits/webdataset/val_shard_1.tar ] || \
  python script/gh_make_shards.py --root data/rehearsal/processed \
    --split data/rehearsal/processed/val.txt \
    --output "data/greatest-hits/webdataset/val_shard_%d.tar" || exit 1
[ -e data/greatest-hits/webdataset/test_shard_1.tar ] || \
  python script/gh_make_shards.py --root data/rehearsal/processed \
    --split data/rehearsal/processed/test.txt \
    --output "data/greatest-hits/webdataset/test_shard_%d.tar" || exit 1
echo DATA_DONE

#!/usr/bin/env python
"""Pack processed Greatest Hits videos into webdataset shards.

    python script/gh_make_shards.py --root data/gh/mic-mp4-processed \
        --split data/gh/mic-mp4-processed/train.txt \
        --output "data/gh/webdataset/train_shard_%d.tar" [--shard_size 256] \
        [--pred_csv_dir LOGDIR/media/annotations/pred]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from syncfusion_tpu.data.shard_writer import write_shards


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--split", required=True)
    ap.add_argument("--output", required=True, help="pattern with %%d shard index")
    ap.add_argument("--shard_size", type=int, default=256)
    ap.add_argument("--pred_csv_dir", default=None)
    args = ap.parse_args(argv)
    paths = write_shards(args.root, args.split, args.output,
                         shard_size=args.shard_size,
                         pred_csv_dir=args.pred_csv_dir)
    print("\n".join(paths))


if __name__ == "__main__":
    main()

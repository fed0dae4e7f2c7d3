#!/usr/bin/env python
"""Seeded train/val/test split generation
(reference script/gh_preprocess_split.py: seed 42, 0.7/0.1/0.2)."""

from __future__ import annotations

import argparse
import random
from pathlib import Path


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True, help="processed videos root")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--train", type=float, default=0.7)
    ap.add_argument("--val", type=float, default=0.1)
    args = ap.parse_args(argv)

    root = Path(args.input_dir)
    names = sorted(p.name for p in root.iterdir() if p.is_dir())
    random.Random(args.seed).shuffle(names)
    n = len(names)
    n_train = int(n * args.train)
    n_val = int(n * args.val)
    splits = {
        "train": names[:n_train],
        "val": names[n_train : n_train + n_val],
        "test": names[n_train + n_val :],
    }
    for split, items in splits.items():
        (root / f"{split}.txt").write_text("\n".join(items) + "\n")
        print(f"{split}: {len(items)}")


if __name__ == "__main__":
    main()

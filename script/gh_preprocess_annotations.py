#!/usr/bin/env python
"""Convert Greatest-Hits ``*_times.txt`` ("time label ...") annotations into
``{name}.times.csv`` ("time,labels") files next to each processed video
(reference script/gh_preprocess_annotations.py:8-47)."""

from __future__ import annotations

import argparse
from pathlib import Path


def convert(times_txt: Path, out_dir: Path) -> Path:
    name = times_txt.name.replace("_times.txt", "")
    rows = []
    for line in times_txt.read_text().splitlines():
        if not line.strip():
            continue
        parts = line.split(" ", 1)
        time = parts[0]
        label = parts[1].strip() if len(parts) > 1 else "None"
        rows.append(f"{time},{label}")
    out = out_dir / name / f"{name}.times.csv"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(rows) + "\n")
    return out


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True, help="dir with *_times.txt")
    ap.add_argument("--output_dir", required=True, help="processed videos root")
    args = ap.parse_args(argv)

    files = sorted(Path(args.input_dir).glob("*_times.txt"))
    for f in files:
        convert(f, Path(args.output_dir))
    print(f"converted {len(files)} annotation files")


if __name__ == "__main__":
    main()

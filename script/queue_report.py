#!/usr/bin/env python
"""Summarize rehearsal decision cells into one table.

Parses ``rehearsal/curve_<cell>.log`` (generation + FAD proxy) and
``rehearsal/curve_onset_<cell>.log`` (onset metrics JSON line) pairs — the
artifact layout every queue since 26 produces — and prints a
docs/REHEARSAL.md-style markdown table plus one machine-readable JSON line.
Keeps the quality-gate calls (DeepCache flips, fast-point composition)
reproducible instead of hand-copied.

    python script/queue_report.py ddim150_band ddim150_band_dc4 ...
    python script/queue_report.py --glob 'ddim150_*'   # every matching cell
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REHEARSAL = Path(__file__).resolve().parents[1] / "rehearsal"


def parse_cell(name: str) -> dict:
    row: dict = {"cell": name}
    gen = REHEARSAL / f"curve_{name}.log"
    if gen.exists():
        text = gen.read_text(errors="replace")
        m = re.findall(r"'fad_melstats': ([0-9.]+)", text)
        if m:
            row["fad_melstats"] = round(float(m[-1]), 2)
        clips = re.findall(r"\(([\d.]+) 8s-clips/min\)", text)
        if clips:
            row["eval_8s_clips_per_min"] = float(clips[-1])
    onset = REHEARSAL / f"curve_onset_{name}.log"
    if onset.exists():
        for line in reversed(onset.read_text(errors="replace").splitlines()):
            line = line.strip()
            if line.startswith("{") and "detection_acc" in line:
                try:
                    row.update(json.loads(line))
                    break
                except json.JSONDecodeError:
                    continue
    return row


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("cells", nargs="*", help="cell names (curve_<name>.log)")
    ap.add_argument("--glob", default=None,
                    help="glob over rehearsal/curve_<pattern>.log")
    args = ap.parse_args(argv)

    names = list(args.cells)
    if args.glob:
        skip = re.compile(r"^curve_onset_")
        for p in sorted(REHEARSAL.glob(f"curve_{args.glob}.log")):
            if not skip.match(p.name):
                names.append(p.stem[len("curve_"):])
    if not names:
        ap.error("no cells given")

    rows = [parse_cell(n) for n in dict.fromkeys(names)]
    cols = ["cell", "fad_melstats", "detection_acc", "detection_ap",
            "onset_count_match", "num_files"]
    print("| " + " | ".join(cols) + " |")
    print("|" + "---|" * len(cols))
    for r in rows:
        print("| " + " | ".join(str(r.get(c, "—")) for c in cols) + " |")
    print(json.dumps({"cells": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

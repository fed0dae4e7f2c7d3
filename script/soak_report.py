#!/usr/bin/env python
"""Soak-run step-time profile (VERDICT r3 item #4).

Reads the metrics.jsonl of one or more training run dirs (a kill+resume soak
spans two) and prints, per 1k-step window: p50/p99 of the logged
``sec_per_step`` samples (the driver logs one every ``trainer.log_every_n_steps``
= 10 steps, synced by the train_loss pull), the window wall time, and the
valid_loss trajectory — evidence that async checkpoint saves never stall the
step loop and that step time stays flat over a multi-hour run
(reference counterpart: the 785-epoch training reality, README.md:192).

Usage: python script/soak_report.py logs/runs/RUN1 [logs/runs/RUN2 ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np


def load(run_dirs):
    rows = []
    for d in run_dirs:
        p = Path(d) / "metrics.jsonl"
        if not p.exists():
            print(f"WARNING: {p} missing", file=sys.stderr)
            continue
        for line in p.read_text().splitlines():
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return rows


def main() -> None:
    runs = sys.argv[1:]
    assert runs, "usage: soak_report.py RUN_DIR [RUN_DIR ...]"
    rows = load(runs)
    steps = [r for r in rows if "sec_per_step" in r]
    vals = [r for r in rows if "valid_loss" in r]
    if not steps:
        print("no sec_per_step records found")
        return

    print(f"runs: {', '.join(runs)}")
    print(f"step records: {len(steps)} (one per 10 steps), "
          f"val records: {len(vals)}")
    max_step = max(r["step"] for r in steps)
    print(f"final step: {max_step}")
    print()
    print(f"{'window':>14} {'n':>4} {'p50 s/step':>10} {'p99 s/step':>10} "
          f"{'max':>7} {'wall min':>8}")
    for lo in range(0, max_step, 1000):
        hi = lo + 1000
        w = [r for r in steps if lo < r["step"] <= hi]
        if not w:
            continue
        t = np.array([r["sec_per_step"] for r in w])
        wall = (w[-1]["_time"] - w[0]["_time"]) / 60 if len(w) > 1 else 0.0
        print(f"{lo:>6}-{hi:<7} {len(t):>4} {np.percentile(t, 50):>10.3f} "
              f"{np.percentile(t, 99):>10.3f} {t.max():>7.3f} {wall:>8.1f}")
    print()
    print("valid_loss trajectory:")
    for r in vals:
        print(f"  step {r['step']:>6}: {r['valid_loss']:.4f}")
    total_wall = (steps[-1]["_time"] - steps[0]["_time"]) / 3600
    print(f"\ntotal wall (first→last step record): {total_wall:.2f} h")


if __name__ == "__main__":
    main()

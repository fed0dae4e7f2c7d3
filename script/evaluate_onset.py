#!/usr/bin/env python
"""Onset metrics on generated audio (reference script/evaluate_onset.py).

    python script/evaluate_onset.py --gen_dir DIR --tar_dir DIR [--multi_delta]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from syncfusion_tpu.eval.onset_metrics import evaluate_onset_dirs


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen_dir", required=True)
    ap.add_argument("--tar_dir", required=True)
    ap.add_argument("--delta", type=float, default=0.1)
    ap.add_argument("--multi_delta", action="store_true",
                    help="average over delta ∈ arange(0.1, delta+0.05, 0.05) "
                         "(reference evaluate_onset.py:175)")
    args = ap.parse_args(argv)

    import numpy as np

    deltas = (
        list(np.arange(0.1, args.delta + 0.05, 0.05)) if args.multi_delta else None
    )
    metrics = evaluate_onset_dirs(args.gen_dir, args.tar_dir,
                                  delta=args.delta, deltas=deltas)
    print(json.dumps({k: round(v, 4) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()

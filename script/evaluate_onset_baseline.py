#!/usr/bin/env python
"""Onset metrics for CondFoleyGen baseline outputs
(reference script/evaluate_onset_baseline.py).

Baseline outputs are named ``{cond}_to_{target}_{i}.wav`` (the A_to_B
convention); each is matched against the target video's ground-truth audio
chunk and scored with the same NMS + greedy-match protocol.

    python script/evaluate_onset_baseline.py --gen_dir DIR --gt_root PROCESSED_ROOT
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from syncfusion_tpu.eval.onset_detect import SR, onset_detect
from syncfusion_tpu.eval.onset_metrics import match_onsets
from syncfusion_tpu.ops.resample import resample
from syncfusion_tpu.ops.wav import read_wav


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen_dir", required=True)
    ap.add_argument("--gt_root", required=True,
                    help="processed GH root with {video}/audio/*.resampled.wav")
    ap.add_argument("--delta", type=float, default=0.1)
    ap.add_argument("--duration", type=float, default=2.0)
    args = ap.parse_args(argv)

    pattern = re.compile(r"(?P<cond>.+)_to_(?P<target>.+?)_(?P<idx>\d+)\.wav$")
    accs, matches = [], []
    from sklearn.metrics import average_precision_score

    y_true_all, y_score_all = [], []
    n = 0
    for p in sorted(Path(args.gen_dir).glob("*.wav")):
        m = pattern.match(p.name)
        if not m:
            continue
        gen_wav, sr = read_wav(p)
        gen = gen_wav.mean(axis=0)
        if sr != SR:
            gen = resample(gen, sr, SR)

        target = m.group("target")
        gt_path = Path(args.gt_root) / target / "audio" / f"{target}.resampled.wav"
        if not gt_path.exists():
            continue
        gt_wav, gt_sr = read_wav(gt_path)
        gt = gt_wav.mean(axis=0)
        if gt_sr != SR:
            gt = resample(gt, gt_sr, SR)
        gt = gt[: int(args.duration * SR)]

        gen_onsets = onset_detect(gen, SR, delta=0.3)
        gt_onsets = onset_detect(gt, SR, delta=0.3)
        res = match_onsets(gt_onsets, gen_onsets, gen, delta=args.delta)
        accs.append(res["acc"])
        matches.append(res["count_match"])
        y_true_all += res["y_true"]
        y_score_all += res["y_score"]
        n += 1

    ap_score = (
        float(average_precision_score(y_true_all, y_score_all))
        if len(set(y_true_all)) > 1 else float("nan")
    )
    print(json.dumps({
        "detection_acc": round(float(np.mean(accs)) if accs else 0.0, 4),
        "detection_ap": round(ap_score, 4),
        "onset_count_match": round(float(np.mean(matches)) if matches else 0.0, 4),
        "num_files": n,
    }))


if __name__ == "__main__":
    main()

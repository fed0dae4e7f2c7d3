#!/usr/bin/env python
"""Roofline analysis of the onset trainer step (VERDICT r2 weak #3).

Compiles the real train step at the reference batch (16 x 30 x 112^2) in
both dtypes, pulls XLA's cost analysis (FLOPs + HBM bytes), and relates it
to the measured step time and the chip's peaks — answering whether the
257 ms f32 / 164 ms bf16 step is compute-, bandwidth- or overhead-bound.

    python script/onset_roofline.py [--batch 16] [--no-measure]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from syncfusion_tpu.core.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

# v5e chip peaks (public spec): 197 bf16 TFLOP/s (394 int8 TOPS), 819 GB/s
# HBM.  f32 runs through the MXU at ~1/4 bf16 rate.
PEAKS = {"tpu v5 lite": {"bf16_tflops": 197.0, "hbm_gbs": 819.0}}


def analyze(dtype_name: str, batch: int, measure: bool) -> dict:
    from syncfusion_tpu.models.onset_net import VideoOnsetNet
    from syncfusion_tpu.train.onset_trainer import OnsetTrainer

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    trainer = OnsetTrainer(model=VideoOnsetNet(dtype=dtype))
    state = trainer.init(jax.random.key(0), frames_shape=(1, 30, 112, 112, 3))

    rng = np.random.default_rng(0)
    batch_data = {
        "frames": jnp.asarray(
            rng.normal(size=(batch, 30, 112, 112, 3)).astype(np.float32)
        ),
        "label": jnp.asarray(
            (rng.random((batch, 30)) < 0.1).astype(np.float32)
        ),
    }

    step_fn = jax.jit(trainer._train_step, donate_argnums=(0,))
    lowered = step_fn.lower(state, batch_data, np.uint32(0))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))

    out = {
        "dtype": dtype_name,
        "gflops_per_step": flops / 1e9,
        "gbytes_per_step": bytes_ / 1e9,
        "arithmetic_intensity": flops / max(bytes_, 1.0),
    }

    if measure:
        st, metrics, _ = step_fn(state, batch_data, np.uint32(0))
        # donate: rebind every call (CLAUDE.md); sync by pulling a scalar
        float(metrics["loss/train"])
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            st, metrics, _ = step_fn(st, batch_data, np.uint32(0))
            float(metrics["loss/train"])
            times.append(time.perf_counter() - t0)
        times.sort()
        dt = times[len(times) // 2]
        out["measured_s_per_step"] = dt

        kind = jax.devices()[0].device_kind.lower()
        peaks = PEAKS.get(kind)
        if peaks:
            peak_flops = peaks["bf16_tflops"] * 1e12
            if dtype_name == "f32":
                peak_flops /= 4.0
            out["pct_of_flops_peak"] = 100.0 * flops / dt / peak_flops
            out["pct_of_hbm_peak"] = 100.0 * bytes_ / dt / (peaks["hbm_gbs"] * 1e9)
            out["flops_bound_floor_ms"] = 1e3 * flops / peak_flops
            out["hbm_bound_floor_ms"] = 1e3 * bytes_ / (peaks["hbm_gbs"] * 1e9)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--no-measure", action="store_true")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0].device_kind}")
    for dtype in ("f32", "bf16"):
        r = analyze(dtype, args.batch, not args.no_measure)
        print({k: round(v, 3) if isinstance(v, float) else v
               for k, v in r.items()})


if __name__ == "__main__":
    main()

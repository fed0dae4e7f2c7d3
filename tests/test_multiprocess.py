"""Multi-process (multi-host / DCN) execution of the DP batch path.

SURVEY §2.5 names host-side per-process input sharding a first-class
component; this test actually RUNS it: two OS processes, each with two
local CPU devices, joined by ``jax.distributed.initialize`` (gloo
collectives), exercising

  * ``data.shards.shard_for_process``  — disjoint shard assignment,
  * ``core.mesh.shard_batch``          — the
    ``jax.make_array_from_process_local_data`` path (process_count > 1),
  * a DP train step whose gradients all-reduce ACROSS processes,

and asserting the multi-process result equals the single-process full-batch
reference to float32 round-off.
"""

import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    pid, nproc, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, %(repo)r)
    from syncfusion_tpu.core.mesh import (
        MeshSpec, create_mesh, data_sharding, replicate_tree, shard_batch,
    )
    from syncfusion_tpu.data.shards import shard_for_process

    assert jax.process_count() == nproc and jax.device_count() == 2 * nproc

    # --- host-side input pipeline sharding: disjoint + complete ----------
    shards = [f"shard_{i}.tar" for i in range(5)]
    mine = shard_for_process(shards, pid, nproc)
    all_assignments = [shard_for_process(shards, p, nproc) for p in range(nproc)]
    flat = sorted(s for a in all_assignments for s in a)
    assert flat == sorted(shards), flat
    assert not set(mine) & set(shard_for_process(shards, 1 - pid, nproc))

    # --- global batch assembled from process-local rows ------------------
    mesh = create_mesh(MeshSpec(data=2 * nproc, model=1))
    rng = np.random.default_rng(0)            # same seed on every process
    x_global = rng.normal(size=(8, 4)).astype(np.float32)
    y_global = rng.normal(size=(8, 1)).astype(np.float32)
    lo, hi = pid * 4, (pid + 1) * 4
    batch = shard_batch({"x": x_global[lo:hi], "y": y_global[lo:hi]}, mesh)

    # --- DP step: grads must all-reduce across the two processes ---------
    w0 = np.full((4, 1), 0.5, np.float32)
    w = replicate_tree(jnp.asarray(w0), mesh)

    def loss_fn(w, b):
        pred = b["x"] @ w
        return jnp.mean((pred - b["y"]) ** 2)

    step = jax.jit(jax.value_and_grad(loss_fn),
                   out_shardings=(None, None))
    loss, grad = step(w, batch)
    loss, grad = float(loss), np.asarray(jax.device_get(grad))

    # single-process full-batch reference (pure numpy)
    pred = x_global @ w0
    ref_loss = float(np.mean((pred - y_global) ** 2))
    ref_grad = 2.0 * x_global.T @ (pred - y_global) / y_global.size

    np.testing.assert_allclose(loss, ref_loss, rtol=1e-5)
    np.testing.assert_allclose(grad, ref_grad, rtol=1e-4, atol=1e-6)

    if pid == 0:
        json.dump({"loss": loss, "n_processes": nproc,
                   "n_devices": jax.device_count()},
                  open(os.path.join(outdir, "result.json"), "w"))
    """
) % {"repo": str(REPO)}


def test_two_process_dp_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = 29517
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    result = json.loads((tmp_path / "result.json").read_text())
    assert result == {"loss": result["loss"], "n_processes": 2, "n_devices": 4}
    assert np.isfinite(result["loss"])

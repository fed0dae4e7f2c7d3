"""Microbenchmark for the host↔device link and dispatch overheads.

The TPU is reached through a tunnel whose latency/bandwidth characteristics
drive most driver-level design decisions (async checkpoint drains, uint8
wire formats, seed-chains instead of eager key splits — see CLAUDE.md).
This tool measures, on the real chip:

  * eager-op latency (single tiny op outside jit)
  * jitted-dispatch latency (cached executable, async dispatch + sync)
  * H2D bandwidth (device_put of 1/16/64 MB arrays)
  * D2H bandwidth (np.asarray of device arrays, plus pipelined
    copy_to_host_async variant over many leaves)

Run serialized against other TPU jobs:  python script/tunnel_bench.py
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    """Tunnel-reliable device sync: pull one scalar (see CLAUDE.md)."""
    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev)}))

    # --- dispatch/latency ------------------------------------------------
    x = jax.device_put(jnp.ones((8, 128)))
    sync(x)
    eager = timeit(lambda: sync(x + 1.0))
    print(json.dumps({"metric": "eager_op_roundtrip_ms",
                      "value": round(eager * 1e3, 2)}))

    f = jax.jit(lambda x: x * 2.0 + 1.0)
    sync(f(x))  # compile
    jit_rt = timeit(lambda: sync(f(x)))
    print(json.dumps({"metric": "jit_dispatch_roundtrip_ms",
                      "value": round(jit_rt * 1e3, 2)}))

    # dispatch-only (no sync): how fast can we queue work?
    t0 = time.perf_counter()
    y = x
    for _ in range(100):
        y = f(y)
    queue_ms = (time.perf_counter() - t0) / 100 * 1e3
    sync(y)
    print(json.dumps({"metric": "jit_dispatch_async_ms",
                      "value": round(queue_ms, 3)}))

    # --- H2D bandwidth ---------------------------------------------------
    for mb in (1, 16, 64):
        host = np.random.default_rng(0).random(mb * 1024 * 1024 // 4).astype(np.float32)

        def h2d():
            a = jax.device_put(host)
            a.block_until_ready()
            sync(a)  # belt and braces: block_until_ready may lie over the tunnel

        dt = timeit(h2d, n=3)
        print(json.dumps({"metric": f"h2d_{mb}mb_mbps",
                          "value": round(mb / dt, 1),
                          "seconds": round(dt, 3)}))

    # --- D2H bandwidth ---------------------------------------------------
    # jax.Array caches its host value after the first pull — every
    # measurement must pull a FRESH device array (g(i) below), or the
    # numbers are host-memcpy speed, not the tunnel.
    g = jax.jit(lambda n, i: jnp.full((n,), i, jnp.float32), static_argnums=0)
    for mb in (1, 16, 64):
        n = mb * 1024 * 1024 // 4

        def d2h(i=[0]):
            i[0] += 1
            a = g(n, float(i[0]))
            sync(a)
            t0 = time.perf_counter()
            np.asarray(a)
            return time.perf_counter() - t0

        dt = float(np.median([d2h() for _ in range(3)]))
        print(json.dumps({"metric": f"d2h_{mb}mb_mbps",
                          "value": round(mb / dt, 1),
                          "seconds": round(dt, 3)}))

    # pipelined many-leaf D2H (the checkpoint drain pattern): 64 x 1 MB
    n = 1024 * 1024 // 4

    def drain(pipelined, base):
        leaves = [g(n, float(base + i)) for i in range(64)]
        for leaf in leaves:
            sync(leaf)
        t0 = time.perf_counter()
        if pipelined:
            for leaf in leaves:
                leaf.copy_to_host_async()
            jax.device_get(leaves)
        else:
            for leaf in leaves:
                np.asarray(leaf)
        return time.perf_counter() - t0

    print(json.dumps({"metric": "d2h_64x1mb_serial_mbps",
                      "value": round(64 / drain(False, 1000), 1)}))
    print(json.dumps({"metric": "d2h_64x1mb_pipelined_mbps",
                      "value": round(64 / drain(True, 2000), 1)}))


if __name__ == "__main__":
    main()

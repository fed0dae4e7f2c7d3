"""Double-buffered host→device prefetch.

The reference overlaps data loading with compute via torch DataLoader
workers + pinned memory (exp/train_diffusion_gh.yaml:43-44).  The TPU
equivalent: a background thread runs the (numpy) pipeline and eagerly
``device_put``s the next batches with the target sharding while the current
step executes, so H2D DMA rides under compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional

import jax
from jax.sharding import Mesh

from syncfusion_tpu.core.mesh import shard_batch


def device_prefetch(
    batches: Iterator[Any],
    mesh: Optional[Mesh] = None,
    buffer_size: int = 2,
    transform: Optional[Callable[[Any], Any]] = None,
) -> Iterator[Any]:
    """Yield device-resident batches, keeping ``buffer_size`` in flight."""

    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    _END = object()
    error: list[BaseException] = []

    def put(batch):
        if transform is not None:
            batch = transform(batch)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        else:
            batch = jax.tree_util.tree_map(jax.device_put, batch)
        q.put(batch)

    def worker():
        try:
            for batch in batches:
                put(batch)
        except BaseException as e:  # surfaced on the consumer side
            error.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is _END:
            if error:
                raise error[0]
            return
        yield item

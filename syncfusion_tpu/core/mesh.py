"""Device mesh + sharding utilities — the framework's communication backend.

The reference (mcomunita/syncfusion) delegates all distribution to PyTorch
Lightning DDP over NCCL (reference: script/train_onset_model.py:19-27,
exp/train_diffusion_gh.yaml:84-96).  The TPU-native equivalent is a single
``jax.sharding.Mesh`` whose axes ride the ICI links; gradients are reduced by
the ``psum`` XLA inserts for batch-sharded computation, and ``sync_batchnorm``
becomes a cross-replica ``pmean`` of batch statistics (see
``models/onset_net.py``).

Axis convention (all models here fit one chip, so ``data`` is the workhorse;
``model`` exists so tensor-parallel shardings compose for larger variants):

  * ``data``  — batch dimension (pure data parallelism).
  * ``model`` — reserved for tensor parallelism of wide layers.

Multi-host note: each JAX process feeds its addressable shard of the batch;
``shard_batch`` uses ``jax.make_array_from_process_local_data`` when running
multi-process so host→device traffic stays node-local and gradient reduction
rides ICI, not DCN.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Declarative mesh shape. ``data=-1`` means "all remaining devices"."""

    data: int = -1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = self.model
        data = self.data if self.data != -1 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"MeshSpec(data={self.data}, model={self.model}) does not "
                f"tile {n_devices} devices"
            )
        return data, model


def create_mesh(
    spec: MeshSpec | None = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh over the given (default: all) devices.

    Device order is kept as ``jax.devices()`` returns it, which on TPU
    already follows the physical torus so adjacent mesh coordinates are ICI
    neighbours.
    """
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec()
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def mesh_for_batch(batch_size: int, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh whose data axis is the largest divisor of ``batch_size`` that
    fits the device count (so small-batch runs still work on big meshes —
    surplus devices are simply left out, matching the reference's
    single-GPU-by-default behavior)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    data = next(d for d in range(min(n, batch_size), 0, -1) if batch_size % d == 0)
    return create_mesh(MeshSpec(data=data, model=1), devices=devices[:data])


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over ``data``; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n_data = mesh.shape[DATA_AXIS]
    if global_batch % n_data:
        raise ValueError(f"batch {global_batch} not divisible by data axis {n_data}")
    return global_batch // n_data


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host-side batch pytree onto the mesh, sharded over ``data``.

    Single-process: a plain ``device_put`` with a NamedSharding.
    Multi-process: assembles the global array from process-local data so
    each host only feeds its own chips.
    """

    def _put(x):
        # Keep already-device-resident leaves (e.g. async CLAP embeddings) on
        # device: np.asarray would block on a D2H pull — ~100 ms over the chip
        # tunnel — only for device_put to push the bytes straight back.
        if not isinstance(x, jax.Array):
            x = np.asarray(x)
        sharding = NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(_put, batch)


def shard_global_array(x: Any, mesh: Mesh, spec: Optional[P] = None) -> jax.Array:
    """Place a host array whose FULL value every process holds onto the mesh.

    Single-process this is ``device_put``.  Multi-process, ``device_put``
    cannot target non-addressable devices, so each process slices out and
    uploads exactly the shards its local devices own
    (``addressable_devices_indices_map``) and the global array is assembled
    with ``make_array_from_single_device_arrays`` — no cross-host traffic.
    Used by the serving path, where every host derives the same global
    noise/conditioning deterministically from a shared seed.
    """
    if not (isinstance(x, jax.Array) and x.is_fully_addressable):
        # keep device-resident trees on device (replicate_tree on a jitted
        # init): slicing/device_put below is device→device, never a D2H
        # drain over the host link
        x = np.asarray(x)
    if spec is None:
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    idx_map = sharding.addressable_devices_indices_map(x.shape)
    arrs = [jax.device_put(x[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(x.shape, sharding, arrs)


def local_rows(arr: jax.Array) -> tuple[np.ndarray, np.ndarray]:
    """Pull THIS process's rows of a batch-sharded global array.

    Returns ``(rows, global_indices)`` with rows ordered by global index —
    the multi-host serving contract: each host persists the clips its own
    chips generated (no all-gather of waveforms over DCN).
    """
    n = arr.shape[0]
    # a batch dim the sharding leaves whole yields index slice(None, None) —
    # normalize to the full range or np.arange(None or 0, None) silently
    # returns ZERO rows (review finding, round 5)
    rng = [(s, s.index[0].indices(n)) for s in arr.addressable_shards]
    rng.sort(key=lambda t: t[1][0])
    rows = np.concatenate([np.asarray(s.data) for s, _ in rng], axis=0)
    idx = np.concatenate([np.arange(start, stop) for _, (start, stop, _) in rng])
    # adjacent devices may hold replicas of the same rows (e.g. model axis)
    uniq, first = np.unique(idx, return_index=True)
    return rows[first], uniq


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    """Replicate a parameter/opt-state pytree across the whole mesh.

    Multi-process: ``device_put`` to a multi-host sharding runs a hidden
    cross-process ``assert_equal`` collective (an allgather of the inputs!)
    before any jitted work exists — at startup that is (a) a full param-tree
    transfer over DCN and (b) a 30 s Gloo rendezvous that times out when
    processes reach it skewed (observed: one worker still compiling while
    the other waited).  Each process instead uploads its own replicas
    locally via ``shard_global_array`` — no collective, no cross-host bytes;
    callers guarantee the tree is identical on every process (same init
    seed / same restored checkpoint), and that guarantee is VERIFIED by a
    scalar-digest allgather (tiny, and an XLA collective rather than the
    Gloo host rendezvous that motivated dropping ``device_put``): divergent
    trees raise here instead of silently computing with different weights
    per host.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, NamedSharding(mesh, P()))
    _assert_trees_agree_across_processes(tree)
    return jax.tree_util.tree_map(
        lambda x: shard_global_array(x, mesh, spec=P()), tree
    )


_REPLICATE_SEQ = 0  # per-process call counter; same order on every process


def _assert_trees_agree_across_processes(tree: Any) -> None:
    """Cheap cross-process consistency guard for to-be-replicated trees.

    Each process reduces its LOCAL tree to one float64 digest (deterministic
    op order → identical trees give bitwise-identical digests), then the
    digests are exchanged through the ``jax.distributed`` KV store — NOT a
    Gloo/XLA collective, whose fixed 30 s first-contact window is exactly
    what compile-time skew between processes blows past (the reason
    ``device_put``'s hidden assert_equal was dropped).  Never moves the
    tree itself.
    """
    leaves = [np.asarray(x) if np.isscalar(x) else x
              for x in jax.tree_util.tree_leaves(tree)
              if np.isscalar(x) or (hasattr(x, "dtype")
                                    and np.issubdtype(x.dtype, np.number))]
    dev = [x for x in leaves if isinstance(x, jax.Array)]
    host = [x for x in leaves if not isinstance(x, jax.Array)]
    digest = np.float64(len(leaves)) + 0.31 * sum(float(x.size) for x in leaves)
    if dev:  # reduce on device — no D2H drain of the tree itself
        digest += float(jax.jit(lambda ls: sum(
            jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in ls))(dev))
    for a in host:
        digest += float(np.sum(np.abs(np.asarray(a, dtype=np.float64))))

    from jax._src import distributed

    client = getattr(distributed.global_state, "client", None)
    if client is None:  # initialized without a coordinator — nothing to check
        return
    global _REPLICATE_SEQ
    seq = _REPLICATE_SEQ = _REPLICATE_SEQ + 1  # same call order on every proc
    key = f"syncfusion/replicate_digest/{seq}"
    client.key_value_set(f"{key}/{jax.process_index()}", repr(float(digest)))
    all_digests = [
        client.blocking_key_value_get(f"{key}/{p}", 300_000)
        for p in range(jax.process_count())
    ]
    if len(set(all_digests)) != 1:
        raise ValueError(
            "replicate_tree: tree differs across processes (digests "
            f"{all_digests}); every process must build the same tree "
            "(same init seed / same restored checkpoint)")


def fsdp_param_specs(params: Any, mesh: Mesh, min_size: int = 2**14) -> Any:
    """PartitionSpecs sharding each large parameter over ``model``.

    The FSDP/tensor-parallel rule (GSPMD handles both from the same
    annotation): for every leaf of at least ``min_size`` elements, shard the
    last dimension divisible by the ``model`` axis size — conv kernels
    ``(W, Cin, Cout)`` and dense kernels ``(In, Out)`` split over output
    channels (Megatron column-parallel), everything smaller stays
    replicated.  With activations left batch-sharded, XLA lowers this to
    ZeRO-3 semantics: params/grads/opt-state live sharded in HBM (1/tp the
    memory) and are all-gathered over ICI only around their use.  This is
    the TPU-native counterpart of the reference's DDP+ZeRO knobs — no
    explicit collective anywhere.

    Works on both concrete arrays and ``ShapeDtypeStruct`` leaves (for AOT
    compile checks).
    """
    tp = mesh.shape[MODEL_AXIS]

    def spec(x) -> P:
        if tp == 1 or x.size < min_size:
            return P()
        for d in reversed(range(x.ndim)):
            if x.shape[d] % tp == 0 and x.shape[d] >= tp:
                axes: list = [None] * x.ndim
                axes[d] = MODEL_AXIS
                return P(*axes)
        return P()

    return jax.tree_util.tree_map(spec, params)


def shard_params(params: Any, mesh: Mesh, specs: Any = None,
                 min_size: int = 2**14) -> Any:
    """Place a parameter pytree onto the mesh per ``fsdp_param_specs``."""
    if specs is None:
        specs = fsdp_param_specs(params, mesh, min_size=min_size)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def fsdp_init_opt(tx, params: Any, mesh: Mesh, min_size: int = 2**14) -> Any:
    """``tx.init`` with FSDP out-shardings.

    Adam's mu/nu are param-shaped, so applying the same FSDP rule to the
    abstract opt state lands the whole optimizer sharded in HBM; counters
    and scalars fall through to replicated.  With ``model=1`` every spec is
    ``P()`` and this degrades to a replicated init — safe for pure-DP
    meshes.
    """
    abs_opt = jax.eval_shape(tx.init, params)
    opt_sh = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        fsdp_param_specs(abs_opt, mesh, min_size=min_size),
    )
    return jax.jit(tx.init, out_shardings=opt_sh)(params)

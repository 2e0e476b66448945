"""Device mesh and sharding helpers.

The reference scales with Ray CPU fan-out + torch DataParallel/Lightning DDP
over NCCL (``sim/sim_2d.py:194-202``, ``dynamics/trainer.py:41-43``,
``generator/train.py:152``). Here scale-out is XLA collectives over ICI via
``jax.sharding``:

- axis ``dp``: data parallelism (training batches, datagen pairs),
- axis ``sp``: the pose-grid axis of guidance evaluation and datagen — the
  workload's analog of sequence/context parallelism (SURVEY.md §5): the
  9,000-pose classifier sweep shards over devices and gradients reduce with a
  single psum riding ICI.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axes: Tuple[str, ...] = ("dp", "sp")
) -> Mesh:
    """Factorize devices into a (dp, sp) mesh (sp gets the smaller factor),
    or a flat 1-axis mesh when ``axes`` has one name."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if len(axes) == 1:
        return Mesh(np.asarray(devs), axes)
    sp = 1
    for cand in (2, 4, 8):
        if n % cand == 0 and n // cand >= cand // 2:
            sp = cand
            break
    if n % sp != 0:
        sp = 1
    arr = np.asarray(devs).reshape(n // sp, sp)
    return Mesh(arr, axes)


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place a pytree of arrays with the leading dim sharded over ``axis``.

    Single-process only (device_put to a local mesh); multi-host callers use
    ``shard_global_batch``, which also handles the per-process data split.
    """
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def shard_global_batch(mesh: Mesh, batch, axis: str = "dp"):
    """DDP-sampler analog: every process passes the same GLOBAL batch (same
    seed -> same host-side order, like the reference's Lightning DDP sampler,
    ``generator/train.py:35,152``); rows are trimmed to a multiple of the
    ``axis`` size, each process keeps its contiguous block, and the returned
    arrays are global (jax.Array) with the leading dim sharded over ``axis``.

    Single-process this degrades to trim + ``shard_batch``.
    """
    total = mesh.shape[axis]
    n = next(iter(jax.tree.leaves(batch))).shape[0]
    if n % total:
        batch = jax.tree.map(lambda x: x[: n - n % total], batch)
        n -= n % total
    pc = jax.process_count()
    if pc == 1:
        return shard_batch(mesh, batch, axis)
    per = n // pc
    lo = per * jax.process_index()

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        local = np.asarray(x[lo : lo + per])
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), local
        )

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree over the full mesh (multi-host safe)."""
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
        )

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, P()), lambda idx: x[idx]
        )

    return jax.tree.map(put, tree)


def pad_to_multiple(batch, k: int):
    """Pad each array's leading dim up to a multiple of k (repeating the last
    row) so it shards evenly; returns (padded_batch, original_length)."""
    import numpy as _np

    lens = {x.shape[0] for x in jax.tree.leaves(batch)}
    assert len(lens) == 1, f"inconsistent leading dims {lens}"
    n = lens.pop()
    pad = (-n) % k

    def put(x):
        if pad == 0:
            return x
        filler = _np.broadcast_to(
            _np.asarray(x[-1:]), (pad,) + tuple(x.shape[1:])
        )
        return _np.concatenate([_np.asarray(x), filler], axis=0)

    return (batch if pad == 0 else jax.tree.map(put, batch)), n


def data_parallel_mesh(min_devices: int = 2) -> Optional[Mesh]:
    """A flat dp mesh over all local devices, or None on a single device.

    The reference makes every training run multi-device by default
    (``dynamics/trainer.py:41-43`` DataParallel, ``generator/train.py:152``
    DDP devices=-1); this is the jax.sharding equivalent the training CLIs
    call — sharded batches + replicated params make XLA insert the gradient
    psum over ICI."""
    if jax.device_count() < min_devices:
        return None
    return make_mesh(axes=("dp",))

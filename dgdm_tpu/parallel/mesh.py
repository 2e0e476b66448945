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
    """Place a pytree of arrays with the leading dim sharded over ``axis``."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


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

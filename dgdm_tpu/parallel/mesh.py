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
    n_devices: Optional[int] = None, axes: Tuple[str, str] = ("dp", "sp")
) -> Mesh:
    """Factorize devices into a 2D (dp, sp) mesh; sp gets the smaller factor."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
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

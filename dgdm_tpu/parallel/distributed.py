"""Multi-host initialization — the reference's multi-node story is Lightning
DDP reading ``NODE_RANK`` (``generator/train.py:35``); ours is
``jax.distributed`` over a TPU pod slice (or any multi-process mesh), after
which ``jax.devices()`` spans all hosts and every ``Mesh`` built by
``parallel.mesh`` is global automatically.

Environment contract (reference parity + JAX convention):
  DGDM_COORDINATOR   "host:port" of process 0 (absent -> single host, no-op)
  NODE_RANK          this process's index (reference name; JAX
                     ``PROCESS_ID`` is honored too)
  DGDM_NUM_NODES     total process count (or ``NUM_NODES``)

On TPU pods, ``jax.distributed.initialize()`` with no arguments discovers
all three from the TPU metadata — the coordinator env is only needed on
CPU/GPU fleets or when overriding.
"""

from __future__ import annotations

import os
from typing import Optional

_INITIALIZED = False


def maybe_initialize_distributed(verbose: bool = True) -> bool:
    """Initialize ``jax.distributed`` when a multi-host environment is
    declared; safe no-op otherwise (and on repeat calls).

    Returns True when running multi-host."""
    global _INITIALIZED
    import jax

    if _INITIALIZED:
        return jax.process_count() > 1

    coordinator: Optional[str] = os.environ.get("DGDM_COORDINATOR")
    num = os.environ.get("DGDM_NUM_NODES") or os.environ.get("NUM_NODES")
    rank = os.environ.get("NODE_RANK") or os.environ.get("PROCESS_ID")

    if coordinator is None and num is None:
        # single-host: nothing to do (TPU pod auto-init would also be
        # triggered here if JAX_COORDINATOR_ADDRESS etc. are set by the
        # infra, but we do not force it — jit works single-process).
        return False

    kwargs = {}
    if coordinator:
        kwargs["coordinator_address"] = coordinator
    if num:
        kwargs["num_processes"] = int(num)
    if rank:
        kwargs["process_id"] = int(rank)
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    if verbose:
        print(
            f"[dgdm] jax.distributed: process {jax.process_index()}"
            f"/{jax.process_count()}, {jax.local_device_count()} local /"
            f" {jax.device_count()} global devices",
            flush=True,
        )
    return jax.process_count() > 1


def process_local_batch_slice(global_batch: int) -> slice:
    """Rows of a globally-indexed batch owned by this process (contiguous
    block partition, reference DDP-sampler analog)."""
    import jax

    per = global_batch // jax.process_count()
    lo = per * jax.process_index()
    return slice(lo, lo + per)

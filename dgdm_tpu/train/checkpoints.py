"""Checkpoint / resume via orbax.

Replaces the reference's raw ``torch.save(state_dict)`` (``dynamics/
trainer.py:105-106``) and Lightning ModelCheckpoint-with-injected-EMA
(``generator/diffusion.py:745-753``): one tree holding params, EMA params,
optimizer state and step, saved atomically, restorable onto the matching
TrainState dataclass.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def save(path: str, state: Any) -> None:
    """Multi-host: ``save`` is a COLLECTIVE — every process must call it with
    the same path (orbax synchronizes across hosts and only the primary host
    writes replicated data, the coordinated equivalent of Lightning's
    rank_zero_only checkpoint). Rank-gating the call breaks the barrier —
    measured: the primary's save times out on Gloo once the other rank exits.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore(path: str, target: Any) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)


def latest_step_dir(root: str) -> Optional[str]:
    """Directory layout: <root>/step_<n>. Returns the largest-n path."""
    if not os.path.isdir(root):
        return None
    steps = []
    for d in os.listdir(root):
        if d.startswith("step_"):
            try:
                steps.append((int(d.split("_", 1)[1]), d))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(root, max(steps)[1])

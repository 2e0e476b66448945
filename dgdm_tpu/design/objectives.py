"""Task objectives for guided sampling.

``deltas_to_objective`` maps predicted whitened (delta_theta, delta_x, delta_y)
to a per-row scalar the guidance ascends — parity with the reference
(``generator/diffusion.py:430-471``), including the convergence objective's
wrapped half-profile construction and ``get_convergence_centers``
(``generator/diffusion.py:506-539``).

Sign conventions (from ``dynamics/metrics.py``): clockwise = negative
delta_theta; up = negative delta_x; left = negative delta_y.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


SIMPLE_OBJECTIVES = {
    "rotate": lambda d: d[..., 0] ** 2,
    "rotate_clockwise": lambda d: -d[..., 0],
    "rotate_counterclockwise": lambda d: d[..., 0],
    "shift_up": lambda d: -d[..., 1],
    "shift_down": lambda d: d[..., 1],
    "shift_left": lambda d: -d[..., 2],
    "shift_right": lambda d: d[..., 2],
    "clockwise_up": lambda d: -d[..., 0] - d[..., 1],
    "clockwise_down": lambda d: -d[..., 0] + d[..., 1],
    "clockwise_left": lambda d: -d[..., 0] - d[..., 2],
    "clockwise_right": lambda d: -d[..., 0] + d[..., 2],
    "counterclockwise_up": lambda d: d[..., 0] - d[..., 1],
    "counterclockwise_down": lambda d: d[..., 0] + d[..., 1],
    "counterclockwise_left": lambda d: d[..., 0] - d[..., 2],
    "counterclockwise_right": lambda d: d[..., 0] + d[..., 2],
}


def deltas_to_objective(
    deltas: jnp.ndarray,
    objective: str,
    grid_size: Optional[int] = None,
    centers: Optional[jnp.ndarray] = None,
    num_pos: int = 1,
) -> jnp.ndarray:
    """deltas: (..., 3) predicted whitened profile entries.

    For 'convergence', deltas must be reshaped as (B, grid_size, num_pos^2, 3)
    and ``centers`` (B,) gives the per-sample convergence orientation index;
    poses left of the center should rotate ccw (+), right of it cw (-).
    """
    if objective != "convergence":
        return SIMPLE_OBJECTIVES[objective](deltas)
    assert centers is not None and grid_size is not None
    b = deltas.shape[0]
    d = deltas.reshape(b, grid_size, -1, 3)[..., 0]      # (B, G, P)
    idx = jnp.arange(grid_size)[None, :]                 # (1, G)
    # signed circular offset of each orientation from the center, in (-G/2, G/2]
    off = (idx - centers[:, None] + grid_size // 2) % grid_size - grid_size // 2
    # left of center (off in [-G/2, 0)) wants +delta_theta; right wants -delta
    sign = jnp.where(off < 0, 1.0, -1.0)
    return (sign[..., None] * d).reshape(b, -1)


def convergence_centers(
    profile_cls: jnp.ndarray, grid_size: int
) -> jnp.ndarray:
    """Centers of the longest ccw->cw transition runs.

    profile_cls: (B, G) in {0 (cw), 1 (none), 2 (ccw)} over orientations —
    the classifier profile at pos=0 (generator/diffusion.py:506-539). A
    convergence center is an orientation where rotation switches from
    ccw (left side) to cw (right side); we score each orientation by the
    length of the surrounding correctly-signed arc and take the argmax.
    """
    b, g = profile_cls.shape
    signs = jnp.where(
        profile_cls == 2, 1.0, jnp.where(profile_cls == 0, -1.0, 0.0)
    )

    def score_center(c):
        idx = jnp.arange(g)
        off = (idx - c + g // 2) % g - g // 2
        want = jnp.where(off < 0, 1.0, jnp.where(off > 0, -1.0, 0.0))
        return jnp.sum((signs * want[None, :]) > 0, axis=-1)   # (B,)

    scores = jnp.stack([score_center(c) for c in range(g)], axis=-1)  # (B, G)
    return jnp.argmax(scores, axis=-1)

"""Procedural gripper sampling with bit-exact parity to the reference.

The reference regenerates its entire diffusion training set from
``np.random.RandomState(idx)`` seeds (``generator/train.py:42-58``) and uses
the same seeds during datagen (``sim/sim_2d.py:74-77``, ``sim/sim_3d.py:73-75``)
— the seed IS the dataset. We reproduce that exactly (numpy MT19937 on the
host, batched into device arrays), and additionally provide a fast on-device
sampler (jax PRNG) for workloads that don't need reference parity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import GRIPPER_2D, GRIPPER_3D


def ctrl_x_2d() -> np.ndarray:
    g = GRIPPER_2D
    return np.linspace(g.ctrl_x_min, g.ctrl_x_max, g.num_ctrl)


def sample_gripper_2d(idx: int) -> Tuple[np.ndarray, np.ndarray]:
    """(yl, yr) each (7,) — parity with sim/sim_2d.py:74-77."""
    g = GRIPPER_2D
    rs = np.random.RandomState(idx)
    yl = rs.uniform(g.ctrl_y_min, g.ctrl_y_max, size=(g.num_ctrl,))
    yr = rs.uniform(g.ctrl_y_min, g.ctrl_y_max, size=(g.num_ctrl,))
    return yl, yr


def sample_gripper_3d(idx: int) -> Tuple[np.ndarray, np.ndarray]:
    """(yl, yr) each (21,) — parity with sim/sim_3d.py:73-75."""
    g = GRIPPER_3D
    rs = np.random.RandomState(idx)
    yl = rs.uniform(g.ctrl_y_min, g.ctrl_y_max, size=(g.num_ctrl,))
    yr = rs.uniform(g.ctrl_y_min, g.ctrl_y_max, size=(g.num_ctrl,))
    return yl, yr


def sample_grippers_batch(
    start: int, count: int, fingers_3d: bool = False
) -> np.ndarray:
    """(count, 2, n_ctrl) stacked [yl, yr] for idx in [start, start+count)."""
    fn = sample_gripper_3d if fingers_3d else sample_gripper_2d
    return np.stack([np.stack(fn(i)) for i in range(start, start + count)])


def ctrlpts_2d(yl: np.ndarray, yr: np.ndarray) -> np.ndarray:
    """(14, 2) control point array matching assets/finger_sampler.py:38-50."""
    x = ctrl_x_2d()
    return np.concatenate(
        [np.stack([x, yl], -1), np.stack([x, yr], -1)], axis=0
    )


def ctrlpts_3d(yl: np.ndarray, yr: np.ndarray) -> np.ndarray:
    """(42, 3) matching assets/finger_3d.py:82-88 (x-major grid order)."""
    g = GRIPPER_3D
    x = np.linspace(g.ctrl_x_min, g.ctrl_x_max, g.nu)
    z = np.linspace(g.ctrl_z_min, g.ctrl_z_max, g.nv)
    xn, zn = np.meshgrid(x, z)
    xf, zf = xn.T.reshape(-1), zn.T.reshape(-1)
    l = np.stack([xf, yl, zf], axis=-1)
    r = np.stack([xf, yr, zf], axis=-1)
    return np.concatenate([l, r], axis=0)


# -- normalization (dynamics/dataloader.py:46-49, generator/dataloader.py:17-19)


def normalize_y(y: jnp.ndarray, fingers_3d: bool = False) -> jnp.ndarray:
    g = GRIPPER_3D if fingers_3d else GRIPPER_2D
    return (y - g.ctrl_y_min) / (g.ctrl_y_max - g.ctrl_y_min) * 2.0 - 1.0


def denormalize_y(y: jnp.ndarray, fingers_3d: bool = False) -> jnp.ndarray:
    g = GRIPPER_3D if fingers_3d else GRIPPER_2D
    return (y + 1.0) / 2.0 * (g.ctrl_y_max - g.ctrl_y_min) + g.ctrl_y_min


def fast_sample_y(
    key: jax.Array, count: int, fingers_3d: bool = False
) -> jnp.ndarray:
    """On-device batch sampler: (count, 2, n_ctrl) uniform in the ctrl-y range.

    Not bit-identical to RandomState streams; use for throughput workloads.
    """
    g = GRIPPER_3D if fingers_3d else GRIPPER_2D
    return jax.random.uniform(
        key,
        (count, 2, g.num_ctrl),
        minval=g.ctrl_y_min,
        maxval=g.ctrl_y_max,
        dtype=jnp.float32,
    )

"""Piecewise-polynomial fit of the 3D finger contact surface in WORLD coords.

The contact surface is the convex-hull ENVELOPE of the finger's slab
decomposition (geom/envelope3d.py) — piecewise planar with its dominant
ridges on the 12 x-slab boundaries and the mid-z split of the 12x2
decomposition. The fit grid mirrors that structure exactly: one
cubic-in-x x quadratic-in-z polynomial per (x-slab, z-slab) CELL, so no
polynomial ever straddles a dominant ridge. (An earlier 8-x-segment,
full-z fit straddled both ridge families and cut 1-2 mm below the crests
— measured p99 3.5-4.3 mm — which made the kernel miss marginal
late-onset grips, e.g. suite case 27.) Remaining interior facet ridges
have near-tangent slope jumps; measured residuals after the split are
below contact tolerance (tests/test_pallas3d.py).

Evaluation stays the same segment-select + Horner pattern the 2D Pallas
kernel uses — no gathers, no basis recursion in the hot loop — with the
flattened cell index ``seg = xseg * NZ_SEG + zseg``.
"""

from __future__ import annotations

import numpy as np

from dgdm_tpu.core.config import GRIPPER_3D
from dgdm_tpu.geom.spline import gripper3d_surface

N_SEG = 12      # x cells, aligned to the 12 envelope slab boundaries
NZ_SEG = 2      # z cells, aligned to the 12x2 decomposition's mid-z split
TOT_SEG = N_SEG * NZ_SEG
DEG_X, DEG_Z = 3, 2


def _cell_samples(samples_per_seg: int, samples_z: int):
    """Per-cell local sample offsets (t, s) and world sample grids."""
    g = GRIPPER_3D
    h = (g.ctrl_x_max - g.ctrl_x_min) / N_SEG
    hz = (g.ctrl_z_max - g.ctrl_z_min) / NZ_SEG
    t = np.linspace(0.0, h, samples_per_seg)
    s = np.linspace(0.0, hz, samples_z)
    xs, zs = [], []
    for xseg in range(N_SEG):
        for zseg in range(NZ_SEG):
            xs.append(g.ctrl_x_min + xseg * h + t)
            zs.append(g.ctrl_z_min + zseg * hz + s)
    return h, hz, t, s, np.asarray(xs), np.asarray(zs)


def fit_surface_batch(y_ctrls: np.ndarray, samples_per_seg: int = 12,
                      samples_z: int = 9, sides=None) -> np.ndarray:
    """(B, 21) or (B, 7, 3) -> (B, TOT_SEG, DEG_X+1, DEG_Z+1) in ONE
    vectorized surface evaluation + one einsum (scene-building hot path).

    ``sides`` (len B, 'upper'/'lower') switches each row to the hull-
    envelope contact surface when engine3d.CONTACT_SURFACE_3D='envelope'
    (the left jaw's inner face points +y -> 'upper'; right -> 'lower').

    ``y(x, z) = sum_{a,b} C[seg, a, b] * t^a * s^b`` with
    seg = xseg * NZ_SEG + zseg, t = x - cell_x0, s = z - cell_z0."""
    import jax
    import jax.numpy as jnp

    g = GRIPPER_3D
    ycs = np.asarray(y_ctrls).reshape(-1, g.nu, g.nv)
    h, hz, t, s, xs, zs = _cell_samples(samples_per_seg, samples_z)
    # world sample grid per cell: (TOT_SEG, samples_per_seg, samples_z)
    gx = np.broadcast_to(xs[:, :, None],
                         (TOT_SEG, samples_per_seg, samples_z))
    gz = np.broadcast_to(zs[:, None, :],
                         (TOT_SEG, samples_per_seg, samples_z))
    from dgdm_tpu.sim import engine3d as _e3

    if _e3.CONTACT_SURFACE_3D == "envelope" and sides is not None:
        from dgdm_tpu.geom.envelope3d import finger_envelope

        vals = np.stack([
            finger_envelope(yc, gx.reshape(-1), gz.reshape(-1),
                            side=sides[k])[0]
            for k, yc in enumerate(ycs.reshape(len(ycs), -1))
        ]).reshape(len(ycs), TOT_SEG, samples_per_seg * samples_z)
    else:
        surf = gripper3d_surface()
        fx = jnp.asarray(gx.reshape(-1), jnp.float32)
        fz = jnp.asarray(gz.reshape(-1), jnp.float32)
        vals = np.asarray(
            jax.jit(jax.vmap(lambda yc: surf.height(yc, fx, fz)))(
                jnp.asarray(ycs, jnp.float32)
            )
        ).reshape(len(ycs), TOT_SEG, samples_per_seg * samples_z)
    # the design matrix is identical for every cell: precompute its pinv
    tt = np.tile(t[:, None], (1, samples_z)).reshape(-1)
    ss = np.tile(s[None, :], (samples_per_seg, 1)).reshape(-1)
    cols = [tt**a * ss**b for a in range(DEG_X + 1) for b in range(DEG_Z + 1)]
    pinv = np.linalg.pinv(np.stack(cols, -1))
    return np.einsum("cn,bsn->bsc", pinv, vals).reshape(
        len(ycs), TOT_SEG, DEG_X + 1, DEG_Z + 1
    )


def fit_surface(y_ctrl: np.ndarray, samples_per_seg: int = 12,
                samples_z: int = 9) -> np.ndarray:
    """Single smooth-sheet fit: (21,) -> (TOT_SEG, DEG_X+1, DEG_Z+1)."""
    return fit_surface_batch(np.asarray(y_ctrl)[None], samples_per_seg,
                             samples_z, sides=None)[0]


def eval_fit(coefs: np.ndarray, x: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Reference numpy evaluation (for tests)."""
    g = GRIPPER_3D
    h = (g.ctrl_x_max - g.ctrl_x_min) / N_SEG
    hz = (g.ctrl_z_max - g.ctrl_z_min) / NZ_SEG
    xseg = np.clip(((x - g.ctrl_x_min) / h).astype(int), 0, N_SEG - 1)
    zseg = np.clip(((z - g.ctrl_z_min) / hz).astype(int), 0, NZ_SEG - 1)
    seg = xseg * NZ_SEG + zseg
    t = x - (g.ctrl_x_min + xseg * h)
    s = z - (g.ctrl_z_min + zseg * hz)
    c = coefs[seg]                                 # (..., 4, 3)
    out = np.zeros_like(x, dtype=np.float64)
    for a in range(DEG_X, -1, -1):
        row = np.zeros_like(x, dtype=np.float64)
        for b in range(DEG_Z, -1, -1):
            row = row * s + c[..., a, b]
        out = out * t + row
    return out

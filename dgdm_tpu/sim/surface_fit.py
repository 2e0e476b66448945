"""Piecewise-polynomial fit of the 3D finger surface in WORLD coordinates.

The B-spline surface is polynomial in its (u, v) parameters, but the contact
engine needs y as a function of (x, z). Composing with the (mildly nonlinear)
inverse map u(x) breaks exact polynomial structure, so we least-squares fit
y(x, z) per x-segment as cubic-in-x x quadratic-in-z. With 6 uniform x
segments the fit error is far below contact tolerances (tested < 2e-5 m),
and evaluation becomes the same segment-select + Horner pattern the 2D Pallas
kernel uses — no gathers, no basis recursion in the hot loop.
"""

from __future__ import annotations

import numpy as np

from dgdm_tpu.core.config import GRIPPER_3D
from dgdm_tpu.geom.spline import gripper3d_surface

N_SEG = 8
DEG_X, DEG_Z = 3, 2


def fit_surface(y_ctrl: np.ndarray, samples_per_seg: int = 12,
                samples_z: int = 9) -> np.ndarray:
    """y_ctrl (21,) or (7, 3) -> coefficients (N_SEG, DEG_X+1, DEG_Z+1).

    ``y(x, z) = sum_{a,b} C[seg, a, b] * t^a * s^b`` with
    t = x - seg_start, s = z - z0."""
    import jax
    import jax.numpy as jnp

    g = GRIPPER_3D
    surf = gripper3d_surface()
    yc = jnp.asarray(np.asarray(y_ctrl).reshape(g.nu, g.nv), jnp.float32)
    h = (g.ctrl_x_max - g.ctrl_x_min) / N_SEG
    zs = np.linspace(g.ctrl_z_min, g.ctrl_z_max, samples_z)
    # one jitted evaluation of all samples across all segments
    xs_all = np.concatenate(
        [
            g.ctrl_x_min + seg * h + np.linspace(0, h, samples_per_seg)
            for seg in range(N_SEG)
        ]
    )
    gx, gz = np.meshgrid(xs_all, zs, indexing="ij")
    vals_all = np.asarray(
        jax.jit(surf.height)(
            yc,
            jnp.asarray(gx.reshape(-1), jnp.float32),
            jnp.asarray(gz.reshape(-1), jnp.float32),
        )
    ).reshape(N_SEG, samples_per_seg, samples_z)

    # the design matrix is identical for every segment: precompute its pinv
    t = np.tile(np.linspace(0, h, samples_per_seg)[:, None],
                (1, samples_z)).reshape(-1)
    s = np.tile(zs[None, :] - g.ctrl_z_min, (samples_per_seg, 1)).reshape(-1)
    cols = [t**a * s**b for a in range(DEG_X + 1) for b in range(DEG_Z + 1)]
    pinv = np.linalg.pinv(np.stack(cols, -1))
    coefs = np.einsum(
        "cn,sn->sc", pinv, vals_all.reshape(N_SEG, -1)
    ).reshape(N_SEG, DEG_X + 1, DEG_Z + 1)
    return coefs


def fit_surface_batch(y_ctrls: np.ndarray, samples_per_seg: int = 12,
                      samples_z: int = 9, sides=None) -> np.ndarray:
    """(B, 21) or (B, 7, 3) -> (B, N_SEG, DEG_X+1, DEG_Z+1) in ONE jitted
    vmapped surface evaluation + one einsum (scene-building hot path).

    ``sides`` (len B, 'upper'/'lower') switches each row to the hull-
    envelope contact surface when engine3d.CONTACT_SURFACE_3D='envelope'
    (the left jaw's inner face points +y -> 'upper'; right -> 'lower')."""
    import jax
    import jax.numpy as jnp

    g = GRIPPER_3D
    surf = gripper3d_surface()
    ycs = jnp.asarray(
        np.asarray(y_ctrls).reshape(-1, g.nu, g.nv), jnp.float32
    )
    h = (g.ctrl_x_max - g.ctrl_x_min) / N_SEG
    zs = np.linspace(g.ctrl_z_min, g.ctrl_z_max, samples_z)
    xs_all = np.concatenate(
        [
            g.ctrl_x_min + seg * h + np.linspace(0, h, samples_per_seg)
            for seg in range(N_SEG)
        ]
    )
    gx, gz = np.meshgrid(xs_all, zs, indexing="ij")
    from dgdm_tpu.sim import engine3d as _e3

    if _e3.CONTACT_SURFACE_3D == "envelope" and sides is not None:
        from dgdm_tpu.geom.envelope3d import finger_envelope

        vals = np.stack([
            finger_envelope(np.asarray(yc), gx.reshape(-1), gz.reshape(-1),
                            side=sides[k])[0]
            for k, yc in enumerate(np.asarray(y_ctrls).reshape(len(ycs), -1))
        ]).reshape(len(ycs), N_SEG, samples_per_seg * samples_z)
    else:
        fx = jnp.asarray(gx.reshape(-1), jnp.float32)
        fz = jnp.asarray(gz.reshape(-1), jnp.float32)
        vals = np.asarray(
            jax.jit(jax.vmap(lambda yc: surf.height(yc, fx, fz)))(ycs)
        ).reshape(len(ycs), N_SEG, samples_per_seg * samples_z)
    t = np.tile(np.linspace(0, h, samples_per_seg)[:, None],
                (1, samples_z)).reshape(-1)
    s = np.tile(zs[None, :] - g.ctrl_z_min, (samples_per_seg, 1)).reshape(-1)
    cols = [t**a * s**b for a in range(DEG_X + 1) for b in range(DEG_Z + 1)]
    pinv = np.linalg.pinv(np.stack(cols, -1))
    return np.einsum("cn,bsn->bsc", pinv, vals).reshape(
        len(ycs), N_SEG, DEG_X + 1, DEG_Z + 1
    )


def eval_fit(coefs: np.ndarray, x: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Reference numpy evaluation (for tests)."""
    g = GRIPPER_3D
    h = (g.ctrl_x_max - g.ctrl_x_min) / N_SEG
    seg = np.clip(((x - g.ctrl_x_min) / h).astype(int), 0, N_SEG - 1)
    t = x - (g.ctrl_x_min + seg * h)
    s = z - g.ctrl_z_min
    c = coefs[seg]                                 # (..., 4, 3)
    out = np.zeros_like(x, dtype=np.float64)
    for a in range(DEG_X, -1, -1):
        row = np.zeros_like(x, dtype=np.float64)
        for b in range(DEG_Z, -1, -1):
            row = row * s + c[..., a, b]
        out = out * t + row
    return out

"""Convex-hull contact envelopes of the 3D finger surface.

The reference never contacts the smooth B-spline sheet: fingers are
V-HACD-decomposed into convex hulls (``sim/sim_3d.py:25-70``, ``-h 32``),
and MuJoCo contacts the HULLS — whose faces bridge every concavity of the
sheet with planar chords. Measured on suite grippers (round 3): a 12-slab
full-z decomposition overfills by 4-5.5 mm mean; 12x2 / 12x3 patch
decompositions (24 / 36 hulls, bracketing V-HACD's 32-hull budget) are
0.9-1.9 mm. Those millimeters decide late-onset contacts: grips that barely
reach snap in MuJoCo but miss entirely against the smooth sheet.

This module evaluates the per-patch convex envelope (height + slopes) so
the engine/kernel contact surfaces can model the decomposed finger exactly
like the oracle's (mean over the two suite decompositions by default).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

# The decomposition the engine/kernel CONTACT. Round-3 refinement: model ONE
# decomposition exactly (12x2 = 24 hulls, the V-HACD -h 32 budget) rather
# than the mean of two — contact onset is a threshold phenomenon, so a
# mean-of-envelopes surface reproduces NEITHER sim's marginal grips (measured
# on suite case 27: the mean surface contacts ~20 steps late and rotates
# 0.007 where both per-decomposition oracles rotate 0.021). The 12x3 build
# stays in the suite as the cross-decomposition ceiling.
DEFAULT_DECOMPS: Tuple[Tuple[int, int], ...] = ((12, 2),)


def _patch_upper_facets(sheet: np.ndarray):
    """Upper-y facet planes of hull(sheet): rows (nx, ny, nz, off) with
    ny > 0 and plane eval y = (-off - nx x - nz z)/ny. Falls back to the
    least-squares plane for (near-)degenerate patches."""
    from scipy.spatial import ConvexHull, QhullError

    try:
        eqs = ConvexHull(sheet).equations
        up = eqs[eqs[:, 1] > 1e-9]
        if len(up):
            return up
    except QhullError:
        pass
    # planar patch: single fitted plane
    a = np.stack([sheet[:, 0], sheet[:, 2], np.ones(len(sheet))], -1)
    cx, cz, c0 = np.linalg.lstsq(a, sheet[:, 1], rcond=None)[0]
    # y = cx x + cz z + c0  ->  (-cx) x + 1 y + (-cz) z + (-c0) = 0
    return np.asarray([[-cx, 1.0, -cz, -c0]])


def _envelope_one(y_ctrl: np.ndarray, qx: np.ndarray, qz: np.ndarray,
                  nx_slabs: int, nz_slabs: int, sample_size: int):
    """Upper envelope (height, dy/dx, dy/dz) of one decomposition."""
    from dgdm_tpu.sim.oracle3d import _surface_grid

    grid = _surface_grid(np.asarray(y_ctrl), sample_size)   # (S, S, 3)
    bx = np.linspace(0, sample_size - 1, nx_slabs + 1).astype(int)
    bz = np.linspace(0, sample_size - 1, nz_slabs + 1).astype(int)
    y_env = np.full(qx.shape, -np.inf)
    sx = np.zeros_like(qx)
    sz = np.zeros_like(qx)
    for i in range(nx_slabs):
        for j in range(nz_slabs):
            sheet = grid[bx[i]: bx[i + 1] + 1,
                         bz[j]: bz[j + 1] + 1].reshape(-1, 3)
            up = _patch_upper_facets(sheet)
            ys = (
                -up[:, 3][None, :]
                - up[:, 0][None, :] * qx[:, None]
                - up[:, 2][None, :] * qz[:, None]
            ) / up[:, 1][None, :]
            k = np.argmin(ys, 1)
            y_here = ys[np.arange(len(qx)), k]
            inside = (
                (qx >= sheet[:, 0].min() - 1e-9)
                & (qx <= sheet[:, 0].max() + 1e-9)
                & (qz >= sheet[:, 2].min() - 1e-9)
                & (qz <= sheet[:, 2].max() + 1e-9)
            )
            take = inside & (y_here > y_env)
            y_env = np.where(take, y_here, y_env)
            nrm = up[k]
            sx = np.where(take, -nrm[:, 0] / nrm[:, 1], sx)
            sz = np.where(take, -nrm[:, 2] / nrm[:, 1], sz)
    return y_env, sx, sz


def finger_envelope(
    y_ctrl: np.ndarray,
    qx: np.ndarray,
    qz: np.ndarray,
    side: str,
    decomps: Sequence[Tuple[int, int]] = DEFAULT_DECOMPS,
    sample_size: int = 25,
):
    """Decomposition-mean hull-envelope height + slopes at (qx, qz).

    side='upper' for the LEFT finger (inner face points +y),
    side='lower' for the RIGHT (inner face points -y; the lower envelope is
    computed as the negated upper envelope of the negated sheet)."""
    qx = np.asarray(qx, np.float64).reshape(-1)
    qz = np.asarray(qz, np.float64).reshape(-1)
    yc = np.asarray(y_ctrl, np.float64)
    sgn = 1.0 if side == "upper" else -1.0
    hs, xs, zs = [], [], []
    for nx_s, nz_s in decomps:
        h, sx, sz = _envelope_one(sgn * yc, qx, qz, nx_s, nz_s, sample_size)
        hs.append(sgn * h)
        xs.append(sgn * sx)
        zs.append(sgn * sz)
    return (np.mean(hs, 0), np.mean(xs, 0), np.mean(zs, 0))

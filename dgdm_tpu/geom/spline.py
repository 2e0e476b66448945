"""Spline evaluation as linear algebra, built for XLA.

The reference evaluates finger geometry through scipy/geomdl on the host
(``assets/finger_sampler.py:7-50`` uses ``scipy.interpolate.CubicSpline`` with
its default not-a-knot boundary conditions; ``assets/finger_3d.py:13-67`` uses
a geomdl B-spline surface, degree (3, 2), clamped uniform knots). Both
constructions are *linear in the control values*, so here every curve/surface
evaluation is a precomputed basis matrix applied to control points:

- dense sampling (the 200-point finger curve, the 25x25 surface grid) is a
  single matmul,
- evaluation at runtime-varying abscissae (contact points inside the physics
  engine) is a static segment lookup + Horner polynomial, fully vmappable.

All precomputation happens once at import in float64 numpy; the resulting
operators are small constants baked into the jitted programs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Not-a-knot cubic spline on a uniform grid (matches scipy.CubicSpline default)
# ---------------------------------------------------------------------------


def _cubic_moment_operator(n: int) -> np.ndarray:
    """Return M (n, n) mapping values y -> second derivatives at the knots for
    a not-a-knot cubic spline on a uniform grid with unit spacing."""
    a = np.zeros((n, n))
    b = np.zeros((n, n))
    # interior continuity of first derivative:
    #   m[i-1] + 4 m[i] + m[i+1] = 6 (y[i-1] - 2 y[i] + y[i+1])
    for i in range(1, n - 1):
        a[i, i - 1 : i + 2] = (1.0, 4.0, 1.0)
        b[i, i - 1 : i + 2] = (6.0, -12.0, 6.0)
    # not-a-knot: third derivative continuous across the 2nd and (n-1)th knot
    a[0, 0:3] = (1.0, -2.0, 1.0)
    a[-1, -3:] = (1.0, -2.0, 1.0)
    return np.linalg.solve(a, b)


def cubic_coef_operator(n: int, x0: float, x1: float) -> np.ndarray:
    """Operator C of shape (n-1, 4, n): per-segment cubic coefficients
    (value, d1, d2, d3 in the local variable t = x - x_seg) as a linear map of
    the n knot values. ``poly(t) = c0 + c1 t + c2 t^2 + c3 t^3``."""
    h = (x1 - x0) / (n - 1)
    m = _cubic_moment_operator(n) / h**2          # moments per unit y
    eye = np.eye(n)
    c = np.zeros((n - 1, 4, n))
    for i in range(n - 1):
        yi, yi1 = eye[i], eye[i + 1]
        mi, mi1 = m[i], m[i + 1]
        c[i, 0] = yi
        c[i, 1] = (yi1 - yi) / h - h * (2.0 * mi + mi1) / 6.0
        c[i, 2] = mi / 2.0
        c[i, 3] = (mi1 - mi) / (6.0 * h)
    return c


def cubic_basis_matrix(n: int, x0: float, x1: float, xq: np.ndarray) -> np.ndarray:
    """Dense basis B (len(xq), n) with curve(xq) = B @ y."""
    c = cubic_coef_operator(n, x0, x1)            # (n-1, 4, n)
    h = (x1 - x0) / (n - 1)
    seg = np.clip(((xq - x0) / h).astype(np.int64), 0, n - 2)
    t = xq - (x0 + seg * h)
    powers = np.stack([np.ones_like(t), t, t * t, t**3], axis=-1)  # (q, 4)
    return np.einsum("qk,qkn->qn", powers, c[seg])


class CubicSpline1D:
    """Not-a-knot cubic spline on a fixed uniform grid, evaluated in JAX.

    Control values may carry arbitrary leading batch dims: ``coefs`` maps
    ``y (..., n) -> (..., n-1, 4)``.
    """

    def __init__(self, n: int, x0: float, x1: float):
        self.n, self.x0, self.x1 = n, x0, x1
        self.h = (x1 - x0) / (n - 1)
        self._coef_op = jnp.asarray(
            cubic_coef_operator(n, x0, x1), dtype=jnp.float32
        )  # (n-1, 4, n)

    def coefs(self, y: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("skn,...n->...sk", self._coef_op, y, precision="highest")

    def _local(self, coefs: jnp.ndarray, x: jnp.ndarray):
        """Select per-query segment coefficients via one-hot contraction
        (only n-1 = 6 segments: cheaper and more fusion-friendly on TPU than
        a gather). coefs: B + (n-1, 4); x: B + (Q,)."""
        import jax

        scalar = x.ndim == coefs.ndim - 2
        if scalar:
            x = x[..., None]
        seg = jnp.clip(((x - self.x0) / self.h).astype(jnp.int32), 0, self.n - 2)
        t = x - (self.x0 + seg * self.h)
        oh = jax.nn.one_hot(seg, self.n - 1, dtype=coefs.dtype)   # B+(Q, S)
        c = jnp.einsum("...qs,...sk->...qk", oh, coefs, precision="highest")
        return c, t, scalar

    def evaluate(self, coefs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """coefs: B + (n-1, 4); x: B + (Q,) (or B-shaped scalar) -> values."""
        c, t, scalar = self._local(coefs, x)
        out = ((c[..., 3] * t + c[..., 2]) * t + c[..., 1]) * t + c[..., 0]
        return out[..., 0] if scalar else out

    def evaluate_with_derivative(self, coefs: jnp.ndarray, x: jnp.ndarray):
        """(value, derivative) sharing one coefficient selection — the hot
        path of the contact engine."""
        c, t, scalar = self._local(coefs, x)
        val = ((c[..., 3] * t + c[..., 2]) * t + c[..., 1]) * t + c[..., 0]
        der = (3.0 * c[..., 3] * t + 2.0 * c[..., 2]) * t + c[..., 1]
        if scalar:
            return val[..., 0], der[..., 0]
        return val, der

    def derivative(self, coefs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        c, t, scalar = self._local(coefs, x)
        out = (3.0 * c[..., 3] * t + 2.0 * c[..., 2]) * t + c[..., 1]
        return out[..., 0] if scalar else out

    def basis(self, xq: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(
            cubic_basis_matrix(self.n, self.x0, self.x1, np.asarray(xq)),
            dtype=jnp.float32,
        )


# ---------------------------------------------------------------------------
# Clamped uniform B-spline basis (matches geomdl generate_knot_vector)
# ---------------------------------------------------------------------------


def clamped_knot_vector(degree: int, num_ctrl: int) -> np.ndarray:
    """Clamped, internally-uniform knot vector on [0, 1]."""
    interior = num_ctrl - degree - 1
    mids = (np.arange(1, interior + 1)) / (interior + 1)
    return np.concatenate(
        [np.zeros(degree + 1), mids, np.ones(degree + 1)]
    )


def bspline_basis(degree: int, knots: np.ndarray, num_ctrl: int, u: np.ndarray) -> np.ndarray:
    """Cox-de Boor evaluation of all basis functions: (len(u), num_ctrl)."""
    u = np.asarray(u, dtype=np.float64)
    # zeroth degree
    n = np.zeros((len(u), len(knots) - 1))
    for i in range(len(knots) - 1):
        n[:, i] = np.where((u >= knots[i]) & (u < knots[i + 1]), 1.0, 0.0)
    # right-end closure
    last = np.max(np.where(knots < knots[-1])[0])
    n[u >= knots[-1], last] = 1.0
    for d in range(1, degree + 1):
        new = np.zeros((len(u), len(knots) - 1 - d))
        for i in range(len(knots) - 1 - d):
            den1 = knots[i + d] - knots[i]
            den2 = knots[i + d + 1] - knots[i + 1]
            t1 = np.where(den1 > 0, (u - knots[i]) / np.where(den1 > 0, den1, 1.0), 0.0)
            t2 = np.where(
                den2 > 0, (knots[i + d + 1] - u) / np.where(den2 > 0, den2, 1.0), 0.0
            )
            new[:, i] = t1 * n[:, i] + t2 * n[:, i + 1]
        n = new
    return n[:, :num_ctrl]


def _piecewise_poly_from_basis(
    degree: int, knots: np.ndarray, num_ctrl: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Exactly convert the B-spline basis to per-segment polynomials.

    Returns (breaks (s+1,), P (s, degree+1, num_ctrl)) with
    ``N_i(u) = sum_k P[seg, k, i] * (u - breaks[seg])**k``.
    """
    breaks = np.unique(knots)
    segs = len(breaks) - 1
    p = np.zeros((segs, degree + 1, num_ctrl))
    for s in range(segs):
        lo, hi = breaks[s], breaks[s + 1]
        # sample degree+1 points strictly inside the segment; a degree-d
        # polynomial is determined exactly
        ts = lo + (hi - lo) * (np.arange(degree + 1) + 0.5) / (degree + 1)
        vals = bspline_basis(degree, knots, num_ctrl, ts)   # (d+1, n)
        vander = np.vander(ts - lo, degree + 1, increasing=True)
        p[s] = np.linalg.solve(vander, vals)
    return breaks, p


class BSplineSurfaceY:
    """B-spline surface y(u, v) over a fixed (x, z) control lattice.

    The 3D finger surface (reference ``assets/finger_3d.py:13-36``) has control
    x = linspace(x0, x1, nu) and z = linspace(z0, z1, nv) fixed; only the 21 y
    values vary. This class exposes:

    - ``grid_basis``: (S*S, nu*nv) operator reproducing geomdl's evalpts grid,
    - ``height(y_ctrl, x, z)``: surface y at arbitrary (x, z) — the contact
      heightfield — via precomputed u(x), v(z) inverse lookup tables,
    - ``grad``: surface slope (dy/dx, dy/dz) for contact normals.
    """

    LUT_SIZE = 1024

    def __init__(self, nu: int, nv: int, degree_u: int, degree_v: int,
                 x0: float, x1: float, z0: float, z1: float):
        self.nu, self.nv = nu, nv
        self.x0, self.x1, self.z0, self.z1 = x0, x1, z0, z1
        ku = clamped_knot_vector(degree_u, nu)
        kv = clamped_knot_vector(degree_v, nv)
        self._breaks_u, pu = _piecewise_poly_from_basis(degree_u, ku, nu)
        self._breaks_v, pv = _piecewise_poly_from_basis(degree_v, kv, nv)
        self._pu = jnp.asarray(pu, dtype=jnp.float32)   # (su, du+1, nu)
        self._pv = jnp.asarray(pv, dtype=jnp.float32)   # (sv, dv+1, nv)
        self.du, self.dv = degree_u, degree_v
        self._ku, self._kv = ku, kv

        # u(x), v(z) inverse LUTs. x(u) = sum_i N_i(u) * x_i is monotone.
        xs = np.linspace(x0, x1, nu)
        zs = np.linspace(z0, z1, nv)
        uu = np.linspace(0.0, 1.0, 200001)
        x_of_u = bspline_basis(degree_u, ku, nu, uu) @ xs
        z_of_v = bspline_basis(degree_v, kv, nv, np.linspace(0, 1, 200001)) @ zs
        x_grid = np.linspace(x0, x1, self.LUT_SIZE)
        z_grid = np.linspace(z0, z1, self.LUT_SIZE)
        self._u_lut = jnp.asarray(
            np.interp(x_grid, x_of_u, uu), dtype=jnp.float32
        )
        self._v_lut = jnp.asarray(
            np.interp(z_grid, z_of_v, np.linspace(0, 1, 200001)), dtype=jnp.float32
        )

    # -- host-side dense operators ------------------------------------------

    def grid_basis(self, sample_size: int) -> jnp.ndarray:
        """(S*S, nu*nv) operator: surface y values on geomdl's uniform
        (u, v) grid, ordered u-major like geomdl evalpts."""
        uu = np.linspace(0.0, 1.0, sample_size)
        bu = bspline_basis(self.du, self._ku, self.nu, uu)   # (S, nu)
        bv = bspline_basis(self.dv, self._kv, self.nv, uu)   # (S, nv)
        full = np.einsum("ai,bj->abij", bu, bv).reshape(
            sample_size * sample_size, self.nu * self.nv
        )
        return jnp.asarray(full, dtype=jnp.float32)

    # -- jit-friendly evaluation ---------------------------------------------

    def _param_of(self, lut: jnp.ndarray, lo: float, hi: float, q: jnp.ndarray):
        f = (q - lo) / (hi - lo) * (self.LUT_SIZE - 1)
        f = jnp.clip(f, 0.0, self.LUT_SIZE - 1.0)
        i0 = jnp.clip(f.astype(jnp.int32), 0, self.LUT_SIZE - 2)
        w = f - i0
        return lut[i0] * (1.0 - w) + lut[i0 + 1] * w

    def _basis_1d(self, p: jnp.ndarray, breaks: np.ndarray, t: jnp.ndarray,
                  deriv: bool):
        """Evaluate all basis funcs (or derivatives) at parameter t (...,)."""
        br = jnp.asarray(breaks[:-1], dtype=jnp.float32)
        seg = jnp.clip(
            jnp.searchsorted(br, t, side="right") - 1, 0, len(breaks) - 2
        )
        tt = t - br[seg]
        coef = p[seg]                                   # (..., d+1, n)
        deg = coef.shape[-2] - 1
        if deriv:
            out = coef[..., deg, :] * deg
            for k in range(deg - 1, 0, -1):
                out = out * tt[..., None] + coef[..., k, :] * k
        else:
            out = coef[..., deg, :]
            for k in range(deg - 1, -1, -1):
                out = out * tt[..., None] + coef[..., k, :]
        return out                                      # (..., n)

    def height(self, y_ctrl: jnp.ndarray, x: jnp.ndarray, z: jnp.ndarray):
        """y_ctrl (..., nu, nv); x, z (...,) -> surface y."""
        u = self._param_of(self._u_lut, self.x0, self.x1, x)
        v = self._param_of(self._v_lut, self.z0, self.z1, z)
        bu = self._basis_1d(self._pu, self._breaks_u, u, False)   # (..., nu)
        bv = self._basis_1d(self._pv, self._breaks_v, v, False)   # (..., nv)
        return jnp.einsum("...i,...ij,...j->...", bu, y_ctrl, bv, precision="highest")

    def slopes(self, y_ctrl: jnp.ndarray, x: jnp.ndarray, z: jnp.ndarray):
        """Approximate (dy/dx, dy/dz) using d(param)/d(coord) from the LUT
        grids (the param maps are near-affine)."""
        u = self._param_of(self._u_lut, self.x0, self.x1, x)
        v = self._param_of(self._v_lut, self.z0, self.z1, z)
        bu = self._basis_1d(self._pu, self._breaks_u, u, False)
        bv = self._basis_1d(self._pv, self._breaks_v, v, False)
        dbu = self._basis_1d(self._pu, self._breaks_u, u, True)
        dbv = self._basis_1d(self._pv, self._breaks_v, v, True)
        dy_du = jnp.einsum("...i,...ij,...j->...", dbu, y_ctrl, bv, precision="highest")
        dy_dv = jnp.einsum("...i,...ij,...j->...", bu, y_ctrl, dbv, precision="highest")
        # chain rule through the (monotone) param maps, finite-diff the LUTs
        eps_x = (self.x1 - self.x0) / (self.LUT_SIZE - 1)
        eps_z = (self.z1 - self.z0) / (self.LUT_SIZE - 1)
        du_dx = (
            self._param_of(self._u_lut, self.x0, self.x1, x + eps_x)
            - self._param_of(self._u_lut, self.x0, self.x1, x - eps_x)
        ) / (2 * eps_x)
        dv_dz = (
            self._param_of(self._v_lut, self.z0, self.z1, z + eps_z)
            - self._param_of(self._v_lut, self.z0, self.z1, z - eps_z)
        ) / (2 * eps_z)
        return dy_du * du_dx, dy_dv * dv_dz


@functools.lru_cache(maxsize=None)
def gripper2d_spline() -> CubicSpline1D:
    from dgdm_tpu.core.config import GRIPPER_2D as g

    return CubicSpline1D(g.num_ctrl, g.ctrl_x_min, g.ctrl_x_max)


@functools.lru_cache(maxsize=None)
def gripper3d_surface() -> BSplineSurfaceY:
    from dgdm_tpu.core.config import GRIPPER_3D as g

    return BSplineSurfaceY(
        g.nu, g.nv, g.degree_u, g.degree_v,
        g.ctrl_x_min, g.ctrl_x_max, g.ctrl_z_min, g.ctrl_z_max,
    )

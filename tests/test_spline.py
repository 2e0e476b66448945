"""Spline parity tests against scipy (the reference's host-side evaluators)."""

import numpy as np
import pytest
import scipy.interpolate as si

from dgdm_tpu.core.config import GRIPPER_2D, GRIPPER_3D
from dgdm_tpu.geom.spline import (
    BSplineSurfaceY,
    CubicSpline1D,
    bspline_basis,
    clamped_knot_vector,
    cubic_basis_matrix,
    gripper2d_spline,
    gripper3d_surface,
)


def test_cubic_matches_scipy_not_a_knot():
    rng = np.random.RandomState(0)
    x = np.linspace(-0.12, 0.12, 7)
    for _ in range(5):
        y = rng.uniform(-0.045, 0.015, size=7)
        ref = si.CubicSpline(x, y)  # default bc_type='not-a-knot'
        xq = np.linspace(-0.12, 0.12, 200)
        b = cubic_basis_matrix(7, -0.12, 0.12, xq)
        np.testing.assert_allclose(b @ y, ref(xq), atol=1e-10)


def test_cubic_jax_eval_and_derivative():
    rng = np.random.RandomState(1)
    sp = CubicSpline1D(7, -0.12, 0.12)
    y = rng.uniform(-0.045, 0.015, size=(3, 7)).astype(np.float32)
    coefs = sp.coefs(y)
    xq = rng.uniform(-0.12, 0.12, size=(3, 50)).astype(np.float32)
    got = sp.evaluate(coefs, xq)
    dgot = sp.derivative(coefs, xq)
    for i in range(3):
        ref = si.CubicSpline(np.linspace(-0.12, 0.12, 7), y[i])
        np.testing.assert_allclose(got[i], ref(xq[i]), atol=2e-6)
        np.testing.assert_allclose(dgot[i], ref(xq[i], 1), atol=2e-4)


def test_cubic_eval_outside_domain_extrapolates():
    sp = CubicSpline1D(7, -0.12, 0.12)
    y = np.linspace(0.0, 0.06, 7).astype(np.float32)
    coefs = sp.coefs(y)
    ref = si.CubicSpline(np.linspace(-0.12, 0.12, 7), y)
    for xq in (-0.15, 0.15):
        np.testing.assert_allclose(
            float(sp.evaluate(coefs, np.float32(xq))), ref(xq), atol=1e-5
        )


def test_bspline_basis_matches_scipy():
    deg, n = 3, 7
    knots = clamped_knot_vector(deg, n)
    u = np.linspace(0, 1, 101)
    ours = bspline_basis(deg, knots, n, u)
    for i in range(n):
        c = np.zeros(n)
        c[i] = 1.0
        ref = si.BSpline(knots, c, deg)(u)
        np.testing.assert_allclose(ours[:, i], ref, atol=1e-12)


def test_bspline_partition_of_unity():
    for deg, n in [(3, 7), (2, 3)]:
        knots = clamped_knot_vector(deg, n)
        u = np.linspace(0, 1, 57)
        b = bspline_basis(deg, knots, n, u)
        np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-12)


def _ref_surface(y_ctrl):
    """scipy tensor-product reference for the 7x3 deg-(3,2) surface."""
    g = GRIPPER_3D
    ku = clamped_knot_vector(3, 7)
    kv = clamped_knot_vector(2, 3)

    def eval_uv(u, v):
        bu = np.stack(
            [si.BSpline(ku, np.eye(7)[i], 3)(u) for i in range(7)], -1
        )
        bv = np.stack(
            [si.BSpline(kv, np.eye(3)[i], 2)(v) for i in range(3)], -1
        )
        return np.einsum("...i,ij,...j->...", bu, y_ctrl, bv)

    return eval_uv


def test_surface_grid_matches_scipy():
    rng = np.random.RandomState(2)
    surf = gripper3d_surface()
    y = rng.uniform(-0.1, 0.0, size=(7, 3))
    eval_uv = _ref_surface(y)
    s = 25
    uu = np.linspace(0, 1, s)
    grid = np.asarray(surf.grid_basis(s)) @ y.reshape(-1)
    ref = eval_uv(
        np.repeat(uu, s), np.tile(uu, s)
    )
    np.testing.assert_allclose(grid, ref, atol=1e-5)


def test_surface_heightfield_inverse_maps():
    """height(y, x, z) must equal the surface y at the (u, v) where the
    surface x and z coordinates equal the queried x, z."""
    rng = np.random.RandomState(3)
    surf = gripper3d_surface()
    y = rng.uniform(-0.1, 0.0, size=(7, 3)).astype(np.float32)
    eval_uv = _ref_surface(y)
    xs = np.linspace(-0.12, 0.12, 7)
    zs = np.linspace(0.0, 0.12, 3)
    ku = clamped_knot_vector(3, 7)
    uu = np.linspace(0, 1, 20001)
    x_of_u = bspline_basis(3, ku, 7, uu) @ xs
    xq = rng.uniform(-0.118, 0.118, size=64)
    zq = rng.uniform(0.001, 0.119, size=64)
    u_true = np.interp(xq, x_of_u, uu)
    v_true = zq / 0.12  # z(v) is exactly linear for equispaced ctrl z
    ref = eval_uv(u_true, v_true)
    got = np.asarray(surf.height(y, xq.astype(np.float32), zq.astype(np.float32)))
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_surface_slopes_finite_difference():
    rng = np.random.RandomState(4)
    surf = gripper3d_surface()
    y = rng.uniform(-0.1, 0.0, size=(7, 3)).astype(np.float32)
    xq = rng.uniform(-0.11, 0.11, size=32).astype(np.float32)
    zq = rng.uniform(0.005, 0.115, size=32).astype(np.float32)
    sx, sz = surf.slopes(y, xq, zq)
    eps = 1e-4
    fd_x = (
        np.asarray(surf.height(y, xq + eps, zq))
        - np.asarray(surf.height(y, xq - eps, zq))
    ) / (2 * eps)
    fd_z = (
        np.asarray(surf.height(y, xq, zq + eps))
        - np.asarray(surf.height(y, xq, zq - eps))
    ) / (2 * eps)
    np.testing.assert_allclose(np.asarray(sx), fd_x, atol=5e-3)
    np.testing.assert_allclose(np.asarray(sz), fd_z, atol=5e-3)


def test_gripper2d_spline_cached():
    assert gripper2d_spline() is gripper2d_spline()
    assert gripper2d_spline().n == GRIPPER_2D.num_ctrl

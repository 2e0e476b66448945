"""The contact engine is differentiable end-to-end — gradients flow from
rollout outcomes to the calibration parameters AND to the gripper geometry
(a capability the reference's MuJoCo pipeline lacks; it approximates this
with a learned dynamics network)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.geom.fingers import sample_gripper_2d
from dgdm_tpu.geom.spline import gripper2d_spline
from dgdm_tpu.sim import engine2d
from tests.util_icons import make_icon


@pytest.mark.slow
def test_grad_through_rollout_wrt_calib():
    contour = extract_contours(make_icon(3))
    yl, yr = sample_gripper_2d(0)
    scene = engine2d.make_scene(yl, yr, contour)
    pose = jnp.array([0.0, 0.0, 2.0], jnp.float32)

    def loss(log_mu):
        calib = engine2d.default_calib().replace(
            mu_plane=jnp.exp(log_mu)
        )
        dth, _, _ = engine2d.rollout(scene, pose, steps=220, calib=calib)
        return dth**2

    g = jax.grad(loss)(jnp.asarray(0.0))
    assert np.isfinite(float(g))
    # friction actually affects the outcome at a contacting pose
    assert abs(float(g)) > 0.0


@pytest.mark.slow
def test_grad_through_rollout_wrt_gripper_shape():
    """d(rollout delta_theta)/d(control points): differentiable design."""
    contour = extract_contours(make_icon(3))
    yl, yr = sample_gripper_2d(0)
    scene = engine2d.make_scene(yl, yr, contour)
    sp = gripper2d_spline()
    pose = jnp.array([0.0, 0.0, 2.0], jnp.float32)

    def loss(y):
        sc = scene.replace(coef_l=sp.coefs(y))
        dth, _, _ = engine2d.rollout(sc, pose, steps=220)
        return dth

    g = jax.grad(loss)(jnp.asarray(yl, jnp.float32))
    assert g.shape == (7,)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0.0

"""Properties of the coupled Newton contact solvers (engine2d.step_newton,
engine3d.step_newton3) that need no MuJoCo oracle: resting stability,
grip-closure servo behavior, differentiability, and solver cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.geom.fingers import sample_gripper_2d, sample_gripper_3d
from dgdm_tpu.geom.mesh3d import box_mesh
from dgdm_tpu.geom.shapes import suite_icon
from dgdm_tpu.sim import engine2d, engine3d


@pytest.fixture(scope="module")
def scene2d():
    contour = extract_contours(suite_icon(3))
    yl, yr = sample_gripper_2d(17)
    return engine2d.make_scene(yl, yr, contour)


def _rollout2d_newton(scene, pose, steps=150, calib=None):
    st = engine2d.init_state(scene, jnp.asarray(pose, jnp.float32))
    ctrl = jnp.array([0.2, -0.2], jnp.float32)

    def body(s, _):
        return engine2d.step_newton(scene, s, ctrl, calib=calib), None

    st, _ = jax.lax.scan(body, st, None, length=steps)
    return st


def test_newton2d_settles_on_plane(scene2d):
    st = jax.jit(_rollout2d_newton, static_argnums=(2,))(
        scene2d, [0.0, 0.0, 0.7], 150)
    # object bottom rests at the plane with ~1e-4 penetration, like MuJoCo
    assert -0.0105 < float(st.zb) < -0.0099
    assert abs(float(st.vz)) < 1e-2
    assert np.isfinite(np.asarray(st.com)).all()
    assert np.isfinite(float(st.theta))


def test_newton2d_grip_reaches_servo_band(scene2d):
    st = jax.jit(_rollout2d_newton, static_argnums=(2,))(
        scene2d, [0.0, 0.0, 0.3], 250)
    q = np.asarray(st.q)
    # fingers advance toward the clamp; the kp=10 / damping-1 servo may
    # overshoot the 0.1 target ~20% mid-transient (MuJoCo does the same)
    assert 0.0 < q[0] <= 0.13
    assert -0.13 <= q[1] < 0.0


def test_newton2d_profile_finite_and_regrasp(scene2d):
    poses = engine2d.pose_grid(grid_size=6, num_pos=1)
    saved = engine2d.SOLVER
    engine2d.SOLVER = "newton"
    try:
        dth, dpos, fth = engine2d.profile(
            scene2d, jnp.asarray(poses), steps=120, regrasp_every=40)
    finally:
        engine2d.SOLVER = saved
    assert np.isfinite(np.asarray(dth)).all()
    assert np.isfinite(np.asarray(dpos)).all()
    assert (np.abs(np.asarray(dth)) <= np.pi + 1e-5).all()


def test_newton2d_differentiable(scene2d):
    calib = engine2d.default_calib()

    def loss(k):
        c = calib.replace(k_contact=k)
        st = _rollout2d_newton(scene2d, [0.0, 0.0, 0.3], steps=60, calib=c)
        return st.theta**2 + jnp.sum(st.com**2)

    g = jax.jit(jax.grad(loss))(jnp.float32(8000.0))
    assert np.isfinite(float(g))


def test_newton3d_settles_and_finite():
    verts, faces = box_mesh(0.035, 0.045, 0.04, 0.04)
    yl, yr = sample_gripper_3d(1)
    scene = engine3d.make_scene(yl, yr, verts, faces, num_points=128)
    saved = engine3d.SOLVER3
    engine3d.SOLVER3 = "newton"
    try:
        poses = np.stack([np.zeros(4), np.zeros(4),
                          np.linspace(0, np.pi, 4)], -1).astype(np.float32)
        dth, dpos, fth, valid = engine3d.profile(
            scene, jnp.asarray(poses), steps=200)
    finally:
        engine3d.SOLVER3 = saved
    assert np.isfinite(np.asarray(dth)).all()
    assert np.isfinite(np.asarray(dpos)).all()
    assert np.asarray(valid).all()   # a grounded box must not tip over

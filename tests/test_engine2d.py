"""2D contact engine: invariants + statistical fidelity vs the MuJoCo oracle.

Note on tolerances: MuJoCo itself is chaotic at the pose level — re-running the
reference scene with a different (equally valid) convex decomposition changes
per-pose delta_theta with correlation only ~0.7 (measured: 50 vs 100 slabs).
The fidelity tests therefore check orientation-profile statistics
(smoothed correlation, magnitude, 3-class agreement), not pointwise equality.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgdm_tpu.core.config import SIM
from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.geom.fingers import sample_gripper_2d
from dgdm_tpu.sim import engine2d
from tests.util_icons import make_icon


@pytest.fixture(scope="module")
def scene():
    contour = extract_contours(make_icon(3))
    yl, yr = sample_gripper_2d(0)
    return engine2d.make_scene(yl, yr, contour)


def test_scene_mass_properties(scene):
    # synthetic blob ~0.08 m across: mass in a sane range, inertia positive
    assert 0.02 < float(scene.mass) < 1.0
    assert float(scene.inertia) > 0
    np.testing.assert_allclose(float(jnp.sum(scene.support_w)), 1.0, atol=1e-5)


def test_object_settles_on_plane(scene):
    # no-contact pose: fingers squeeze empty air, object drops 1cm onto plane
    pose = jnp.array([0.0, 0.0, 0.0], jnp.float32)
    state = engine2d.init_state(scene, pose)
    ctrl = jnp.zeros(2, jnp.float32)

    def body(s, _):
        return engine2d.step(scene, s, ctrl), None

    state, _ = jax.lax.scan(body, state, None, length=200)
    assert -0.0105 < float(state.zb) < -0.0099
    assert abs(float(state.vz)) < 1e-2
    # nothing pushed it sideways
    np.testing.assert_allclose(np.asarray(state.com), np.asarray(
        engine2d.init_state(scene, pose).com), atol=1e-6)


def test_fingers_track_actuator_without_contact(scene):
    # move the object far away so fingers move freely to their clamped targets
    pose = jnp.array([0.0, 0.0, 0.0], jnp.float32)
    state = engine2d.init_state(scene, pose)
    state = state.replace(com=state.com + jnp.array([10.0, 0.0]))
    ctrl = jnp.array([SIM.ctrl_2d, -SIM.ctrl_2d], jnp.float32)

    def body(s, _):
        return engine2d.step(scene, s, ctrl), None

    # the kp=10/damping=1 servo is underdamped (zeta~0.27): needs ~2.5s to
    # settle within 2% of the clamped target 0.1
    state, _ = jax.lax.scan(body, state, None, length=1250)
    np.testing.assert_allclose(np.asarray(state.q), [0.1, -0.1], atol=5e-3)


def test_profile_shapes_and_finiteness(scene):
    poses = jnp.asarray(engine2d.pose_grid(grid_size=8, num_pos=2))
    dth, dpos, fth = engine2d.profile(scene, poses)
    assert dth.shape == (8 * 4,)
    assert dpos.shape == (8 * 4, 2)
    assert np.isfinite(np.asarray(dth)).all()
    assert np.isfinite(np.asarray(dpos)).all()
    assert (np.asarray(fth) >= 0).all() and (np.asarray(fth) < 2 * np.pi + 1e-5).all()


def test_profile_batch_over_pairs(scene):
    scenes = jax.tree.map(lambda x: jnp.stack([x, x]), scene)
    poses = jnp.asarray(engine2d.pose_grid(grid_size=4, num_pos=1))
    dth, dpos, fth = engine2d.profile_batch(scenes, poses)
    assert dth.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(dth[0]), np.asarray(dth[1]), atol=1e-6)


def test_wrap():
    x = jnp.array([0.1, 3.2, -3.2, 6.3, -6.3])
    w = np.asarray(engine2d._wrap(x))
    np.testing.assert_allclose(
        w, [0.1, 3.2 - 2 * np.pi, 2 * np.pi - 3.2, 6.3 - 2 * np.pi, 2 * np.pi - 6.3],
        atol=1e-6,
    )


def test_pose_grid_matches_reference_order():
    g = engine2d.pose_grid(grid_size=3, num_pos=2, pos_extent=0.03)
    # rot-major, then x, then y (sim/sim_2d.py:139-146 loop order k,i,j writes
    # init_poses[k,i,j]); flattening matches npz obj_theta layout
    assert g.shape == (12, 3)
    np.testing.assert_allclose(g[0], [-0.03, -0.03, 0.0], atol=1e-7)
    np.testing.assert_allclose(g[1], [-0.03, 0.03, 0.0], atol=1e-7)
    np.testing.assert_allclose(g[4], [-0.03, -0.03, 2 * np.pi / 3], atol=1e-6)


@pytest.mark.slow
def test_statistical_fidelity_vs_mujoco():
    """Engine interaction-profile statistics vs the MuJoCo oracle. Thresholds
    sit below MuJoCo's own decomposition-to-decomposition agreement (~0.7
    smoothed corr, ~0.72 class agreement) but far above chance."""
    from dgdm_tpu.sim.oracle import Oracle2D

    contour = extract_contours(make_icon(3))
    yl, yr = sample_gripper_2d(0)
    n = 24
    ths = np.linspace(0, 2 * np.pi, n, endpoint=False)
    oracle = Oracle2D(yl, yr, contour)
    mj = np.array([oracle.rollout(0, 0, th)[0] for th in ths])

    scene = engine2d.make_scene(yl, yr, contour)
    poses = np.stack([np.zeros(n), np.zeros(n), ths], -1).astype(np.float32)
    en = np.asarray(engine2d.profile(scene, jnp.asarray(poses))[0])

    def smooth(x, w=5):
        k = np.ones(w) / w
        return np.convolve(np.concatenate([x[-w:], x, x[:w]]), k, "same")[w:-w]

    def cls(x, th=0.03):
        return np.where(x > th, 2, np.where(x < -th, 0, 1))

    corr = np.corrcoef(smooth(mj), smooth(en))[0, 1]
    ratio = en.std() / mj.std()
    agree = (cls(mj) == cls(en)).mean()
    # single-case bounds are loose (per-case variance is large); the 6-case
    # calibration suite averages corr 0.42 / ratio 0.90 / agree 0.62
    # (docs/BENCH_NOTES.md)
    assert corr > 0.3, f"smoothed profile corr too low: {corr}"
    assert 0.4 < ratio < 2.2, f"delta_theta magnitude off: {ratio}"
    assert agree > 0.4, f"3-class agreement too low: {agree}"

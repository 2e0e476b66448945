"""3D contact engine invariants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgdm_tpu.core.config import SIM
from dgdm_tpu.geom import mesh3d
from dgdm_tpu.geom.fingers import sample_gripper_3d
from dgdm_tpu.sim import engine3d


from dgdm_tpu.geom.mesh3d import box_mesh  # shared synthetic object


def test_mesh_mass_properties_box():
    verts, faces = box_mesh()
    mass, com, inertia = mesh3d.mass_properties(verts, faces, 1000.0)
    vol = 0.08 * 0.08 * 0.10
    np.testing.assert_allclose(mass, 1000 * vol, rtol=1e-6)
    np.testing.assert_allclose(com, [0, 0, 0.05], atol=1e-9)
    # box inertia about COM
    m = 1000 * vol
    ixx = m / 12 * (0.08**2 + 0.10**2)
    izz = m / 12 * (0.08**2 + 0.08**2)
    np.testing.assert_allclose(inertia[0, 0], ixx, rtol=1e-6)
    np.testing.assert_allclose(inertia[2, 2], izz, rtol=1e-6)
    np.testing.assert_allclose(inertia[0, 1], 0, atol=1e-9)


def test_surface_sampling_on_box():
    verts, faces = box_mesh()
    pts = mesh3d.sample_surface(verts, faces, 256, seed=1)
    assert pts.shape == (256, 3)
    # every sample on the surface: at least one coord at a face plane
    on_face = (
        np.isclose(np.abs(pts[:, 0]), 0.04)
        | np.isclose(np.abs(pts[:, 1]), 0.04)
        | np.isclose(np.abs(pts[:, 2] - 0.05), 0.05)
    )
    assert on_face.all()


def test_obj_roundtrip(tmp_path):
    verts, faces = box_mesh()
    path = str(tmp_path / "box.obj")
    mesh3d.save_obj(path, verts, faces)
    v2, f2 = mesh3d.load_obj(path)
    np.testing.assert_allclose(v2, verts, atol=1e-7)
    np.testing.assert_array_equal(f2, faces)


@pytest.fixture(scope="module")
def scene():
    verts, faces = box_mesh()
    yl, yr = sample_gripper_3d(0)
    return engine3d.make_scene(yl, yr, verts, faces, num_points=128)


def test_quat_math():
    th = 1.1
    q = jnp.asarray([np.cos(th / 2), 0, 0, np.sin(th / 2)], jnp.float32)
    r = np.asarray(engine3d.quat_to_mat(q))
    expect = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    np.testing.assert_allclose(r, expect, atol=1e-6)
    np.testing.assert_allclose(float(engine3d._z_angle(q)), th, atol=1e-6)
    # integrate pure z spin
    q2 = q
    for _ in range(100):
        q2 = engine3d.quat_integrate(q2, jnp.asarray([0.0, 0.0, 1.0]), 0.001)
    np.testing.assert_allclose(float(engine3d._z_angle(q2)), th + 0.1, atol=1e-3)


@pytest.mark.slow
def test_object_drops_and_rests_upright(scene):
    pose = jnp.array([0.0, 0.0, 0.3], jnp.float32)
    state = engine3d.init_state(scene, pose)
    ctrl = jnp.zeros(2, jnp.float32)

    def body(s, _):
        return engine3d.step(scene, s, ctrl), None

    state, _ = jax.lax.scan(body, state, None, length=400)
    # box bottom (z=0 at start) settles on the plane at z=-0.01
    bottom = float(state.pos[2]) - 0.05
    assert -0.012 < bottom < -0.009, bottom
    # stays upright, keeps its z-rotation
    assert abs(float(state.quat[1])) < 1e-2
    assert abs(float(state.quat[2])) < 1e-2
    np.testing.assert_allclose(
        float(engine3d._z_angle(state.quat)), 0.3, atol=0.02
    )
    assert float(jnp.linalg.norm(state.vel)) < 0.05


@pytest.mark.slow
def test_profile_3d_runs(scene):
    poses = jnp.asarray(
        np.stack(
            [np.zeros(4), np.zeros(4), np.linspace(0, 2 * np.pi, 4, False)], -1
        ),
        jnp.float32,
    )
    dth, dpos, fth, valid = engine3d.profile(scene, poses, steps=SIM.steps_3d)
    assert dth.shape == (4,)
    assert np.isfinite(np.asarray(dth)).all()
    assert np.asarray(valid).dtype == bool
    # symmetric box squeezed by symmetric-ish fingers should not move meters
    assert np.abs(np.asarray(dpos)).max() < 0.1


def test_pyramid_solver_smoke():
    """The pyramidal-cone solver (SOLVER3='pyramid') integrates stably and
    produces finite grips with its fitted calibration — the structural
    alternative to the Huber-Newton default (statistical parity on the
    oracle suite, runs/calib/calib3d_pyramid.json; docs/PARITY.md)."""
    import jax
    import jax.numpy as jnp

    from dgdm_tpu.geom.fingers import sample_gripper_3d
    from dgdm_tpu.geom.mesh3d import box_mesh

    verts, faces = box_mesh(0.035, 0.045, 0.04, 0.04)
    scene = engine3d.make_scene(*sample_gripper_3d(0), verts, faces,
                                num_points=64)
    saved = engine3d.SOLVER3
    try:
        engine3d.SOLVER3 = "pyramid"
        calib = engine3d.default_calib3()
        ctrl = jnp.array([0.5, -0.5], jnp.float32)

        @jax.jit
        def roll(pose):
            st = engine3d.init_state(scene, pose)

            def body(s, _):
                return engine3d.step_newton3_pyramid(
                    scene, s, ctrl, calib=calib), None

            return jax.lax.scan(body, st, None, length=300)[0]

        st = roll(jnp.asarray([0.0, 0.0, 0.4], jnp.float32))
        pos = np.asarray(st.pos)
        assert np.isfinite(pos).all()
        assert np.isfinite(np.asarray(st.om)).all()
        # the object stays in the workspace (no explosion)
        assert np.abs(pos).max() < 0.5
        # the jaws actually traveled inward
        q = np.asarray(st.q)
        assert q[0] > 0.01 and q[1] < -0.01
    finally:
        engine3d.SOLVER3 = saved


def test_gripper_host_work_cache():
    """make_scene serves per-gripper geometry (envelope bake + hull masses)
    from the LRU cache — identical scenes, ~2.7 s -> ~1 ms per repeat
    (production datagen loops gripper blocks outer for exactly this)."""
    import time

    from dgdm_tpu.geom.fingers import sample_gripper_3d
    from dgdm_tpu.geom.mesh3d import box_mesh

    verts, faces = box_mesh()
    op = engine3d.object_properties_3d(verts, faces)
    yl, yr = sample_gripper_3d(7)
    engine3d._GRIP_CACHE.clear()
    s1 = engine3d.make_scene(yl, yr, verts, faces, obj_props=op)
    t0 = time.time()
    s2 = engine3d.make_scene(yl, yr, verts, faces, obj_props=op)
    warm = time.time() - t0
    assert warm < 0.5
    np.testing.assert_array_equal(np.asarray(s1.hgrid), np.asarray(s2.hgrid))
    np.testing.assert_array_equal(np.asarray(s1.finger_mass),
                                  np.asarray(s2.finger_mass))
    # different gripper -> different geometry (no false sharing)
    yl2, yr2 = sample_gripper_3d(8)
    s3 = engine3d.make_scene(yl2, yr2, verts, faces, obj_props=op)
    assert not np.array_equal(np.asarray(s1.hgrid), np.asarray(s3.hgrid))

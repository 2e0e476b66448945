"""Visualization smoke tests (file outputs exist and rasters are sane)."""

import numpy as np
import pytest

from dgdm_tpu.eval import viz
from dgdm_tpu.geom.fingers import sample_gripper_2d


def _contour():
    ang = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    return np.stack([0.03 * np.cos(ang), 0.04 * np.sin(ang)], -1)


def test_render_object_silhouette_rotates():
    c = _contour()
    m0 = viz.render_object_silhouette(c, 0.0)
    m90 = viz.render_object_silhouette(c, np.pi / 2)
    assert m0.shape == (128, 128)
    assert 0.05 < m0.mean() < 0.95
    # the ellipse-ish blob at 90 degrees is the transpose-ish of 0 degrees
    assert abs(m0.sum() - m90.sum()) / m0.sum() < 0.1
    assert (m0 != m90).any()


@pytest.mark.slow
def test_plots_write_files(tmp_path):
    yl, yr = sample_gripper_2d(0)
    p1 = str(tmp_path / "profile.png")
    viz.visualize_profile(np.random.RandomState(0).randint(-1, 2, 36), p1)
    p2 = str(tmp_path / "ctrl.png")
    from dgdm_tpu.geom.fingers import ctrlpts_2d

    viz.visualize_ctrlpts(ctrlpts_2d(yl, yr), p2)
    p3 = str(tmp_path / "finals.png")
    viz.visualize_finals(np.linspace(0, 360, 36), p3)
    img = viz.render_gripper_2d(yl, yr)
    assert img.ndim == 3 and img.shape[2] == 3
    import os

    assert all(os.path.getsize(p) > 0 for p in (p1, p2, p3))


@pytest.mark.slow
def test_rollout_video(tmp_path):
    yl, yr = sample_gripper_2d(0)
    traj = [(0.0, 0.0, 0.1 * i, 0.0005 * i, -0.0005 * i) for i in range(40)]
    path = viz.rollout_video_2d(
        _contour(), yl, yr, traj, str(tmp_path / "roll.mp4"), stride=5
    )
    import os

    assert os.path.getsize(path) > 0


def test_rollout_trace_feeds_video(tmp_path):
    """Engine trajectory capture -> rollout_video_2d (VERDICT r1 item 7:
    previously the video helper had no engine API feeding it)."""
    import jax.numpy as jnp

    from dgdm_tpu.geom.fingers import sample_gripper_2d
    from dgdm_tpu.sim import engine2d

    ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    rad = 0.035 * (1 + 0.2 * np.sin(3 * ang))
    contour = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)
    yl, yr = sample_gripper_2d(0)
    scene = engine2d.make_scene(yl, yr, contour)
    tr = np.asarray(engine2d.rollout_trace(
        scene, jnp.array([0.0, 0.0, 1.0], jnp.float32), steps=40, every=10
    ))
    assert tr.shape == (4, 5)
    assert np.isfinite(tr).all()
    out = viz.rollout_video_2d(contour, yl, yr, tr,
                               str(tmp_path / "roll.mp4"))
    assert out


def test_render_scene_3d_and_video(tmp_path):
    import jax.numpy as jnp

    from dgdm_tpu.geom.fingers import sample_gripper_3d
    from dgdm_tpu.geom.mesh3d import box_mesh
    from dgdm_tpu.sim import engine3d

    verts, faces = box_mesh()
    yl, yr = sample_gripper_3d(0)
    scene = engine3d.make_scene(yl, yr, verts, faces, num_points=128)
    tr = np.asarray(engine3d.rollout_trace3d(
        scene, jnp.array([0.0, 0.0, 0.5], jnp.float32), steps=40, every=20
    ))
    assert tr.shape == (2, 9)
    p = viz.render_scene_3d(
        np.asarray(scene.points), np.asarray(scene.com), yl, yr, tr[-1],
        str(tmp_path / "scene3d.png"),
    )
    assert p.endswith(".png")
    out = viz.rollout_video_3d(
        np.asarray(scene.points), np.asarray(scene.com), yl, yr, tr,
        str(tmp_path / "roll3d.mp4"),
    )
    assert out

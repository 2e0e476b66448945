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

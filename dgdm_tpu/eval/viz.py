"""Visualization — counterparts of the reference's plotting and rendering.

- ``visualize_profile`` / ``visualize_ctrlpts`` / ``visualize_finals``:
  the matplotlib plots of ``dynamics/utils.py:20-80``.
- ``render_gripper_2d`` / ``render_object_silhouette``: replaces the MuJoCo
  offscreen renderer (``sim/render_mesh.py:23-65``) with an analytic
  rasterization — gripper portraits from the spline curves, per-orientation
  object silhouettes from the rotated contour polygon (the reference only
  uses the segmentation channel, which is exactly the polygon mask).
- ``rollout_video_2d``: frame sequence of a squeeze (object mask + finger
  curves per step), exportable as mp4 via imageio.

All functions are host-side and import matplotlib lazily.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from dgdm_tpu.core.config import GRIPPER_2D
from dgdm_tpu.geom.polygon import points_in_polygon
from dgdm_tpu.geom.spline import cubic_basis_matrix


def visualize_profile(profile: np.ndarray, save_path: str,
                      ori_range=(-1.0, 1.0)) -> None:
    """Polar quiver of a signed 3-class profile (dynamics/utils.py:29-44)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    signs = np.sign(profile)
    thetas = np.linspace(
        ori_range[0] * np.pi + np.pi, ori_range[1] * np.pi + np.pi, len(profile)
    )
    theta, r = np.meshgrid(thetas, np.array([1]))
    u = -2 * np.pi / len(profile) * np.sin(theta) * signs
    v = 2 * np.pi / len(profile) * np.cos(theta) * signs
    f = plt.figure(figsize=(8, 8))
    ax = f.add_subplot(polar=True)
    ax.quiver(theta, r, u, v, profile, scale=1, width=0.005, cmap="bwr")
    plt.savefig(save_path)
    plt.close(f)


def visualize_ctrlpts(ctrlpts: np.ndarray, save_path: str) -> None:
    """Two-panel control-point scatter (dynamics/utils.py:70-80)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = ctrlpts.shape[0] // 2
    f = plt.figure()
    for i, sl in enumerate((slice(0, n), slice(n, 2 * n))):
        ax = f.add_subplot(2, 1, i + 1)
        ax.set(xlim=(-0.12, 0.12), ylim=(-0.045, 0.015))
        ax.scatter(ctrlpts[sl, 0], ctrlpts[sl, 1])
    plt.savefig(save_path)
    plt.close(f)


def visualize_denoise_steps(traj: np.ndarray, save_path: str) -> None:
    """One panel per DDIM step: scatter of every sample's normalized control
    values vs control index — the reference's per-step validation dumps
    (generator/diffusion.py:258-292). ``traj`` is (S+1, B, N) or (S+1, B,
    N, 1) from ``GeneratorTrainer.sample_trajectory`` (index 0 = pure noise).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    traj = np.asarray(traj)
    if traj.ndim == 4:
        traj = traj[..., 0]
    s, b, n = traj.shape
    f, axes = plt.subplots(1, s, figsize=(2.2 * s, 2.6), sharey=True)
    if s == 1:
        axes = [axes]
    x = np.arange(n)
    for si, ax in enumerate(axes):
        for bi in range(b):
            ax.scatter(x, traj[si, bi], s=4, alpha=0.5)
        ax.set_ylim(-1.6, 1.6)
        ax.set_title("noise" if si == 0 else f"step {si}", fontsize=8)
    f.tight_layout()
    f.savefig(save_path, dpi=90)
    plt.close(f)


def visualize_finals(finals: np.ndarray, save_path: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    f = plt.figure(figsize=(10, 6))
    ax = f.add_subplot(111)
    ax.set(ylim=(0, 2 * np.pi))
    ax.scatter(np.arange(len(finals)), np.asarray(finals) * np.pi / 180.0, s=2)
    plt.savefig(save_path)
    plt.close(f)


def _raster_polygon(poly: np.ndarray, size: int = 128,
                    extent: float = 0.2) -> np.ndarray:
    """Rasterize a polygon to a boolean (size, size) mask over
    [-extent/2, extent/2]^2 (world meters, y up)."""
    xs = (np.arange(size) + 0.5) / size * extent - extent / 2
    gx, gy = np.meshgrid(xs, xs, indexing="xy")
    pts = np.stack([gx.reshape(-1), gy.reshape(-1)], -1)
    return points_in_polygon(pts, poly).reshape(size, size)


def render_object_silhouette(
    contour: np.ndarray, theta: float, size: int = 128, extent: float = 0.2
) -> np.ndarray:
    """Segmentation-style object mask at orientation theta — the analytic
    version of sim/render_mesh.py:39-65."""
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    return _raster_polygon(contour @ rot.T, size, extent)


def _finger_curves(yl: np.ndarray, yr: np.ndarray, num: int = 200):
    g = GRIPPER_2D
    xq = np.linspace(g.ctrl_x_min, g.ctrl_x_max, num)
    basis = np.asarray(
        cubic_basis_matrix(g.num_ctrl, g.ctrl_x_min, g.ctrl_x_max, xq)
    )
    return xq, basis @ np.asarray(yl), basis @ np.asarray(yr)


def render_gripper_2d(
    yl: np.ndarray, yr: np.ndarray, save_path: Optional[str] = None,
    size: int = 256,
):
    """Gripper portrait (replaces sim/render_mesh.py:23-37): both finger
    strips drawn at their jaw offsets."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    g = GRIPPER_2D
    xq, cl, cr = _finger_curves(yl, yr)
    f = plt.figure(figsize=(size / 100, size / 100), dpi=100)
    ax = f.add_subplot(111)
    ax.fill_between(xq, cl - g.jaw_offset, cl - g.jaw_offset + g.width,
                    color="#EEC759")
    ax.fill_between(xq, cr + g.jaw_offset, cr + g.jaw_offset + g.width,
                    color="#B1C381")
    ax.set(xlim=(-0.15, 0.15), ylim=(-0.25, 0.25))
    ax.set_aspect("equal")
    ax.axis("off")
    if save_path:
        plt.savefig(save_path, bbox_inches="tight")
        plt.close(f)
        return save_path
    f.canvas.draw()
    img = np.asarray(f.canvas.buffer_rgba())[..., :3].copy()
    plt.close(f)
    return img


def rollout_video_2d(
    contour: np.ndarray,
    yl: np.ndarray,
    yr: np.ndarray,
    traj: Sequence,  # iterable of (obj_x, obj_y, theta, ql, qr)
    save_path: str,
    size: int = 128,
    extent: float = 0.5,
    fps: int = 20,
    stride: int = 10,
) -> str:
    """Squeeze video (replaces the segmentation-render mp4 path of
    dynamics/sim_test_mj.py:219-233)."""
    import imageio

    try:
        writer = imageio.get_writer(save_path, fps=fps)
    except ValueError:
        # no mp4 backend in this environment: fall back to GIF
        save_path = save_path.rsplit(".", 1)[0] + ".gif"
        writer = imageio.get_writer(save_path, fps=fps)
    writer.close()

    g = GRIPPER_2D
    xq, cl, cr = _finger_curves(yl, yr, 64)
    colors = np.array(
        [[255, 247, 212], [155, 184, 205], [238, 199, 89], [177, 195, 129]],
        dtype=np.uint8,
    )
    xs = (np.arange(size) + 0.5) / size * extent - extent / 2
    gx, gy = np.meshgrid(xs, xs, indexing="xy")
    with imageio.get_writer(save_path, fps=fps) as w:  # noqa: already probed
        for frame in list(traj)[::stride]:
            ox, oy, th, ql, qr = frame
            c, s = np.cos(th), np.sin(th)
            rot = np.array([[c, -s], [s, c]])
            poly = contour @ rot.T + [ox, oy]
            seg = np.zeros((size, size), dtype=np.int64)
            mask = points_in_polygon(
                np.stack([gx.reshape(-1), gy.reshape(-1)], -1), poly
            ).reshape(size, size)
            seg[mask] = 1
            # finger bands
            yl_low = np.interp(gx, xq, cl) - g.jaw_offset + ql
            yr_low = np.interp(gx, xq, cr) + g.jaw_offset + qr
            in_x = (gx >= g.ctrl_x_min) & (gx <= g.ctrl_x_max)
            seg[(gy >= yl_low) & (gy <= yl_low + g.width) & in_x] = 2
            seg[(gy >= yr_low) & (gy <= yr_low + g.width) & in_x] = 3
            w.append_data(colors[seg[::-1]])  # flip y for image coords
    return save_path


def _finger_surface_grid(y_ctrl: np.ndarray, n: int = 25) -> np.ndarray:
    """(n*n, 3) points on one finger's B-spline surface (body frame)."""
    from dgdm_tpu.sim.oracle3d import _surface_grid

    return _surface_grid(np.asarray(y_ctrl).reshape(-1), n).reshape(-1, 3)


def render_scene_3d(
    obj_points: np.ndarray,      # (P, 3) object surface points, body frame
    com: np.ndarray,             # (3,) body COM
    yl: np.ndarray,
    yr: np.ndarray,
    state_row: np.ndarray,       # (9,): pos(3), quat wxyz(4), q(2)
    save_path: str,
    elev: float = 25.0,
    azim: float = -60.0,
) -> str:
    """Matplotlib-3D point-splat of the gripper + object at one state — the
    analytic replacement for the reference's offscreen MuJoCo RGB render
    (sim/render_mesh.py:23-65, dynamics/sim_test_mj_3d.py render path)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from dgdm_tpu.core.config import GRIPPER_3D

    g = GRIPPER_3D
    pos, quat, q = state_row[:3], state_row[3:7], state_row[7:9]
    w, x, y, z = quat
    rot = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])
    obj_w = pos + (np.asarray(obj_points) - np.asarray(com)) @ rot.T

    fl = _finger_surface_grid(yl)
    fr = _finger_surface_grid(yr)
    fl_w = fl + [0.0, -g.jaw_offset + g.width + q[0], 0.0]
    fr_w = fr + [0.0, g.jaw_offset + q[1], 0.0]

    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(*obj_w.T, s=4, c="tab:orange", label="object")
    ax.scatter(*fl_w.T, s=2, c="tab:blue", alpha=0.6)
    ax.scatter(*fr_w.T, s=2, c="tab:green", alpha=0.6)
    ax.set_xlim(-0.15, 0.15)
    ax.set_ylim(-0.25, 0.25)
    ax.set_zlim(-0.02, 0.2)
    ax.view_init(elev=elev, azim=azim)
    ax.set_box_aspect((0.3, 0.5, 0.22))
    fig.savefig(save_path, dpi=90, bbox_inches="tight")
    plt.close(fig)
    return save_path


def rollout_video_3d(
    obj_points: np.ndarray,
    com: np.ndarray,
    yl: np.ndarray,
    yr: np.ndarray,
    traj: np.ndarray,            # (T, 9) from engine3d.rollout_trace3d
    save_path: str,
    fps: int = 10,
) -> str:
    """Frame sequence of a 3D squeeze (mp4 when imageio+ffmpeg are available,
    else a .png frame strip) — replaces the reference's 3D render videos."""
    import os
    import tempfile

    frames = []
    with tempfile.TemporaryDirectory() as td:
        for i, row in enumerate(np.asarray(traj)):
            p = os.path.join(td, f"f{i:03d}.png")
            render_scene_3d(obj_points, com, yl, yr, row, p)
            frames.append(p)
        try:
            import imageio.v2 as imageio

            with imageio.get_writer(save_path, fps=fps) as w:
                for f in frames:
                    w.append_data(imageio.imread(f))
            return save_path
        except Exception:
            # fallback: keep the final frame as a still
            import shutil

            still = save_path.rsplit(".", 1)[0] + "_final.png"
            shutil.copy(frames[-1], still)
            return still

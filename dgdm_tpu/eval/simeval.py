"""Simulation-in-the-loop evaluation of generated grippers.

Replaces the Ray/MuJoCo eval workers (``dynamics/sim_test_mj.py:107-295``)
with on-device batched rollouts: 360 orientations per object x gripper, long
rollouts with periodic gripper re-grasp (reset of gripper joints and all
velocities every 200 steps — ``dynamics/sim_test_mj.py:165-171``), recording
the profile after the FIRST squeeze (t=200) and the final converged pose.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import SIM
from dgdm_tpu.eval.metrics import metric2objective, profile_metrics_2d
from dgdm_tpu.geom.fingers import denormalize_y
from dgdm_tpu.sim import engine2d
from dgdm_tpu.sim.types import Scene2D


@functools.partial(
    jax.jit, static_argnames=("first_squeeze", "total_steps", "regrasp_every")
)
def eval_rollout_batch(
    scenes: Scene2D,
    thetas: jnp.ndarray,
    first_squeeze: int = SIM.eval_regrasp_2d,
    total_steps: int = SIM.eval_steps_2d,
    regrasp_every: int = SIM.eval_regrasp_2d,
    calib: Optional[engine2d.Calib] = None,
):
    """scenes: stacked pair batch (B); thetas (G,) initial orientations at
    position (0, 0).

    Returns per (B, G): delta_theta/delta_pos after the first squeeze and
    final_theta/final_pos after the full re-grasp schedule."""
    ctrl = jnp.array([SIM.ctrl_2d, -SIM.ctrl_2d], jnp.float32)

    def one(scene, theta0):
        pose = jnp.stack([jnp.zeros(()), jnp.zeros(()), theta0])
        state = engine2d.init_state(scene, pose)

        def body(state, i):
            rg = (i % regrasp_every == 0) & (i > 0)
            return engine2d.step(scene, state, ctrl, regrasp=rg, calib=calib), None

        # phase 1: first squeeze (profile measurement at t = first_squeeze)
        state, _ = jax.lax.scan(
            body, state, jnp.arange(first_squeeze)
        )
        d_theta = engine2d._wrap(state.theta - theta0)
        d_pos = engine2d._origin_of(scene, state) - pose[:2]
        # phase 2: remaining re-grasp schedule to convergence
        state, _ = jax.lax.scan(
            body, state, jnp.arange(first_squeeze, total_steps)
        )
        final_theta = jnp.mod(state.theta, 2.0 * jnp.pi)
        final_pos = engine2d._origin_of(scene, state)
        return d_theta, d_pos, final_theta, final_pos

    return jax.vmap(lambda sc: jax.vmap(lambda th: one(sc, th))(thetas))(scenes)


def sim_eval_batch_2d(
    pts_y: np.ndarray,
    contours: Sequence[np.ndarray],
    num_rot: int = 360,
    ori_range=( -1.0, 1.0),
    total_steps: int = SIM.eval_steps_2d,
    regrasp_every: int = SIM.eval_regrasp_2d,
    calib: Optional[engine2d.Calib] = None,
) -> List[Dict[str, np.ndarray]]:
    """Evaluate normalized diffusion samples against objects.

    pts_y: (B, 2*n_ctrl) or (B, 2*n_ctrl, 1) normalized y in [-1, 1]
    (denormalized via p_y * 0.03 - 0.015 semantics — same affine map as
    ``dynamics/sim_test_mj.py:261``).

    Returns a metric dict per (object, gripper), object-major like
    ``sim_test_batch`` (``dynamics/sim_test_mj.py:249-295``).
    """
    pts_y = np.asarray(pts_y)
    if pts_y.ndim == 3:
        pts_y = pts_y[..., 0]
    b = pts_y.shape[0]
    n = pts_y.shape[1] // 2
    y = np.asarray(denormalize_y(pts_y))
    thetas = (
        np.linspace(ori_range[0], ori_range[1], num_rot) * np.pi + np.pi
    ).astype(np.float32)

    use_pallas = jax.default_backend() == "tpu"
    from dgdm_tpu.parallel import mesh as meshlib

    results = []
    for contour in contours:
        scenes = [
            engine2d.make_scene(y[i, :n], y[i, n:], contour) for i in range(b)
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
        # grippers dp-shard over the device mesh (the Ray eval fan-out
        # analog, dynamics/sim_test_mj.py:265-282 — same pattern as the
        # 3D eval and 2D datagen paths)
        mesh = meshlib.data_parallel_mesh()
        if mesh is not None and b % mesh.shape["dp"] != 0:
            mesh = None
        if use_pallas:
            from dgdm_tpu.sim import pallas2d

            nr = thetas.shape[0]
            pad = (-nr) % pallas2d.LANE
            th_p = np.concatenate([thetas, np.full(pad, thetas[-1],
                                                   np.float32)])
            poses = np.stack(
                [np.zeros_like(th_p), np.zeros_like(th_p), th_p], -1
            )
            arrs = pallas2d.scene_arrays(stacked, calib=calib)
            kernel = lambda *a: pallas2d.profile_batch_pallas(
                *a, jnp.asarray(poses),
                steps=total_steps, regrasp_every=regrasp_every,
                snapshot_step=regrasp_every,
            )
            if mesh is not None:
                from jax.experimental.shard_map import shard_map
                from jax.sharding import PartitionSpec as P

                kernel = shard_map(
                    kernel, mesh=mesh,
                    in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
                    out_specs=P("dp"), check_rep=False,
                )
            dth_, dpos_, fth_, fpos_ = kernel(*arrs)
            d_theta = np.asarray(dth_)[:, :nr]
            d_pos = np.asarray(dpos_)[:, :nr]
            f_theta = np.asarray(fth_)[:, :nr]
            f_pos = np.asarray(fpos_)[:, :nr]
        else:
            if mesh is not None:
                stacked = meshlib.shard_batch(mesh, stacked, "dp")
            d_theta, d_pos, f_theta, f_pos = jax.tree.map(
                np.asarray,
                eval_rollout_batch(
                    stacked,
                    jnp.asarray(thetas),
                    total_steps=total_steps,
                    regrasp_every=regrasp_every,
                    calib=calib,
                ),
            )
        for i in range(b):
            results.append(
                profile_metrics_2d(
                    d_theta[i],
                    np.concatenate([d_pos[i], np.zeros((num_rot, 1))], -1),
                    f_theta[i],
                    thetas,
                    np.concatenate([f_pos[i], np.zeros((num_rot, 1))], -1),
                )
            )
    return results


def objectives_table(
    metrics: List[Dict[str, np.ndarray]], objective: str
) -> List[Dict]:
    return [metric2objective(m, objective) for m in metrics]

"""3D simulation-in-the-loop evaluation — counterpart of
``dynamics/sim_test_mj_3d.py:94-277``: 360 orientations x 32,000 steps with
gripper re-grasp every 800 steps, profile recorded after the first squeeze.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import NORM, SIM
from dgdm_tpu.eval.metrics import three_class, wrap_pi
from dgdm_tpu.geom.fingers import denormalize_y
from dgdm_tpu.sim import engine3d


@functools.partial(
    jax.jit, static_argnames=("first_squeeze", "total_steps", "regrasp_every")
)
def eval_rollout_batch_3d(
    scenes,
    thetas: jnp.ndarray,
    first_squeeze: int = SIM.eval_regrasp_3d,
    total_steps: int = SIM.eval_steps_3d,
    regrasp_every: int = SIM.eval_regrasp_3d,
):
    ctrl = jnp.array([SIM.ctrl_3d, -SIM.ctrl_3d], jnp.float32)

    def one(scene, theta0):
        pose = jnp.stack([jnp.zeros(()), jnp.zeros(()), theta0])
        state = engine3d.init_state(scene, pose)

        def body(state, i):
            rg = (i % regrasp_every == 0) & (i > 0)
            return engine3d.step(scene, state, ctrl, regrasp=rg), None

        state, _ = jax.lax.scan(body, state, jnp.arange(first_squeeze))
        d_theta = engine3d._z_angle(state.quat) - jnp.mod(theta0, 2 * jnp.pi)
        d_theta = d_theta - 2 * jnp.pi * jnp.round(d_theta / (2 * jnp.pi))
        rot = engine3d.quat_to_mat(state.quat)
        d_pos = (state.pos - rot @ scene.com)[:2] - pose[:2]
        state, _ = jax.lax.scan(
            body, state, jnp.arange(first_squeeze, total_steps)
        )
        rot = engine3d.quat_to_mat(state.quat)
        final_theta = engine3d._z_angle(state.quat)
        final_pos = (state.pos - rot @ scene.com)[:2]
        return d_theta, d_pos, final_theta, final_pos

    return jax.vmap(lambda sc: jax.vmap(lambda th: one(sc, th))(thetas))(scenes)


def sim_eval_batch_3d(
    pts_y: np.ndarray,
    objects: Sequence,
    num_rot: int = 360,
    ori_range=(-1.0, 1.0),
    total_steps: int = SIM.eval_steps_3d,
    regrasp_every: int = SIM.eval_regrasp_3d,
) -> List[Dict[str, np.ndarray]]:
    """pts_y (B, 42[, 1]) normalized samples; objects: list of (verts, faces).

    Returns metric dicts (object-major), same keys/units as the 2D eval."""
    pts_y = np.asarray(pts_y)
    if pts_y.ndim == 3:
        pts_y = pts_y[..., 0]
    b = pts_y.shape[0]
    n = pts_y.shape[1] // 2
    y = np.asarray(denormalize_y(pts_y, fingers_3d=True))
    thetas = (
        np.linspace(ori_range[0], ori_range[1], num_rot) * np.pi + np.pi
    ).astype(np.float32)
    th3 = NORM.threshold_3d

    use_pallas = jax.default_backend() == "tpu"
    from dgdm_tpu.parallel import mesh as meshlib

    results = []
    for verts, faces in objects:
        # object host work shared across the gripper batch
        obj_props = engine3d.object_properties_3d(verts, faces)
        scenes = [
            engine3d.make_scene(y[i, :n], y[i, n:], verts, faces,
                                obj_props=obj_props)
            for i in range(b)
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
        # grippers dp-shard over the device mesh (like the 2D datagen path)
        mesh = meshlib.data_parallel_mesh()
        if mesh is not None and b % mesh.shape["dp"] != 0:
            mesh = None
        if use_pallas:
            from dgdm_tpu.sim import pallas3d

            nr = thetas.shape[0]
            pad = (-nr) % pallas3d.LANE
            th_p = np.concatenate(
                [thetas, np.full(pad, thetas[-1], np.float32)]
            )
            poses = np.stack(
                [np.zeros_like(th_p), np.zeros_like(th_p), th_p], -1
            )
            arrs = pallas3d.scene_arrays_3d(stacked)
            kernel = lambda *a: pallas3d.profile_batch_pallas3d(
                *a, jnp.asarray(poses),
                steps=total_steps, regrasp_every=regrasp_every,
                snapshot_step=regrasp_every,
            )
            if mesh is not None:
                from jax.experimental.shard_map import shard_map
                from jax.sharding import PartitionSpec as P

                kernel = shard_map(
                    kernel, mesh=mesh,
                    in_specs=(P("dp"), P("dp"), P("dp")),
                    out_specs=P("dp"), check_rep=False,
                )
            dth_, sdpos_, fth_, _valid, fpos_ = kernel(*arrs)
            d_theta = np.asarray(dth_)[:, :nr]
            d_pos = np.asarray(sdpos_)[:, :nr]
            f_theta = np.asarray(fth_)[:, :nr]
            # eval poses start at the origin: final delta == absolute origin
            f_pos = np.asarray(fpos_)[:, :nr]
        else:
            if mesh is not None:
                stacked = meshlib.shard_batch(mesh, stacked, "dp")
            d_theta, d_pos, f_theta, f_pos = jax.tree.map(
                np.asarray,
                eval_rollout_batch_3d(
                    stacked, jnp.asarray(thetas),
                    total_steps=total_steps, regrasp_every=regrasp_every,
                ),
            )
        for i in range(b):
            fdt = np.asarray(
                [wrap_pi(f - t0) for f, t0 in zip(f_theta[i], thetas)]
            )
            results.append(
                {
                    "delta_theta": d_theta[i] * 180 / np.pi,
                    "delta_pos": np.concatenate(
                        [d_pos[i], np.zeros((num_rot, 1))], -1
                    ) * 100,
                    "profile": three_class(d_theta[i], th3[0]),
                    "profile_x": three_class(d_pos[i][:, 0], th3[1]),
                    "profile_y": three_class(d_pos[i][:, 1], th3[2]),
                    "final_theta": f_theta[i] * 180 / np.pi,
                    "final_delta_theta": fdt * 180 / np.pi,
                    "final_pos": np.concatenate(
                        [f_pos[i], np.zeros((num_rot, 1))], -1
                    ) * 100,
                }
            )
    return results

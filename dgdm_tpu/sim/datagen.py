"""Batched interaction-profile data generation.

Replaces the reference's Ray fan-out (512 MuJoCo processes per shell
iteration, ``sim/sim_2d.py:184-202``, ``sim/run_sim_2d.sh``) with one device
program: scenes for a block of grippers live in HBM, the 9,000-pose grid is
processed in static-shape chunks, and results stream back as npz shards in the
exact format the reference's ``DynamicsDataset`` consumes
(``dynamics/dataloader.py:40-79``: a dict under ``arr_0`` with keys
``ctrlpts, allpts, object_vertices, obj_pos, obj_theta, delta_theta,
delta_pos``).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import GRIPPER_2D, SIM
from dgdm_tpu.geom.fingers import ctrlpts_2d, sample_gripper_2d
from dgdm_tpu.geom.spline import cubic_basis_matrix
from dgdm_tpu.sim import engine2d


def stack_scenes(scenes: Sequence) -> object:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)


def profile_pairs_2d(
    scenes,
    poses: np.ndarray,
    chunk: int = 1500,
    calib: Optional[engine2d.Calib] = None,
    use_pallas: bool = True,
    block: bool = True,
) -> Dict[str, np.ndarray]:
    """Run the full pose grid for a stacked scene batch.

    Default path: the fused Pallas rollout kernel (VMEM-resident state, pose
    batch padded to a LANE multiple). Fallback / calibrated path: the pure-JAX
    engine, chunked to bound the live-intermediate footprint.

    Returns dict with delta_theta (B, N), delta_pos (B, N, 2), final_theta.
    With ``block=False`` the kernel is only DISPATCHED (JAX async): values
    stay device-side (pose axis still padded) plus ``n`` — materialize with
    ``fetch_pairs_2d``. This is what lets the production pipeline bake block
    i+1 on the host while block i simulates (sim/pipeline.py)."""
    n = poses.shape[0]
    if jax.default_backend() != "tpu":
        use_pallas = False  # Mosaic kernels compile on TPU only
    b = next(iter(jax.tree.leaves(scenes))).shape[0]
    from dgdm_tpu.parallel import mesh as meshlib

    mesh = meshlib.data_parallel_mesh()
    if mesh is not None and b % mesh.shape["dp"] != 0:
        mesh = None  # uneven pair block: fall back to single-device
    if use_pallas:
        from dgdm_tpu.sim import pallas2d

        pad = (-n) % pallas2d.LANE
        if pad:
            filler = np.broadcast_to(poses[-1], (pad,) + poses.shape[1:])
            poses_p = np.concatenate([poses, filler], axis=0)
        else:
            poses_p = poses
        arrs = pallas2d.scene_arrays(scenes, calib=calib)
        if mesh is not None:
            # multi-chip: pairs shard over dp, each device runs the fused
            # kernel on its shard (the Ray fan-out analog over ICI)
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            poses_j = jnp.asarray(poses_p)
            fn = shard_map(
                lambda *a: pallas2d.profile_batch_pallas(*a, poses_j)[:3],
                mesh=mesh,
                in_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
                out_specs=P("dp"),
                check_rep=False,
            )
            dth, dpos, fth = fn(*arrs)
        else:
            dth, dpos, fth, _ = pallas2d.profile_batch_pallas(
                *arrs, jnp.asarray(poses_p)
            )
        if not block:
            return {"delta_theta": dth, "delta_pos": dpos,
                    "final_theta": fth, "n": n}
        return {
            "delta_theta": np.asarray(dth)[:, :n],
            "delta_pos": np.asarray(dpos)[:, :n],
            "final_theta": np.asarray(fth)[:, :n],
        }
    if mesh is not None:
        scenes = meshlib.shard_batch(mesh, scenes, "dp")
    assert n % chunk == 0 or chunk >= n, (n, chunk)
    outs = []
    for lo in range(0, n, chunk):
        pblock = jnp.asarray(poses[lo : lo + chunk])
        outs.append(engine2d.profile_batch(scenes, pblock, calib=calib))
    dth = jnp.concatenate([o[0] for o in outs], axis=1)
    dpos = jnp.concatenate([o[1] for o in outs], axis=1)
    fth = jnp.concatenate([o[2] for o in outs], axis=1)
    if not block:
        return {"delta_theta": dth, "delta_pos": dpos,
                "final_theta": fth, "n": n}
    return {"delta_theta": np.asarray(dth), "delta_pos": np.asarray(dpos),
            "final_theta": np.asarray(fth)}


def fetch_pairs_2d(res: Dict) -> Dict[str, np.ndarray]:
    """Materialize a ``profile_pairs_2d(..., block=False)`` result."""
    n = res["n"]
    return {
        "delta_theta": np.asarray(res["delta_theta"])[:, :n],
        "delta_pos": np.asarray(res["delta_pos"])[:, :n],
        "final_theta": np.asarray(res["final_theta"])[:, :n],
    }


def _curve_points(yl: np.ndarray, yr: np.ndarray) -> np.ndarray:
    """(400, 2) dense curve samples = reference `allpts`
    (assets/finger_sampler.py:38-50)."""
    g = GRIPPER_2D
    xq = np.linspace(g.ctrl_x_min, g.ctrl_x_max, g.num_curve_points)
    basis = cubic_basis_matrix(g.num_ctrl, g.ctrl_x_min, g.ctrl_x_max, xq)
    pts_l = np.stack([xq, basis @ yl], -1)
    pts_r = np.stack([xq, basis @ yr], -1)
    return np.concatenate([pts_l, pts_r], axis=0)


def generate_2d(
    object_idx: int,
    contour: np.ndarray,
    gripper_indices: Sequence[int],
    save_dir: Optional[str] = None,
    chunk: int = 1500,
    grid_size: int = SIM.grid_size,
    num_pos: int = SIM.num_pos,
    calib: Optional[engine2d.Calib] = None,
) -> List[Dict[str, np.ndarray]]:
    """Profiles for one object x a block of (seed-indexed) grippers.

    Mirrors one shell iteration of ``sim/run_sim_2d.sh`` (512 grippers x 1
    object) as a single device batch. If ``save_dir`` is given, writes
    ``{object_idx}_{gripper_idx}.npz`` shards in the reference layout.
    """
    grips = [sample_gripper_2d(i) for i in gripper_indices]
    scenes = stack_scenes(
        [engine2d.make_scene(yl, yr, contour) for yl, yr in grips]
    )
    poses = engine2d.pose_grid(grid_size=grid_size, num_pos=num_pos)
    out = profile_pairs_2d(scenes, poses, chunk=chunk, calib=calib)

    records = []
    theta0 = poses[:, 2].astype(np.float32)
    obj_pos = np.concatenate(
        [poses[:, :2], np.zeros((poses.shape[0], 1))], axis=1
    ).astype(np.float32)
    for b, (gi, (yl, yr)) in enumerate(zip(gripper_indices, grips)):
        dpos3 = np.concatenate(
            [out["delta_pos"][b], np.zeros((poses.shape[0], 1))], axis=1
        ).astype(np.float32)
        rec = {
            "ctrlpts": ctrlpts_2d(yl, yr).astype(np.float32),
            "allpts": _curve_points(yl, yr).astype(np.float32),
            "object_vertices": np.asarray(contour, dtype=np.float32),
            "obj_pos": obj_pos,
            "obj_theta": theta0,
            "delta_theta": out["delta_theta"][b].astype(np.float32),
            "delta_pos": dpos3,
        }
        records.append(rec)
        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            np.savez_compressed(
                os.path.join(save_dir, "%d_%d.npz" % (object_idx, gi)), rec
            )
    return records


def throughput_workload(
    num_pairs: int = 32,
    grid_size: int = SIM.grid_size,
    num_pos: int = SIM.num_pos,
    chunk: int = 1500,
    contour: Optional[np.ndarray] = None,
    use_pallas: bool = True,
):
    """Build a ready-to-run closure for benchmarking rollout throughput."""
    if contour is None:
        # deterministic synthetic object (no Icons-50 needed on device hosts)
        ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
        rad = 0.035 * (1 + 0.25 * np.sin(3 * ang) + 0.1 * np.sin(7 * ang))
        contour = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)
    grips = [sample_gripper_2d(i) for i in range(num_pairs)]
    scenes = stack_scenes(
        [engine2d.make_scene(yl, yr, contour) for yl, yr in grips]
    )
    poses = engine2d.pose_grid(grid_size=grid_size, num_pos=num_pos)

    def run():
        return profile_pairs_2d(scenes, poses, chunk=chunk, use_pallas=use_pallas)

    total_rollouts = num_pairs * poses.shape[0]
    return run, total_rollouts

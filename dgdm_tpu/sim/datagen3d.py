"""3D interaction-profile data generation — counterpart of ``sim/sim_3d.py`` +
``sim/run_sim_3d.sh`` (300 objects x 2000 grippers, 800-step rollouts,
tip-over give-up).

Objects are watertight meshes (the reference uses the MuJoCo scanned-objects
dataset, ``model.obj`` per object directory). The give-up semantics
(``sim/sim_3d.py:159-161``) become per-rollout validity masks; a pair record
is only written when ALL rollouts stay upright, matching the reference's
all-or-nothing npz output.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import GRIPPER_3D, SIM
from dgdm_tpu.geom.fingers import ctrlpts_3d, sample_gripper_3d
from dgdm_tpu.geom.spline import gripper3d_surface
from dgdm_tpu.sim import engine3d
from dgdm_tpu.sim.engine2d import pose_grid


@functools.lru_cache(maxsize=4)
def _surface_grid_const(sample_size: int):
    """Gripper-independent pieces of :func:`surface_points_3d` — the basis
    operator and the geomdl grid x/z lattices — as HOST numpy. Round 5:
    these were rebuilt per gripper through eager device dispatch (~9 s each
    over the tunnel), which alone accounted for 421 s of the 425 s demo3d
    datagen stage (scripts/probe_demo3d_rate.py)."""
    g = GRIPPER_3D
    surf = gripper3d_surface()
    basis = np.asarray(surf.grid_basis(sample_size))
    uu = np.linspace(0, 1, sample_size)
    # geomdl grid x/z coordinates from the same basis applied to the lattices
    from dgdm_tpu.geom.spline import bspline_basis, clamped_knot_vector

    bu = bspline_basis(g.degree_u, clamped_knot_vector(g.degree_u, g.nu), g.nu, uu)
    bv = bspline_basis(g.degree_v, clamped_knot_vector(g.degree_v, g.nv), g.nv, uu)
    xs = bu @ np.linspace(g.ctrl_x_min, g.ctrl_x_max, g.nu)
    zs = bv @ np.linspace(g.ctrl_z_min, g.ctrl_z_max, g.nv)
    xg = np.repeat(xs, sample_size)
    zg = np.tile(zs, sample_size)
    return basis, xg, zg


def surface_points_3d(yl: np.ndarray, yr: np.ndarray,
                      sample_size: int = 25) -> np.ndarray:
    """Reference `allpts`: both finger surfaces evaluated on the geomdl grid
    (assets/finger_3d.py:59-67): (2 * sample_size^2, 3)."""
    basis, xg, zg = _surface_grid_const(sample_size)
    out = []
    for y in (yl, yr):
        yg = basis @ np.asarray(y).reshape(-1)
        out.append(np.stack([xg, yg, zg], -1))
    return np.concatenate(out, 0)


def profile_pairs_3d(
    stacked,
    poses: np.ndarray,
    steps: int = SIM.steps_3d,
    pose_chunk: int = 450,
    use_pallas: bool = True,
    block: bool = True,
):
    """Full pose grid for a stacked 3D scene batch -> (dth, dpos, valid),
    each (B, N). Pairs dp-shard over the device mesh exactly like the 2D
    path (sim/datagen.py) — the reference fanned 3D out over Ray identically
    (sim/run_sim_3d.sh). With ``block=False``, returns device-side
    (dth, dpos, valid, n) right after dispatch (pose axis padded) so the
    host can bake the next block while this one simulates; materialize via
    ``fetch_pairs_3d``."""
    n = poses.shape[0]
    if jax.default_backend() != "tpu":
        use_pallas = False  # Mosaic kernels compile on TPU only
    b = next(iter(jax.tree.leaves(stacked))).shape[0]
    from dgdm_tpu.parallel import mesh as meshlib

    mesh = meshlib.data_parallel_mesh()
    if mesh is not None and b % mesh.shape["dp"] != 0:
        mesh = None  # uneven pair block: fall back to single-device

    if use_pallas:
        from dgdm_tpu.sim import pallas3d

        pad = (-n) % pallas3d.LANE
        poses_p = (
            np.concatenate(
                [poses, np.broadcast_to(poses[-1], (pad,) + poses.shape[1:])],
                0,
            )
            if pad
            else poses
        )
        arrs = pallas3d.scene_arrays_3d(stacked)
        if mesh is not None:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            poses_j = jnp.asarray(poses_p)
            fn = shard_map(
                lambda *a: pallas3d.profile_batch_pallas3d(
                    *a, poses_j, steps=steps),
                mesh=mesh,
                in_specs=(P("dp"), P("dp"), P("dp")),
                out_specs=P("dp"),
                check_rep=False,
            )
            o = fn(*arrs)
        else:
            o = pallas3d.profile_batch_pallas3d(
                *arrs, jnp.asarray(poses_p), steps=steps
            )
        if not block:
            return (o[0], o[1], o[3], n)
        return (np.asarray(o[0])[:, :n], np.asarray(o[1])[:, :n],
                np.asarray(o[3])[:, :n])

    if mesh is not None:
        stacked = meshlib.shard_batch(mesh, stacked, "dp")
    dth, dpos, valid = [], [], []
    for lo in range(0, n, pose_chunk):
        pblock = jnp.asarray(poses[lo : lo + pose_chunk])
        o = engine3d.profile_batch(stacked, pblock, steps=steps)
        dth.append(o[0])
        dpos.append(o[1])
        valid.append(o[3])
    dth = jnp.concatenate(dth, 1)
    dpos = jnp.concatenate(dpos, 1)
    valid = jnp.concatenate(valid, 1)
    if not block:
        return (dth, dpos, valid, n)
    return (np.asarray(dth), np.asarray(dpos), np.asarray(valid))


def fetch_pairs_3d(res):
    """Materialize a ``profile_pairs_3d(..., block=False)`` result."""
    dth, dpos, valid, n = res
    return (np.asarray(dth)[:, :n], np.asarray(dpos)[:, :n],
            np.asarray(valid)[:, :n])


def generate_3d(
    object_idx: int,
    object_name: str,
    verts: np.ndarray,
    faces: np.ndarray,
    gripper_indices: Sequence[int],
    save_dir: Optional[str] = None,
    grid_size: int = SIM.grid_size,
    num_pos: int = SIM.num_pos,
    steps: int = SIM.steps_3d,
    pose_chunk: int = 450,
) -> List[Optional[Dict[str, np.ndarray]]]:
    """Profiles for one object x a block of grippers. Entries are None for
    pairs that tipped the object over (reference give-up)."""
    grips = [sample_gripper_3d(i) for i in gripper_indices]
    # object host work (mass integration + surface sampling) once per block,
    # not once per gripper — small-batch datagen was host-dominated
    obj_props = engine3d.object_properties_3d(verts, faces)
    scenes = [engine3d.make_scene(yl, yr, verts, faces, obj_props=obj_props)
              for yl, yr in grips]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    poses = pose_grid(grid_size=grid_size, num_pos=num_pos)
    dth, dpos, valid = profile_pairs_3d(
        stacked, poses, steps=steps, pose_chunk=pose_chunk
    )

    records: List[Optional[Dict[str, np.ndarray]]] = []
    theta0 = poses[:, 2].astype(np.float32)
    obj_pos = np.concatenate(
        [poses[:, :2], np.zeros((poses.shape[0], 1))], axis=1
    ).astype(np.float32)
    for b, (gi, (yl, yr)) in enumerate(zip(gripper_indices, grips)):
        if not valid[b].all():
            records.append(None)  # give up: object not upright
            continue
        rec = {
            "ctrlpts": ctrlpts_3d(yl, yr).astype(np.float32),
            "allpts": surface_points_3d(yl, yr).astype(np.float32),
            "object_name": object_name,
            "obj_pos": obj_pos,
            "obj_theta": theta0,
            "delta_theta": dth[b].astype(np.float32),
            "delta_pos": np.concatenate(
                [dpos[b], np.zeros((poses.shape[0], 1))], 1
            ).astype(np.float32),
        }
        records.append(rec)
        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            np.savez_compressed(
                os.path.join(save_dir, "%d_%d.npz" % (object_idx, gi)), rec
            )
    return records

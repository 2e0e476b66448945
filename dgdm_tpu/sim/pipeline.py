"""Software-pipelined production datagen — host/device overlap.

The one-shot paths (``datagen.generate_2d`` / ``datagen3d.generate_3d``)
serialize bake -> dispatch -> save, which left demo-scale throughput 5x (2D)
to 90x (3D) below the device's bench rate (VERDICT r4 items 5-6). Here the
three stages overlap, TPU-style:

- JAX dispatch is asynchronous: the kernel for block i is ENQUEUED
  (``profile_pairs_*(..., block=False)``) and the host immediately bakes
  block i+1 (gripper sampling, scene packing) while the device simulates;
- record assembly + ``np.savez_compressed`` stream to a writer thread pool
  (zlib releases the GIL), so npz writes ride under the NEXT block's device
  time as well.

Reference shape: ``sim/run_sim_2d.sh`` (1,001 objects x 1,000 grippers in
512-pair Ray waves) and ``sim/run_sim_3d.sh`` (300 x 2,000); one "work item"
here = one (object x gripper-block) wave.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import numpy as np

from dgdm_tpu.core.config import SIM
from dgdm_tpu.geom.fingers import ctrlpts_2d, ctrlpts_3d, sample_gripper_2d, \
    sample_gripper_3d
from dgdm_tpu.sim import datagen, datagen3d, engine2d, engine3d


def _write_npz(path: str, rec: Dict[str, np.ndarray],
               compress: bool = True) -> None:
    (np.savez_compressed if compress else np.savez)(path, rec)


def _submit_capped(pool, pending: List, queue_cap: int, *args) -> None:
    """Submit a write, bounding the in-flight record queue (each pending
    record pins ~1 MB of host arrays; at production scale an unbounded
    queue would grow to tens of GB on a slow-writer host)."""
    while len(pending) >= queue_cap:
        pending.pop(0).result()
    pending.append(pool.submit(_write_npz, *args))


def pipeline_2d(
    objects: Sequence[Tuple[int, np.ndarray]],
    gripper_indices: Sequence[int],
    save_dir: Optional[str] = None,
    grid_size: int = SIM.grid_size,
    num_pos: int = SIM.num_pos,
    calib=None,
    writers: int = 4,
    queue_cap: int = 512,
    compress: bool = True,
    on_records: Optional[Callable[[int, List[Dict]], None]] = None,
) -> Dict[str, float]:
    """2D datagen over ``objects`` x ``gripper_indices`` with the bake of
    wave i+1 and the npz writes of wave i-1 hidden under wave i's device
    time. Returns a throughput summary (the per-record npz layout and
    give-up-free semantics match ``datagen.generate_2d`` exactly).

    ``on_records(object_idx, records)`` (optional) receives each wave's
    records as they materialize — e.g. to subsample training rows without
    re-reading npz shards.
    """
    poses = engine2d.pose_grid(grid_size=grid_size, num_pos=num_pos)
    theta0 = poses[:, 2].astype(np.float32)
    obj_pos = np.concatenate(
        [poses[:, :2], np.zeros((poses.shape[0], 1))], 1
    ).astype(np.float32)
    # grippers are object-independent (seed-indexed): sample + ctrlpts once
    grips = [sample_gripper_2d(i) for i in gripper_indices]
    ctrl = [ctrlpts_2d(yl, yr).astype(np.float32) for yl, yr in grips]
    allp = [datagen._curve_points(yl, yr).astype(np.float32)
            for yl, yr in grips]
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)

    def bake(contour):
        scenes = datagen.stack_scenes(
            [engine2d.make_scene(yl, yr, contour) for yl, yr in grips]
        )
        return scenes

    t0 = time.time()
    pool = ThreadPoolExecutor(max_workers=writers)
    pending: List = []
    n_pairs = 0

    def drain(oi: int, contour: np.ndarray, res) -> None:
        out = datagen.fetch_pairs_2d(res)
        records = []
        for b, gi in enumerate(gripper_indices):
            rec = {
                "ctrlpts": ctrl[b],
                "allpts": allp[b],
                "object_vertices": np.asarray(contour, np.float32),
                "obj_pos": obj_pos,
                "obj_theta": theta0,
                "delta_theta": out["delta_theta"][b].astype(np.float32),
                "delta_pos": np.concatenate(
                    [out["delta_pos"][b],
                     np.zeros((poses.shape[0], 1))], 1).astype(np.float32),
            }
            records.append(rec)
            if save_dir is not None:
                _submit_capped(
                    pool, pending, queue_cap,
                    os.path.join(save_dir, "%d_%d.npz" % (oi, gi)), rec,
                    compress)
        if on_records is not None:
            on_records(oi, records)

    inflight = None  # (oi, contour, device result)
    for oi, contour in objects:
        scenes = bake(contour)  # overlaps the previous wave's device time
        res = datagen.profile_pairs_2d(scenes, poses, calib=calib,
                                       block=False)
        if inflight is not None:
            drain(*inflight)
        inflight = (oi, contour, res)
        n_pairs += len(gripper_indices)
    if inflight is not None:
        drain(*inflight)
    for f in pending:
        f.result()
    pool.shutdown()
    dt = time.time() - t0
    rolls = n_pairs * poses.shape[0]
    return {"pairs": n_pairs, "rollouts": rolls, "seconds": dt,
            "rollouts_per_sec": rolls / dt}


def pipeline_3d(
    objects: Sequence[Tuple[int, str, np.ndarray, np.ndarray]],
    gripper_indices: Sequence[int],
    save_dir: Optional[str] = None,
    grid_size: int = SIM.grid_size,
    num_pos: int = SIM.num_pos,
    steps: int = SIM.steps_3d,
    writers: int = 4,
    queue_cap: int = 512,
    compress: bool = True,
    on_records: Optional[Callable[[int, List], None]] = None,
) -> Dict[str, float]:
    """3D counterpart of :func:`pipeline_2d` over
    ``(object_idx, name, verts, faces)`` items. Give-up pairs (any tipped
    rollout) yield ``None`` records and no npz, matching
    ``datagen3d.generate_3d`` / the reference's all-or-nothing output
    (``sim/sim_3d.py:159-161``)."""
    poses = engine2d.pose_grid(grid_size=grid_size, num_pos=num_pos)
    theta0 = poses[:, 2].astype(np.float32)
    obj_pos = np.concatenate(
        [poses[:, :2], np.zeros((poses.shape[0], 1))], 1
    ).astype(np.float32)
    grips = [sample_gripper_3d(i) for i in gripper_indices]
    ctrl = [ctrlpts_3d(yl, yr).astype(np.float32) for yl, yr in grips]
    allp = [datagen3d.surface_points_3d(yl, yr).astype(np.float32)
            for yl, yr in grips]
    if save_dir is not None:
        os.makedirs(save_dir, exist_ok=True)

    def bake(verts, faces):
        obj_props = engine3d.object_properties_3d(verts, faces)
        scenes = [engine3d.make_scene(yl, yr, verts, faces,
                                      obj_props=obj_props)
                  for yl, yr in grips]
        return jax.tree.map(lambda *xs: np.stack(xs), *scenes)

    t0 = time.time()
    pool = ThreadPoolExecutor(max_workers=writers)
    pending: List = []
    n_pairs = 0
    n_valid = [0]

    def drain(oi: int, name: str, res) -> None:
        dth, dpos, valid = datagen3d.fetch_pairs_3d(res)
        records = []
        for b, gi in enumerate(gripper_indices):
            if not valid[b].all():
                records.append(None)
                continue
            rec = {
                "ctrlpts": ctrl[b],
                "allpts": allp[b],
                "object_name": name,
                "obj_pos": obj_pos,
                "obj_theta": theta0,
                "delta_theta": dth[b].astype(np.float32),
                "delta_pos": np.concatenate(
                    [dpos[b], np.zeros((poses.shape[0], 1))], 1
                ).astype(np.float32),
            }
            records.append(rec)
            n_valid[0] += 1
            if save_dir is not None:
                _submit_capped(
                    pool, pending, queue_cap,
                    os.path.join(save_dir, "%d_%d.npz" % (oi, gi)), rec,
                    compress)
        if on_records is not None:
            on_records(oi, records)

    inflight = None
    for oi, name, verts, faces in objects:
        stacked = bake(verts, faces)
        res = datagen3d.profile_pairs_3d(stacked, poses, steps=steps,
                                         block=False)
        if inflight is not None:
            drain(*inflight)
        inflight = (oi, name, res)
        n_pairs += len(gripper_indices)
    if inflight is not None:
        drain(*inflight)
    for f in pending:
        f.result()
    pool.shutdown()
    dt = time.time() - t0
    rolls = n_pairs * poses.shape[0]
    return {"pairs": n_pairs, "pairs_valid": n_valid[0], "rollouts": rolls,
            "seconds": dt, "rollouts_per_sec": rolls / dt}

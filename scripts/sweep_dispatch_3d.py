"""Sweep the 3D datagen dispatch shape on the real chip.

bench.py measures 3D squeeze throughput at 8 pairs x 1,152 poses (9,216
rollouts/dispatch). Production datagen (sim/run_sim_3d.sh: 301 objects x
2,000 grippers x 9,000 poses) dispatches far bigger blocks, and the Pallas
grid is (pairs, poses/128) sequential programs per core — bigger dispatches
amortize dispatch/tail overhead. This sweep measures rollouts/s across
dispatch shapes to pick the bench + datagen default.

Usage: python scripts/sweep_dispatch_3d.py
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_dgdm")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.geom.fingers import sample_gripper_3d
from dgdm_tpu.geom.mesh3d import box_mesh
from dgdm_tpu.sim import engine3d, pallas3d


def measure(num_pairs: int, num_poses: int, repeats: int = 3) -> float:
    # odd repeat count: np.median of 2 is a mean and loses the tunnel-spike
    # robustness per-dispatch median timing exists for (bench.py uses 3)
    verts, faces = box_mesh()
    scenes = [
        engine3d.make_scene(*sample_gripper_3d(i), verts, faces)
        for i in range(num_pairs)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    rng = np.random.RandomState(0)
    poses = np.stack(
        [
            rng.uniform(-0.03, 0.03, num_poses),
            rng.uniform(-0.03, 0.03, num_poses),
            rng.uniform(0, 2 * np.pi, num_poses),
        ],
        -1,
    ).astype(np.float32)
    arrs = pallas3d.scene_arrays_3d(stacked)

    def run():
        o = pallas3d.profile_batch_pallas3d(*arrs, jnp.asarray(poses))
        jax.block_until_ready(o)

    run()  # compile + warm
    rates = []
    for _ in range(repeats):
        t0 = time.time()
        run()
        rates.append(num_pairs * num_poses / (time.time() - t0))
    return float(np.median(rates))


def main():
    out = {}
    shapes = [(8, 1152), (16, 4608), (32, 9088)]
    if "--full" in sys.argv:
        shapes = [(8, 1152), (16, 1152), (8, 4608), (16, 4608),
                  (32, 4608), (16, 9088), (32, 9088)]
    for pairs, poses in shapes:
        try:
            r = measure(pairs, poses)
        except Exception as e:  # OOM at the big end is informative, not fatal
            out[f"{pairs}x{poses}"] = f"error: {str(e)[:120]}"
            print(f"{pairs:4d} x {poses:5d}: ERROR {str(e)[:120]}", flush=True)
            continue
        out[f"{pairs}x{poses}"] = r
        print(f"{pairs:4d} x {poses:5d}: {r:,.0f} rollouts/s", flush=True)
    path = os.path.join(os.path.dirname(__file__), "..", "runs", "calib",
                        "sweep_dispatch_3d.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("saved", path)


if __name__ == "__main__":
    main()

"""Throughput probe: 3D kernel rollouts/s vs (newton_iters, contact points).

VERDICT r4 item 1 groundwork — before shipping a NIT/point-count reduction
(each needs its own held-out recalibration: runs/calib/calib3d_search_nit*),
measure what each knob actually buys at the bench shape (8 pairs x 1,152
poses x 800-step squeezes, bench.measure_tpu_3d).

    python scripts/probe_nit_speed_3d.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.geom.fingers import sample_gripper_3d
from dgdm_tpu.geom.mesh3d import box_mesh
from dgdm_tpu.sim import engine3d, pallas3d

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def rate_at(num_points: int, nit: int, num_pairs: int = 8,
            num_poses: int = 1152) -> float:
    verts, faces = box_mesh()
    scenes = [
        engine3d.make_scene(*sample_gripper_3d(i), verts, faces,
                            num_points=num_points)
        for i in range(num_pairs)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    rng = np.random.RandomState(0)
    poses = np.stack(
        [rng.uniform(-0.03, 0.03, num_poses),
         rng.uniform(-0.03, 0.03, num_poses),
         rng.uniform(0, 2 * np.pi, num_poses)], -1).astype(np.float32)
    arrs = pallas3d.scene_arrays_3d(stacked)

    def run():
        o = pallas3d.profile_batch_pallas3d(
            *arrs, jnp.asarray(poses), newton_iters=nit)
        jax.block_until_ready(o)

    run()
    rates = []
    for _ in range(3):
        t0 = time.time()
        run()
        rates.append(num_pairs * num_poses / (time.time() - t0))
    return float(np.median(rates))


def main():
    os.makedirs(OUT, exist_ok=True)
    out = {"device": jax.devices()[0].device_kind, "rows": []}
    for pts in (192, 128):
        for nit in (6, 4, 3):
            r = rate_at(pts, nit)
            row = {"num_points": pts, "newton_iters": nit,
                   "rollouts_per_sec": round(r, 1)}
            print(json.dumps(row), flush=True)
            out["rows"].append(row)
    base = out["rows"][0]["rollouts_per_sec"]
    for row in out["rows"]:
        row["speedup_vs_p192_nit6"] = round(
            row["rollouts_per_sec"] / base, 3)
    with open(os.path.join(OUT, "probe_nit_speed.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("saved", flush=True)


if __name__ == "__main__":
    main()

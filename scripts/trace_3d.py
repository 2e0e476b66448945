"""Capture an xprof trace of the 3D squeeze kernel at the bench shape.

VERDICT r4 item 1: the 3D throughput defense needs a committed trace, not
just analytic accounting. This runs bench.measure_tpu_3d's exact workload
(8 pairs x 1,152 poses x 800-step squeezes) under ``jax.profiler.trace``
and records wall-per-dispatch alongside, so the trace shows whether the
device is saturated (one grid of fused Mosaic programs, no host gaps)
or idle-bubbled.

    python scripts/trace_3d.py          # writes runs/trace3d/
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

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "trace3d")


def main():
    os.makedirs(OUT, exist_ok=True)
    num_pairs, num_poses = 8, 1152
    verts, faces = box_mesh()
    scenes = [engine3d.make_scene(*sample_gripper_3d(i), verts, faces)
              for i in range(num_pairs)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    rng = np.random.RandomState(0)
    poses = np.stack(
        [rng.uniform(-0.03, 0.03, num_poses),
         rng.uniform(-0.03, 0.03, num_poses),
         rng.uniform(0, 2 * np.pi, num_poses)], -1).astype(np.float32)
    arrs = pallas3d.scene_arrays_3d(stacked)
    poses_j = jnp.asarray(poses)

    def run():
        o = pallas3d.profile_batch_pallas3d(*arrs, poses_j)
        jax.block_until_ready(o)

    run()  # compile outside the trace
    times = []
    with jax.profiler.trace(OUT):
        for _ in range(3):
            t0 = time.time()
            run()
            times.append(time.time() - t0)
    rate = num_pairs * num_poses / float(np.median(times))
    summary = {
        "device": jax.devices()[0].device_kind,
        "workload": {"pairs": num_pairs, "poses": num_poses, "steps": 800},
        "wall_s_per_dispatch": [round(t, 4) for t in times],
        "rollouts_per_sec": round(rate, 1),
    }
    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()

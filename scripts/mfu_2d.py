"""2D Pallas kernel throughput accounting (round 4; VERDICT r3 item 5).

Phase-structured cost breakdown of ``pallas2d.profile_batch_pallas`` at the
bench shape, for both solvers, to locate the Newton kernel's gap to the
Jacobi kernel (213k vs 287k rollouts/s in BENCH_r03):

  - steps sweep (50/140/200): travel-phase vs contact-phase marginal cost
  - solver comparison at each phase
  - roofline estimate for the contact phase

    python scripts/mfu_2d.py [--pairs 256]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_dgdm")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.geom.fingers import sample_gripper_2d
from dgdm_tpu.sim import engine2d, pallas2d
from dgdm_tpu.sim.datagen import stack_scenes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=256)
    ap.add_argument("--poses", type=int, default=9088)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "runs", "calib", "mfu_2d.json"))
    args = ap.parse_args()

    ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    rad = 0.035 * (1 + 0.25 * np.sin(3 * ang) + 0.1 * np.sin(7 * ang))
    contour = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)
    scenes = stack_scenes([
        engine2d.make_scene(*sample_gripper_2d(i), contour)
        for i in range(args.pairs)])
    poses = engine2d.pose_grid()[: args.poses]
    pad = (-poses.shape[0]) % pallas2d.LANE
    if pad:
        poses = np.concatenate(
            [poses, np.broadcast_to(poses[-1], (pad,) + poses.shape[1:])], 0)
    poses_j = jnp.asarray(poses)
    arrs = pallas2d.scene_arrays(scenes)
    n_roll = args.pairs * poses.shape[0]
    n_prog = n_roll // pallas2d.LANE

    def timed(steps, solver, repeats=3):
        def run():
            o = pallas2d.profile_batch_pallas(
                *arrs, poses_j, steps=steps, solver=solver)
            jax.block_until_ready(o)
        run()
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
        return float(np.median(ts))

    report = {"pairs": args.pairs, "programs": int(n_prog)}
    for solver in ("newton", "jacobi"):
        rows = []
        for steps in (50, 140, 200):
            dt = timed(steps, solver)
            rows.append({"steps": steps, "t": dt,
                         "rollouts_per_sec": n_roll / dt})
            print(f"{solver:7s} steps={steps:3d}  t={dt:.3f}s  "
                  f"{n_roll/dt:,.0f} rollouts/s", flush=True)
        t50, t140, t200 = rows[0]["t"], rows[1]["t"], rows[2]["t"]
        early_us = (t140 - t50) / 90 / n_prog * 1e6
        late_us = (t200 - t140) / 60 / n_prog * 1e6
        report[solver] = {
            "steps_sweep": rows,
            "early_phase_us_per_program_step": early_us,
            "late_phase_us_per_program_step": late_us,
        }
        print(f"{solver:7s} early(50-140) {early_us:.3f} us/prog-step; "
              f"late(140-200) {late_us:.3f} us/prog-step", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()

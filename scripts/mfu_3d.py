"""3D Pallas kernel throughput accounting (VERDICT r3 item 3).

Measures where `pallas3d.profile_batch_pallas3d` time goes at the bench
shape and prints a roofline-style accounting:

  - dispatch-shape sweep (pairs x poses): fixed overhead vs per-rollout cost
  - steps sweep: per-step marginal cost (isolates dispatch/compile overhead)
  - solver comparison (newton vs jacobi kernel)
  - optional xprof trace (--profile_dir runs/profile3d)

Analytic FLOP estimate: the kernel is VPU-bound (elementwise (P, LANE)
f32 ops; no matmuls), so the roofline peak is the VPU rate, not the MXU.
We count vector FLOPs from the kernel structure per full-solve step and
per travel step, times the measured step mix.

    python scripts/mfu_3d.py [--pairs 8] [--poses 1152] [--profile_dir D]
"""

import argparse
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


def make_inputs(num_pairs, num_poses):
    verts, faces = box_mesh()
    scenes = [
        engine3d.make_scene(*sample_gripper_3d(i), verts, faces)
        for i in range(num_pairs)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    rng = np.random.RandomState(0)
    poses = np.stack(
        [rng.uniform(-0.03, 0.03, num_poses),
         rng.uniform(-0.03, 0.03, num_poses),
         rng.uniform(0, 2 * np.pi, num_poses)], -1).astype(np.float32)
    arrs = pallas3d.scene_arrays_3d(stacked)
    return arrs, jnp.asarray(poses)


def timed(arrs, poses, steps=800, solver=None, repeats=3, **kw):
    def run():
        o = pallas3d.profile_batch_pallas3d(
            *arrs, poses, steps=steps, solver=solver, **kw)
        jax.block_until_ready(o)

    run()
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--poses", type=int, default=1152)
    ap.add_argument("--profile_dir", default=None)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "runs", "calib", "mfu_3d.json"))
    args = ap.parse_args()

    report = {"device": str(jax.devices()[0].device_kind)}

    # 1. steps sweep at the bench shape: marginal per-step cost
    arrs, poses = make_inputs(args.pairs, args.poses)
    n_roll = args.pairs * args.poses
    rows = []
    for steps in (100, 400, 800):
        dt = timed(arrs, poses, steps=steps)
        rows.append({"steps": steps, "t": dt,
                     "rollouts_per_sec": n_roll / dt})
        print(f"steps={steps:4d}  t={dt:.3f}s  {n_roll/dt:,.0f} rollouts/s",
              flush=True)
    # the cost is PHASE-structured, not linear in steps: steps 0-400 are
    # almost entirely the travel fast path (near-free), the contact phase
    # lands in 400-800 — report per-phase marginal costs instead of one
    # global linear fit
    report["steps_sweep"] = rows
    grid_programs = args.pairs * (args.poses // pallas3d.LANE)
    report["grid_programs"] = grid_programs
    t100, t400, t800 = (rows[0]["t"], rows[1]["t"], rows[2]["t"])
    travel_us = (t400 - t100) / 300 / grid_programs * 1e6
    contact_us = (t800 - t400) / 400 / grid_programs * 1e6
    report["travel_phase_us_per_program_step"] = travel_us
    report["contact_phase_us_per_program_step"] = contact_us
    per_prog_step_us = contact_us  # the phase that costs
    print(f"travel phase {travel_us:.2f} us/program-step; contact phase "
          f"{contact_us:.2f} us/program-step over {grid_programs} programs "
          f"({pallas3d.LANE} rollouts x P points); contact/travel ratio "
          f"{contact_us / max(travel_us, 1e-9):,.0f}x", flush=True)

    # 2. dispatch-shape sweep: pairs scaling (fixed 800 steps)
    shape_rows = []
    for pairs in (8, 32, 64):
        a2, p2 = make_inputs(pairs, args.poses)
        dt = timed(a2, p2, steps=800)
        r = pairs * args.poses / dt
        shape_rows.append({"pairs": pairs, "rollouts_per_sec": r})
        print(f"pairs={pairs:3d}  {r:,.0f} rollouts/s", flush=True)
    report["pairs_sweep"] = shape_rows

    # 3. solver comparison
    for solver in ("newton", "jacobi"):
        dt = timed(arrs, poses, steps=800, solver=solver)
        report[f"rollouts_per_sec_{solver}"] = n_roll / dt
        print(f"solver={solver:7s}  {n_roll/dt:,.0f} rollouts/s", flush=True)

    # 4. roofline accounting for the Newton kernel. Vector-FLOP estimate per
    # program-step from the kernel structure (pallas3d._rollout3d_kernel):
    # every op is elementwise over (P, LANE) f32 — no MXU work. Counted from
    # the code: full solve ~= narrow phase (2 surface evals ~70 ops) +
    # frames/admittances ~160 + NIT x (forces/grad/hessian assembly ~340 +
    # 8x8 Cholesky+solve (~250 scalar ops, LANE-wide) + line search ~120).
    P = int(np.asarray(arrs[1]).shape[1])
    L = pallas3d.LANE
    nit = 6
    flops_full = (70 + 160 + nit * (340 + 120)) * P * L + nit * 250 * L
    # roofline for the CONTACT phase alone (every step a full solve);
    # the travel phase is measured separately above and is ~free
    flops_step = flops_full
    t_step = contact_us * 1e-6
    vpu_flops = flops_step / t_step
    report["est_vector_flops_per_program_step"] = flops_step
    report["est_vpu_gflops"] = vpu_flops / 1e9
    # v5e VPU peak: 8 ALUs x (8x128) lanes x ~0.94 GHz ~= 7.5 Top/s West;
    # use 4 Tops as a conservative usable-peak band
    report["est_vpu_utilization_vs_4T"] = vpu_flops / 4e12
    print(f"est vector throughput {vpu_flops/1e12:.2f} Tflop/s "
          f"(~{100*vpu_flops/4e12:.0f}% of a 4T VPU band)", flush=True)

    if args.profile_dir:
        os.makedirs(args.profile_dir, exist_ok=True)
        with jax.profiler.trace(args.profile_dir):
            timed(arrs, poses, steps=800, repeats=1)
        print(f"xprof trace -> {args.profile_dir}", flush=True)
        report["profile_dir"] = args.profile_dir

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()

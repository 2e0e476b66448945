"""Measure the frozen-grip opportunity in the 3D squeeze (round 4).

The MFU accounting (runs/calib/mfu_3d.json) shows the 800-step squeeze's
cost is concentrated in the post-onset contact phase (~28.6 us/program-step
vs ~0.05 for travel, near the VPU roofline) — so the remaining lever is
running FEWER full solves. Candidate: once a normal step's solve returns
all post-solve velocities (object AND jaw) below EPS, the state is an
epsilon-exact fixed point of the step map (positions frozen => identical
solve next step), so the kernel can skip work until the next regrasp.

This probe runs the pure-JAX engine over a pose batch, records the
per-step post-solve motion metric, and reports per-lane "frozen-from"
steps (first step after which motion stays < EPS forever) plus the
per-128-lane-block min — the fraction of contact-phase steps a
block-gated frozen fast path would actually skip.

    JAX_PLATFORMS=cpu python scripts/probe_frozen_3d.py --pairs 2 ...
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import SIM
from dgdm_tpu.geom.fingers import sample_gripper_3d
from dgdm_tpu.geom.mesh3d import box_mesh
from dgdm_tpu.sim import engine3d

EPS = 1e-4   # pallas3d.EPS_SETTLED


def motion_trace(scene, pose, steps, regrasp_every=0):
    state0 = engine3d.init_state(scene, pose)
    ctrl = jnp.array([SIM.ctrl_3d, -SIM.ctrl_3d], jnp.float32)

    def body(state, i):
        if regrasp_every:
            rg = (i % regrasp_every == 0) & (i > 0)
        else:
            rg = None
        new = engine3d.step(scene, state, ctrl, SIM.dt, regrasp=rg)
        mot = jnp.maximum(
            jnp.max(jnp.abs(new.vel)),
            jnp.maximum(jnp.max(jnp.abs(new.om)), jnp.max(jnp.abs(new.qd))))
        return new, mot

    _, mots = jax.lax.scan(body, state0, jnp.arange(steps))
    return mots


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--poses", type=int, default=256)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--regrasp_every", type=int, default=0)
    ap.add_argument("--grid", action="store_true",
                    help="use the production pose grid order, not random")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "runs", "calib",
        "probe_frozen_3d.json"))
    args = ap.parse_args()

    verts, faces = box_mesh()
    if args.grid:
        from dgdm_tpu.sim.engine2d import pose_grid
        poses = pose_grid()[: args.poses]
    else:
        rng = np.random.RandomState(0)
        poses = np.stack(
            [rng.uniform(-0.03, 0.03, args.poses),
             rng.uniform(-0.03, 0.03, args.poses),
             rng.uniform(0, 2 * np.pi, args.poses)], -1).astype(np.float32)
    poses = jnp.asarray(poses)

    fn = jax.jit(jax.vmap(
        lambda p, sc: motion_trace(sc, p, args.steps, args.regrasp_every),
        in_axes=(0, None)), static_argnames=())

    frozen_from_all, tails = [], []
    for i in range(args.pairs):
        scene = engine3d.make_scene(*sample_gripper_3d(i), verts, faces)
        mots = np.asarray(fn(poses, scene))          # (N, T)
        above = mots >= EPS
        # last step with motion >= EPS; frozen-from = that + 1
        last = np.where(above.any(1), args.steps - 1 -
                        above[:, ::-1].argmax(1), -1)
        frozen_from_all.append(last + 1)
        tails.append(mots[:, -100:])                 # hold-phase motion
    ff = np.concatenate(frozen_from_all)             # (pairs*N,)
    tail = np.concatenate(tails)                     # (pairs*N, 100)
    tail_med = np.median(tail, 1)                    # per-lane steady motion

    T = args.steps
    lane = 128
    blocks = ff.reshape(-1, lane)
    block_ff = blocks.max(1)                         # block waits for worst lane
    report = {
        "pairs": args.pairs, "poses": args.poses, "steps": T,
        "regrasp_every": args.regrasp_every,
        "grid_order": bool(args.grid),
        "frozen_from_pct": {
            "p10": float(np.percentile(ff, 10)),
            "p50": float(np.percentile(ff, 50)),
            "p90": float(np.percentile(ff, 90)),
            "never_frozen_frac": float(np.mean(ff >= T)),
        },
        "mean_skippable_frac_per_lane": float(np.mean((T - ff) / T)),
        "mean_skippable_frac_per_block": float(np.mean((T - block_ff) / T)),
        "block_frozen_from_p50": float(np.percentile(block_ff, 50)),
        # steady-state hold motion: is the residual numerical jitter (a
        # higher freeze epsilon works) or real creep (freezing would change
        # the physics)?
        "tail_motion_per_lane_median": {
            "p10": float(np.percentile(tail_med, 10)),
            "p50": float(np.percentile(tail_med, 50)),
            "p90": float(np.percentile(tail_med, 90)),
            "p99": float(np.percentile(tail_med, 99)),
        },
    }
    print(json.dumps(report, indent=1))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()

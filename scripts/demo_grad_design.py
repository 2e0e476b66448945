"""Design-in-the-simulator demo: optimize finger control points against the
TPU engine's simulated task objective, then verify the designs in MuJoCo.

This exercises a capability the reference pipeline cannot offer (its physics
is MuJoCo's C engine on CPU workers — one rollout per core — which is why its
design loop needs a learned dynamics surrogate + classifier guidance,
``generator/diffusion.py:430-539``): here every optimizer iteration evaluates
a batch of perturbed candidate grippers x orientations as one fused rollout
dispatch, ascending the pose-jitter-smoothed simulated objective directly
(design/graddesign.py ``method="smoothed"``; the backprop estimator is
measured anti-informative on these chaotic rollouts — see the module
docstring and scripts/diag_graddesign_estimators.py).

Protocol (per objective x start seed) — defaults below ARE the protocol:
  1. start from a procedural gripper (the generator's training distribution)
  2. ascend the smoothed mean objective over a 36-orientation grid
     (Adam lr 1e-3 + projection into the ctrl-y range); the returned design
     is the PAIRED held-out argmax over iterates, start included — it can
     never score below the start on the engine metric
  3. evaluate start vs designed gripper on a DENSER held-out grid (96
     orientations), in BOTH the engine and the MuJoCo oracle (48
     orientations) — the oracle never participates in the optimization.

Writes runs/grad_design/summary.json.

Usage: python scripts/demo_grad_design.py [--iters 50] [--seeds 0 1]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_dgdm")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "grad_design")

# (objective key, delta index, desired sign, success threshold)
OBJECTIVES = [
    ("rotate_clockwise", 0, -1.0, 0.03),
    ("shift_left", 2, -1.0, 0.003),
]


def eval_engine(yl, yr, contour, num_rot):
    import jax.numpy as jnp

    from dgdm_tpu.design.graddesign import pose_grid
    from dgdm_tpu.sim import engine2d

    scene = engine2d.make_scene(yl, yr, contour)
    th = np.linspace(0, 2 * np.pi, num_rot, endpoint=False)
    poses = jnp.asarray(
        np.stack([np.zeros_like(th), np.zeros_like(th), th], -1), jnp.float32)
    dth, dpos, _ = engine2d.profile(scene, poses)
    return np.asarray(dth), np.asarray(dpos)


def eval_oracle(yl, yr, contour, num_rot):
    from dgdm_tpu.sim.oracle import Oracle2D

    oracle = Oracle2D(yl, yr, contour)
    dth, dpos = [], []
    for th in np.linspace(0, 2 * np.pi, num_rot, endpoint=False):
        d, p, _ = oracle.rollout(0.0, 0.0, float(th))
        dth.append(d)
        dpos.append(p[:2])
    return np.asarray(dth), np.asarray(dpos)


def stats(dth, dpos, idx, sign, thresh):
    d = np.stack([dth, dpos[:, 0], dpos[:, 1]], -1)
    v = sign * d[:, idx]
    return {
        "mean": float(np.mean(v)),
        "success_rate": float(np.mean(v > thresh)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--num_rot", type=int, default=36)
    ap.add_argument("--eval_rot", type=int, default=96)
    ap.add_argument("--oracle_rot", type=int, default=48)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1])
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--method", default="smoothed",
                    choices=["smoothed", "backprop"])
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)

    from dgdm_tpu.design.graddesign import design_gradient_2d
    from dgdm_tpu.geom.fingers import sample_gripper_2d

    ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    rad = 0.035 * (1 + 0.2 * np.sin(3 * ang) + 0.08 * np.cos(5 * ang))
    contour = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)

    summary = {"config": vars(args), "results": []}
    for obj_key, idx, sign, thresh in OBJECTIVES:
        for seed in args.seeds:
            yl0, yr0 = sample_gripper_2d(seed)
            t0 = time.time()
            out = design_gradient_2d(
                yl0, yr0, contour, objective=obj_key,
                num_rot=args.num_rot, iters=args.iters, lr=args.lr,
                method=args.method, seed=seed,
            )
            opt_s = time.time() - t0
            yl1, yr1 = out["y"][0].astype(np.float64), out["y"][1].astype(
                np.float64)

            ed0 = stats(*eval_engine(yl0, yr0, contour, args.eval_rot),
                        idx, sign, thresh)
            ed1 = stats(*eval_engine(yl1, yr1, contour, args.eval_rot),
                        idx, sign, thresh)
            od0 = stats(*eval_oracle(yl0, yr0, contour, args.oracle_rot),
                        idx, sign, thresh)
            od1 = stats(*eval_oracle(yl1, yr1, contour, args.oracle_rot),
                        idx, sign, thresh)
            rec = {
                "objective": obj_key, "seed": seed,
                "optimize_seconds": round(opt_s, 1),
                "objective_history": [round(h, 4) for h in out["history"]],
                "holdout": [round(h, 4) for h in out["holdout"]],
                "best_iter": out["best_iter"],
                "engine_start": ed0, "engine_designed": ed1,
                "mujoco_start": od0, "mujoco_designed": od1,
                "y_start": out["y0"].tolist(), "y_designed": out["y"].tolist(),
            }
            summary["results"].append(rec)
            print(
                f"{obj_key} seed {seed}: engine success "
                f"{ed0['success_rate']:.2f} -> {ed1['success_rate']:.2f}, "
                f"MuJoCo success {od0['success_rate']:.2f} -> "
                f"{od1['success_rate']:.2f} "
                f"(mean {od0['mean']:+.4f} -> {od1['mean']:+.4f}), "
                f"{opt_s:.0f}s", flush=True)

    path = os.path.join(OUT, "summary.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print("saved", path)


if __name__ == "__main__":
    main()

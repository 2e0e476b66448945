"""Measure when datagen squeezes SETTLE — the motion-vs-step distribution
that sizes a settled-early-exit in the rollout kernels.

A single-squeeze rollout (no regrasp) reaching a static fixed point (all
velocities ~ 0) stays there: every later step maps the state to itself, so
exiting the loop early is exact, not an approximation. This probe measures,
per pose over suite cases, the LAST step at which any velocity exceeds eps
— the step from which an early exit is lossless.

    JAX_PLATFORMS=cpu python scripts/probe_settle_3d.py        # engines on CPU
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.sim import engine2d, engine3d
from dgdm_tpu.core.config import SIM

SUITE3 = os.path.join(os.path.dirname(__file__), "..", "runs", "calib",
                      "oracle3d_suite.npz")
SUITE2 = os.path.join(os.path.dirname(__file__), "..", "runs", "calib",
                      "oracle2d_suite.npz")
EPS_V = 1e-4      # m/s | rad/s: 800 leftover steps drift < 4e-7 m / rad


def motion_trace_3d(scene, theta, steps):
    ctrl = jnp.array([SIM.ctrl_3d, -SIM.ctrl_3d], jnp.float32)
    state = engine3d.init_state(scene, jnp.array([0.0, 0.0, theta]))

    def body(st, i):
        new = engine3d.step(scene, st, ctrl)
        mot = jnp.maximum(
            jnp.max(jnp.abs(new.vel)),
            jnp.maximum(jnp.max(jnp.abs(new.om)),
                        jnp.max(jnp.abs(new.qd))),
        )
        return new, mot

    _, mo = jax.lax.scan(body, state, jnp.arange(steps))
    return mo


def motion_trace_2d(scene, theta, steps):
    ctrl = jnp.array([SIM.ctrl_2d, -SIM.ctrl_2d], jnp.float32)
    state = engine2d.init_state(scene, jnp.array([0.0, 0.0, theta]))

    def body(st, i):
        new = engine2d.step(scene, st, ctrl)
        mot = jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(new.vel)), jnp.abs(new.om)),
            jnp.max(jnp.abs(new.qd)),
        )
        return new, mot

    _, mo = jax.lax.scan(body, state, jnp.arange(steps))
    return mo


def last_motion_step(mo):
    idx = np.where(np.asarray(mo) > EPS_V)[0]
    return int(idx[-1]) + 1 if len(idx) else 0


def main():
    out = {"eps": EPS_V}

    d3 = np.load(SUITE3, allow_pickle=True)
    cases = range(0, 30, 3)
    thetas = np.asarray(d3["thetas"])[::4]
    settle3 = []
    f3 = jax.jit(motion_trace_3d, static_argnames=("steps",))
    for ci in cases:
        nv, nf = int(d3["nv"][ci]), int(d3["nf"][ci])
        scene = engine3d.make_scene(
            d3["yl"][ci], d3["yr"][ci], d3["verts"][ci][:nv],
            d3["faces"][ci][:nf])
        for th in thetas:
            mo = f3(scene, float(th), steps=SIM.steps_3d)
            settle3.append(last_motion_step(mo))
    out["settle_3d"] = {
        "steps": SIM.steps_3d,
        "n": len(settle3),
        "quartiles": [int(np.percentile(settle3, q))
                      for q in (25, 50, 75, 90, 100)],
        "mean": float(np.mean(settle3)),
        "mean_frac": float(np.mean(settle3)) / SIM.steps_3d,
    }
    print("3D:", out["settle_3d"], flush=True)

    d2 = np.load(SUITE2, allow_pickle=True)
    settle2 = []
    f2 = jax.jit(motion_trace_2d, static_argnames=("steps",))
    thetas2 = np.asarray(d2["thetas"])[::6]
    for ci in range(0, len(d2["yl"]), 6):
        scene = engine2d.make_scene(
            d2["yl"][ci], d2["yr"][ci], d2["contours"][ci])
        for th in thetas2:
            mo = f2(scene, float(th), steps=SIM.steps_2d)
            settle2.append(last_motion_step(mo))
    out["settle_2d"] = {
        "steps": SIM.steps_2d,
        "n": len(settle2),
        "quartiles": [int(np.percentile(settle2, q))
                      for q in (25, 50, 75, 90, 100)],
        "mean": float(np.mean(settle2)),
        "mean_frac": float(np.mean(settle2)) / SIM.steps_2d,
    }
    print("2D:", out["settle_2d"], flush=True)

    path = os.path.join(os.path.dirname(__file__), "..", "runs", "calib",
                        "probe_settle.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()

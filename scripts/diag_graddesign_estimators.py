"""Measure which design-gradient estimator actually ascends the smoothed
simulated objective — the experiment behind graddesign's ``method`` default.

Backprop (reparameterization) gradients through a 200-step crack-capture
rollout are exact for the sampled trajectory but miss the contact-bifurcation
jump terms of the jitter-SMOOTHED objective E_xy[f(y; xy)] — the quantity the
design loop optimizes. This script quantifies both estimators in the red-test
scenario of round 3 (seed-0 gripper, 3+5-lobe contour, rotate_clockwise,
8 orientations, pos_jitter 4 mm):

  1. per-draw backprop gradients: values, norms, pairwise cosine;
  2. finite steps of the smoothed objective (16 fixed eval draws) along the
     clipped MEAN backprop gradient, at +-{2e-4 .. 1e-2};
  3. an antithetic smoothed-ascent run (sigma 2e-3, 4 pairs, Adam 1e-3,
     10 iterations) tracking the same smoothed objective.

Round-4 measured result (runs/calib/graddesign_estimators.json, TPU; the CPU
run is qualitatively identical): backprop mean-grad pairwise cosine +0.64
(the draws AGREE), yet the line search along it is anti-monotone — large
positive steps DECREASE E[f] (-0.15 at +5e-3, -0.52 at +1e-2) while the
corresponding negative steps increase it (+0.15, +0.22) — anti-informative,
not merely noisy. The antithetic estimator ascends E[f] 0.16 -> 0.35 over 10
iterations on the same landscape. Hence
``design_gradient_2d(method="smoothed")`` is the default and the demo runs it.

Usage: JAX_PLATFORMS=cpu python scripts/diag_graddesign_estimators.py
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
import optax

from dgdm_tpu.core.config import GRIPPER_2D, NORM, SIM
from dgdm_tpu.design import graddesign
from dgdm_tpu.design.objectives import SIMPLE_OBJECTIVES
from dgdm_tpu.geom.fingers import sample_gripper_2d
from dgdm_tpu.sim import engine2d

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")

NUM_ROT = 8
STEPS = 200
JIT = 0.004


def _contour(n=100):
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    rad = 0.035 * (1 + 0.2 * np.sin(3 * ang) + 0.08 * np.cos(5 * ang))
    return np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)


def main():
    yl, yr = sample_gripper_2d(0)
    contour = _contour()
    obj_fn = SIMPLE_OBJECTIVES["rotate_clockwise"]
    inv_std = 1.0 / jnp.asarray(NORM.std_2d, jnp.float32)
    coef_op = graddesign._coef_operator()
    thetas = graddesign.pose_grid(NUM_ROT)[:, 2]
    ctrl = jnp.array([SIM.ctrl_2d, -SIM.ctrl_2d], jnp.float32)
    ck_step = jax.checkpoint(engine2d.step, static_argnums=(3,))

    def mean_objective(y, scene_base, xy0, step_fn):
        scene = graddesign.scene_with_y(scene_base, y[0], y[1], coef_op)

        def one(theta, xy):
            pose = jnp.concatenate([xy, theta[None]])
            state = engine2d.init_state(scene, pose)

            def body(s, _):
                return step_fn(scene, s, ctrl, SIM.dt, None, None), None

            state, _ = jax.lax.scan(body, state, None, length=STEPS)
            dth = engine2d._wrap(state.theta - theta)
            dpos = engine2d._origin_of(scene, state) - pose[:2]
            d = jnp.stack([dth, dpos[0], dpos[1]]) * inv_std
            return obj_fn(d)

        return jnp.mean(jax.vmap(one)(thetas, xy0))

    fwd = lambda y, sb, xy: mean_objective(y, sb, xy, engine2d.step)
    batch_fn = jax.jit(jax.vmap(fwd, in_axes=(0, None, 0)))
    eval_fn = jax.jit(jax.vmap(fwd, in_axes=(None, None, 0)))
    bgrad_fn = jax.jit(jax.vmap(
        jax.value_and_grad(lambda y, sb, xy: mean_objective(y, sb, xy, ck_step)),
        in_axes=(None, None, 0),
    ))

    y0 = jnp.asarray(np.stack([yl, yr]), jnp.float32)
    scene0 = engine2d.make_scene(yl, yr, contour)
    g = GRIPPER_2D
    report = {}

    K = 8
    xy_grad = jnp.asarray(
        np.random.RandomState(0).uniform(-JIT, JIT, (K, NUM_ROT, 2)),
        jnp.float32)
    xy_eval = jnp.asarray(
        np.random.RandomState(1000).uniform(-JIT, JIT, (16, NUM_ROT, 2)),
        jnp.float32)

    t0 = time.time()
    vals, grads = bgrad_fn(y0, scene0, xy_grad)
    vals, grads = np.asarray(vals), np.asarray(grads)
    norms = np.linalg.norm(grads.reshape(K, -1), axis=1)
    gn = grads.reshape(K, -1) / (norms[:, None] + 1e-12)
    cos = gn @ gn.T
    report["backprop"] = {
        "per_draw_val": vals.round(4).tolist(),
        "per_draw_grad_norm": norms.round(1).tolist(),
        "mean_pairwise_cosine": float((cos.sum() - K) / (K * K - K)),
    }
    print(f"backprop: vals {vals.round(3)}, cosine "
          f"{report['backprop']['mean_pairwise_cosine']:+.3f} "
          f"({time.time()-t0:.0f}s)", flush=True)

    clip = np.minimum(1.0, 1.0 / (norms + 1e-12))
    gmean = (grads * clip[:, None, None]).mean(0)
    gdir = jnp.asarray(gmean / (np.linalg.norm(gmean) + 1e-12))
    base = float(np.mean(np.asarray(eval_fn(y0, scene0, xy_eval))))
    line = {}
    for eps in [2e-4, 1e-3, 2e-3, 5e-3, 1e-2]:
        for s in (+1, -1):
            yp = y0 + s * eps * gdir * np.sqrt(y0.size)
            v = float(np.mean(np.asarray(eval_fn(yp, scene0, xy_eval))))
            line[f"{s*eps:+.0e}"] = round(v - base, 4)
            print(f"  step {s*eps:+8.0e} along mean backprop grad: "
                  f"dE[f] = {v-base:+.4f}", flush=True)
    report["smoothed_objective_at_y0"] = round(base, 4)
    report["backprop_line_search_delta"] = line

    # antithetic smoothed ascent on the same landscape
    E, SIGMA = 4, 2e-3
    rs = np.random.RandomState(0)
    opt = optax.adam(1e-3)
    y = y0
    opt_state = opt.init(y)
    curve = [base]
    for it in range(10):
        xi = rs.normal(size=(E,) + y0.shape).astype(np.float32)
        xy = jnp.asarray(
            rs.uniform(-JIT, JIT, (2 * E, NUM_ROT, 2)), jnp.float32)
        cands = jnp.clip(
            jnp.concatenate([y[None] + SIGMA * jnp.asarray(xi),
                             y[None] - SIGMA * jnp.asarray(xi)], 0),
            g.ctrl_y_min, g.ctrl_y_max)
        fv = np.asarray(batch_fn(cands, scene0, xy))
        ges = np.einsum("e,e...->...", (fv[:E] - fv[E:]) / (2 * SIGMA * E), xi)
        ges /= max(np.linalg.norm(ges), 1.0)
        updates, opt_state = opt.update(jnp.asarray(-ges), opt_state)
        y = jnp.clip(y + updates, g.ctrl_y_min, g.ctrl_y_max)
        curve.append(float(np.mean(np.asarray(eval_fn(y, scene0, xy_eval)))))
        print(f"  smoothed iter {it}: E[f] = {curve[-1]:+.4f}", flush=True)
    report["smoothed_ascent_curve"] = [round(c, 4) for c in curve]

    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "graddesign_estimators.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print("saved", path, f"({time.time()-t0:.0f}s total)", flush=True)


if __name__ == "__main__":
    main()

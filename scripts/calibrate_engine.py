"""Gradient-based calibration of the 2D contact engine against MuJoCo.

The engine is end-to-end differentiable (a capability the reference's
MuJoCo pipeline lacks entirely), so its effective-parameter knobs
(``engine2d.Calib``: frictions, contact gains) can be FITTED to oracle
rollouts by gradient descent on a smoothed-profile loss, instead of
hand-tuning.

    python scripts/calibrate_engine.py [--cases 4] [--steps 40]

Writes the fitted parameters + before/after statistics to
runs/calib/calib.json. The loss is the mean-squared error between
orientation-smoothed delta_theta profiles (smoothing suppresses the
contact-chaos component that is not learnable — see docs/PARITY.md).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.geom.fingers import sample_gripper_2d
from dgdm_tpu.sim import engine2d

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def make_icon(seed, size=64):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    c = size / 2
    ang = np.arctan2(yy - c, xx - c)
    r = np.hypot(xx - c, yy - c)
    rad = size * 0.35 * (
        1 + 0.25 * np.sin(3 * ang + rng.uniform(0, 6)) + 0.1 * np.sin(7 * ang)
    )
    return np.stack([np.where(r < rad, 30, 255).astype(np.uint8)] * 3, -1)


def smooth_circular(x, w=5):
    k = jnp.ones(w) / w
    xp = jnp.concatenate([x[-w:], x, x[:w]])
    return jnp.convolve(xp, k, "same")[w:-w]


def build_cases(n_cases, n_theta, steps):
    """Oracle targets for (gripper, object) pairs over a theta sweep."""
    from dgdm_tpu.sim.oracle import Oracle2D

    cases = []
    ths = np.linspace(0, 2 * np.pi, n_theta, endpoint=False)
    specs = [(3, 0), (7, 2), (11, 3), (5, 7), (9, 12), (3, 1)][:n_cases]
    for obj_seed, grip_idx in specs:
        contour = extract_contours(make_icon(obj_seed))
        yl, yr = sample_gripper_2d(grip_idx)
        oracle = Oracle2D(yl, yr, contour)
        mj = np.array([oracle.rollout(0, 0, t, steps=steps)[0] for t in ths])
        scene = engine2d.make_scene(yl, yr, contour)
        cases.append((scene, np.float32(ths), np.float32(mj)))
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=4)
    ap.add_argument("--n_theta", type=int, default=24)
    ap.add_argument("--rollout_steps", type=int, default=200)
    ap.add_argument("--opt_steps", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.08)
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)

    cases = build_cases(args.cases, args.n_theta, args.rollout_steps)
    print(f"built {len(cases)} oracle cases", flush=True)

    # optimize log-params for positivity
    init = engine2d.default_calib()
    log_params = jax.tree.map(jnp.log, init)

    def profile_fn(calib, scene, ths):
        poses = jnp.stack(
            [jnp.zeros_like(ths), jnp.zeros_like(ths), ths], -1
        )
        dth, _, _ = jax.vmap(
            lambda p: engine2d.rollout(
                scene, p, steps=args.rollout_steps, calib=calib
            )
        )(poses)
        return dth

    def loss_fn(log_p):
        calib = jax.tree.map(jnp.exp, log_p)
        total = 0.0
        for scene, ths, mj in cases:
            en = profile_fn(calib, scene, jnp.asarray(ths))
            total = total + jnp.mean(
                (smooth_circular(en) - smooth_circular(jnp.asarray(mj))) ** 2
            )
        return total / len(cases)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    l0, _ = grad_fn(log_params)
    print(f"initial loss {float(l0):.6f}", flush=True)
    lp = log_params
    import optax

    tx = optax.adam(args.lr)
    opt_state = tx.init(lp)
    for step in range(args.opt_steps):
        loss, g = grad_fn(lp)
        updates, opt_state = tx.update(g, opt_state)
        lp = jax.tree.map(lambda a, b: a + b, lp, updates)
        if step % 5 == 0:
            print(f"step {step}: loss {float(loss):.6f}", flush=True)
    fitted = jax.tree.map(jnp.exp, lp)
    l1, _ = grad_fn(lp)
    result = {
        "initial_loss": float(l0),
        "final_loss": float(l1),
        "fitted": {
            k: float(getattr(fitted, k))
            for k in ("mu_plane", "mu_finger", "mu_torsion",
                      "k_contact", "b_contact")
        },
        "defaults": {
            k: float(getattr(init, k))
            for k in ("mu_plane", "mu_finger", "mu_torsion",
                      "k_contact", "b_contact")
        },
    }
    with open(os.path.join(OUT, "calib.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1), flush=True)


if __name__ == "__main__":
    main()

"""First-order gripper design: gradient ascent THROUGH the contact rollout.

The reference's design loop is zeroth-order by construction — its physics is
MuJoCo's C engine, so task objectives can only steer generation through a
learned dynamics surrogate (classifier guidance, ``generator/diffusion.py:
430-539``). The TPU engines are differentiable end-to-end (the calibration in
``scripts/calibrate_engine.py`` already backprops through 200-step contact
rollouts), which unlocks a capability the reference cannot offer: optimize
the finger control points DIRECTLY against the simulated task outcome,

    y*  =  argmax_y   mean_poses  objective( rollout(scene(y), pose) )

with the gradient flowing through contact detection, the coupled Newton
contact solve, and the full squeeze integration.

Differentiability of the scene w.r.t. control points:

- ``Scene2D.coef_l/coef_r`` (the per-segment cubic spline coefficients that
  the contact narrow phase evaluates) are LINEAR in the 7 knot y-values —
  ``coef = einsum(C, y)`` with the constant not-a-knot operator C
  (``geom/spline.py:cubic_coef_operator``) — so they are rebuilt in-trace.
- ``Scene2D.finger_mass`` is MuJoCo-parity hull mass (host-side convex hull
  work, ``geom/polygon.py``) and only sets the kp=10 servo arrival timing.
  It is FROZEN at the current iterate's value each optimizer step (refreshed
  on the host between steps, so the value tracks y exactly while its
  second-order timing gradient is dropped).
- every object field is independent of y.

The per-pose objective is the reference's own signed objective map
(``design/objectives.py:SIMPLE_OBJECTIVES``, matching
``generator/diffusion.py:430-471``) applied to the TRUE simulated deltas,
whitened by the dataset score stds (``core/config.py:NormSpec.std_2d``) so
combined objectives (e.g. ``clockwise_left``) weight rotation vs translation
exactly like the guided sampler does.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dgdm_tpu.core.config import GRIPPER_2D, NORM, SIM
from dgdm_tpu.design.objectives import SIMPLE_OBJECTIVES
from dgdm_tpu.sim import engine2d


def _coef_operator() -> jnp.ndarray:
    from dgdm_tpu.geom.spline import cubic_coef_operator

    g = GRIPPER_2D
    return jnp.asarray(
        cubic_coef_operator(g.num_ctrl, g.ctrl_x_min, g.ctrl_x_max),
        jnp.float32,
    )


def scene_with_y(
    scene: engine2d.Scene2D, yl: jnp.ndarray, yr: jnp.ndarray,
    coef_op: Optional[jnp.ndarray] = None,
) -> engine2d.Scene2D:
    """Rebuild the y-dependent scene fields in-trace (differentiable).

    ``finger_mass`` is intentionally NOT touched — the caller keeps it at the
    host-computed hull value for the current iterate (see module docstring).
    """
    if coef_op is None:
        coef_op = _coef_operator()
    return scene.replace(
        coef_l=jnp.einsum("skn,n->sk", coef_op, yl),
        coef_r=jnp.einsum("skn,n->sk", coef_op, yr),
    )


def pose_grid(num_rot: int) -> jnp.ndarray:
    th = np.linspace(0.0, 2.0 * np.pi, num_rot, endpoint=False)
    return jnp.asarray(
        np.stack([np.zeros_like(th), np.zeros_like(th), th], -1), jnp.float32
    )


def design_gradient_2d(
    yl0: np.ndarray,
    yr0: np.ndarray,
    contour: np.ndarray,
    objective: str = "rotate_clockwise",
    num_rot: int = 36,
    steps: int = SIM.steps_2d,
    iters: int = 40,
    lr: float = 1e-3,
    pos_jitter: float = 0.004,
    calib: Optional[engine2d.Calib] = None,
    seed: int = 0,
) -> Dict:
    """Gradient-ascend the 2x7 finger control points against the simulated
    task objective on one object.

    2D crack capture is bifurcation-sensitive (MuJoCo self-corr 0.856 at a
    0.2 mm perturbation — docs/PARITY.md), so the raw 200-step objective is
    chaotic in y and plain Adam ascent diverges after a few steps (measured:
    lr 2e-3 walks the mean objective 0.27 -> -0.23 in 10 iters while the
    FIRST step improves it). Three standard stabilizers make the ascent
    usable:

    - stochastic smoothing: each iteration draws fresh (x0, y0) pose jitter
      (uniform +-pos_jitter), so the gradient estimates a jitter-averaged
      objective whose bifurcation spikes cancel;
    - global-norm gradient clipping (chaotic rollouts produce occasional
      exploding gradients);
    - best-iterate selection: the returned design is the iterate with the
      best mean objective, not the last one.

    Returns {"y": best design (2, n), "y_final": last iterate, "history":
    per-iter mean objective (whitened units), "best_iter", "y0"}.
    """
    g = GRIPPER_2D
    obj_fn = SIMPLE_OBJECTIVES[objective]
    inv_std = 1.0 / jnp.asarray(NORM.std_2d, jnp.float32)
    coef_op = _coef_operator()
    thetas = pose_grid(num_rot)[:, 2]
    ck_step = jax.checkpoint(engine2d.step, static_argnums=(3,))
    ctrl = jnp.array([SIM.ctrl_2d, -SIM.ctrl_2d], jnp.float32)

    def mean_objective(y, scene_base, xy0):
        scene = scene_with_y(scene_base, y[0], y[1], coef_op)

        def one(theta, xy):
            pose = jnp.concatenate([xy, theta[None]])
            state = engine2d.init_state(scene, pose)

            def body(s, _):
                return ck_step(scene, s, ctrl, SIM.dt, None, calib), None

            state, _ = jax.lax.scan(body, state, None, length=steps)
            dth = engine2d._wrap(state.theta - theta)
            dpos = engine2d._origin_of(scene, state) - pose[:2]
            d = jnp.stack([dth, dpos[0], dpos[1]]) * inv_std
            return obj_fn(d)

        return jnp.mean(jax.vmap(one)(thetas, xy0))

    grad_fn = jax.jit(jax.value_and_grad(mean_objective))
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))

    y = jnp.asarray(np.stack([yl0, yr0]), jnp.float32)
    y0 = np.asarray(y).copy()
    opt_state = opt.init(y)
    rs = np.random.RandomState(seed)
    history = []
    best_val, best_y, best_it = -np.inf, y0, -1
    for it in range(iters):
        # refresh the host-side hull mass at the CURRENT control points so
        # the frozen finger_mass tracks the iterate exactly
        scene_base = engine2d.make_scene(
            np.asarray(y[0], np.float64), np.asarray(y[1], np.float64),
            contour,
        )
        xy0 = jnp.asarray(
            rs.uniform(-pos_jitter, pos_jitter, (num_rot, 2)), jnp.float32)
        val, grad = grad_fn(y, scene_base, xy0)
        history.append(float(val))
        if history[-1] > best_val:
            best_val, best_y, best_it = history[-1], np.asarray(y).copy(), it
        updates, opt_state = opt.update(-grad, opt_state)  # ascent
        y = y + updates
        # projected ascent: control points stay in the generator's range
        y = jnp.clip(y, g.ctrl_y_min, g.ctrl_y_max)
    return {
        "y": best_y, "y_final": np.asarray(y), "y0": y0,
        "history": history, "best_iter": best_it,
    }

"""First-order gripper design: optimize control points against the simulator.

The reference's design loop is zeroth-order by construction — its physics is
MuJoCo's C engine, so task objectives can only steer generation through a
learned dynamics surrogate (classifier guidance, ``generator/diffusion.py:
430-539``). The TPU engine evaluates thousands of candidate rollouts per
dispatch, which unlocks a capability the reference cannot offer: optimize the
finger control points DIRECTLY against the simulated task outcome,

    y*  =  argmax_y   E_jitter  mean_poses  objective( rollout(scene(y), pose) )

Two gradient estimators are provided (``method=``):

- ``"smoothed"`` (default): antithetic Gaussian smoothing in design space —
  per iteration draw E directions xi, evaluate the simulated objective at
  y +- sigma*xi under fresh pose jitter, and ascend
  grad ~= sum_e (f+ - f-) / (2 sigma E) * xi_e. This is the gradient of the
  sigma-smoothed objective and is exact in expectation even across contact
  bifurcations. All 2*E candidates x num_rot poses run as ONE batched
  forward dispatch (no backprop), so on TPU an iteration is a single fused
  rollout batch.
- ``"backprop"``: reverse-mode through the full contact rollout (the engines
  are end-to-end differentiable; the calibration in
  ``scripts/calibrate_engine.py`` backprops through 200-step rollouts).

Why smoothed is the default — a measured pathology (round 4,
``scripts/diag_graddesign_estimators.py``): on 200-step crack-capture
rollouts the objective is chaotic below the 1e-5 control-point scale
(MuJoCo self-corr 0.856 at a 0.2 mm pose perturbation — docs/PARITY.md), and
the reparameterization gradient misses the contact-bifurcation jump terms
that dominate the smoothed landscape's slope. Measured in the red-test
scenario (runs/calib/graddesign_estimators.json): per-draw backprop gradients
agree with each other (pairwise cosine +0.64) yet the line search along their
mean is anti-monotone — large steps along it DECREASE the jitter-averaged
objective (-0.52 at +1e-2) while the mirrored steps increase it (+0.22) —
the estimator is anti-informative, not merely noisy. The antithetic
estimator ascends the same smoothed objective reliably (E[f] 0.16 -> 0.35
in 10 iterations in the same scenario).

Best-iterate selection is done on a FIXED held-out evaluation set (fresh
jitter draws disjoint from the per-iteration training draws, shared across
all iterates so comparisons are paired), and the start point is always a
candidate — the returned design can never score below the start on the
held-out engine metric. (Round-3 selection compared mean objectives computed
under different per-iteration jitter draws, so the "best" iterate could be a
lucky noise draw — the committed round-3 artifact picked such an iterate and
the MuJoCo oracle rated it WORSE than the start.)

Differentiability of the scene w.r.t. control points (backprop path):

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
    method: str = "smoothed",
    sigma: float = 2e-3,
    num_pairs: int = 4,
    holdout_draws: int = 8,
) -> Dict:
    """Optimize the 2x7 finger control points against the simulated task
    objective on one object.

    2D crack capture is bifurcation-sensitive, so both the per-iteration
    training objective and the gradient are estimated under stochastic pose
    jitter (uniform +-pos_jitter in x0/y0); ``method`` selects the gradient
    estimator (see module docstring — "smoothed" is the one that works).
    Common stabilizers for both: global-norm gradient clipping, projection
    into the generator's control range, and paired held-out best-iterate
    selection (``holdout_draws`` fixed jitter draws; the start point is
    candidate 0, so the returned design never scores below the start on the
    held-out engine metric).

    Returns {"y": best design (2, n), "y_final": last iterate, "y0": start,
    "history": per-iter training objective, "holdout": per-candidate held-out
    objective (index 0 = start), "best_iter": -1 if the start won}.
    """
    g = GRIPPER_2D
    obj_fn = SIMPLE_OBJECTIVES[objective]
    inv_std = 1.0 / jnp.asarray(NORM.std_2d, jnp.float32)
    coef_op = _coef_operator()
    thetas = pose_grid(num_rot)[:, 2]
    ctrl = jnp.array([SIM.ctrl_2d, -SIM.ctrl_2d], jnp.float32)
    ck_step = jax.checkpoint(engine2d.step, static_argnums=(3,))

    def mean_objective(y, scene_base, xy0, step_fn):
        scene = scene_with_y(scene_base, y[0], y[1], coef_op)

        def one(theta, xy):
            pose = jnp.concatenate([xy, theta[None]])
            state = engine2d.init_state(scene, pose)

            def body(s, _):
                return step_fn(scene, s, ctrl, SIM.dt, None, calib), None

            state, _ = jax.lax.scan(body, state, None, length=steps)
            dth = engine2d._wrap(state.theta - theta)
            dpos = engine2d._origin_of(scene, state) - pose[:2]
            d = jnp.stack([dth, dpos[0], dpos[1]]) * inv_std
            return obj_fn(d)

        return jnp.mean(jax.vmap(one)(thetas, xy0))

    # forward-only paths use the raw step (no rematerialization needed)
    fwd = lambda y, sb, xy: mean_objective(y, sb, xy, engine2d.step)
    # (candidates, draws) batched in one dispatch
    batch_fn = jax.jit(jax.vmap(fwd, in_axes=(0, None, 0)))
    holdout_fn = jax.jit(jax.vmap(fwd, in_axes=(None, None, 0)))
    grad_fn = jax.jit(jax.value_and_grad(
        lambda y, sb, xy: mean_objective(y, sb, xy, ck_step)))

    y = jnp.asarray(np.stack([yl0, yr0]), jnp.float32)
    y0 = np.asarray(y).copy()
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = opt.init(y)
    rs = np.random.RandomState(seed)
    # held-out jitter draws: fixed for the whole run, disjoint RNG stream
    xy_hold = jnp.asarray(
        np.random.RandomState(seed + 10_000).uniform(
            -pos_jitter, pos_jitter, (holdout_draws, num_rot, 2)
        ),
        jnp.float32,
    )

    history = []
    iterates = [y0]
    for it in range(iters):
        # refresh the host-side hull mass at the CURRENT control points so
        # the frozen finger_mass tracks the iterate exactly
        scene_base = engine2d.make_scene(
            np.asarray(y[0], np.float64), np.asarray(y[1], np.float64),
            contour,
        )
        if method == "smoothed":
            xi = rs.normal(size=(num_pairs,) + y.shape).astype(np.float32)
            xy = jnp.asarray(
                rs.uniform(-pos_jitter, pos_jitter,
                           (2 * num_pairs, num_rot, 2)),
                jnp.float32,
            )
            cands = jnp.clip(
                jnp.concatenate(
                    [y[None] + sigma * jnp.asarray(xi),
                     y[None] - sigma * jnp.asarray(xi)], 0
                ),
                g.ctrl_y_min, g.ctrl_y_max,
            )
            fv = np.asarray(batch_fn(cands, scene_base, xy))
            fp, fm = fv[:num_pairs], fv[num_pairs:]
            grad = -jnp.asarray(
                np.einsum(
                    "e,e...->...", (fp - fm) / (2 * sigma * num_pairs), xi
                )
            )  # negated: optax minimizes
            history.append(float(fv.mean()))
        elif method == "backprop":
            xy = jnp.asarray(
                rs.uniform(-pos_jitter, pos_jitter, (num_rot, 2)),
                jnp.float32,
            )
            val, grad = grad_fn(y, scene_base, xy)
            grad = -grad
            history.append(float(val))
        else:
            raise ValueError(f"unknown method {method!r}")
        updates, opt_state = opt.update(grad, opt_state)
        # projected ascent: control points stay in the generator's range
        y = jnp.clip(y + updates, g.ctrl_y_min, g.ctrl_y_max)
        iterates.append(np.asarray(y).copy())

    # paired held-out selection over (start + every iterate); each candidate
    # is evaluated under its OWN host hull mass on the shared fixed draws
    hold = np.asarray([
        float(np.mean(np.asarray(holdout_fn(
            jnp.asarray(c, jnp.float32),
            engine2d.make_scene(
                c[0].astype(np.float64), c[1].astype(np.float64), contour
            ),
            xy_hold,
        ))))
        for c in iterates
    ])  # (iters+1,)
    best = int(np.argmax(hold))
    return {
        "y": iterates[best],
        "y_final": np.asarray(y),
        "y0": y0,
        "history": history,
        "holdout": hold.tolist(),
        "best_iter": best - 1,
    }

"""Gradient-based gripper design through the differentiable 2D engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgdm_tpu.design import graddesign
from dgdm_tpu.geom.fingers import sample_gripper_2d
from dgdm_tpu.sim import engine2d


def _contour(n=100):
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    rad = 0.035 * (1 + 0.2 * np.sin(3 * ang) + 0.08 * np.cos(5 * ang))
    return np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)


def test_scene_with_y_matches_host_coefs():
    """The in-trace coef rebuild is bit-close to make_scene's host path."""
    yl, yr = sample_gripper_2d(3)
    scene = engine2d.make_scene(yl, yr, _contour())
    rebuilt = graddesign.scene_with_y(
        scene, jnp.asarray(yl, jnp.float32), jnp.asarray(yr, jnp.float32)
    )
    np.testing.assert_allclose(
        np.asarray(rebuilt.coef_l), np.asarray(scene.coef_l),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(rebuilt.coef_r), np.asarray(scene.coef_r),
        rtol=1e-5, atol=1e-7,
    )


def test_design_gradient_is_finite_and_nonzero():
    """Backprop through the 40-step contact rollout yields a usable signal."""
    yl, yr = sample_gripper_2d(0)
    contour = _contour()
    scene = engine2d.make_scene(yl, yr, contour)
    coef_op = graddesign._coef_operator()
    poses = graddesign.pose_grid(4)
    inv_std = 1.0 / jnp.asarray(graddesign.NORM.std_2d, jnp.float32)
    ck_step = jax.checkpoint(engine2d.step, static_argnums=(3,))
    ctrl = jnp.array([0.2, -0.2], jnp.float32)

    def mean_obj(y):
        sc = graddesign.scene_with_y(scene, y[0], y[1], coef_op)

        def one(pose):
            state = engine2d.init_state(sc, pose)

            def body(s, _):
                return ck_step(sc, s, ctrl, 0.002, None, None), None

            # full squeeze length: finger contact only begins ~70% in, and
            # a rollout that never touches the fingers has zero y-gradient
            state, _ = jax.lax.scan(body, state, None, length=200)
            dth = engine2d._wrap(state.theta - pose[2])
            return -dth * inv_std[0]

        return jnp.mean(jax.vmap(one)(poses))

    y = jnp.asarray(np.stack([yl, yr]), jnp.float32)
    val, grad = jax.value_and_grad(mean_obj)(y)
    assert np.isfinite(float(val))
    g = np.asarray(grad)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0.0


@pytest.mark.slow
def test_design_gradient_improves_objective():
    """A short smoothed-ascent run improves the held-out simulated objective.

    Selection is paired (fixed held-out jitter draws, start = candidate 0),
    so the assertion is that some iterate strictly beats the start on the
    held-out engine metric — the claim the round-3 artifact failed under
    MuJoCo verification.
    """
    yl, yr = sample_gripper_2d(0)
    out = graddesign.design_gradient_2d(
        yl, yr, _contour(), objective="rotate_clockwise",
        num_rot=8, steps=200, iters=8, lr=1e-3,
    )
    hist = out["history"]
    assert len(hist) == 8 and all(np.isfinite(hist))
    hold = out["holdout"]
    assert len(hold) == 9 and all(np.isfinite(hold))
    assert max(hold[1:]) > hold[0], hold
    # the returned design is the held-out argmax (can never lose to start)
    assert np.allclose(hold[out["best_iter"] + 1], max(hold))
    # projection kept the design inside the generator's control range
    g = graddesign.GRIPPER_2D
    assert out["y"].min() >= g.ctrl_y_min - 1e-6
    assert out["y"].max() <= g.ctrl_y_max + 1e-6

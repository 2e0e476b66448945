"""DDIM scheduler math tests (independent numpy recomputation + invariants)."""

import numpy as np
import jax.numpy as jnp

from dgdm_tpu.diffusion import ddim


def _np_betas(T):
    def ab(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

    return np.array(
        [min(1 - ab((i + 1) / T) / ab(i / T), 0.999) for i in range(T)]
    )


def test_betas_and_alphas():
    T = 15
    sched = ddim.make_schedule(T)
    np.testing.assert_allclose(np.asarray(sched.betas), _np_betas(T), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.alphas_cumprod), np.cumprod(1 - _np_betas(T)), atol=1e-6
    )


def test_inference_timesteps_leading_spacing():
    np.testing.assert_array_equal(
        ddim.inference_timesteps(15, 5), [12, 9, 6, 3, 0]
    )
    np.testing.assert_array_equal(ddim.prev_timesteps(15, 5), [9, 6, 3, 0, -3])
    np.testing.assert_array_equal(
        ddim.inference_timesteps(1000, 100)[:3], [990, 980, 970]
    )


def test_add_noise_formula():
    sched = ddim.make_schedule(15)
    rng = np.random.RandomState(0)
    x0 = rng.randn(4, 14, 1).astype(np.float32)
    eps = rng.randn(4, 14, 1).astype(np.float32)
    ts = np.array([0, 5, 10, 14])
    noisy = np.asarray(
        ddim.add_noise(sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(ts))
    )
    abar = np.cumprod(1 - _np_betas(15))[ts][:, None, None]
    np.testing.assert_allclose(
        noisy, np.sqrt(abar) * x0 + np.sqrt(1 - abar) * eps, atol=1e-5
    )


def test_ddim_step_perfect_epsilon_recovers_x0():
    """With the true epsilon as the model output and no clipping active,
    a full inference sweep reproduces x0 exactly (DDIM is deterministic)."""
    sched = ddim.make_schedule(15)
    rng = np.random.RandomState(1)
    x0 = np.clip(rng.randn(2, 14, 1) * 0.3, -0.99, 0.99).astype(np.float32)
    eps = rng.randn(2, 14, 1).astype(np.float32)
    ts = ddim.inference_timesteps(15, 5)
    pts = ddim.prev_timesteps(15, 5)
    # start at the highest inference timestep
    sample = np.asarray(
        ddim.add_noise(
            sched, jnp.asarray(x0), jnp.asarray(eps), jnp.asarray([ts[0], ts[0]])
        )
    )
    for t, pt in zip(ts, pts):
        abar = np.asarray(sched.alphas_cumprod)[t]
        true_eps = (sample - np.sqrt(abar) * x0) / np.sqrt(1 - abar)
        sample = np.asarray(
            ddim.ddim_step(
                sched,
                jnp.asarray(true_eps),
                jnp.asarray(t),
                jnp.asarray(pt),
                jnp.asarray(sample),
            )
        )
    np.testing.assert_allclose(sample, x0, atol=1e-4)


def test_ddim_step_clip_sample():
    """x0 outside [-1,1] is clipped; direction term uses the raw epsilon
    (diffusers 0.11.1 behavior)."""
    sched = ddim.make_schedule(15)
    sample = jnp.full((1, 2, 1), 3.0)
    noise_pred = jnp.zeros((1, 2, 1))
    t, pt = jnp.asarray(12), jnp.asarray(9)
    out = np.asarray(ddim.ddim_step(sched, noise_pred, t, pt, sample))
    abar_prev = float(np.asarray(sched.alphas_cumprod)[9])
    np.testing.assert_allclose(out, np.sqrt(abar_prev) * 1.0, atol=1e-6)


def test_final_alpha_cumprod_at_negative_prev():
    sched = ddim.make_schedule(15)
    sample = jnp.zeros((1, 2, 1))
    eps = jnp.ones((1, 2, 1))
    out = np.asarray(
        ddim.ddim_step(sched, eps, jnp.asarray(0), jnp.asarray(-3), sample)
    )
    # abar_prev = 1 -> prev sample = x0 (epsilon direction weight = 0)
    abar0 = float(np.asarray(sched.alphas_cumprod)[0])
    x0 = (0.0 - np.sqrt(1 - abar0) * 1.0) / np.sqrt(abar0)
    np.testing.assert_allclose(out, np.clip(x0, -1, 1), atol=1e-6)

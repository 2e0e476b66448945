"""DDIM scheduler as pure functions.

Math parity with diffusers' ``DDIMScheduler`` as configured by the reference
(``generator/train.py:83``, ``dynamics/trainer.py:36``):
``num_train_timesteps=15, beta_schedule='squaredcos_cap_v2', clip_sample=True,
prediction_type='epsilon'``, ``set_timesteps(5)`` with the default 'leading'
spacing and eta=0.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class DDIMSchedule(NamedTuple):
    num_train_timesteps: int
    betas: jnp.ndarray              # (T,)
    alphas_cumprod: jnp.ndarray     # (T,)
    final_alpha_cumprod: jnp.ndarray  # () = 1.0 (set_alpha_to_one default)
    clip_sample: bool


def squaredcos_cap_v2_betas(num_timesteps: int, max_beta: float = 0.999) -> np.ndarray:
    def alpha_bar(t):
        return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

    betas = []
    for i in range(num_timesteps):
        t1 = i / num_timesteps
        t2 = (i + 1) / num_timesteps
        betas.append(min(1.0 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.asarray(betas, dtype=np.float64)


@functools.lru_cache(maxsize=None)
def make_schedule(
    num_train_timesteps: int = 15, clip_sample: bool = True
) -> DDIMSchedule:
    betas = squaredcos_cap_v2_betas(num_train_timesteps)
    alphas_cumprod = np.cumprod(1.0 - betas)
    return DDIMSchedule(
        num_train_timesteps=num_train_timesteps,
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        final_alpha_cumprod=jnp.asarray(1.0, dtype=jnp.float32),
        clip_sample=clip_sample,
    )


def inference_timesteps(
    num_train_timesteps: int, num_inference_steps: int
) -> np.ndarray:
    """diffusers 'leading' spacing: e.g. 15 train / 5 inference -> [12,9,6,3,0]."""
    step_ratio = num_train_timesteps // num_inference_steps
    ts = (np.arange(num_inference_steps) * step_ratio).round().astype(np.int64)
    return ts[::-1].copy()


def add_noise(
    sched: DDIMSchedule,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """q(x_t | x_0): sqrt(abar_t) x0 + sqrt(1 - abar_t) eps. timesteps (B,)
    broadcast over trailing dims of sample."""
    abar = sched.alphas_cumprod[timesteps]
    shape = abar.shape + (1,) * (sample.ndim - abar.ndim)
    abar = abar.reshape(shape)
    return jnp.sqrt(abar) * sample + jnp.sqrt(1.0 - abar) * noise


def ddim_step(
    sched: DDIMSchedule,
    noise_pred: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    sample: jnp.ndarray,
) -> jnp.ndarray:
    """One deterministic (eta=0) DDIM update, epsilon prediction, clip_sample.

    ``prev_timestep`` may be negative, selecting final_alpha_cumprod = 1."""
    abar_t = sched.alphas_cumprod[timestep]
    abar_prev = jnp.where(
        prev_timestep >= 0,
        sched.alphas_cumprod[jnp.maximum(prev_timestep, 0)],
        sched.final_alpha_cumprod,
    )
    x0 = (sample - jnp.sqrt(1.0 - abar_t) * noise_pred) / jnp.sqrt(abar_t)
    if sched.clip_sample:
        x0 = jnp.clip(x0, -1.0, 1.0)
    # diffusers 0.11.1 (the reference pin) uses the RAW model output for the
    # direction term even when x0 was clipped (scheduling_ddim.py step())
    return jnp.sqrt(abar_prev) * x0 + jnp.sqrt(1.0 - abar_prev) * noise_pred


def prev_timesteps(
    num_train_timesteps: int, num_inference_steps: int
) -> np.ndarray:
    """prev_t for each inference timestep (diffusers: t - T // n)."""
    ts = inference_timesteps(num_train_timesteps, num_inference_steps)
    return ts - num_train_timesteps // num_inference_steps

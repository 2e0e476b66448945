"""Diffusion-generator training.

Parity with the reference Lightning module (``generator/diffusion.py:126-177,
711-728``): epsilon-prediction MSE at uniform random train timesteps, Adam at
1e-4 with cosine annealing to 0, and an EMA of the full network stepped every
batch using diffusers-0.11.1's decay schedule
``decay = clamp(1 - (1 + step)^(-power), 0, 0.9999)`` with power 0.85
(``generator/train_diffusion_2d.sh``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dgdm_tpu.core.config import DIFFUSION
from dgdm_tpu.diffusion import ddim
from dgdm_tpu.models.unet1d import ConditionalUnet1D


@flax.struct.dataclass
class GenTrainState:
    params: Any
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray


def ema_decay(step: jnp.ndarray, power: float = DIFFUSION.ema_power,
              max_value: float = 0.9999) -> jnp.ndarray:
    """diffusers 0.11.1 EMAModel.get_decay with inv_gamma=1, min_value=0."""
    value = 1.0 - (1.0 + step.astype(jnp.float32)) ** (-power)
    return jnp.clip(value, 0.0, max_value)


class GeneratorTrainer:
    def __init__(
        self,
        model: ConditionalUnet1D | None = None,
        learning_rate: float = DIFFUSION.learning_rate,
        total_steps: int = 100_000,
        num_train_timesteps: int = DIFFUSION.num_train_timesteps,
        ema_power: float = DIFFUSION.ema_power,
        warmup_steps: int = 0,
    ):
        self.model = model or ConditionalUnet1D()
        self.sched = ddim.make_schedule(num_train_timesteps)
        self.num_train_timesteps = num_train_timesteps
        self.ema_power = ema_power
        if warmup_steps > 0:
            lr = optax.warmup_cosine_decay_schedule(
                0.0, learning_rate, warmup_steps, max(total_steps, 1)
            )
        else:
            lr = optax.cosine_decay_schedule(learning_rate, max(total_steps, 1))
        self.tx = optax.adam(lr)

    def init(self, rng: jax.Array, example: jnp.ndarray) -> GenTrainState:
        t = jnp.zeros((example.shape[0],), jnp.int32)
        params = self.model.init(rng, example, t)["params"]
        return GenTrainState(
            params=params,
            ema_params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step(
        self, state: GenTrainState, batch: jnp.ndarray, rng: jax.Array
    ) -> Tuple[GenTrainState, Dict[str, jnp.ndarray]]:
        """batch: (B, L, 1) normalized control-point y values."""
        t_rng, n_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (batch.shape[0],), 0, self.num_train_timesteps)
        noise = jax.random.normal(n_rng, batch.shape)
        noisy = ddim.add_noise(self.sched, batch, noise, t)

        def loss_fn(params):
            pred = self.model.apply({"params": params}, noisy, t)
            return jnp.mean((pred - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        decay = ema_decay(state.step, self.ema_power)
        ema_params = jax.tree.map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema_params, params
        )
        new_state = GenTrainState(
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, {"loss": loss, "ema_decay": decay}

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_step(
        self, state: GenTrainState, batch: jnp.ndarray, rng: jax.Array
    ) -> Dict[str, jnp.ndarray]:
        t_rng, n_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (batch.shape[0],), 0, self.num_train_timesteps)
        noise = jax.random.normal(n_rng, batch.shape)
        noisy = ddim.add_noise(self.sched, batch, noise, t)
        pred = self.model.apply({"params": state.params}, noisy, t)
        return {"loss": jnp.mean((pred - noise) ** 2)}

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def recon_metrics(
        self,
        state: GenTrainState,
        batch: jnp.ndarray,
        rng: jax.Array,
        num_inference_steps: int = DIFFUSION.num_inference_steps,
    ) -> Dict[str, jnp.ndarray]:
        """Reconstruction check (reference validation_step,
        generator/diffusion.py:181-244): noise the clean batch at a mid
        timestep, run the full inference denoise loop, and report
        per-step noise-pred MSE, final denoise MSE, and the fraction of
        points reconstructed within 0.01.

        The reference (unintentionally) noises at train-timestep index
        ``num_inference_steps`` (=5 of 15) — i.e. a PARTIAL noising — and
        still denoises with the full schedule; reproduced here since the
        published validation numbers depend on it."""
        noise = jax.random.normal(rng, batch.shape)
        t_noise = jnp.full((batch.shape[0],), num_inference_steps)
        sample = ddim.add_noise(self.sched, batch, noise, t_noise)
        ts = jnp.asarray(
            ddim.inference_timesteps(self.num_train_timesteps, num_inference_steps)
        )
        pts = jnp.asarray(
            ddim.prev_timesteps(self.num_train_timesteps, num_inference_steps)
        )

        def body(sample, tp):
            t, pt = tp
            tb = jnp.full((sample.shape[0],), t)
            eps = self.model.apply({"params": state.params}, sample, tb)
            step_mse = jnp.mean((eps - noise) ** 2)
            return ddim.ddim_step(self.sched, eps, t, pt, sample), step_mse

        sample, step_mses = jax.lax.scan(body, sample, (ts, pts))
        return {
            "noise_pred_loss": jnp.mean(step_mses),
            "denoise_loss": jnp.mean((sample - batch) ** 2),
            "accuracy": jnp.mean((jnp.abs(sample - batch) < 0.01)
                                 .astype(jnp.float32)),
        }

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def sample(
        self,
        state: GenTrainState,
        noise: jnp.ndarray,
        num_inference_steps: int = DIFFUSION.num_inference_steps,
    ) -> jnp.ndarray:
        """Unguided DDIM sampling from pure noise using the EMA weights
        (generator/diffusion.py:246-292)."""
        ts = jnp.asarray(
            ddim.inference_timesteps(self.num_train_timesteps, num_inference_steps)
        )
        pts = jnp.asarray(
            ddim.prev_timesteps(self.num_train_timesteps, num_inference_steps)
        )

        def body(sample, tp):
            t, pt = tp
            tb = jnp.full((sample.shape[0],), t)
            eps = self.model.apply({"params": state.ema_params}, sample, tb)
            return ddim.ddim_step(self.sched, eps, t, pt, sample), None

        out, _ = jax.lax.scan(body, noise, (ts, pts))
        return out

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def sample_trajectory(
        self,
        state: GenTrainState,
        noise: jnp.ndarray,
        num_inference_steps: int = DIFFUSION.num_inference_steps,
    ):
        """Unguided DDIM sampling that also returns the per-step samples
        (S+1, B, N, 1) including the initial noise — the reference dumps the
        sample scatter at every denoising step during validation
        (generator/diffusion.py:258-292); here the trajectory is the scan's
        ys output, captured in the same single jitted loop."""
        ts = jnp.asarray(
            ddim.inference_timesteps(self.num_train_timesteps, num_inference_steps)
        )
        pts = jnp.asarray(
            ddim.prev_timesteps(self.num_train_timesteps, num_inference_steps)
        )

        def body(sample, tp):
            t, pt = tp
            tb = jnp.full((sample.shape[0],), t)
            eps = self.model.apply({"params": state.ema_params}, sample, tb)
            nxt = ddim.ddim_step(self.sched, eps, t, pt, sample)
            return nxt, nxt

        out, traj = jax.lax.scan(body, noise, (ts, pts))
        return out, jnp.concatenate([noise[None], traj], axis=0)

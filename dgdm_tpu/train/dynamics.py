"""Dynamics-model training.

Behavior parity with the reference trainer (``dynamics/trainer.py:53-103``):
the control points are DDIM-noised at a random train timestep before the
forward pass (that is what makes the net usable as a guidance classifier on
noisy samples), the timestep is rescaled to [0, 1], loss is MSE against the
whitened profile entry, optimizer Adam(0.9, 0.95) with cosine annealing to
1e-2 of the base LR. Accuracy metrics are the reference's 3-class
(negative / none / positive vs threshold/std) — vectorized instead of the
reference's Python list comprehensions (``dynamics/main.py:151-153``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from dgdm_tpu.core.config import DIFFUSION, NORM
from dgdm_tpu.diffusion import ddim
from dgdm_tpu.models.profile2d import ProfileForward2D


@flax.struct.dataclass
class DynTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class DynamicsTrainer:
    def __init__(
        self,
        model: Optional[ProfileForward2D] = None,
        learning_rate: float = 1e-4,
        weight_decay: float = 0.0,
        total_steps: int = 100_000,
        num_train_timesteps: int = DIFFUSION.num_train_timesteps,
        fingers_3d: bool = False,
        warmup_steps: int = 0,
    ):
        self.model = model or ProfileForward2D()
        self.sched = ddim.make_schedule(num_train_timesteps)
        self.num_train_timesteps = num_train_timesteps
        self.fingers_3d = fingers_3d
        self.threshold_std = jnp.asarray(NORM.threshold_std(fingers_3d))
        if warmup_steps > 0:
            lr = optax.warmup_cosine_decay_schedule(
                0.0, learning_rate, warmup_steps, max(total_steps, 1),
                end_value=0.01 * learning_rate,
            )
        else:
            lr = optax.cosine_decay_schedule(
                learning_rate, max(total_steps, 1), alpha=0.01
            )
        self.tx = optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.scale_by_adam(b1=0.9, b2=0.95),
            optax.scale_by_learning_rate(lr),
        )

    def init(self, rng: jax.Array, example: Dict[str, jnp.ndarray]) -> DynTrainState:
        variables = self.model.init(
            rng,
            example["ctrl"],
            example["ori"],
            example["pos"],
            jnp.zeros(example["ctrl"].shape[0]),
            example["obj"],
            train=True,
        )
        return DynTrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )

    def _noised_inputs(self, rng, ctrl):
        # In both 2D and 3D, `ctrl` is the y-vector of the control points, so
        # noising all of it reproduces the reference's y-row-only noising
        # (dynamics/trainer.py:67: the x/z rows get zero noise and the model
        # never reads them anyway, profile_forward_3d.py:78).
        t = jax.random.randint(
            rng, (ctrl.shape[0],), 0, self.num_train_timesteps
        )
        noise = jax.random.normal(jax.random.fold_in(rng, 1), ctrl.shape)
        noisy = ddim.add_noise(self.sched, ctrl, noise, t)
        t_rescaled = t.astype(jnp.float32) / self.num_train_timesteps
        return noisy, t_rescaled

    @functools.partial(jax.jit, static_argnums=(0,))
    def train_step(
        self, state: DynTrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Tuple[DynTrainState, Dict[str, jnp.ndarray]]:
        noisy_ctrl, t = self._noised_inputs(rng, batch["ctrl"])

        def loss_fn(params):
            pred, mut = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                noisy_ctrl,
                batch["ori"],
                batch["pos"],
                t,
                batch["obj"],
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean((pred - batch["score"]) ** 2), (pred, mut)

        (loss, (pred, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **self.class_accuracy(pred, batch["score"])}
        return (
            DynTrainState(
                params=params,
                batch_stats=mut["batch_stats"],
                opt_state=opt_state,
                step=state.step + 1,
            ),
            metrics,
        )

    @functools.partial(jax.jit, static_argnums=(0,))
    def eval_step(
        self, state: DynTrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array
    ) -> Dict[str, jnp.ndarray]:
        noisy_ctrl, t = self._noised_inputs(rng, batch["ctrl"])
        pred = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            noisy_ctrl,
            batch["ori"],
            batch["pos"],
            t,
            batch["obj"],
            train=False,
        )
        loss = jnp.mean((pred - batch["score"]) ** 2)
        return {"loss": loss, **self.class_accuracy(pred, batch["score"])}

    def class_accuracy(self, pred, score) -> Dict[str, jnp.ndarray]:
        """3-class accuracy per axis (dynamics/main.py:151-153, vectorized)."""
        th = self.threshold_std

        def cls(x):
            return jnp.where(x > th, 2, jnp.where(x < -th, 0, 1))

        eq = (cls(pred) == cls(score)).astype(jnp.float32).mean(axis=0)
        return {"acc_ori": eq[0], "acc_x": eq[1], "acc_y": eq[2]}

    def apply_eval(self, state: DynTrainState, ctrl, ori, pos, t, obj):
        """Frozen forward (the guidance classifier path): eval-mode batch
        stats, no mutation."""
        return self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            ctrl, ori, pos, t, obj, train=False,
        )

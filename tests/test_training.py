"""Training-loop smoke tests: loss decreases, EMA follows the schedule,
checkpoints round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgdm_tpu.models.profile2d import ProfileForward2D
from dgdm_tpu.models.unet1d import ConditionalUnet1D
from dgdm_tpu.train import checkpoints
from dgdm_tpu.train.data import normalize_record_2d, procedural_grippers
from dgdm_tpu.train.dynamics import DynamicsTrainer
from dgdm_tpu.train.generator import GeneratorTrainer, ema_decay


def _fake_batch(rng, n=64):
    return {
        "ctrl": jnp.asarray(rng.uniform(-1, 1, (n, 14)), jnp.float32),
        "ori": jnp.asarray(rng.uniform(-1, 1, (n, 1)), jnp.float32),
        "pos": jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32),
        "obj": jnp.asarray(rng.uniform(-1, 1, (n, 200)), jnp.float32),
        "score": jnp.asarray(rng.randn(n, 3), jnp.float32),
    }


@pytest.mark.slow
def test_dynamics_trainer_loss_decreases():
    rng = np.random.RandomState(0)
    # learnable target: score is a linear function of pose
    batch = _fake_batch(rng, 256)
    w = rng.randn(3, 3) * 2
    feats = np.concatenate([np.asarray(batch["ori"]), np.asarray(batch["pos"])], 1)
    batch["score"] = jnp.asarray(feats @ w.T, jnp.float32)

    trainer = DynamicsTrainer(
        ProfileForward2D(width=64, num_trunk=2), learning_rate=3e-3,
        total_steps=200,
    )
    state = trainer.init(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(150):
        key, k = jax.random.split(key)
        state, m = trainer.train_step(state, batch, k)
        losses.append(float(m["loss"]))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    em = trainer.eval_step(state, batch, key)
    assert np.isfinite(float(em["loss"]))
    assert 0.0 <= float(em["acc_ori"]) <= 1.0


@pytest.mark.slow
def test_generator_trainer_and_sampling():
    train, _ = procedural_grippers(64)
    trainer = GeneratorTrainer(
        ConditionalUnet1D(down_dims=(32, 64)), learning_rate=1e-3,
        total_steps=100,
    )
    batch = jnp.asarray(train[:32])
    state = trainer.init(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(60):
        key, k = jax.random.split(key)
        state, m = trainer.train_step(state, batch, k)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    noise = jax.random.normal(jax.random.PRNGKey(2), (4, 14, 1))
    out = trainer.sample(state, noise)
    assert out.shape == (4, 14, 1)
    # clip_sample guarantees the final x0 is within [-1, 1] + direction term
    assert np.abs(np.asarray(out)).max() < 2.0


def test_ema_decay_schedule():
    # diffusers 0.11.1: decay(0)=0, grows toward 0.9999
    assert float(ema_decay(jnp.asarray(0), 0.85)) == 0.0
    d10 = float(ema_decay(jnp.asarray(10), 0.85))
    assert 0.85 < d10 < 0.95
    assert float(ema_decay(jnp.asarray(10**7), 0.85)) == pytest.approx(0.9999)


def test_procedural_grippers_parity():
    """Dataset must reproduce RandomState(idx) streams (the seed IS the
    dataset, generator/train.py:42-58)."""
    train, val = procedural_grippers(20)
    assert train.shape == (18, 14, 1) and val.shape == (2, 14, 1)
    rs = np.random.RandomState(5)
    yl = rs.uniform(-0.045, 0.015, 7)
    yr = rs.uniform(-0.045, 0.015, 7)
    expect = (np.concatenate([yl, yr]) + 0.045) / 0.06 * 2 - 1
    np.testing.assert_allclose(train[5, :, 0], expect, atol=1e-6)


def test_normalize_record_2d():
    n = 10
    rec = {
        "ctrlpts": np.stack([np.linspace(-0.12, 0.12, 14),
                             np.full(14, -0.015)], 1),
        "object_vertices": np.full((100, 2), 0.05),
        "obj_pos": np.tile([0.03, -0.03, 0.0], (n, 1)),
        "obj_theta": np.full(n, np.pi),
        "delta_theta": np.full(n, 0.0565),
        "delta_pos": np.tile([0.0026, -0.0047, 0.0], (n, 1)),
    }
    out = normalize_record_2d(rec)
    np.testing.assert_allclose(out["ctrl"][0], 0.0, atol=1e-6)   # mid-range y
    np.testing.assert_allclose(out["ori"][0, 0], 0.0, atol=1e-6)  # pi -> 0
    np.testing.assert_allclose(out["pos"][0], [1.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(out["obj"][0, :2], [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(out["score"][0], [1.0, 1.0, -1.0], atol=1e-4)


def test_checkpoint_roundtrip(tmp_path):
    trainer = GeneratorTrainer(ConditionalUnet1D(down_dims=(32, 64)))
    batch = jnp.zeros((2, 14, 1))
    state = trainer.init(jax.random.PRNGKey(0), batch)
    state, _ = trainer.train_step(state, batch, jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt" / "step_1")
    checkpoints.save(path, state)
    restored = checkpoints.restore(path, state)
    assert int(restored.step) == int(state.step)
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert checkpoints.latest_step_dir(str(tmp_path / "ckpt")).endswith("step_1")

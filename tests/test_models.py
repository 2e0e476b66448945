"""Model architecture tests: shapes, jit, differentiability, parity details."""

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.models.embeddings import (
    nerf_embed,
    nerf_embed_dim,
    sinusoidal_pos_emb,
    timestep_embedding,
)
from dgdm_tpu.models.profile2d import ProfileForward2D
from dgdm_tpu.models.unet1d import ConditionalUnet1D


def test_nerf_embed_layout():
    x = jnp.asarray([[0.5, -0.25]])
    e = np.asarray(nerf_embed(x, multires=4))
    assert e.shape == (1, nerf_embed_dim(2, 4)) == (1, 18)
    np.testing.assert_allclose(e[0, :2], [0.5, -0.25])
    np.testing.assert_allclose(e[0, 2:4], np.sin([0.5, -0.25]), atol=1e-6)
    np.testing.assert_allclose(e[0, 4:6], np.cos([0.5, -0.25]), atol=1e-6)
    # last frequency block is 2^3
    np.testing.assert_allclose(e[0, -2:], np.cos([4.0, -2.0]), atol=1e-6)


def test_timestep_embedding_conventions():
    t = jnp.asarray([3.0])
    e = np.asarray(timestep_embedding(t, 8))
    freqs = np.exp(-np.log(10000.0) * np.arange(4) / 4)
    np.testing.assert_allclose(e[0, :4], np.cos(3 * freqs), atol=1e-6)
    np.testing.assert_allclose(e[0, 4:], np.sin(3 * freqs), atol=1e-6)
    e2 = np.asarray(sinusoidal_pos_emb(t, 8))
    freqs2 = np.exp(-np.log(10000.0) * np.arange(4) / 3)
    np.testing.assert_allclose(e2[0, :4], np.sin(3 * freqs2), atol=1e-6)


def test_profile2d_shapes_and_grad():
    model = ProfileForward2D(params_ch=14, object_ch=200)
    rng = jax.random.PRNGKey(0)
    b = 6
    ctrl = jnp.zeros((b, 14))
    ori = jnp.zeros((b, 1))
    pos = jnp.zeros((b, 2))
    t = jnp.zeros((b,))
    obj = jnp.zeros((b, 200))
    variables = model.init(rng, ctrl, ori, pos, t, obj, train=True)
    out = model.apply(variables, ctrl, ori, pos, t, obj, train=False)
    assert out.shape == (b, 3)

    # gradient w.r.t. the gripper input flows (the guidance path)
    def loss(c):
        return jnp.sum(model.apply(variables, c, ori, pos, t, obj) ** 2)

    g = jax.grad(loss)(ctrl + 0.1)
    assert g.shape == ctrl.shape
    assert np.isfinite(np.asarray(g)).all()

    # train mode updates batch stats
    _, mutated = model.apply(
        variables, ctrl + 1.0, ori, pos, t, obj, train=True,
        mutable=["batch_stats"],
    )
    assert "batch_stats" in mutated


def test_unet1d_shapes():
    for length, dims in [(14, (128, 256)), (42, (128, 256))]:
        model = ConditionalUnet1D(input_dim=1, down_dims=dims)
        rng = jax.random.PRNGKey(0)
        x = jnp.zeros((2, length, 1))
        t = jnp.zeros((2,), jnp.int32)
        variables = model.init(rng, x, t)
        out = model.apply(variables, x, t)
        assert out.shape == (2, length, 1)


def test_unet1d_jit_and_param_count():
    model = ConditionalUnet1D()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 14, 1))
    t = jnp.zeros((2,), jnp.int32)
    variables = model.init(rng, x, t)
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    # diffusion-policy UNet at these dims is ~2.7M params in torch; ours must
    # be the same order (exact count differs by conv bias conventions)
    assert 1e6 < n_params < 6e6, n_params
    f = jax.jit(lambda v, x, t: model.apply(v, x, t))
    out = f(variables, x, t)
    assert np.isfinite(np.asarray(out)).all()

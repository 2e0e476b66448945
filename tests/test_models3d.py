"""PointNet++ and 3D profile model tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgdm_tpu.models.pointnet2 import (
    ball_query,
    farthest_point_sample,
    pairwise_sqdist,
)
from dgdm_tpu.models.profile3d import ProfileForward3D


def test_pairwise_sqdist():
    a = jnp.asarray([[[0.0, 0, 0], [1, 0, 0]]])
    b = jnp.asarray([[[0.0, 1, 0]]])
    d = np.asarray(pairwise_sqdist(a, b))
    np.testing.assert_allclose(d[0, :, 0], [1.0, 2.0], atol=1e-6)


def test_fps_spreads():
    rng = np.random.RandomState(0)
    # two well-separated clusters: fps with 2 points must take one from each
    pts = np.concatenate(
        [rng.randn(16, 3) * 0.01, rng.randn(16, 3) * 0.01 + 5.0]
    )[None]
    idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 2))[0]
    assert (idx[0] < 16) != (idx[1] < 16)


def test_ball_query_padding():
    xyz = jnp.asarray([[[0.0, 0, 0], [0.05, 0, 0], [9, 9, 9]]])
    centers = xyz[:, :1]
    idx = np.asarray(ball_query(0.2, 3, xyz, centers))[0, 0]
    # point 2 is out of ball -> replaced by the first in-ball index (0)
    assert set(idx.tolist()) == {0, 1} and idx[2] == 0


@pytest.mark.slow
def test_profile3d_shapes_and_grad():
    model = ProfileForward3D(width=32, params_ch=42)
    rng = jax.random.PRNGKey(0)
    b, p = 2, 512
    ctrl = jnp.zeros((b, 42))
    ori = jnp.zeros((b, 1))
    pos = jnp.zeros((b, 2))
    t = jnp.zeros((b,))
    obj = jax.random.normal(jax.random.PRNGKey(1), (b, p, 3))

    @jax.jit
    def init(r):
        return model.init(r, ctrl, ori, pos, t, obj, train=True)

    variables = init(rng)
    out = model.apply(variables, ctrl, ori, pos, t, obj, train=False)
    assert out.shape == (b, 3)

    def loss(c):
        return jnp.sum(model.apply(variables, c, ori, pos, t, obj) ** 2)

    g = jax.jit(jax.grad(loss))(ctrl + 0.1)
    assert np.isfinite(np.asarray(g)).all()

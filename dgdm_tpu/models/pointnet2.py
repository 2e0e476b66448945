"""PointNet++ set-abstraction encoder in JAX/flax.

Equivalent of the vendored torch implementation the reference uses for its 3D
object encoder (``dynamics/models/pointnet2.py:11-32``,
``dynamics/models/pointnet2_utils.py``): three set-abstraction levels
SA(512, r=0.2, k=32, [64, 128]) -> SA(128, r=0.4, k=64, [128, W]) ->
global SA([W]). Farthest-point sampling and ball query are fixed-shape JAX
ops (distance matmuls ride the MXU); per-group MLPs are 1x1 convs + BatchNorm
+ max-pool exactly like the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a (..., N, 3), b (..., M, 3) -> (..., N, M)."""
    an = jnp.sum(a * a, -1, keepdims=True)
    bn = jnp.sum(b * b, -1, keepdims=True)
    cross = jnp.einsum("...nc,...mc->...nm", a, b)
    return an - 2.0 * cross + jnp.swapaxes(bn, -1, -2)


def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """xyz (B, N, 3) -> indices (B, npoint). Deterministic start at index 0
    (the reference uses a random start; FPS coverage is equivalent)."""
    b, n, _ = xyz.shape

    def one(pts):
        def body(carry, _):
            dist, last = carry
            d = jnp.sum((pts - pts[last]) ** 2, -1)
            dist = jnp.minimum(dist, d)
            nxt = jnp.argmax(dist)
            return (dist, nxt), last

        (_, _), idx = jax.lax.scan(
            body, (jnp.full((n,), jnp.inf), jnp.int32(0)), None, length=npoint
        )
        return idx

    return jax.vmap(one)(xyz)


def ball_query(
    radius: float, nsample: int, xyz: jnp.ndarray, centers: jnp.ndarray
) -> jnp.ndarray:
    """Group up to nsample point indices within radius of each center,
    duplicating the first in-ball point for padding (reference
    pointnet2_utils.py:95-115 semantics)."""
    d2 = pairwise_sqdist(centers, xyz)                       # (B, M, N)
    n = xyz.shape[-2]
    in_ball = d2 <= radius**2
    # sort: in-ball points (by index) first, out-of-ball after
    order_key = jnp.where(in_ball, jnp.arange(n)[None, None, :], n + 1)
    idx = jnp.argsort(order_key, axis=-1)[..., :nsample]     # (B, M, k)
    first = idx[..., :1]
    key_sorted = jnp.sort(order_key, axis=-1)[..., :nsample]
    return jnp.where(key_sorted > n, first, idx)


class SetAbstraction(nn.Module):
    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    group_all: bool = False

    @nn.compact
    def __call__(self, xyz, feats, train: bool = False):
        """xyz (B, N, 3); feats (B, N, C) or None -> (new_xyz, new_feats)."""
        if self.group_all:
            new_xyz = jnp.zeros((xyz.shape[0], 1, 3))
            grouped = xyz[:, None]                            # (B, 1, N, 3)
            if feats is not None:
                grouped = jnp.concatenate(
                    [grouped, feats[:, None]], axis=-1
                )
        else:
            fps_idx = farthest_point_sample(xyz, self.npoint)
            new_xyz = jnp.take_along_axis(xyz, fps_idx[..., None], axis=1)
            group_idx = ball_query(self.radius, self.nsample, xyz, new_xyz)
            grouped_xyz = jnp.take_along_axis(
                xyz[:, None], group_idx[..., None], axis=2
            )                                                 # (B, M, k, 3)
            grouped = grouped_xyz - new_xyz[:, :, None, :]
            if feats is not None:
                grouped_f = jnp.take_along_axis(
                    feats[:, None], group_idx[..., None], axis=2
                )
                grouped = jnp.concatenate([grouped, grouped_f], axis=-1)
        x = grouped
        for i, ch in enumerate(self.mlp):
            x = nn.Dense(ch, name=f"mlp_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=f"bn_{i}"
            )(x)
            x = nn.relu(x)
        new_feats = jnp.max(x, axis=-2)                       # pool over group
        return new_xyz, new_feats


class PointNet2(nn.Module):
    """3-level encoder -> (B, width) global feature."""

    width: int = 256

    @nn.compact
    def __call__(self, xyz, train: bool = False):
        l1_xyz, l1 = SetAbstraction(512, 0.2, 32, (64, 128), name="sa1")(
            xyz, None, train
        )
        l2_xyz, l2 = SetAbstraction(128, 0.4, 64, (128, self.width), name="sa2")(
            l1_xyz, l1, train
        )
        _, l3 = SetAbstraction(None, None, None, (self.width,), True, name="sa3")(
            l2_xyz, l2, train
        )
        return l3[:, 0]

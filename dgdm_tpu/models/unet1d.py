"""Conditional 1-D UNet noise-prediction network.

Architecture parity with the diffusion-policy ``ConditionalUnet1D`` the
reference uses (``generator/diffusion_utils.py:123-285``): Conv1d+GroupNorm+
Mish blocks, FiLM-conditioned residual blocks, strided-conv down / transposed-
conv up path with skip concatenation, sinusoidal diffusion-step encoder.
Config from ``generator/train.py:80``: input_dim=1, down_dims=(128, 256),
diffusion_step_embed_dim=32, kernel=5, groups=8.

Layout: (B, L, C) channels-last — the natural layout for TPU convolutions.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from dgdm_tpu.models.embeddings import mish, sinusoidal_pos_emb


class Conv1dBlock(nn.Module):
    features: int
    kernel_size: int = 5
    n_groups: int = 8

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel_size,), padding="SAME")(x)
        x = nn.GroupNorm(num_groups=self.n_groups)(x)
        return mish(x)


class FiLMResBlock(nn.Module):
    features: int
    cond_dim: int
    kernel_size: int = 5
    n_groups: int = 8

    @nn.compact
    def __call__(self, x, cond):
        out = Conv1dBlock(self.features, self.kernel_size, self.n_groups)(x)
        scale_bias = nn.Dense(2 * self.features)(mish(cond))
        scale, bias = jnp.split(scale_bias[:, None, :], 2, axis=-1)
        out = scale * out + bias
        out = Conv1dBlock(self.features, self.kernel_size, self.n_groups)(out)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1,))(x)
        return out + x


class Downsample1d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (3,), strides=(2,), padding=((1, 1),))(x)


class Upsample1d(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features, (4,), strides=(2,), padding="SAME"
        )(x)


class ConditionalUnet1D(nn.Module):
    input_dim: int = 1
    down_dims: Sequence[int] = (128, 256)
    diffusion_step_embed_dim: int = 32
    kernel_size: int = 5
    n_groups: int = 8
    global_cond_dim: int = 0

    @nn.compact
    def __call__(self, sample, timestep, global_cond=None):
        """sample (B, L, input_dim); timestep (B,) -> (B, L, input_dim)."""
        dsed = self.diffusion_step_embed_dim
        t = sinusoidal_pos_emb(timestep.astype(jnp.float32), dsed)
        t = nn.Dense(dsed * 4)(t)
        t = mish(t)
        cond = nn.Dense(dsed)(t)
        if global_cond is not None:
            cond = jnp.concatenate([cond, global_cond], axis=-1)

        dims = list(self.down_dims)
        x = sample
        skips = []
        for i, dim in enumerate(dims):
            x = FiLMResBlock(dim, 0, self.kernel_size, self.n_groups)(x, cond)
            x = FiLMResBlock(dim, 0, self.kernel_size, self.n_groups)(x, cond)
            skips.append(x)
            if i < len(dims) - 1:
                x = Downsample1d(dim)(x)

        mid = dims[-1]
        x = FiLMResBlock(mid, 0, self.kernel_size, self.n_groups)(x, cond)
        x = FiLMResBlock(mid, 0, self.kernel_size, self.n_groups)(x, cond)

        # up path mirrors reference: reversed(in_out[1:]) with skip concat
        for i, dim in enumerate(reversed(dims[:-1])):
            skip = skips.pop()  # matching resolution feature map
            x = jnp.concatenate([x, skip], axis=-1)
            x = FiLMResBlock(dim, 0, self.kernel_size, self.n_groups)(x, cond)
            x = FiLMResBlock(dim, 0, self.kernel_size, self.n_groups)(x, cond)
            x = Upsample1d(dim)(x)

        x = Conv1dBlock(dims[0], self.kernel_size, self.n_groups)(x)
        return nn.Conv(self.input_dim, (1,))(x)

"""Embedding functions shared by the dynamics and diffusion models.

Two distinct sinusoidal conventions exist in the reference and both are kept:

- ``timestep_embedding`` (dynamics nets, ``dynamics/profile_forward_2d.py:58-76``):
  freqs = exp(-ln(10000) * k / half), concat(cos, sin).
- ``sinusoidal_pos_emb`` (diffusion UNet, ``generator/diffusion_utils.py:25-37``):
  freqs = exp(-ln(10000) * k / (half - 1)), concat(sin, cos).

``nerf_embed`` is the NeRF positional encoding used for pose conditioning
(``dynamics/profile_forward_2d.py:5-56``): identity plus sin/cos at
log-sampled frequencies 2^0 .. 2^(multires-1).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """t (...,) -> (..., dim). cos-first layout like the reference."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[..., None].astype(jnp.float32) * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """t (...,) -> (..., dim). sin-first, /(half-1) layout (diffusion-policy)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - 1)
    )
    args = t[..., None].astype(jnp.float32) * freqs
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def nerf_embed(x: jnp.ndarray, multires: int = 4) -> jnp.ndarray:
    """x (..., d) -> (..., d * (1 + 2*multires)): [x, sin(2^k x), cos(2^k x)].

    Ordering matches the reference Embedder: per frequency, sin then cos,
    frequencies log-sampled as 2^0 .. 2^(multires-1).
    """
    out = [x]
    for k in range(multires):
        freq = float(2**k)
        out.append(jnp.sin(x * freq))
        out.append(jnp.cos(x * freq))
    return jnp.concatenate(out, axis=-1)


def nerf_embed_dim(input_dim: int, multires: int = 4) -> int:
    return input_dim * (1 + 2 * multires)


def mish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.tanh(jnp.log1p(jnp.exp(x)))

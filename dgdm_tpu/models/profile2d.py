"""2D dynamics (interaction-profile) network.

Architecture parity with the reference ``ProfileForward2DModel``
(``dynamics/profile_forward_2d.py:78-156``): MLP encoders for gripper y-vector
and flattened object contour, NeRF positional embeddings for pose, sinusoidal
timestep embedding through a SiLU MLP, then an 8-block Dense+BatchNorm+ReLU
trunk and a linear head predicting the whitened
(delta_theta, delta_x, delta_y).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from dgdm_tpu.models.embeddings import nerf_embed, timestep_embedding


class MLP2(nn.Module):
    width: int
    act: str = "relu"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.width)(x)
        x = nn.relu(x) if self.act == "relu" else nn.silu(x)
        return nn.Dense(self.width)(x)


class ProfileForward2D(nn.Module):
    """Inputs (all normalized like dynamics/dataloader.py):
    ctrl (B, params_ch) finger y-vector in [-1, 1],
    ori (B, 1) = theta/pi - 1, pos (B, 2) = pos/0.03,
    t (B,) rescaled timestep in [0, 1],
    obj (B, object_ch) flattened contour in [-1, 1].
    """

    width: int = 256
    params_ch: int = 14
    object_ch: int = 200
    output_ch: int = 3
    multires: int = 4
    num_trunk: int = 8

    @nn.compact
    def __call__(self, ctrl, ori, pos, t, obj, train: bool = False):
        w = self.width
        x_ctrl = MLP2(w, "relu", name="gripper_encoder")(ctrl)
        x_obj = MLP2(w, "relu", name="object_encoder")(obj)
        x_ori = nerf_embed(ori, self.multires)
        x_pos = nerf_embed(pos, self.multires)
        t_emb = timestep_embedding(t, w // 2)
        t_emb = nn.Dense(w, name="time_in")(t_emb)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(w, name="time_out")(t_emb)
        x = jnp.concatenate([x_obj, x_ctrl, x_ori, x_pos, t_emb], axis=-1)
        for i in range(self.num_trunk):
            x = nn.Dense(w, name=f"trunk_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                name=f"bn_{i}",
            )(x)
            x = nn.relu(x)
        return nn.Dense(self.output_ch, name="head")(x)

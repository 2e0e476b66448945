"""2D dynamics (interaction-profile) network.

Architecture parity with the reference ``ProfileForward2DModel``
(``dynamics/profile_forward_2d.py:78-156``): MLP encoders for gripper y-vector
and flattened object contour, NeRF positional embeddings for pose, sinusoidal
timestep embedding through a SiLU MLP, then an 8-block Dense+BatchNorm+ReLU
trunk and a linear head predicting the whitened
(delta_theta, delta_x, delta_y).

``encode_object``/``trunk`` are exposed separately so the guidance loop can
encode each (static) object once per denoise step instead of once per
pose-grid row.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from dgdm_tpu.models.embeddings import nerf_embed, timestep_embedding


class MLP2(nn.Module):
    width: int
    act: str = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.width, dtype=self.dtype)(x)
        x = nn.relu(x) if self.act == "relu" else nn.silu(x)
        return nn.Dense(self.width, dtype=self.dtype)(x)


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
    # compute dtype: params stay f32; bfloat16 roughly doubles training
    # throughput on TPU with negligible quality impact for this MLP
    dtype: Any = jnp.float32

    def setup(self):
        w = self.width
        self.gripper_encoder = MLP2(w, "relu", dtype=self.dtype)
        self.object_encoder = MLP2(w, "relu", dtype=self.dtype)
        self.time_in = nn.Dense(w, dtype=self.dtype)
        self.time_out = nn.Dense(w, dtype=self.dtype)
        self.trunk_layers = [
            nn.Dense(w, name=f"trunk_{i}", dtype=self.dtype)
            for i in range(self.num_trunk)
        ]
        self.trunk_bns = [
            nn.BatchNorm(momentum=0.9, name=f"bn_{i}", dtype=self.dtype)
            for i in range(self.num_trunk)
        ]
        self.head = nn.Dense(self.output_ch)  # head stays f32

    def __call__(self, ctrl, ori, pos, t, obj, train: bool = False):
        feat = self.encode_object(obj, train)
        return self.trunk(ctrl, ori, pos, t, feat, train)

    def encode_object(self, obj, train: bool = False):
        """Object geometry -> (..., W) feature."""
        return self.object_encoder(obj)

    def trunk(self, ctrl, ori, pos, t, obj_feat, train: bool = False):
        w = self.width
        x_ctrl = self.gripper_encoder(ctrl)
        x_ori = nerf_embed(ori, self.multires)
        x_pos = nerf_embed(pos, self.multires)
        t_emb = timestep_embedding(t, w // 2)
        t_emb = self.time_out(nn.silu(self.time_in(t_emb)))
        if obj_feat.shape[:-1] != x_ctrl.shape[:-1]:
            obj_feat = jnp.broadcast_to(
                obj_feat, x_ctrl.shape[:-1] + obj_feat.shape[-1:]
            )
        x = jnp.concatenate([obj_feat, x_ctrl, x_ori, x_pos, t_emb], axis=-1)
        for dense, bn in zip(self.trunk_layers, self.trunk_bns):
            x = nn.relu(bn(dense(x), use_running_average=not train))
        return self.head(x)

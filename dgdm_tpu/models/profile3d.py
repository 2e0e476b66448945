"""3D dynamics (interaction-profile) network.

Parity with the reference ``ProfileForward3DModel``
(``dynamics/profile_forward_3d.py:13-86``): PointNet++ object encoder, MLP
gripper encoder consuming ONLY the y-row of the control grid (the x/z rows
are constant lattices — ``profile_forward_3d.py:78``), NeRF pose embeddings,
and — reference quirk preserved — the raw sinusoidal timestep embedding is fed
to the trunk directly (a ``time_encoder`` exists in the reference but is never
called in ``forward``; ``profile_forward_3d.py:83``). Trunk starts at width
2W then 7 blocks at W.

``encode_object``/``trunk`` split: the PointNet++ encoding of a (static)
object is computed once per guidance step, not once per pose-grid row — the
reference instead re-encodes the tiled point cloud for all 9,000 poses
(``generator/diffusion.py:491``).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dgdm_tpu.models.embeddings import nerf_embed, timestep_embedding
from dgdm_tpu.models.pointnet2 import PointNet2
from dgdm_tpu.models.profile2d import MLP2


class ProfileForward3D(nn.Module):
    """Inputs:
    ctrl (B, params_ch) = the y-row of the control grid, normalized [-1, 1]
    ori (B, 1), pos (B, 2), t (B,) rescaled in [0, 1],
    obj (B, P, 3) normalized object surface points.
    """

    width: int = 256
    params_ch: int = 42
    output_ch: int = 3
    multires: int = 4

    def setup(self):
        w = self.width
        self.gripper_encoder = MLP2(w, "relu")
        self.object_encoder = PointNet2(w)
        widths = [2 * w] + [w] * 7
        self.trunk_layers = [
            nn.Dense(wd, name=f"trunk_{i}") for i, wd in enumerate(widths)
        ]
        self.trunk_bns = [
            nn.BatchNorm(momentum=0.9, name=f"bn_{i}")
            for i in range(len(widths))
        ]
        self.head = nn.Dense(self.output_ch)

    def __call__(self, ctrl, ori, pos, t, obj, train: bool = False):
        feat = self.encode_object(obj, train)
        return self.trunk(ctrl, ori, pos, t, feat, train)

    def encode_object(self, obj, train: bool = False):
        return self.object_encoder(obj, train)

    def trunk(self, ctrl, ori, pos, t, obj_feat, train: bool = False):
        x_ctrl = self.gripper_encoder(ctrl)
        x_ori = nerf_embed(ori, self.multires)
        x_pos = nerf_embed(pos, self.multires)
        t_emb = timestep_embedding(t, self.width)  # fed raw (reference quirk)
        if obj_feat.shape[:-1] != x_ctrl.shape[:-1]:
            obj_feat = jnp.broadcast_to(
                obj_feat, x_ctrl.shape[:-1] + obj_feat.shape[-1:]
            )
        x = jnp.concatenate([obj_feat, x_ctrl, x_ori, x_pos, t_emb], axis=-1)
        for dense, bn in zip(self.trunk_layers, self.trunk_bns):
            x = nn.relu(bn(dense(x), use_running_average=not train))
        return self.head(x)

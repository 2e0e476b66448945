"""3D dynamics (interaction-profile) network.

Parity with the reference ``ProfileForward3DModel``
(``dynamics/profile_forward_3d.py:13-86``): PointNet++ object encoder, MLP
gripper encoder consuming ONLY the y-row of the control grid (the x/z rows
are constant lattices — ``profile_forward_3d.py:78``), NeRF pose embeddings,
and — reference quirk preserved — the raw sinusoidal timestep embedding is fed
to the trunk directly (a ``time_encoder`` exists in the reference but is never
called in ``forward``; ``profile_forward_3d.py:83``). Trunk starts at width
2W then 7 blocks at W.
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

    @nn.compact
    def __call__(self, ctrl, ori, pos, t, obj, train: bool = False):
        w = self.width
        x_ctrl = MLP2(w, "relu", name="gripper_encoder")(ctrl)
        x_obj = PointNet2(w, name="object_encoder")(obj, train)
        x_ori = nerf_embed(ori, self.multires)
        x_pos = nerf_embed(pos, self.multires)
        t_emb = timestep_embedding(t, w)   # fed raw (reference quirk)
        x = jnp.concatenate([x_obj, x_ctrl, x_ori, x_pos, t_emb], axis=-1)
        widths = [2 * w] + [w] * 7
        for i, wd in enumerate(widths):
            x = nn.Dense(wd, name=f"trunk_{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=f"bn_{i}"
            )(x)
            x = nn.relu(x)
        return nn.Dense(self.output_ch, name="head")(x)

"""Classifier-guided DDIM sampling — the flagship fused loop.

The reference's guided sampling (``generator/diffusion.py:541-709``) runs, per
denoising step, a host-orchestrated loop: UNet forward on GPU, then
``cond_fn`` tiling the noisy sample across the 360 x 5 x 5 pose grid through
the frozen dynamics net with autograd (``generator/diffusion.py:473-504``),
gradient update of epsilon (``:575``: eps <- eps - sqrt(1-abar_t) * grad *
scale), DDIM step — and after sampling, a Ray/MuJoCo re-simulation.

Here the whole denoise loop is ONE ``lax.scan`` jitted on TPU: UNet forward,
pose-grid classifier gradient (chunked with ``lax.map`` over the pose axis to
bound the live-activation footprint — the principled version of the
reference's ``sub_bs``), epsilon correction, DDIM update. Simulation-based
verification afterwards is also on-device (``dgdm_tpu.eval.simeval``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import DIFFUSION, GUIDANCE
from dgdm_tpu.diffusion import ddim
from dgdm_tpu.design.objectives import convergence_centers


def pose_grid_normalized(
    grid_size: int, num_pos: int, ori_range: Tuple[float, float] = (-1.0, 1.0)
) -> np.ndarray:
    """(N, 3) normalized poses [ori, x, y], meshgrid-ordered like the
    reference cond_fn (ori-major, then x, then y;
    generator/diffusion.py:478-482)."""
    ori = np.linspace(ori_range[0], ori_range[1], grid_size)
    xy = np.linspace(-1.0, 1.0, num_pos)
    o, x, y = np.meshgrid(ori, xy, xy, indexing="ij")
    return np.stack([o.reshape(-1), x.reshape(-1), y.reshape(-1)], -1).astype(
        np.float32
    )


class GuidedSampler2D:
    """Bundles the (frozen) dynamics classifier and the (EMA) denoiser into a
    single jitted guided-sampling program.

    Works for both 2D and 3D grippers: the sample is the control y-vector
    (B, L, 1); the classifier must expose ``encode_object`` / ``trunk``
    methods (ProfileForward2D/3D). The object is encoded ONCE per sampling
    call — the reference re-encodes the tiled object for every pose-grid row
    (``generator/diffusion.py:485,491``).
    """

    def __init__(
        self,
        unet,
        classifier,
        grid_size: int = GUIDANCE.grid_size_2d,
        num_pos: int = GUIDANCE.num_pos,
        num_train_timesteps: int = DIFFUSION.num_train_timesteps,
        num_inference_steps: int = DIFFUSION.num_inference_steps,
        pose_chunks: int = 12,
        mesh=None,
    ):
        self.unet = unet
        self.classifier = classifier
        self.sched = ddim.make_schedule(num_train_timesteps)
        self.num_train_timesteps = num_train_timesteps
        self.num_inference_steps = num_inference_steps
        self.grid_size = grid_size
        self.num_pos = num_pos
        # multi-chip: shard the pose-grid axis over the mesh's 'sp' axis
        # (the sequence/context-parallel analog — SURVEY §5); XLA reduces the
        # objective gradient with a psum over ICI. Sharding replaces lax.map
        # chunking as the memory bound, so pose_chunks collapses to 1.
        self.mesh = mesh
        self.pose_chunks = 1 if mesh is not None else pose_chunks

    def _shard_poses(self, poses: jnp.ndarray) -> jnp.ndarray:
        if self.mesh is None or "sp" not in self.mesh.shape:
            return poses
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            poses, NamedSharding(self.mesh, P("sp", None))
        )

    # -- classifier plumbing -------------------------------------------------

    def _encode_object(self, cls_vars, obj):
        """obj (obj_dims...) -> (W,) feature (batch dim added/removed)."""
        return self.classifier.apply(
            cls_vars, obj[None], train=False, method="encode_object"
        )[0]

    def _trunk(self, cls_vars, ctrl, ori, pos, t, obj_feat):
        return self.classifier.apply(
            cls_vars, ctrl, ori, pos, t, obj_feat, train=False, method="trunk"
        )

    def _objective_weights(
        self, objective: str, centers: Optional[jnp.ndarray], batch: int
    ) -> Tuple[jnp.ndarray, bool]:
        """Linear weights w (N, 1-or-B, 3) with objective = sum w*deltas
        (square of component 0 instead for 'rotate')."""
        from dgdm_tpu.design.objectives import SIMPLE_OBJECTIVES

        n = self.grid_size * self.num_pos**2
        if objective == "rotate":
            return jnp.zeros(()), True
        if objective == "convergence":
            assert centers is not None
            gidx = jnp.arange(n) // (self.num_pos**2)          # (N,)
            off = (
                gidx[None, :] - centers[:, None] + self.grid_size // 2
            ) % self.grid_size - self.grid_size // 2           # (B, N)
            sign = jnp.where(off < 0, 1.0, -1.0)
            w = jnp.zeros((batch, n, 3)).at[..., 0].set(sign)
            return jnp.transpose(w, (1, 0, 2)), False          # (N, B, 3)
        base = SIMPLE_OBJECTIVES[objective](jnp.eye(3))        # (3,) weights
        return jnp.broadcast_to(base, (n, 1, 3)), False

    def cond_grad(
        self,
        cls_vars,
        x: jnp.ndarray,
        t: jnp.ndarray,
        obj_feat: jnp.ndarray,
        weights: jnp.ndarray,
        rotate_sq: bool,
        poses: jnp.ndarray,
    ) -> jnp.ndarray:
        """d(sum objective over pose grid)/dx. x (B, L, 1); poses (N, 3);
        obj_feat (W,) precomputed object feature."""
        b, l, _ = x.shape
        n = poses.shape[0]
        # largest divisor of n not exceeding the requested chunk count
        chunks = max(
            (c for c in range(1, min(self.pose_chunks, n) + 1) if n % c == 0),
            default=1,
        )
        chunk = n // chunks
        poses_c = poses.reshape(chunks, chunk, 3)
        if weights.ndim == 3 and weights.shape[0] == n:
            w_c = weights.reshape(chunks, chunk, *weights.shape[1:])
        else:
            w_c = jnp.broadcast_to(weights, (chunks,) + weights.shape)
        t_resc = jnp.full((), t, jnp.float32) / self.num_train_timesteps

        def chunk_objective(xf, pose_chunk, w_chunk):
            c = pose_chunk.shape[0]
            ctrl = jnp.broadcast_to(xf[None], (c, b, l)).reshape(c * b, l)
            ori = jnp.repeat(pose_chunk[:, 0:1], b, axis=0)
            pos = jnp.repeat(pose_chunk[:, 1:3], b, axis=0)
            tt = jnp.full((c * b,), t_resc)
            deltas = self._trunk(cls_vars, ctrl, ori, pos, tt, obj_feat[None])
            deltas = deltas.reshape(c, b, 3)
            if rotate_sq:
                return jnp.sum(deltas[..., 0] ** 2)
            return jnp.sum(w_chunk * deltas)

        def chunk_grad(args):
            pose_chunk, w_chunk = args
            return jax.grad(chunk_objective)(x[..., 0], pose_chunk, w_chunk)

        grads = jax.lax.map(chunk_grad, (poses_c, w_c))
        return jnp.sum(grads, axis=0)[..., None]               # (B, L, 1)

    # -- guided sampling -----------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self", "objective"))
    def sample(
        self,
        unet_params,
        cls_vars,
        noise: jnp.ndarray,
        obj_flat: jnp.ndarray,
        objective: str,
        scale: jnp.ndarray,
        centers: Optional[jnp.ndarray] = None,
        ori_range: Tuple[float, float] = (-1.0, 1.0),
    ) -> jnp.ndarray:
        """One fused guided DDIM run. noise (B, L, 1) -> samples (B, L, 1)."""
        b = noise.shape[0]
        poses = self._shard_poses(jnp.asarray(
            pose_grid_normalized(self.grid_size, self.num_pos, ori_range)
        ))
        weights, rotate_sq = self._objective_weights(objective, centers, b)
        obj_feat = self._encode_object(cls_vars, obj_flat)
        ts = jnp.asarray(
            ddim.inference_timesteps(
                self.num_train_timesteps, self.num_inference_steps
            )
        )
        pts = jnp.asarray(
            ddim.prev_timesteps(self.num_train_timesteps, self.num_inference_steps)
        )

        def body(x, tp):
            t, pt = tp
            tb = jnp.full((b,), t)
            eps = self.unet.apply({"params": unet_params}, x, tb)
            g = self.cond_grad(cls_vars, x, t, obj_feat, weights, rotate_sq, poses)
            abar = self.sched.alphas_cumprod[t]
            eps = eps - jnp.sqrt(1.0 - abar) * g * scale
            return ddim.ddim_step(self.sched, eps, t, pt, x), None

        out, _ = jax.lax.scan(body, noise, (ts, pts))
        return out

    def _sweep_grad(
        self, cls_vars, x, t, obj_feats, weights, rsq, poses,
        row_budget: int = 65536,
    ) -> jnp.ndarray:
        """d(sum objective)/dx for K fused (objective, object) pairs.

        x (K, B, L, 1); obj_feats (K, W); weights (K, 3) linear objective
        weights; rsq (K,) adds rsq_k * sum(delta_theta^2) (the 'rotate'
        objective); poses (N, 3). The pose axis is lax.map-chunked so each
        trunk call sees ~row_budget rows regardless of K."""
        k, b, l, _ = x.shape
        n = poses.shape[0]
        w_feat = obj_feats.shape[-1]
        max_chunk = max(1, row_budget // max(1, k * b))
        # fewest chunks whose chunk size fits the row budget
        chunks = min(
            (c for c in range(1, n + 1)
             if n % c == 0 and n // c <= max_chunk),
            default=n,
        )
        chunk = n // chunks
        poses_c = poses.reshape(chunks, chunk, 3)
        t_resc = jnp.full((), t, jnp.float32) / self.num_train_timesteps

        def chunk_objective(xf, pose_chunk):
            c = pose_chunk.shape[0]
            ctrl = jnp.broadcast_to(
                xf[:, None], (k, c, b, l)).reshape(k * c * b, l)
            ori = jnp.tile(jnp.repeat(pose_chunk[:, 0:1], b, axis=0), (k, 1))
            pos = jnp.tile(jnp.repeat(pose_chunk[:, 1:3], b, axis=0), (k, 1))
            feat = jnp.broadcast_to(
                obj_feats[:, None, None], (k, c, b, w_feat)
            ).reshape(k * c * b, w_feat)
            tt = jnp.full((k * c * b,), t_resc)
            deltas = self._trunk(cls_vars, ctrl, ori, pos, tt, feat)
            deltas = deltas.reshape(k, c, b, 3)
            lin = jnp.sum(weights[:, None, None, :] * deltas, axis=-1)
            return jnp.sum(lin + rsq[:, None, None] * deltas[..., 0] ** 2)

        def chunk_grad(pose_chunk):
            return jax.grad(chunk_objective)(x[..., 0], pose_chunk)

        grads = jax.lax.map(chunk_grad, poses_c)
        return jnp.sum(grads, axis=0)[..., None]               # (K, B, L, 1)

    @functools.partial(jax.jit, static_argnames=("self",))
    def sample_sweep(
        self,
        unet_params,
        cls_vars,
        noise: jnp.ndarray,       # (B, L, 1) shared noise bank
        obj_feats: jnp.ndarray,   # (K, W) encoded objects, one per pair
        weights: jnp.ndarray,     # (K, 3) linear objective weights
        rsq: jnp.ndarray,         # (K,) squared-rotation objective gate
        scales: jnp.ndarray,      # (K,) guidance scales
        ori_range: Tuple[float, float] = (-1.0, 1.0),
    ) -> jnp.ndarray:
        """Fused guided sampling over K (objective, object) pairs.

        The production design run (reference guided_sample_2d.sh x
        generator/diffusion.py:307-339: every objective x every test object)
        is ONE compiled program here instead of K serial ``sample`` dispatches
        (each a separate XLA program per objective): objectives ride as DATA
        (linear delta weights + the squared-rotation gate), so the UNet runs
        K*B-row batches and the classifier grad K*chunk*B-row batches per
        denoise step. Returns (K, B, L, 1). 'convergence' (per-sample pose
        re-centering) stays on the per-objective ``sample`` path."""
        b = noise.shape[0]
        k = obj_feats.shape[0]
        poses = self._shard_poses(jnp.asarray(
            pose_grid_normalized(self.grid_size, self.num_pos, ori_range)
        ))
        x0 = jnp.broadcast_to(noise[None], (k,) + noise.shape)
        ts = jnp.asarray(
            ddim.inference_timesteps(
                self.num_train_timesteps, self.num_inference_steps
            )
        )
        pts = jnp.asarray(
            ddim.prev_timesteps(self.num_train_timesteps,
                                self.num_inference_steps)
        )

        def body(x, tp):
            t, pt = tp
            tb = jnp.full((k * b,), t)
            eps = self.unet.apply(
                {"params": unet_params},
                x.reshape(k * b, *x.shape[2:]), tb,
            ).reshape(x.shape)
            g = self._sweep_grad(cls_vars, x, t, obj_feats, weights, rsq,
                                 poses)
            abar = self.sched.alphas_cumprod[t]
            eps = eps - jnp.sqrt(1.0 - abar) * g * scales[:, None, None, None]
            return ddim.ddim_step(self.sched, eps, t, pt, x), None

        out, _ = jax.lax.scan(body, x0, (ts, pts))
        return out

    def sweep_inputs(
        self, cls_vars, objectives, obj_flats, fingers_3d: bool
    ):
        """Build (obj_feats, weights, rsq, scales, labels) for sample_sweep
        from objective names x objects. Skips 'convergence' (structural,
        needs per-sample centers); labels[i] = (objective, object_index)."""
        from dgdm_tpu.core.config import GUIDANCE as _G
        from dgdm_tpu.design.objectives import SIMPLE_OBJECTIVES

        feats = jax.vmap(lambda o: self._encode_object(cls_vars, o))(
            jnp.asarray(obj_flats)
        )                                                      # (O, W)
        labels, w_rows, r_rows, s_rows, f_rows = [], [], [], [], []
        for name in objectives:
            if name == "convergence":
                continue
            if name == "rotate":
                w, r = np.zeros(3, np.float32), 1.0
            else:
                w = np.asarray(SIMPLE_OBJECTIVES[name](np.eye(3)),
                               np.float32)
                r = 0.0
            s = float(_G.scale(fingers_3d, name))
            for oi in range(feats.shape[0]):
                labels.append((name, oi))
                w_rows.append(w)
                r_rows.append(r)
                s_rows.append(s)
                f_rows.append(feats[oi])
        return (jnp.stack(f_rows), jnp.asarray(np.stack(w_rows)),
                jnp.asarray(np.asarray(r_rows, np.float32)),
                jnp.asarray(np.asarray(s_rows, np.float32)), labels)

    @functools.partial(jax.jit, static_argnames=("self", "objective"))
    def sample_multi_object(
        self,
        unet_params,
        cls_vars,
        noise: jnp.ndarray,
        obj_flats: jnp.ndarray,   # (O, obj_dim)
        objective: str,
        scale: jnp.ndarray,
        ori_range: Tuple[float, float] = (-1.0, 1.0),
    ) -> jnp.ndarray:
        """Gradient averaged over objects (generator/diffusion.py:621-709)."""
        b = noise.shape[0]
        poses = self._shard_poses(jnp.asarray(
            pose_grid_normalized(self.grid_size, self.num_pos, ori_range)
        ))
        weights, rotate_sq = self._objective_weights(objective, None, b)
        obj_feats = jax.vmap(lambda o: self._encode_object(cls_vars, o))(
            obj_flats
        )
        ts = jnp.asarray(
            ddim.inference_timesteps(
                self.num_train_timesteps, self.num_inference_steps
            )
        )
        pts = jnp.asarray(
            ddim.prev_timesteps(self.num_train_timesteps, self.num_inference_steps)
        )

        def body(x, tp):
            t, pt = tp
            tb = jnp.full((b,), t)
            eps = self.unet.apply({"params": unet_params}, x, tb)
            g = jnp.mean(
                jax.vmap(
                    lambda of: self.cond_grad(
                        cls_vars, x, t, of, weights, rotate_sq, poses
                    )
                )(obj_feats),
                axis=0,
            )
            abar = self.sched.alphas_cumprod[t]
            eps = eps - jnp.sqrt(1.0 - abar) * g * scale
            return ddim.ddim_step(self.sched, eps, t, pt, x), None

        out, _ = jax.lax.scan(body, noise, (ts, pts))
        return out

    @functools.partial(jax.jit, static_argnames=("self",))
    def profile_classes(
        self, cls_vars, x: jnp.ndarray, obj_flat: jnp.ndarray,
        threshold_std0: jnp.ndarray,
        ori_range: Tuple[float, float] = (-1.0, 1.0),
    ) -> jnp.ndarray:
        """Classifier orientation profile at pos=(0,0), t=0 -> classes (B, G).

        Used to find convergence centers (generator/diffusion.py:506-539)."""
        b, l, _ = x.shape
        g = self.grid_size
        ori = jnp.linspace(ori_range[0], ori_range[1], g)
        ctrl = jnp.broadcast_to(x[..., 0][None], (g, b, l)).reshape(g * b, l)
        orif = jnp.repeat(ori[:, None], b, axis=0)
        pos = jnp.zeros((g * b, 2))
        obj_feat = self._encode_object(cls_vars, obj_flat)
        tt = jnp.zeros((g * b,))
        d0 = self._trunk(cls_vars, ctrl, orif, pos, tt, obj_feat[None])[..., 0]
        d0 = d0.reshape(g, b).T                               # (B, G)
        return jnp.where(
            d0 > threshold_std0, 2, jnp.where(d0 < -threshold_std0, 0, 1)
        )

    def find_convergence_centers(
        self, cls_vars, unguided: jnp.ndarray, obj_flat: jnp.ndarray,
        threshold_std0: float,
    ) -> jnp.ndarray:
        cls = self.profile_classes(
            cls_vars, unguided, obj_flat, jnp.asarray(threshold_std0)
        )
        return convergence_centers(cls, self.grid_size)


# alias: the sampler is dimension-agnostic (2D/3D classifiers both work)
GuidedSampler = GuidedSampler2D

"""End-to-end 3D slice: datagen -> 3D dynamics training -> guided sampling
with the PointNet++ classifier -> 3D sim verification, tiny-scale on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgdm_tpu.design.guidance import GuidedSampler
from dgdm_tpu.eval.simeval3d import sim_eval_batch_3d
from dgdm_tpu.models.profile3d import ProfileForward3D
from dgdm_tpu.models.unet1d import ConditionalUnet1D
from dgdm_tpu.sim.datagen3d import generate_3d, surface_points_3d
from dgdm_tpu.train.data import normalize_record_3d, procedural_grippers
from dgdm_tpu.train.dynamics import DynamicsTrainer
from dgdm_tpu.train.generator import GeneratorTrainer
from tests.test_engine3d import box_mesh


@pytest.mark.slow
def test_full_3d_pipeline(tmp_path):
    verts, faces = box_mesh()

    # ---- 1) datagen: 1 object x 2 grippers, 8 orientations, short rollouts
    records = generate_3d(
        0, "box", verts, faces, [0, 1], save_dir=str(tmp_path / "d3"),
        grid_size=8, num_pos=1, steps=200,
    )
    recs = [r for r in records if r is not None]
    assert len(recs) >= 1  # box should not tip over
    assert recs[0]["ctrlpts"].shape == (42, 3)
    assert recs[0]["allpts"].shape == (2 * 25 * 25, 3)
    assert recs[0]["object_name"] == "box"

    # ---- 2) 3D dynamics training (PointNet++ encoder), tiny widths
    from dgdm_tpu.geom import mesh3d

    pts = mesh3d.sample_surface(verts, faces, 64, seed=0)
    rows = [normalize_record_3d(r, pts) for r in recs]
    batch = {
        k: jnp.asarray(np.concatenate([r[k] for r in rows], 0))
        for k in rows[0]
    }
    classifier = ProfileForward3D(width=32, params_ch=42)
    dtr = DynamicsTrainer(classifier, learning_rate=3e-3, total_steps=20,
                          fingers_3d=True)
    dstate = dtr.init(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(10):
        key, k = jax.random.split(key)
        dstate, m = dtr.train_step(dstate, batch, k)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()

    # ---- 3) guided sampling: 42-point samples through the 3D classifier
    train, _ = procedural_grippers(8, fingers_3d=True)
    assert train.shape[1] == 42
    unet = ConditionalUnet1D(down_dims=(16, 32))
    gtr = GeneratorTrainer(unet, total_steps=10)
    gstate = gtr.init(jax.random.PRNGKey(0), jnp.asarray(train[:4]))
    sampler = GuidedSampler(
        unet, classifier, grid_size=4, num_pos=1, pose_chunks=1,
    )
    cls_vars = {"params": dstate.params, "batch_stats": dstate.batch_stats}
    noise = jax.random.normal(jax.random.PRNGKey(2), (2, 42, 1))
    obj_pts = jnp.asarray(batch["obj"][0])  # (P, 3) normalized
    samples = sampler.sample(
        gstate.ema_params, cls_vars, noise, obj_pts, "shift_left",
        jnp.asarray(0.5),
    )
    assert samples.shape == (2, 42, 1)
    assert np.isfinite(np.asarray(samples)).all()

    # ---- 4) 3D sim verification with re-grasp schedule
    metrics = sim_eval_batch_3d(
        np.asarray(samples)[..., 0], [(verts, faces)], num_rot=4,
        total_steps=400, regrasp_every=200,
    )
    assert len(metrics) == 2
    assert metrics[0]["profile"].shape == (4,)
    assert np.isfinite(metrics[0]["delta_theta"]).all()

"""End-to-end 2D slice: datagen -> dynamics training -> diffusion training ->
guided sampling -> sim-in-the-loop verification, all tiny-scale on CPU.

This is the framework's minimum complete pipeline (SURVEY.md §7 build order,
step 5), exercising every subsystem against each other.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgdm_tpu.design.guidance import GuidedSampler2D
from dgdm_tpu.eval.simeval import objectives_table, sim_eval_batch_2d
from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.models.profile2d import ProfileForward2D
from dgdm_tpu.models.unet1d import ConditionalUnet1D
from dgdm_tpu.sim.datagen import generate_2d
from dgdm_tpu.train.data import normalize_record_2d, procedural_grippers
from dgdm_tpu.train.dynamics import DynamicsTrainer
from dgdm_tpu.train.generator import GeneratorTrainer
from tests.util_icons import make_icon


@pytest.mark.slow
def test_full_2d_pipeline(tmp_path):
    # ---- 1) datagen: 1 object x 4 grippers, 32 orientations x 1 position
    contour = extract_contours(make_icon(3))
    records = generate_2d(
        0, contour, [0, 1, 2, 3], save_dir=str(tmp_path / "data"),
        grid_size=32, num_pos=1,
    )
    assert len(records) == 4
    assert records[0]["delta_theta"].shape == (32,)
    assert np.isfinite(records[0]["delta_theta"]).all()
    # shards written in the reference npz layout
    loaded = np.load(
        str(tmp_path / "data" / "0_1.npz"), allow_pickle=True
    )["arr_0"].item()
    assert loaded["ctrlpts"].shape == (14, 2)
    assert loaded["allpts"].shape == (400, 2)

    # ---- 2) dynamics training on the generated profiles
    rows = [normalize_record_2d(r) for r in records]
    batch = {
        k: jnp.asarray(np.concatenate([r[k] for r in rows], 0))
        for k in rows[0]
    }
    classifier = ProfileForward2D(width=32, num_trunk=2, object_ch=200)
    dtr = DynamicsTrainer(classifier, learning_rate=3e-3, total_steps=40)
    dstate = dtr.init(jax.random.PRNGKey(0), batch)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(30):
        key, k = jax.random.split(key)
        dstate, m = dtr.train_step(dstate, batch, k)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

    # ---- 3) diffusion training on procedural grippers
    train, _ = procedural_grippers(64)
    unet = ConditionalUnet1D(down_dims=(16, 32))
    gtr = GeneratorTrainer(unet, learning_rate=1e-3, total_steps=40)
    gstate = gtr.init(jax.random.PRNGKey(0), jnp.asarray(train[:32]))
    for _ in range(30):
        key, k = jax.random.split(key)
        gstate, gm = gtr.train_step(gstate, jnp.asarray(train[:32]), k)

    # ---- 4) guided sampling with the trained classifier
    sampler = GuidedSampler2D(
        unet, classifier, grid_size=8, num_pos=1, pose_chunks=2,
    )
    cls_vars = {"params": dstate.params, "batch_stats": dstate.batch_stats}
    noise = jax.random.normal(jax.random.PRNGKey(2), (2, 14, 1))
    obj_flat = jnp.asarray(contour.reshape(-1) / 0.05)
    samples = sampler.sample(
        gstate.ema_params, cls_vars, noise, obj_flat,
        "rotate_counterclockwise", jnp.asarray(0.01),
    )
    assert np.isfinite(np.asarray(samples)).all()
    # samples stay in the normalized ctrl range (clip_sample + direction term)
    assert np.abs(np.asarray(samples)).max() < 1.5

    # ---- 5) sim-in-the-loop verification of the generated grippers
    metrics = sim_eval_batch_2d(
        np.asarray(samples)[..., 0], [contour], num_rot=8,
        total_steps=400, regrasp_every=200,
    )
    assert len(metrics) == 2
    objs = objectives_table(metrics, "rotate_counterclockwise")
    assert "success_rate" in objs[0]
    assert 0.0 <= objs[0]["success_rate"] <= 1.0

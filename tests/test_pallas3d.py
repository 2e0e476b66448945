"""Pallas 3D rollout kernel vs the pure-JAX engine (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgdm_tpu.geom.fingers import sample_gripper_3d
from dgdm_tpu.sim import engine3d, pallas3d
from tests.test_engine3d import box_mesh


@pytest.mark.slow
def test_pallas3d_matches_engine():
    import jax.experimental.pallas as pl
    from unittest import mock

    verts, faces = box_mesh()
    scenes = [
        engine3d.make_scene(*sample_gripper_3d(i), verts, faces,
                            num_points=128)
        for i in range(2)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    n = pallas3d.LANE
    ths = np.linspace(0, 2 * np.pi, n, endpoint=False).astype(np.float32)
    poses = np.stack([np.zeros(n), np.zeros(n), ths], -1).astype(np.float32)

    steps = 400  # past the drop; into the squeeze
    ref = engine3d.profile_batch(stacked, jnp.asarray(poses), steps=steps)
    arrs = pallas3d.scene_arrays_3d(stacked)

    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    with mock.patch.object(pl, "pallas_call", interp), mock.patch.object(
        pallas3d.pl, "pallas_call", interp
    ):
        out = pallas3d.profile_batch_pallas3d(
            *arrs, jnp.asarray(poses), steps=steps
        )

    dth_r, dth_p = np.asarray(ref[0]), np.asarray(out[0])
    dp_r, dp_p = np.asarray(ref[1]), np.asarray(out[1])
    # same solver, surface differs only by the 1e-4 polynomial fit: agreement
    # is at the contact-chaos floor, not bitwise
    assert np.isfinite(dth_p).all()
    # the kernel surface is a 1e-4-accurate polynomial fit of the B-spline;
    # contacting poses therefore diverge at the contact-chaos level (mm),
    # non-contacting poses agree to f32 rounding
    assert np.abs(dth_r - dth_p).max() < 2e-2, np.abs(dth_r - dth_p).max()
    assert np.median(np.abs(dp_r - dp_p)) < 1e-3
    assert np.abs(dp_r - dp_p).max() < 2e-2
    if dth_r.std() > 5e-3:
        corr = np.corrcoef(dth_r.ravel(), dth_p.ravel())[0, 1]
        assert corr > 0.98, corr
    # validity flags agree
    np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(out[3]))


@pytest.mark.slow
def test_pallas3d_matches_engine_regrasp():
    """3D re-grasp parity: regrasp resets must invalidate the kernel's
    settled-travel broad-phase cache (wy-span), forcing a full re-solve."""
    import jax.experimental.pallas as pl
    from unittest import mock

    verts, faces = box_mesh()
    scene = engine3d.make_scene(*sample_gripper_3d(11), verts, faces,
                                num_points=128)
    stacked = jax.tree.map(lambda x: x[None], scene)
    n = pallas3d.LANE
    ths = np.linspace(0, 2 * np.pi, n, endpoint=False).astype(np.float32)
    poses = np.stack([np.zeros(n), np.zeros(n), ths], -1).astype(np.float32)

    steps = 240
    ref = engine3d.profile(scene, jnp.asarray(poses), steps=steps,
                           regrasp_every=120)
    arrs = pallas3d.scene_arrays_3d(stacked)

    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    with mock.patch.object(pl, "pallas_call", interp), mock.patch.object(
        pallas3d.pl, "pallas_call", interp
    ):
        out = pallas3d.profile_batch_pallas3d(
            *arrs, jnp.asarray(poses), steps=steps, regrasp_every=120)

    dth_r, dth_p = np.asarray(ref[0]), np.asarray(out[0])[0]
    dp_r, dp_p = np.asarray(ref[1]), np.asarray(out[1])[0]
    assert np.isfinite(dth_p).all()
    # kernel surface is a polynomial fit: contacting poses diverge at the
    # contact-chaos level, same tolerances as the squeeze parity test
    assert np.abs(dth_r - dth_p).max() < 2e-2, np.abs(dth_r - dth_p).max()
    assert np.median(np.abs(dp_r - dp_p)) < 1e-3
    assert np.abs(dp_r - dp_p).max() < 2e-2

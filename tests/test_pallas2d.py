"""Pallas rollout kernel vs the pure-JAX engine (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.geom.fingers import sample_gripper_2d
from dgdm_tpu.sim import engine2d, pallas2d
from tests.util_icons import make_icon


@pytest.mark.slow
def test_pallas_matches_engine():
    import jax.experimental.pallas as pl
    from unittest import mock

    contour = extract_contours(make_icon(3))
    scenes = [
        engine2d.make_scene(*sample_gripper_2d(i), contour) for i in range(2)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    n = pallas2d.LANE
    ths = np.linspace(0, 2 * np.pi, n, endpoint=False).astype(np.float32)
    poses = np.stack([np.zeros(n), np.zeros(n), ths], -1).astype(np.float32)

    ref = engine2d.profile_batch(stacked, jnp.asarray(poses), steps=60)
    arrs = pallas2d.scene_arrays(stacked)

    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    with mock.patch.object(pl, "pallas_call", interp), mock.patch.object(
        pallas2d.pl, "pallas_call", interp
    ):
        out = pallas2d.profile_batch_pallas(*arrs, jnp.asarray(poses), steps=60)

    dth_r, dth_p = np.asarray(ref[0]), np.asarray(out[0])
    # identical math modulo op-reordering: early in the squeeze the two agree
    # to f32 tolerance
    assert np.abs(dth_r - dth_p).max() < 5e-3
    assert np.abs(np.asarray(ref[1]) - np.asarray(out[1])).max() < 5e-3


@pytest.mark.slow
def test_pallas_matches_engine_regrasp():
    """Re-grasp parity: the eval schedule resets jaws/velocities mid-rollout,
    which must invalidate the kernel's settled-travel cache (a stale cache
    would skip the re-approach physics entirely)."""
    import jax.experimental.pallas as pl
    from unittest import mock

    contour = extract_contours(make_icon(5))
    scene = engine2d.make_scene(*sample_gripper_2d(7), contour)
    stacked = jax.tree.map(lambda x: x[None], scene)
    n = pallas2d.LANE
    ths = np.linspace(0, 2 * np.pi, n, endpoint=False).astype(np.float32)
    poses = np.stack([np.zeros(n), np.zeros(n), ths], -1).astype(np.float32)

    ref = engine2d.profile(scene, jnp.asarray(poses), steps=80,
                           regrasp_every=40)
    arrs = pallas2d.scene_arrays(stacked)

    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    with mock.patch.object(pl, "pallas_call", interp), mock.patch.object(
        pallas2d.pl, "pallas_call", interp
    ):
        out = pallas2d.profile_batch_pallas(
            *arrs, jnp.asarray(poses), steps=80, regrasp_every=40)

    dth_r, dth_p = np.asarray(ref[0]), np.asarray(out[0])[0]
    dp_r, dp_p = np.asarray(ref[1]), np.asarray(out[1])[0]
    assert np.isfinite(dth_p).all()
    assert np.abs(dth_r - dth_p).max() < 5e-3, np.abs(dth_r - dth_p).max()
    assert np.abs(dp_r - dp_p).max() < 5e-3

"""3D engine fidelity vs the MuJoCo oracle.

Round-2 status (Newton solver + gradient calibration, docs/PARITY.md): on the
30-case prism-oracle suite the engine reaches pooled corr 0.62 / median ratio
0.74 / agree 0.79 (held-out val corr 0.78 / ratio 0.82 / agree 0.87), against
MuJoCo's own 12-vs-24-slab decomposition self-agreement ceiling of 0.935.
The round-1 Jacobi over-rotation (ratio 4-100x from elastic energy pumping)
is gone; the bounds below would catch it decisively.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgdm_tpu.geom.fingers import sample_gripper_3d
from dgdm_tpu.geom.mesh3d import box_mesh
from dgdm_tpu.sim import engine3d

SUITE = os.path.join(os.path.dirname(__file__), "..", "runs", "calib",
                     "oracle3d_suite.npz")
# fixed signal-rich subset (runtime budget: ~20 s CPU for 96 x 800-step
# Newton rollouts); measured at the shipped r5 calibration (192 pt /
# NIT=1): corr/ratio/agree = 0.790 / 1.139 / 0.802
CASES = (0, 1, 3, 8, 9, 21)


def test_engine3d_mass_parity_vs_mujoco():
    from dgdm_tpu.sim.oracle3d import Oracle3D

    verts, faces = box_mesh(0.035, 0.045, 0.04, 0.04)
    yl, yr = sample_gripper_3d(1)
    scene = engine3d.make_scene(yl, yr, verts, faces, num_points=256)
    # object: reference double-counts visual+collision copies
    oracle = Oracle3D(yl, yr, verts, faces, num_slabs=12, num_z=2)
    assert abs(oracle.body_mass("object") - float(scene.mass)) < 0.1
    # per-jaw masses: engine models the 12x2 decomposition exactly
    # (envelope3d.DEFAULT_DECOMPS); each decomposition matches its MjModel
    # to machine precision
    for nz in (2, 3):
        o = Oracle3D(yl, yr, verts, faces, num_slabs=12, num_z=nz)
        per = np.asarray(engine3d.finger_masses_3d(
            yl, yr, decomps=((12, nz),)))
        np.testing.assert_allclose(
            per, [o.body_mass("left_jaw"), o.body_mass("right_jaw")],
            rtol=1e-4,
        )
        if nz == 2:
            np.testing.assert_allclose(
                np.asarray(scene.finger_mass), per, rtol=1e-4,
            )


@pytest.mark.slow
def test_engine3d_suite_fidelity():
    """Statistical parity against the committed MuJoCo oracle suite
    (12x2-decomposition target, upright orientations only)."""
    d = np.load(SUITE)
    # the engine contacts the 12x2 envelope exactly -> score against the
    # 12x2 sim (the 12x3 run is the cross-decomposition ceiling reference)
    target = d["delta_theta_s12"]
    mask = d["upright_s12"].astype(bool)
    ths = d["thetas"]
    steps = int(d["steps"])

    scenes = []
    for i in CASES:
        verts = d["verts"][i][: d["nv"][i]].astype(np.float64)
        faces = d["faces"][i][: d["nf"][i]]
        scenes.append(engine3d.make_scene(d["yl"][i], d["yr"][i], verts,
                                          faces, num_points=192))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    poses = jnp.asarray(np.stack([0 * ths, 0 * ths, ths], -1), jnp.float32)
    en = np.asarray(engine3d.profile_batch(stacked, poses, steps=steps)[0])

    def cls(x, th=0.02):
        return np.where(x > th, 2, np.where(x < -th, 0, 1))

    corrs, ratios, agrees = [], [], []
    for k, i in enumerate(CASES):
        v = mask[i]
        e, t = en[k][v], target[i][v]
        agrees.append((cls(e) == cls(t)).mean())
        if t.std() > 0.005:
            c = np.corrcoef(e, t)[0, 1]
            corrs.append(0.0 if not np.isfinite(c) else c)
            ratios.append(e.std() / t.std())
    corr, ratio, agree = np.mean(corrs), np.median(ratios), np.mean(agrees)
    assert np.isfinite(en).all()
    # measured r5 (envelope contact + held-out NIT=1/192-pt refit, these 6
    # cases): corr 0.790 / ratio 1.139 / agree 0.802 — full-suite kernel
    # numbers 0.697 / 0.978 / 0.783 (runs/calib/calib3d_search_nit1_p192)
    assert corr > 0.62, f"suite corr regressed: {corr:.3f} (was 0.790)"
    assert 0.8 < ratio < 1.5, f"magnitude regressed: {ratio:.3f} (was 1.139)"
    assert agree > 0.75, f"class agreement regressed: {agree:.3f} (was 0.802)"


@pytest.mark.slow
def test_heldout_val_corr_floor_3d():
    """Held-out validation-split fidelity floor (VERDICT r4 item 7) — the
    3D counterpart of test_heldout_val_corr_floor_2d: replays the
    calibration search's RandomState(7) first-third split and per-case
    scoring (scripts/search_calib_3d.py:122-124,100-115) through the
    pure-JAX engine (kernel parity is tested separately in
    tests/test_pallas3d.py). The shipped r5 fit (192 points / NIT=1)
    measures val corr 0.768 on the kernel
    (runs/calib/calib3d_search_nit1_p192.json: val.corr); the floor of
    0.62 absorbs engine-vs-kernel and solver drift while still catching
    any recalibration that trades held-out correlation away (the 128-pt
    refit's 0.613 would fail it, as intended)."""
    d = np.load(SUITE)
    target = d["delta_theta_s12"]
    mask = d["upright_s12"].astype(bool)
    n_cases = target.shape[0]
    perm = np.random.RandomState(7).permutation(n_cases)
    val_idx = np.sort(perm[: int(round(n_cases / 3))])
    ths = d["thetas"]
    steps = int(d["steps"])

    scenes = []
    for i in val_idx:
        verts = d["verts"][i][: d["nv"][i]].astype(np.float64)
        faces = d["faces"][i][: d["nf"][i]]
        scenes.append(engine3d.make_scene(d["yl"][i], d["yr"][i], verts,
                                          faces, num_points=192))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    poses = jnp.asarray(np.stack([0 * ths, 0 * ths, ths], -1), jnp.float32)
    en = np.asarray(engine3d.profile_batch(stacked, poses, steps=steps)[0])

    corrs = []
    for k, i in enumerate(val_idx):
        v = mask[i]
        if v.sum() < 6:
            continue
        e, t = en[k][v], target[i][v]
        if t.std() > 0.005:
            c = np.corrcoef(e, t)[0, 1]
            corrs.append(0.0 if not np.isfinite(c) else c)
    val_corr = float(np.mean(corrs))
    assert np.isfinite(en).all()
    assert val_corr >= 0.62, (
        f"held-out val corr regressed: {val_corr:.3f} "
        "(shipped r5 fit: 0.769 engine / 0.768 kernel, "
        "runs/calib/calib3d_search_nit1_p192.json)"
    )

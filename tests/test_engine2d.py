"""2D contact engine: invariants + statistical fidelity vs the MuJoCo oracle.

Note on tolerances: MuJoCo itself is chaotic at the pose level — re-running the
reference scene with a different (equally valid) convex decomposition changes
per-pose delta_theta with correlation only ~0.7 (measured: 50 vs 100 slabs).
The fidelity tests therefore check orientation-profile statistics
(smoothed correlation, magnitude, 3-class agreement), not pointwise equality.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgdm_tpu.core.config import SIM
from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.geom.fingers import sample_gripper_2d
from dgdm_tpu.sim import engine2d
from tests.util_icons import make_icon


@pytest.fixture(scope="module")
def scene():
    contour = extract_contours(make_icon(3))
    yl, yr = sample_gripper_2d(0)
    return engine2d.make_scene(yl, yr, contour)


def test_scene_mass_properties(scene):
    # synthetic blob ~0.08 m across: mass in a sane range, inertia positive
    assert 0.02 < float(scene.mass) < 1.0
    assert float(scene.inertia) > 0
    np.testing.assert_allclose(float(jnp.sum(scene.support_w)), 1.0, atol=1e-5)


def test_object_settles_on_plane(scene):
    # no-contact pose: fingers squeeze empty air, object drops 1cm onto plane
    pose = jnp.array([0.0, 0.0, 0.0], jnp.float32)
    state = engine2d.init_state(scene, pose)
    ctrl = jnp.zeros(2, jnp.float32)

    def body(s, _):
        return engine2d.step(scene, s, ctrl), None

    state, _ = jax.lax.scan(body, state, None, length=200)
    assert -0.0105 < float(state.zb) < -0.0099
    assert abs(float(state.vz)) < 1e-2
    # nothing pushed it sideways
    np.testing.assert_allclose(np.asarray(state.com), np.asarray(
        engine2d.init_state(scene, pose).com), atol=1e-6)


def test_fingers_track_actuator_without_contact(scene):
    # move the object far away so fingers move freely to their clamped targets
    pose = jnp.array([0.0, 0.0, 0.0], jnp.float32)
    state = engine2d.init_state(scene, pose)
    state = state.replace(com=state.com + jnp.array([10.0, 0.0]))
    ctrl = jnp.array([SIM.ctrl_2d, -SIM.ctrl_2d], jnp.float32)

    def body(s, _):
        return engine2d.step(scene, s, ctrl), None

    # the kp=10/damping=1 servo is underdamped (zeta~0.27): needs ~2.5s to
    # settle within 2% of the clamped target 0.1
    state, _ = jax.lax.scan(body, state, None, length=1250)
    np.testing.assert_allclose(np.asarray(state.q), [0.1, -0.1], atol=5e-3)


def test_profile_shapes_and_finiteness(scene):
    poses = jnp.asarray(engine2d.pose_grid(grid_size=8, num_pos=2))
    dth, dpos, fth = engine2d.profile(scene, poses)
    assert dth.shape == (8 * 4,)
    assert dpos.shape == (8 * 4, 2)
    assert np.isfinite(np.asarray(dth)).all()
    assert np.isfinite(np.asarray(dpos)).all()
    assert (np.asarray(fth) >= 0).all() and (np.asarray(fth) < 2 * np.pi + 1e-5).all()


def test_profile_batch_over_pairs(scene):
    scenes = jax.tree.map(lambda x: jnp.stack([x, x]), scene)
    poses = jnp.asarray(engine2d.pose_grid(grid_size=4, num_pos=1))
    dth, dpos, fth = engine2d.profile_batch(scenes, poses)
    assert dth.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(dth[0]), np.asarray(dth[1]), atol=1e-6)


def test_wrap():
    x = jnp.array([0.1, 3.2, -3.2, 6.3, -6.3])
    w = np.asarray(engine2d._wrap(x))
    np.testing.assert_allclose(
        w, [0.1, 3.2 - 2 * np.pi, 2 * np.pi - 3.2, 6.3 - 2 * np.pi, 2 * np.pi - 6.3],
        atol=1e-6,
    )


def test_pose_grid_matches_reference_order():
    g = engine2d.pose_grid(grid_size=3, num_pos=2, pos_extent=0.03)
    # rot-major, then x, then y (sim/sim_2d.py:139-146 loop order k,i,j writes
    # init_poses[k,i,j]); flattening matches npz obj_theta layout
    assert g.shape == (12, 3)
    np.testing.assert_allclose(g[0], [-0.03, -0.03, 0.0], atol=1e-7)
    np.testing.assert_allclose(g[1], [-0.03, 0.03, 0.0], atol=1e-7)
    np.testing.assert_allclose(g[4], [-0.03, -0.03, 2 * np.pi / 3], atol=1e-6)


@pytest.mark.slow
def test_statistical_fidelity_vs_mujoco_suite():
    """20-case fidelity regression guard against the committed MuJoCo oracle
    suite (runs/calib/oracle2d_suite*.npz, 60 objects x grippers x 48
    orientations, built by scripts/build_oracle_suite.py).

    Context for the thresholds (measured, docs/PARITY.md): MuJoCo's
    instance-vs-mean ceiling on this suite is corr 0.845 / agree 0.779
    (75-slab decomposition vs the 50/100 mean). The Newton engine with the
    searched calibration reaches corr 0.33 / MEDIAN RATIO 1.00 / agree 0.63
    against the mean — magnitude at parity (the Jacobi model under-rotated
    0.62x, biasing every downstream class label), direction at ~40% of the
    ceiling (open work: the crack-wall normal fan, docs/PARITY.md). Bounds
    sit just below those measurements so any regression fails loudly."""
    import os

    suite = os.path.join(os.path.dirname(__file__), "..", "runs", "calib",
                         "oracle2d_suite.npz")
    if not os.path.exists(suite):
        pytest.skip("oracle suite not built")
    d = np.load(suite)
    alt = np.load(suite.replace(".npz", "_s100.npz"))
    cases = np.arange(0, 60, 3)          # 20 cases spanning all 5 families
    mj = 0.5 * (d["delta_theta"] + alt["delta_theta"])[cases]
    ths = d["thetas"]                    # all 48 orientations (the smoothed
    mj = mj                              # corr is resolution-sensitive)

    scenes = [
        engine2d.make_scene(d["yl"][i], d["yr"][i], d["contours"][i])
        for i in cases
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    poses = jnp.asarray(
        np.stack([np.zeros_like(ths), np.zeros_like(ths), ths], -1),
        jnp.float32,
    )
    en = np.asarray(
        jax.jit(
            lambda sc: jax.vmap(lambda s: engine2d.profile(s, poses)[0])(sc)
        )(stacked)
    )

    def smooth(x, w=5):
        k = np.ones(w) / w
        return np.convolve(np.concatenate([x[-w:], x, x[:w]]), k, "same")[w:-w]

    def cls(x, th=0.03):
        return np.where(x > th, 2, np.where(x < -th, 0, 1))

    corrs, ratios, agrees = [], [], []
    for e, m in zip(en, mj):
        if m.std() > 0.01:
            c = np.corrcoef(smooth(e), smooth(m))[0, 1]
            corrs.append(0.0 if not np.isfinite(c) else c)
            ratios.append(e.std() / m.std())
        agrees.append((cls(e) == cls(m)).mean())
    corr, ratio, agree = np.mean(corrs), np.median(ratios), np.mean(agrees)
    # shipped round-4 NIT=3 refit (runs/calib/calib2d_search_nit3.json:
    # full-suite corr 0.413 / ratio 0.895 / agree 0.643, val corr 0.350);
    # this 20-case subset historically runs ~0.1 above the full suite
    # (round-3 NIT=4 fit measured 0.534/0.862/0.695 here), so the bounds
    # below retain roughly 15-20% regression margin over the shipped fit
    assert corr > 0.42, f"suite corr regressed: {corr:.3f} (was 0.53)"
    assert 0.72 < ratio < 1.15, f"magnitude regressed: {ratio:.3f} (was 0.86)"
    assert agree > 0.62, f"class agreement regressed: {agree:.3f} (was 0.70)"
    assert np.isfinite(en).all()


def test_mirror_symmetry_profiles():
    """The scene mirrored across the y-axis must produce exactly mirrored
    interaction profiles (the physical symmetry behind
    train.data.mirror_rows_2d augmentation)."""
    from dgdm_tpu.geom.contour import extract_contours
    from dgdm_tpu.geom.fingers import sample_gripper_2d
    from dgdm_tpu.geom.shapes import suite_icon

    contour = extract_contours(suite_icon(7))
    yl, yr = sample_gripper_2d(42)
    scene = engine2d.make_scene(yl, yr, contour)

    contour_m = (contour * np.asarray([-1.0, 1.0]))[::-1]
    scene_m = engine2d.make_scene(yl[::-1], yr[::-1], contour_m)

    ths = np.linspace(0.2, 2 * np.pi, 6, endpoint=False)
    poses = jnp.asarray(np.stack([0 * ths, 0 * ths, ths], -1), jnp.float32)
    poses_m = jnp.asarray(
        np.stack([0 * ths, 0 * ths, 2 * np.pi - ths], -1), jnp.float32)
    dth, dpos, _ = engine2d.profile(scene, poses, steps=120)
    dth_m, dpos_m, _ = engine2d.profile(scene_m, poses_m, steps=120)
    np.testing.assert_allclose(np.asarray(dth_m), -np.asarray(dth), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dpos_m)[:, 0], -np.asarray(dpos)[:, 0], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(dpos_m)[:, 1], np.asarray(dpos)[:, 1], atol=1e-4)


def test_earclip_anchor_weights():
    """Anchor weights: mean-1 normalization, vertex alignment, variants —
    and make_scene defaults to the uniform (exact no-op) anchor after the
    round-3 falsification (docs/PARITY.md)."""
    from dgdm_tpu.geom.polygon import earclip_anchor_weights

    ang = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    rad = 0.035 * (1 + 0.25 * np.sin(3 * ang) + 0.1 * np.sin(7 * ang))
    poly = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)
    for mode in ("degree", "perp"):
        w = earclip_anchor_weights(poly, mode=mode)
        assert w.shape == (60,)
        assert np.all(w >= 0)
        assert abs(w.mean() - 1.0) < 1e-9
    # the rolled variant is a genuinely different triangulation
    w0 = earclip_anchor_weights(poly)
    w1 = earclip_anchor_weights(poly, variant="rolled")
    assert not np.allclose(w0, w1)
    # CW input: weights must come back in the CALLER's vertex order (the
    # docstring contract), i.e. w(poly[::-1]) == w(poly)[::-1]
    for mode in ("degree", "perp"):
        w_ccw = earclip_anchor_weights(poly, mode=mode)
        w_cw = earclip_anchor_weights(poly[::-1].copy(), mode=mode)
        np.testing.assert_allclose(w_cw, w_ccw[::-1], atol=1e-12)

    contour = extract_contours(make_icon(3))
    yl, yr = sample_gripper_2d(0)
    sc_u = engine2d.make_scene(yl, yr, contour)
    assert np.asarray(sc_u.anchor).size == 1          # scalar/broadcast 1.0
    assert float(np.asarray(sc_u.anchor).reshape(-1)[0]) == 1.0
    sc_a = engine2d.make_scene(yl, yr, contour, triangulation="default")
    a = np.asarray(sc_a.anchor)
    assert a.shape[0] == np.asarray(sc_a.contour).shape[0]
    # anchored scene changes the profile only through cap_rough (finite)
    poses = engine2d.pose_grid(grid_size=4, num_pos=1)
    dth_u = engine2d.profile(sc_u, poses, steps=40)[0]
    dth_a = engine2d.profile(sc_a, poses, steps=40)[0]
    assert np.isfinite(np.asarray(dth_u)).all()
    assert np.isfinite(np.asarray(dth_a)).all()


@pytest.mark.slow
def test_heldout_val_corr_floor_2d():
    """Held-out validation-split fidelity floor (VERDICT r4 item 7).

    The suite guard above gates FULL-suite statistics only, so a
    throughput-motivated recalibration could silently trade held-out
    correlation down (the round-4 NIT=3 refit moved val corr 0.383 ->
    0.350 while the full-suite score stayed flat). This test replays the
    calibration search's own validation protocol — the RandomState(7)
    first-third split and smoothed per-case correlation of
    scripts/search_calib_2d.py:114-118,53-65 — and floors it at the
    shipped fit's value minus ~6% slack (0.350 measured,
    runs/calib/calib2d_search_nit3.json: val.corr)."""
    import os

    suite = os.path.join(os.path.dirname(__file__), "..", "runs", "calib",
                         "oracle2d_suite.npz")
    if not os.path.exists(suite):
        pytest.skip("oracle suite not built")
    d = np.load(suite)
    alt = np.load(suite.replace(".npz", "_s100.npz"))["delta_theta"]
    target = 0.5 * (d["delta_theta"] + alt)
    n_cases = target.shape[0]
    perm = np.random.RandomState(7).permutation(n_cases)
    val_idx = np.sort(perm[: int(round(n_cases / 3))])
    ths = d["thetas"]
    steps = int(d["steps"])

    scenes = [
        engine2d.make_scene(d["yl"][i], d["yr"][i], d["contours"][i])
        for i in val_idx
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    poses = jnp.asarray(
        np.stack([np.zeros_like(ths), np.zeros_like(ths), ths], -1),
        jnp.float32,
    )
    en = np.asarray(engine2d.profile_batch(stacked, poses, steps=steps)[0])
    tgt = target[val_idx]
    sig = tgt.std(-1) > 0.01

    def sm_all(x, w=5):
        pad = np.concatenate([x[..., -w:], x, x[..., :w]], -1)
        k = np.ones(w) / w
        out = np.apply_along_axis(lambda v: np.convolve(v, k, "same"), -1, pad)
        return out[..., w:-w]

    se, st = sm_all(en), sm_all(tgt)
    se_c = se - se.mean(-1, keepdims=True)
    st_c = st - st.mean(-1, keepdims=True)
    num = (se_c * st_c).sum(-1)
    den = np.sqrt((se_c**2).sum(-1) * (st_c**2).sum(-1)) + 1e-12
    val_corr = float((num / den)[sig].mean())
    assert np.isfinite(en).all()
    assert val_corr >= 0.33, (
        f"held-out val corr regressed: {val_corr:.3f} "
        "(shipped NIT=3 fit: 0.350, runs/calib/calib2d_search_nit3.json)"
    )

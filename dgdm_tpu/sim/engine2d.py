"""Batched planar contact engine — the TPU replacement for the reference's
per-process CPU MuJoCo rollouts (``sim/sim_2d.py:113-182``).

Model
-----
The 2D scene is strictly planar: the object (an extruded icon polygon on a
frictional plane) has 3 in-plane DOF plus an explicit vertical DOF that only
exists to reproduce MuJoCo's initial 1 cm drop onto the plane (the plane sits
at z = -0.01, scene XML at ``assets/finger_sampler.py:173-174``) and hence the
time-varying normal force behind plane friction. Each jaw is a 1-DOF slide
joint (axis +y, damping 1) driven by a position actuator (kp = 10, ctrl
clamped to +-0.1) exactly as the reference XML specifies.

Contact is point-vs-heightfield: the inner face of each finger is a
single-valued curve y = f(x) (cubic spline +- extrusion offset), so
finger-object collision reduces to evaluating the spline at the object's
contour-point x coordinates — a fully vectorized test with zero broadphase.
Normal forces follow MuJoCo's soft-constraint law (a_ref = k*depth - b*v_n
scaled by the contact's effective mass); friction is a velocity-level Coulomb
projection with exact stiction, applied after the unconstrained velocity
update. Plane support uses precomputed interior sample points approximating
the uniform pressure distribution of a flat resting body.

Everything is f32, static-shape, and `vmap`s over poses and pairs; a full
object x gripper interaction profile (360 x 5 x 5 poses x 200 steps,
``sim/sim_2d.py:139-171``) is one jitted `scan`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import GRIPPER_2D, OBJECT_2D, SIM
from dgdm_tpu.geom import contour as contour_lib
from dgdm_tpu.geom import polygon as polygon_lib
from dgdm_tpu.geom.spline import gripper2d_spline
from dgdm_tpu.sim.types import Scene2D, State2D

import flax.struct


@flax.struct.dataclass
class Calib:
    """Effective-parameter knobs fitted against the MuJoCo oracle.

    The engine's contact micro-structure differs from MuJoCo's mesh-mesh
    collisions (which tilt/bounce the object and transiently unload plane
    friction); these scalars absorb that difference at the statistics level.
    Being pytree leaves they are runtime values — changing them does not
    retrigger compilation."""

    mu_plane: jnp.ndarray      # effective object-plane sliding friction
    mu_finger: jnp.ndarray     # finger-object sliding friction
    mu_torsion: jnp.ndarray    # torsional coefficient (meters)
    k_contact: jnp.ndarray     # normal constraint stiffness (1/s^2)
    b_contact: jnp.ndarray     # normal constraint damping (1/s)
    unload: jnp.ndarray        # grip-induced plane-unloading gain (see step())
    rough: jnp.ndarray         # crack-capture tangential stiction gain (1/s)
    c_r: jnp.ndarray           # constraint compliance scale (Newton solver):
                               # r_i = c_r * A_ii, MuJoCo's R = (1-d)/d * A_ii
                               # divided by the decomposition multiplicity
    restitution: jnp.ndarray = 0.0
                               # finger-row velocity restitution (3D Newton
                               # only): outgoing-velocity bonus
                               # e*max(-vn0 - V_REST_THRESH, 0). Tested as a
                               # model of MuJoCo's ballistic clamp snaps
                               # (docs/PARITY.md r3) and REJECTED: it
                               # reproduces single snaps (case 29 exact at
                               # e=4) but self-excites chatter in sustained
                               # grips (suite ratio 3-56x at e>=2, pooled
                               # corr down at any e>0). Kept wired at the
                               # default 0.0 — an exact no-op — as the
                               # documented negative result.
    # --- 3D clamp-snap probe knobs (engine3d Newton path only; every one
    # an exact no-op at its default). All six were swept on the oracle
    # suite with contact-level force dumps (scripts/probe_snap_3d.py,
    # scripts/diag_snap3d.py) and REJECTED — pooled corr/ratio fall or stay
    # flat in every tested configuration; the measured snap mechanism needs
    # MuJoCo's coupled pyramidal-cone force amplification, not a scalar
    # gate (docs/PARITY.md "round 3b"). Kept wired as documented negative
    # results so the probes stay runnable.
    lam_sat: jnp.ndarray = 0.0
                               # pressure-saturating finger friction cap:
                               # mu * lam_sat * tanh(lam/lam_sat). 0 = off.
    om_release: jnp.ndarray = 0.0
                               # body-spin friction release toward
                               # mu_ballistic as 1/(1+(|om|*om_release)^2).
    v_gate: jnp.ndarray = 0.0
                               # closing-speed friction gate (mu scaled by
                               # mu_ballistic past v_gate m/s). 0 = off.
    mu_ballistic: jnp.ndarray = 1.0
                               # floor scale for om_release / v_gate.
    ram: jnp.ndarray = 0.0
                               # ram-contact inelastic absorption: fast-
                               # closing finger targets blend toward 0
                               # (never restitutive). 0 = off.
    w_fmult: jnp.ndarray = 1.0
                               # finger-row enforcement multiplicity (3D
                               # Newton): MuJoCo's condim-4 pyramidal
                               # contact is 4 edge rows in parallel, ~2-4x
                               # the single-row weight. Finger rows only —
                               # the engine's plane patch already carries
                               # point multiplicity. 1.0 = off.
    clamp_k: jnp.ndarray = 0.0
                               # clamp-regime coupled bracing (3D Newton,
                               # round 4): fast-closing finger rows'
                               # enforcement weight is amplified by the
                               # plane-braced admittance ratio a_nn/a_b,
                               # a_b_i = Jn_i (M + Jp^T Wp Jp)^-1 Jn_i^T —
                               # the diagonal of the Delassus Schur
                               # complement over the active plane block
                               # (the coupled-cone force amplification the
                               # round-3b measurement attributes to
                               # MuJoCo's full-A solve). 0.0 = off.
    clamp_press: jnp.ndarray = 0.0
                               # clamp-press target override (3D Newton,
                               # round 4): fast-closing finger rows blend
                               # their velocity target toward MuJoCo's
                               # critically-damped solref (0.02, 1) decay
                               # (vn+ ~= 0.82 vn0 — the measured 0.8x/step
                               # press of the clamp snap) instead of the
                               # fitted overdamped Baumgarte target whose
                               # d*b*dt = 1.44 > 1 restitutive spike pops
                               # the object off the press. 0.0 = off.
    plane_corner: jnp.ndarray = 0.0
                               # corner-support plane contact (3D Newton,
                               # round 4): blends the plane row's per-point
                               # enforcement weight toward the footprint
                               # convex-hull corner set (scene.bottom_w,
                               # engine3d.corner_weights_3d) with the total
                               # patch stiffness preserved — MuJoCo contacts
                               # the plane at 3-4 hull corners, and the
                               # round-4 snap trace shows the engine's dense
                               # patch tilt-braces the pivot-lift those
                               # sparse corners allow. 0.0 = off.
    clamp_w: jnp.ndarray = 1.0
                               # clamp-regime scalar weight boost (3D
                               # Newton, round 4): fast-closing finger
                               # rows' enforcement weight multiplied by
                               # clamp_w (gated, unlike the always-on
                               # w_fmult) so the press is enforced
                               # near-rigidly at velocity level. 1.0 = off.


CALIB_FIELDS = ("mu_plane", "mu_finger", "mu_torsion", "k_contact",
                "b_contact", "unload", "rough", "c_r", "restitution",
                "lam_sat", "om_release", "v_gate", "mu_ballistic", "ram",
                "w_fmult", "clamp_k", "clamp_press", "clamp_w",
                "plane_corner")


# Fitted against the 60-case x 48-theta MuJoCo oracle suite targeting the
# MEAN of two finger decompositions (runs/calib/calib2d.json,
# scripts/calibrate_engine.py). k/b sit ~70x above the nominal solref gains
# because they absorb MuJoCo's decomposition multiplicity (overlapping geom
# pairs on one physical patch multiply its effective stiffness); see
# docs/PARITY.md for the full derivation and resulting fidelity statistics.
FITTED_2D = {
    "mu_plane": 0.9661,
    "mu_finger": 1.3150,
    "mu_torsion": 0.002484,
    "k_contact": 177739.0,
    "b_contact": 701.45,
    "unload": 0.1384,
    "rough": 354.94,
    "c_r": 0.0526 / 8.0,   # (1-d)/d over an ~8x patch multiplicity prior
}

# Fitted for the coupled Newton solver at the shipped 3-iteration
# configuration by random search + refinement with a HELD-OUT split
# (scripts/search_calib_2d.py --newton_iters 3 --budget 80 --refine 40;
# runs/calib/calib2d_search_nit3.json, round 4): fit on 40 suite cases,
# validated on the other 20. Full suite: corr 0.413 / median ratio 0.895 /
# class agreement 0.643 (train score 1.088, val 0.903) — statistically at
# parity with the round-3 4-iteration fit (corr 0.419 / ratio 0.906 /
# agree 0.644, val score 0.903, calib2d_newton_r3.json) while the
# 3-iteration kernel runs +19% faster (287k vs 241k rollouts/s,
# runs/calib/sweep_newton_iters_2d_r4.json). The round-2 fit
# (calib2d_newton_final.json, in-sample at 5 iters) measured corr 0.336 /
# ratio 1.007 / agree 0.640 — both refits sit at the decomposition-noise
# ceiling (MuJoCo's own cross-decomposition self-agreement is
# 0.218-0.445, docs/PARITY.md) at a ~10% magnitude cost.
FITTED_2D_NEWTON = {
    "mu_plane": 0.606041,
    "mu_finger": 0.933939,
    "mu_torsion": 0.00373120,
    "k_contact": 10766.1,
    "b_contact": 103.611,
    "unload": 0.695116,
    "rough": 211.673,
    "c_r": 0.0254995,
}

# contact solver: "jacobi" (mass-split projected impulses + explicit elastic
# wedge term — the round-1 model) or "newton" (coupled semi-smooth Newton on
# the 5-DOF soft-constraint energy — MuJoCo's own formulation, exact
# multi-contact wedge equilibrium; the default since round 2). Both engines
# and both Pallas kernels implement both; read at trace time.
SOLVER = "newton"


def default_calib() -> Calib:
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    table = FITTED_2D_NEWTON if SOLVER == "newton" else FITTED_2D
    return Calib(**{k: f32(v) for k, v in table.items()})


def nominal_calib() -> Calib:
    """Uncalibrated solref/XML values (kept for ablation and tests)."""
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return Calib(
        mu_plane=f32(SIM.friction_slide),
        mu_finger=f32(SIM.friction_slide),
        mu_torsion=f32(SIM.friction_torsion),
        k_contact=f32(K_CONTACT),
        b_contact=f32(B_CONTACT),
        unload=f32(UNLOAD),
        rough=f32(ROUGH),
        c_r=f32((1.0 - IMPEDANCE) / IMPEDANCE),
    )


# contact gains (acceleration units, MuJoCo solref-style); the plane gains are
# stiffer, matching the ~1e-4 m resting penetration the oracle shows
K_CONTACT = SIM.contact_k
B_CONTACT = SIM.contact_b
K_PLANE = 1.0e5
B_PLANE = 650.0
# grip-induced plane-unloading gain (dimensionless; 0 disables). Fitted by
# scripts/calibrate_engine.py against the MuJoCo oracle suite.
UNLOAD = 0.0
# saturation depth for the elastic wedge term (stability clamp)
DEPTH_EL_CAP = 0.003
# crack-capture gain: the oracle's (and the reference's V-HACD) decomposition
# is not a smooth wall — penetrating tips wedge between adjacent convex
# pieces, which MuJoCo resolves as large opposing internal normal forces whose
# friction cones lock the tip tangentially. The engine's smooth heightfield
# has no cracks, so an equivalent penetration-proportional tangential stiction
# capacity stands in for it (fitted; 0 disables).
ROUGH = 0.0
# crack capture saturates fast: MuJoCo's crack-wall forces appear at ~zero
# penetration (the corner is in the crack as soon as it crosses the surface)
ROUGH_SAT = 5.0e-4


def upsample_contour(poly: np.ndarray, k: int) -> np.ndarray:
    """Insert k-1 evenly spaced points on every polygon edge.

    Contact is point-vs-heightfield, which only sees OBJECT-VERTEX -> finger
    contacts; a convex finger bump touching an object edge mid-span (the dual
    contact MuJoCo's mesh-mesh collider produces, where the sign of the
    first-touch torque is decided) is invisible until an object vertex sinks
    in. Densifying the contour restores those contacts: at first touch the
    surfaces are tangent, so the heightfield normal at the nearest sample
    equals the true contact normal to first order."""
    if k <= 1:
        return poly
    nxt = np.roll(poly, -1, axis=0)
    fr = np.arange(k, dtype=np.float64)[None, :, None] / k
    dense = poly[:, None, :] * (1.0 - fr) + nxt[:, None, :] * fr
    return dense.reshape(-1, poly.shape[1])


# Per-jaw host work: the cubic coefficient transform is cheap, but the exact
# MuJoCo jaw mass (hull of the full strip + 50 overlapping slab hulls,
# geom/polygon.py:finger_cross_section_area) costs ~8 ms/jaw — at the
# production workload (1,001 objects x 1,000 grippers) recomputing it per
# PAIR is ~4.5 host-hours vs 16 s once-per-gripper. Same pattern as
# engine3d's gripper cache.
_FINGER_CACHE_2D: "dict[bytes, tuple]" = {}
_FINGER_CACHE_2D_MAX = 4096


def _finger_host_work_2d(y: np.ndarray):
    from dgdm_tpu.geom.spline import cubic_basis_matrix, cubic_coef_operator

    g = GRIPPER_2D
    key = y.tobytes()
    hit = _FINGER_CACHE_2D.pop(key, None)
    if hit is not None:
        _FINGER_CACHE_2D[key] = hit     # pop+reinsert: true LRU, not FIFO
        return hit
    coef_op = cubic_coef_operator(g.num_ctrl, g.ctrl_x_min, g.ctrl_x_max)
    coef = np.einsum("skn,n->sk", coef_op, y)
    x_curve = np.linspace(g.ctrl_x_min, g.ctrl_x_max, g.num_curve_points)
    basis = cubic_basis_matrix(g.num_ctrl, g.ctrl_x_min, g.ctrl_x_max, x_curve)
    fmass = SIM.density * g.height * polygon_lib.finger_cross_section_area(
        basis @ y, x_curve, g.width
    )
    if len(_FINGER_CACHE_2D) >= _FINGER_CACHE_2D_MAX:
        _FINGER_CACHE_2D.pop(next(iter(_FINGER_CACHE_2D)))
    out = (coef, float(fmass))
    _FINGER_CACHE_2D[key] = out
    return out


def make_scene(
    yl: np.ndarray,
    yr: np.ndarray,
    contour: np.ndarray,
    support_grid: int = 8,
    contour_upsample: int = 1,
    triangulation: str = "uniform",
) -> Scene2D:
    """Host-side scene construction from raw control points + object contour.

    Mass/COM/inertia reproduce MuJoCo's model of the oracle scene EXACTLY
    (verified to machine precision): vertex-only meshes are convex-hulled, so
    each body is its collision decomposition PLUS the hull of its visual mesh
    (geom/polygon.py:object_mass_properties_2d / finger_cross_section_area).
    Per-finger masses matter: they set the kp=10 servo timing that decides
    where in the grip transient the 200-step profile snapshot lands.

    Pure numpy until the final device_put — eager per-op device dispatch is
    expensive on this platform, and scene building runs in host loops."""
    g = GRIPPER_2D
    coef_l, ml = _finger_host_work_2d(np.asarray(yl, np.float64))
    coef_r, mr = _finger_host_work_2d(np.asarray(yr, np.float64))
    fmass = np.array([ml, mr])
    poly = contour_lib.ensure_ccw(np.asarray(contour, dtype=np.float64))
    area, com, i0 = polygon_lib.object_mass_properties_2d(poly)
    poly_c = upsample_contour(poly, contour_upsample)
    spts, sw = polygon_lib.support_points(poly, grid=support_grid)
    mass = SIM.density * area * OBJECT_2D.height
    inertia = SIM.density * OBJECT_2D.height * i0
    # crack-fan anchors of the oracle's ear-clip decomposition. Probed and
    # REJECTED as a default (scripts/probe_anchor_2d.py, round 3): neither
    # fan-degree nor perpendicular-edge weights raise corr against the
    # MATCHING triangulation's oracle (0.506 uniform vs 0.44-0.49 anchored
    # on s50) — the decomposition-specific snap directions are not
    # expressible as a static per-vertex stiction weight, consistent with
    # the measured 2D chaos sensitivity (MuJoCo self-corr 0.856 at 0.2 mm;
    # docs/PARITY.md). Default "uniform" keeps anchor = 1 exactly.
    if triangulation == "uniform":
        anchor = np.ones(1, np.float64)
    else:
        anchor = polygon_lib.earclip_anchor_weights(
            poly, variant=triangulation)
        if contour_upsample > 1:
            k = contour_upsample
            fr = np.arange(k, dtype=np.float64)[None, :] / k
            nxt = np.roll(anchor, -1)
            anchor = (anchor[:, None] * (1.0 - fr)
                      + nxt[:, None] * fr).reshape(-1)[: len(poly_c)]
    f32 = functools.partial(jnp.asarray, dtype=jnp.float32)
    return Scene2D(
        coef_l=f32(coef_l),
        coef_r=f32(coef_r),
        contour=f32(poly_c),
        com=f32(com),
        mass=f32(mass),
        inertia=f32(inertia),
        support_pts=f32(spts),
        support_w=f32(sw),
        finger_mass=f32(fmass),
        anchor=f32(anchor),
    )


def init_state(scene: Scene2D, pose: jnp.ndarray) -> State2D:
    """pose = (x, y, theta) of the object BODY ORIGIN (the freejoint frame,
    reference sim/sim_2d.py:150-157)."""
    th = pose[2]
    c, s = jnp.cos(th), jnp.sin(th)
    rot = jnp.array([[c, -s], [s, c]])
    com_w = pose[:2] + rot @ scene.com
    z = jnp.zeros((), jnp.float32)
    return State2D(
        com=com_w,
        theta=th,
        vel=jnp.zeros(2, jnp.float32),
        om=z,
        zb=z,
        vz=z,
        q=jnp.zeros(2, jnp.float32),
        qd=jnp.zeros(2, jnp.float32),
    )


def _finger_contacts(scene: Scene2D, state: State2D, pts_w, vel_pts, r):
    """Contact sets against both finger heightfields.

    Returns per-point (depth, normal (P,2), weight, vn, finger velocity coupling)
    for left and right stacked: arrays of shape (2, P, ...)."""
    sp = _SPLINE
    g = GRIPPER_2D
    x = pts_w[:, 0]
    y = pts_w[:, 1]
    x_in = (x >= g.ctrl_x_min) & (x <= g.ctrl_x_max)
    xc = jnp.clip(x, g.ctrl_x_min, g.ctrl_x_max)

    f_l, d_l = sp.evaluate_with_derivative(scene.coef_l, xc)
    f_r, d_r = sp.evaluate_with_derivative(scene.coef_r, xc)

    surf_l = -g.jaw_offset + state.q[0] + f_l + g.width
    surf_r = g.jaw_offset + state.q[1] + f_r

    inv_l = jax.lax.rsqrt(1.0 + d_l * d_l)
    inv_r = jax.lax.rsqrt(1.0 + d_r * d_r)
    # unit normals pointing from finger surface into the halfspace of the object
    n_l = jnp.stack([-d_l * inv_l, inv_l], axis=-1)          # +y-ish
    n_r = jnp.stack([d_r * inv_r, -inv_r], axis=-1)          # -y-ish

    depth_l = (surf_l - y) * inv_l
    depth_r = (y - surf_r) * inv_r
    act_l = (depth_l > 0.0) & x_in
    act_r = (depth_r > 0.0) & x_in

    depth = jnp.stack([depth_l, depth_r])
    n = jnp.stack([n_l, n_r])
    act = jnp.stack([act_l, act_r]).astype(jnp.float32)
    return depth, n, act


def _point_kinematics(scene: Scene2D, state: State2D):
    c, s = jnp.cos(state.theta), jnp.sin(state.theta)
    rot = jnp.array([[c, -s], [s, c]])
    rel_b = scene.contour - scene.com                         # (P, 2)
    r = rel_b @ rot.T                                         # world lever arms
    pts_w = state.com + r
    vel_pts = state.vel + state.om * jnp.stack([-r[:, 1], r[:, 0]], -1)
    return rot, r, pts_w, vel_pts


# construct the cached spline at import time, outside any jit trace
_SPLINE = gripper2d_spline()

# contact-solver iterations: measured against the MuJoCo oracle, 6 matches 8
# on profile statistics (smoothed corr 0.42 vs 0.44, class agreement 0.62
# both) at ~30% higher rollout throughput; see docs/BENCH_NOTES.md
SOLVER_ITERS = 6
IMPEDANCE = 0.95  # MuJoCo solimp d at full penetration


def step(scene: Scene2D, state: State2D, ctrl: jnp.ndarray, dt: float = SIM.dt,
         regrasp: jnp.ndarray | None = None, calib: Calib | None = None) -> State2D:
    """One semi-implicit Euler step, dispatching on the module SOLVER flag
    (read at trace time)."""
    if SOLVER == "newton":
        return step_newton(scene, state, ctrl, dt, regrasp=regrasp, calib=calib)
    return step_jacobi(scene, state, ctrl, dt, regrasp=regrasp, calib=calib)


def step_jacobi(scene: Scene2D, state: State2D, ctrl: jnp.ndarray,
                dt: float = SIM.dt, regrasp: jnp.ndarray | None = None,
                calib: Calib | None = None) -> State2D:
    """One semi-implicit Euler step. ``ctrl`` = requested (left, right) target
    displacement (clamped to the actuator ctrlrange like MuJoCo).

    Contacts are resolved with an implicit velocity-level impulse solver
    (mass-split Jacobi with projected accumulators), which reproduces the
    near-rigid behavior of MuJoCo's constraint solver: the post-step relative
    normal velocity is driven to the soft-constraint target
    ``(1 - d*b*dt) v_n + d*dt*k*depth`` regardless of external load, so the
    large wedge forces of a pinched object emerge correctly.
    """
    if calib is None:
        calib = default_calib()
    g = GRIPPER_2D
    m, inertia, fm = scene.mass, scene.inertia, scene.finger_mass
    inv_m, inv_i, inv_fm = 1.0 / m, 1.0 / inertia, 1.0 / fm

    rot, r, pts_w, vel_pts = _point_kinematics(scene, state)
    depth, n, act = _finger_contacts(scene, state, pts_w, vel_pts, r)

    # mass-splitting weights: impulses applied simultaneously (Jacobi) are
    # scaled by the share of simultaneously-active contacts per finger
    cnt = jnp.maximum(act.sum(axis=1, keepdims=True), 1.0)
    w_c = act / cnt                                           # (2, P)

    # contact frame
    t = jnp.stack([-n[..., 1], n[..., 0]], axis=-1)           # (2, P, 2)
    rxn = r[None, :, 0] * n[..., 1] - r[None, :, 1] * n[..., 0]
    rxt = r[None, :, 0] * t[..., 1] - r[None, :, 1] * t[..., 0]
    inv_fm_c = inv_fm[:, None]                                # (2, 1) per row
    m_eff_n = 1.0 / (inv_m + rxn * rxn * inv_i + n[..., 1] ** 2 * inv_fm_c)
    m_eff_t = 1.0 / (inv_m + rxt * rxt * inv_i + t[..., 1] ** 2 * inv_fm_c)

    # plane normal force: penalty in z (settles to ~1e-4 m like MuJoCo)
    depth_z = (SIM.plane_z) - state.zb
    n_total = m * jnp.maximum(K_PLANE * depth_z - B_PLANE * state.vz, 0.0)
    rs = (scene.support_pts - scene.com) @ rot.T              # (S, 2)

    # soft-constraint velocity targets (from current-state v_n and depth)
    vf0 = state.qd[:, None, None] * jnp.array([0.0, 1.0])
    vn0 = jnp.sum((vel_pts[None] - vf0) * n, axis=-1)
    d_imp = IMPEDANCE
    # implicit stopping target always uses the stable base solref gains; the
    # fitted calib gains drive the explicit elastic term below instead
    target_n = (1.0 - d_imp * B_CONTACT * dt) * vn0 + d_imp * dt * K_CONTACT * depth

    # Sustained elastic wedge force. MuJoCo's soft constraint pushes EVERY
    # contact with force ~ m_eff * d * (k*depth - b*vn) — measured ~50 N total
    # at ~2 mm grip penetration across ~26 contacts (scripts/diag_forces_2d.py).
    # The mass-split Jacobi solve above the fixed point only realizes ~one
    # contact's worth of pushout, so without this term a pinched object
    # freezes in stiction instead of being torqued to the wedge equilibrium —
    # the deterministic signal of the interaction profile. Applied as an
    # explicit per-contact force (no mass splitting), with friction caps
    # enlarged to match.
    # Stability clamps: (a) the elastic impulse may push a contact outward at
    # most to its own Baumgarte pushout velocity (v_cap) — a wedged contact
    # feels the full sustained force, a free one is accelerated to a bounded
    # exit velocity; (b) the driving depth saturates at DEPTH_EL_CAP (MuJoCo
    # grip penetrations stay ~2 mm) so a deeply-penetrated pose cannot pump
    # unbounded spin energy through repeated kicks.
    depth_el = act * jnp.clip(depth, 0.0, DEPTH_EL_CAP)
    v_cap = d_imp * dt * calib.k_contact * depth_el
    dv_el = jnp.clip(
        d_imp * dt * (calib.k_contact * depth_el - calib.b_contact * vn0),
        0.0,
        jnp.maximum(v_cap - vn0, 0.0),
    )
    imp_mag = act * m_eff_n * dv_el                           # (2, P) impulse
    imp_el = imp_mag[..., None] * n                           # (2, P, 2)
    # Global energy clamp: per-point impulses SUM over the patch (that is the
    # multiplicity — MuJoCo's overlapping pairs add), so a free body would be
    # overshot n_active-fold. Scale the whole wrench so no contact's post-push
    # separation velocity exceeds its own pushout cap: a wedged grip (induced
    # dvn ~ 0) feels the full summed force, a free impact is not amplified.
    dvel_u = jnp.sum(imp_el, axis=(0, 1)) * inv_m             # (2,)
    dom_u = jnp.sum(imp_mag * rxn) * inv_i                    # ()
    dqd_u = -jnp.sum(imp_el[..., 1], axis=1) * inv_fm         # (2,)
    dv_pts = dvel_u + dom_u * jnp.stack([-r[:, 1], r[:, 0]], -1)   # (P, 2)
    dvn_ind = (
        jnp.sum(dv_pts[None] * n, axis=-1)
        - dqd_u[:, None] * n[..., 1]
    )                                                         # (2, P)
    headroom = jnp.maximum(v_cap - vn0, 0.0)
    # double-where keeps the unselected branch's gradient finite (the raw
    # quotient has ~0 denominators on inactive contacts)
    take = (act > 0) & (dvn_ind > 1e-9)
    denom = jnp.where(take, dvn_ind, 1.0)
    ratio = jnp.where(take, headroom / denom, jnp.inf)
    s_el = jnp.clip(jnp.min(ratio), 0.0, 1.0)
    imp_mag = s_el * imp_mag
    imp_el = s_el * imp_el
    f_el = imp_mag / dt                                       # (2, P) [N]

    # Mean-field plane unloading: once the object is pinched, MuJoCo's O(100N)
    # grip forces toss it vertically (mesh-contact normals are not exactly
    # horizontal) and it separates from the plane — measured plane force drops
    # to ~0 at grip onset (scripts/diag_forces_2d.py). The friction caps (not
    # the z support) are scaled down by the estimated grip load so the
    # squeeze-phase rotation is not overdamped by resting-weight friction.
    grip_ratio = jnp.sum(f_el) / (m * SIM.gravity)
    n_i = scene.support_w * n_total / (1.0 + calib.unload * grip_ratio)  # (S,)

    # ---- unconstrained velocity update ------------------------------------
    ctrl_c = jnp.clip(
        ctrl, jnp.array([0.0, -g.ctrl_clamped]), jnp.array([g.ctrl_clamped, 0.0])
    )
    f_fing = g.kp * (ctrl_c - state.q) - g.joint_damping * state.qd
    vel = state.vel + jnp.sum(imp_el, axis=(0, 1)) * inv_m
    om = state.om + jnp.sum(dt * f_el * rxn) * inv_i
    vz = state.vz + dt * (-SIM.gravity + n_total * inv_m)
    qd = state.qd + dt * (f_fing * inv_fm) - jnp.sum(imp_el[..., 1], axis=1) * inv_fm

    # ---- implicit contact solve (Jacobi + projected accumulators) ---------
    lam_n = jnp.zeros_like(depth)                             # (2, P)
    lam_t = jnp.zeros_like(depth)
    lam_s = jnp.zeros((scene.support_pts.shape[0], 2), jnp.float32)
    lam_w = jnp.zeros_like(n_i)                               # torsion

    def solver_iter(carry, _):
        vel, om, qd, lam_n, lam_t, lam_s, lam_w = carry
        # finger contacts: current relative velocity
        vp = vel + om * jnp.stack([-r[:, 1], r[:, 0]], -1)
        v_rel = vp[None] - qd[:, None, None] * jnp.array([0.0, 1.0])
        vn = jnp.sum(v_rel * n, axis=-1)
        vt = jnp.sum(v_rel * t, axis=-1)
        # normal: project accumulated impulse to >= 0
        d_lam_n = w_c * m_eff_n * (target_n - vn)
        new_lam_n = jnp.maximum(lam_n + d_lam_n, 0.0)
        d_n = new_lam_n - lam_n
        # friction: clamp accumulated to the cone (normal load includes the
        # explicit elastic wedge impulse + crack-capture capacity)
        cap = calib.mu_finger * (new_lam_n + dt * f_el) \
            + (calib.rough * m_eff_t * jnp.minimum(depth_el, ROUGH_SAT)
               * jnp.atleast_1d(scene.anchor)[None, :])
        d_lam_t = -w_c * m_eff_t * vt
        new_lam_t = jnp.clip(lam_t + d_lam_t, -cap, cap)
        d_t = new_lam_t - lam_t
        imp = d_n[..., None] * n + d_t[..., None] * t         # (2, P, 2)
        vel = vel + jnp.sum(imp, axis=(0, 1)) * inv_m
        om = om + jnp.sum(d_n * rxn + d_t * rxt) * inv_i
        qd = qd - jnp.sum(imp[..., 1], axis=1) * inv_fm

        # plane friction at support points (2D vector impulse per point)
        v_s = vel + om * jnp.stack([-rs[:, 1], rs[:, 0]], -1)
        d_lam_s = -scene.support_w[:, None] * m * v_s
        new_lam_s = lam_s + d_lam_s
        cap_s = calib.mu_plane * n_i * dt
        norm_s = jnp.sqrt(jnp.sum(new_lam_s**2, axis=-1) + 1e-20)
        scale_s = jnp.minimum(1.0, cap_s / norm_s)
        new_lam_s = new_lam_s * scale_s[:, None]
        d_s = new_lam_s - lam_s
        vel = vel + jnp.sum(d_s, axis=0) * inv_m
        om = om + jnp.sum(rs[:, 0] * d_s[:, 1] - rs[:, 1] * d_s[:, 0]) * inv_i
        # torsional friction
        d_lam_w = -scene.support_w * inertia * om
        new_lam_w = jnp.clip(
            lam_w + d_lam_w,
            -calib.mu_torsion * n_i * dt,
            calib.mu_torsion * n_i * dt,
        )
        d_w = new_lam_w - lam_w
        om = om + jnp.sum(d_w) * inv_i
        return (vel, om, qd, new_lam_n, new_lam_t, new_lam_s, new_lam_w), None

    (vel, om, qd, lam_n, lam_t, lam_s, lam_w), _ = jax.lax.scan(
        solver_iter,
        (vel, om, qd, lam_n, lam_t, lam_s, lam_w),
        None,
        length=SOLVER_ITERS,
    )

    # ---- integrate positions ---------------------------------------------
    new = State2D(
        com=state.com + dt * vel,
        theta=state.theta + dt * om,
        vel=vel,
        om=om,
        zb=state.zb + dt * vz,
        vz=vz,
        q=state.q + dt * qd,
        qd=qd,
    )
    if regrasp is not None:
        # gripper state reset (eval re-grasp, dynamics/sim_test_mj.py:165-171):
        # also zeroes all velocities like the reference's qvel reset
        zero2 = jnp.zeros(2, jnp.float32)
        z = jnp.zeros((), jnp.float32)
        new = new.replace(
            q=jnp.where(regrasp, zero2, new.q),
            qd=jnp.where(regrasp, zero2, new.qd),
            vel=jnp.where(regrasp, zero2, new.vel),
            om=jnp.where(regrasp, z, new.om),
            vz=jnp.where(regrasp, z, new.vz),
        )
    return new


# 3 iterations + 2-point line search, with the calibration REFIT AT 3
# iterations (round 4): the r4 sweep on the oracle suite measured NIT
# 5/4/3/2 = 208/241/287/356 k rollouts/s at suite score
# 1.028/1.011/0.978/0.845 under the NIT-4 constants
# (runs/calib/sweep_newton_iters_2d_r4.json); the NIT-3 refit
# (calib2d_search_nit3.json) recovers the score to 1.001 (val 0.903,
# identical to the NIT-4 fit's val) so the +19% throughput is free at
# suite level. The Pallas kernel unrolls exactly this configuration
# (pallas2d.NEWTON_KERNEL_ITERS). Dropping to 2 iterations is NOT safe
# (ratio 1.38 before refit, score 0.845).
NEWTON_ITERS = 3
_LS_ALPHAS = (1.0, 0.5)


def step_newton(scene: Scene2D, state: State2D, ctrl: jnp.ndarray,
                dt: float = SIM.dt, regrasp: jnp.ndarray | None = None,
                calib: Calib | None = None,
                return_forces: bool = False):
    """One semi-implicit step with a coupled semi-smooth Newton contact solve.

    This is MuJoCo's own convex soft-constraint formulation (Todorov 2014)
    specialized to the 5-DOF planar system u = (vx, vy, omega, qd_l, qd_r):

        u+ = argmin  1/2 (u - u_unc)^T M (u - u_unc)
                   + sum_n 1/(2 r_n) relu(target_n - J_n u)^2        (normals)
                   + sum_t Huber(J_t u; cap_t, r_t)                  (friction)

    with per-row compliance r_i = c_r * (J_i M^-1 J_i^T) — exactly MuJoCo's
    regularizer R = (1-d)/d * A_ii, where the calibrated ``c_r`` additionally
    absorbs the reference's decomposition multiplicity (many overlapping geom
    pairs per physical patch). The minimizer is found by damped Newton on the
    piecewise-quadratic energy: 5x5 PD solves, a backtracking line search
    over two step candidates (full and half Newton step) plus the monotone
    current-u fallback (_LS_ALPHAS), friction cone caps lagged one iteration. Unlike the Jacobi path
    (``step_jacobi``) there is no explicit elastic term and no global energy
    clamp — the sustained multi-contact wedge equilibrium is the exact
    minimizer of the energy, which is the regime that decides interaction
    profiles. Fully differentiable for gradient calibration."""
    if calib is None:
        calib = default_calib()
    g = GRIPPER_2D
    m, inertia, fm = scene.mass, scene.inertia, scene.finger_mass
    inv_m, inv_i, inv_fm = 1.0 / m, 1.0 / inertia, 1.0 / fm

    rot, r, pts_w, vel_pts = _point_kinematics(scene, state)
    depth, n, act = _finger_contacts(scene, state, pts_w, vel_pts, r)

    t = jnp.stack([-n[..., 1], n[..., 0]], axis=-1)           # (2, P, 2)
    rxn = r[None, :, 0] * n[..., 1] - r[None, :, 1] * n[..., 0]
    rxt = r[None, :, 0] * t[..., 1] - r[None, :, 1] * t[..., 0]
    inv_fm_c = inv_fm[:, None]
    a_nn = inv_m + rxn * rxn * inv_i + n[..., 1] ** 2 * inv_fm_c   # (2, P)
    a_tt = inv_m + rxt * rxt * inv_i + t[..., 1] ** 2 * inv_fm_c
    w_n = act / (calib.c_r * a_nn)        # stick stiffness [mass units]
    w_t = act / (calib.c_r * a_tt)
    m_eff_t = 1.0 / a_tt

    # constraint Jacobians (2, P, 5): d(v_rel · dir)/du
    e_l = jnp.array([1.0, 0.0], jnp.float32)[:, None]
    e_r = jnp.array([0.0, 1.0], jnp.float32)[:, None]
    Jn = jnp.stack([
        n[..., 0], n[..., 1], rxn, -n[..., 1] * e_l, -n[..., 1] * e_r,
    ], axis=-1)
    Jt = jnp.stack([
        t[..., 0], t[..., 1], rxt, -t[..., 1] * e_l, -t[..., 1] * e_r,
    ], axis=-1)

    u0 = jnp.concatenate([state.vel, state.om[None], state.qd])
    d_imp = IMPEDANCE
    vn0 = jnp.einsum("spk,k->sp", Jn, u0, precision="highest")
    target = (1.0 - d_imp * calib.b_contact * dt) * vn0 \
        + d_imp * dt * calib.k_contact * depth
    depth_el = act * jnp.clip(depth, 0.0, DEPTH_EL_CAP)
    # Crack-capture / rim-fan entrainment: a corner that has dug into the
    # decomposition is held by crack-wall forces measured to GROW with depth
    # (7.6 N at 1.3 mm vs 0.5 N at 0.4 mm in the MuJoCo contact dump,
    # scripts/diag_torque_2d.py) — no saturation. The large bilateral
    # tangential capacity entrains the corner with the advancing finger
    # (a pivot), which is what produces MuJoCo's sustained snap torque
    # rather than a single impulsive kick. scene.anchor carries the
    # per-vertex fan degree of the oracle's actual ear-clip decomposition
    # (mean 1; scalar 1.0 = decomposition-agnostic).
    cap_rough = (calib.rough * m_eff_t * depth_el
                 * jnp.atleast_1d(scene.anchor)[None, :])

    # plane support rows (normal handled by the explicit z penalty)
    depth_z = (SIM.plane_z) - state.zb
    n_total = m * jnp.maximum(K_PLANE * depth_z - B_PLANE * state.vz, 0.0)
    rs = (scene.support_pts - scene.com) @ rot.T              # (S, 2)
    a_s = inv_m + jnp.sum(rs * rs, -1) * inv_i * 0.5          # isotropic avg
    w_s = 1.0 / (calib.c_r * a_s)                             # (S,)
    w_w = inertia / calib.c_r                                 # torsion row

    Mdiag = jnp.concatenate([jnp.stack([m, m, inertia]), fm])
    ctrl_c = jnp.clip(
        ctrl, jnp.array([0.0, -g.ctrl_clamped]), jnp.array([g.ctrl_clamped, 0.0])
    )
    f_fing = g.kp * (ctrl_c - state.q) - g.joint_damping * state.qd
    u_unc = u0 + dt * jnp.concatenate([jnp.zeros(3, jnp.float32),
                                       f_fing * inv_fm])

    mg_dt = jnp.maximum(m * SIM.gravity * dt, 1e-9)

    def caps_from(u):
        vn = jnp.einsum("spk,k->sp", Jn, u, precision="highest")
        lam_n = w_n * jnp.maximum(target - vn, 0.0)
        cap_t = calib.mu_finger * lam_n + cap_rough
        grip_ratio = jnp.sum(lam_n) / mg_dt
        n_i = scene.support_w * n_total / (1.0 + calib.unload * grip_ratio)
        cap_s = calib.mu_plane * n_i * dt
        cap_w = calib.mu_torsion * jnp.sum(n_i) * dt
        return cap_t, cap_s, cap_w

    def hub(v, w, cap):
        """Huber potential: quadratic stick, linear slip."""
        q = 0.5 * w * v * v
        lin = cap * jnp.abs(v) - 0.5 * cap * cap / jnp.maximum(w, 1e-12)
        return jnp.where(w * jnp.abs(v) <= cap, q, lin)

    def plane_vel(u):
        vsx = u[0] - rs[:, 1] * u[2]
        vsy = u[1] + rs[:, 0] * u[2]
        return vsx, vsy, jnp.sqrt(vsx * vsx + vsy * vsy + 1e-16)

    def energy(u, cap_t, cap_s, cap_w):
        vn = jnp.einsum("spk,k->sp", Jn, u, precision="highest")
        vt = jnp.einsum("spk,k->sp", Jt, u, precision="highest")
        e_n = 0.5 * w_n * jnp.maximum(target - vn, 0.0) ** 2
        e_t = hub(vt, w_t, cap_t)
        _, _, vs = plane_vel(u)
        e_s = hub(vs, w_s, cap_s)
        e_w = hub(u[2], w_w, cap_w)
        e_u = 0.5 * jnp.sum(Mdiag * (u - u_unc) ** 2)
        return e_u + jnp.sum(e_n) + jnp.sum(e_t) + jnp.sum(e_s) + e_w

    def newton_iter(u, _):
        cap_t, cap_s, cap_w = caps_from(u)
        vn = jnp.einsum("spk,k->sp", Jn, u, precision="highest")
        vt = jnp.einsum("spk,k->sp", Jt, u, precision="highest")
        res_n = jnp.maximum(target - vn, 0.0)
        lam_n = w_n * res_n                                    # >= 0
        lam_t = jnp.clip(w_t * vt, -cap_t, cap_t)              # opposing force
        vsx, vsy, vs = plane_vel(u)
        fac_s = jnp.minimum(w_s, cap_s / vs)                   # (S,)
        f_w = jnp.clip(w_w * u[2], -cap_w, cap_w)

        grad = Mdiag * (u - u_unc)
        grad = grad - jnp.einsum("sp,spk->k", lam_n, Jn, precision="highest")
        grad = grad + jnp.einsum("sp,spk->k", lam_t, Jt, precision="highest")
        fx, fy = fac_s * vsx, fac_s * vsy
        grad = grad + jnp.stack([
            jnp.sum(fx), jnp.sum(fy),
            jnp.sum(rs[:, 0] * fy - rs[:, 1] * fx) + f_w,
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        ])

        on_n = w_n * (res_n > 0.0)
        on_t = w_t * (jnp.abs(w_t * vt) <= cap_t)
        H = jnp.diag(Mdiag)
        H = H + jnp.einsum("sp,spi,spj->ij", on_n, Jn, Jn,
                           precision="highest")
        H = H + jnp.einsum("sp,spi,spj->ij", on_t, Jt, Jt,
                           precision="highest")
        # plane rows (isotropic Gauss-Newton curvature fac_s)
        Hs00 = jnp.sum(fac_s)
        Hs02 = jnp.sum(fac_s * (-rs[:, 1]))
        Hs12 = jnp.sum(fac_s * rs[:, 0])
        Hs22 = jnp.sum(fac_s * jnp.sum(rs * rs, -1)) \
            + w_w * (jnp.abs(w_w * u[2]) <= cap_w)
        Hp = jnp.zeros((5, 5), jnp.float32)
        Hp = Hp.at[0, 0].set(Hs00).at[1, 1].set(Hs00).at[2, 2].set(Hs22)
        Hp = Hp.at[0, 2].set(Hs02).at[2, 0].set(Hs02)
        Hp = Hp.at[1, 2].set(Hs12).at[2, 1].set(Hs12)
        H = H + Hp

        delta = jnp.linalg.solve(H, -grad)
        cands = jnp.stack([u + a * delta for a in _LS_ALPHAS] + [u])
        evals = jax.vmap(lambda uu: energy(uu, cap_t, cap_s, cap_w))(cands)
        u_new = cands[jnp.argmin(evals)]
        return u_new, None

    # no-contact fast phase (see engine3d): with zero active contacts the
    # full iteration degenerates to the plane-friction-only subproblem, so 2
    # iterations suffice. NOTE: the engine gates per pose; the Pallas kernel
    # gates per 128-lane block (any contacting lane runs the full solve for
    # the whole block) — results agree at convergence, only the cost saving
    # is block-granular there.
    any_f = jnp.sum(act) > 0.0
    nit = jnp.where(any_f, NEWTON_ITERS, 2)

    def body_it(u, i):
        u2, _ = newton_iter(u, None)
        return jnp.where(i < nit, u2, u), None

    u, _ = jax.lax.scan(body_it, u_unc, jnp.arange(NEWTON_ITERS))

    vel, om, qd = u[:2], u[2], u[3:]
    vz = state.vz + dt * (-SIM.gravity + n_total * inv_m)

    if return_forces:
        cap_t, cap_s, cap_w = caps_from(u)
        vn_f = jnp.einsum("spk,k->sp", Jn, u, precision="highest")
        vt_f = jnp.einsum("spk,k->sp", Jt, u, precision="highest")
        lam_n = w_n * jnp.maximum(target - vn_f, 0.0)
        lam_t = jnp.clip(w_t * vt_f, -cap_t, cap_t)
        vsx, vsy, vs = plane_vel(u)
        fac_s = jnp.minimum(w_s, cap_s / vs)
        diag = {
            "lam_n": lam_n, "lam_t": lam_t,          # (2, P) impulses
            "torque_fing": jnp.sum(lam_n * rxn - lam_t * rxt) / dt,
            "torque_plane": -jnp.sum(
                fac_s * (rs[:, 0] * vsy - rs[:, 1] * vsx)) / dt,
            "n_active": act.sum(),
            "depth": depth, "act": act,
        }

    new = State2D(
        com=state.com + dt * vel,
        theta=state.theta + dt * om,
        vel=vel,
        om=om,
        zb=state.zb + dt * vz,
        vz=vz,
        q=state.q + dt * qd,
        qd=qd,
    )
    if regrasp is not None:
        zero2 = jnp.zeros(2, jnp.float32)
        z = jnp.zeros((), jnp.float32)
        new = new.replace(
            q=jnp.where(regrasp, zero2, new.q),
            qd=jnp.where(regrasp, zero2, new.qd),
            vel=jnp.where(regrasp, zero2, new.vel),
            om=jnp.where(regrasp, z, new.om),
            vz=jnp.where(regrasp, z, new.vz),
        )
    if return_forces:
        return new, diag
    return new


def _origin_of(scene: Scene2D, state: State2D) -> jnp.ndarray:
    c, s = jnp.cos(state.theta), jnp.sin(state.theta)
    rot = jnp.array([[c, -s], [s, c]])
    return state.com - rot @ scene.com


def rollout(
    scene: Scene2D,
    pose: jnp.ndarray,
    steps: int = SIM.steps_2d,
    dt: float = SIM.dt,
    regrasp_every: int = 0,
    calib: Calib | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Squeeze rollout from one initial pose.

    Returns (delta_theta wrapped to (-pi, pi], delta_pos (2,), final_theta
    in [0, 2pi)) matching the reference npz conventions (sim/sim_2d.py:172-180).
    """
    state0 = init_state(scene, pose)
    ctrl = jnp.array([SIM.ctrl_2d, -SIM.ctrl_2d], jnp.float32)

    def body(state, i):
        if regrasp_every:
            rg = (i % regrasp_every == 0) & (i > 0)
        else:
            rg = None
        return step(scene, state, ctrl, dt, regrasp=rg, calib=calib), None

    state, _ = jax.lax.scan(body, state0, jnp.arange(steps))
    d_theta = _wrap(state.theta - pose[2])
    d_pos = _origin_of(scene, state) - pose[:2]
    final_theta = jnp.mod(state.theta, 2.0 * jnp.pi)
    return d_theta, d_pos, final_theta


def _wrap(x):
    return x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))


@functools.partial(jax.jit, static_argnames=("steps", "every", "regrasp_every"))
def rollout_trace(
    scene: Scene2D,
    pose: jnp.ndarray,
    steps: int = SIM.steps_2d,
    every: int = 10,
    regrasp_every: int = 0,
    calib: Calib | None = None,
):
    """Trajectory-capturing rollout for visualization: returns per-sampled-step
    (obj_x, obj_y, theta, ql, qr) — exactly the tuple ``eval.viz.rollout_video_2d``
    consumes (replaces the reference's segmentation-render mp4 path,
    dynamics/sim_test_mj.py:219-233)."""
    state0 = init_state(scene, pose)
    ctrl = jnp.array([SIM.ctrl_2d, -SIM.ctrl_2d], jnp.float32)

    def body(state, i):
        if regrasp_every:
            rg = (i % regrasp_every == 0) & (i > 0)
        else:
            rg = None
        new = step(scene, state, ctrl, regrasp=rg, calib=calib)
        origin = _origin_of(scene, new)
        return new, jnp.stack(
            [origin[0], origin[1], new.theta, new.q[0], new.q[1]]
        )

    _, tr = jax.lax.scan(body, state0, jnp.arange(steps))
    return tr[::every]


def pose_grid(
    grid_size: int = SIM.grid_size,
    num_pos: int = SIM.num_pos,
    pos_extent: float = SIM.pos_extent,
) -> np.ndarray:
    """The reference datagen pose lattice (sim/sim_2d.py:139-143), flattened in
    the same (rot-major, then x, then y) order the npz arrays use."""
    z_rots = np.arange(grid_size) * (2.0 * np.pi / grid_size)
    if num_pos == 1:
        locs = np.zeros(1)
    else:
        locs = -pos_extent + 2.0 * pos_extent * np.arange(num_pos) / (num_pos - 1)
    k, i, j = np.meshgrid(z_rots, locs, locs, indexing="ij")
    return np.stack([i.reshape(-1), j.reshape(-1), k.reshape(-1)], -1).astype(
        np.float32
    )


@functools.partial(jax.jit, static_argnames=("steps", "regrasp_every"))
def profile(
    scene: Scene2D,
    poses: jnp.ndarray,
    steps: int = SIM.steps_2d,
    regrasp_every: int = 0,
    calib: Calib | None = None,
):
    """Interaction profile: vmap the rollout over a pose batch.

    poses (N, 3) -> (delta_theta (N,), delta_pos (N, 2), final_theta (N,))."""
    return jax.vmap(
        lambda p: rollout(
            scene, p, steps=steps, regrasp_every=regrasp_every, calib=calib
        )
    )(poses)


@functools.partial(jax.jit, static_argnames=("steps",))
def profile_batch(
    scenes: Scene2D,
    poses: jnp.ndarray,
    steps: int = SIM.steps_2d,
    calib: Calib | None = None,
):
    """Batch over pairs AND poses: scenes with leading dim B, poses (N, 3)
    shared -> outputs (B, N, ...). This is the datagen inner kernel."""
    return jax.vmap(lambda sc: profile(sc, poses, steps=steps, calib=calib))(scenes)

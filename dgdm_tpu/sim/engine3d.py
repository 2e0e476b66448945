"""Batched 3D contact engine — TPU replacement for the reference's 3D MuJoCo
rollouts (``sim/sim_3d.py:108-172``).

The object is a full 6-DOF rigid body (quaternion attitude) described by
surface sample points; each jaw is a 1-DOF slide joint along y carrying a
B-spline surface finger (``assets/finger_3d.py``), whose inner face is the
heightfield y = f(x, z) — so finger contact is again point-vs-heightfield,
evaluated with the precomputed B-spline piecewise-polynomial basis. Plane
contact runs through the same implicit solver (normals +z with lever arms, so
tipping is resolved correctly); the reference's tip-over give-up
(``sim/sim_3d.py:159-161``) becomes a per-rollout validity flag.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import GRIPPER_3D, SIM
from dgdm_tpu.geom.spline import gripper3d_surface
from dgdm_tpu.sim.types import Scene3D, State3D
from dgdm_tpu.sim.engine2d import (
    B_CONTACT, Calib, DEPTH_EL_CAP, IMPEDANCE, K_CONTACT, ROUGH_SAT,
)

# construct the cached B-spline surface at import time, outside any jit
# trace (a trace-time first construction would cache tracer constants)
_SURF = gripper3d_surface()

K_PLANE3 = 2.5e4
B_PLANE3 = 300.0
SOLVER_ITERS = 8
# Closing-speed threshold (m/s) above which finger-row restitution fires
# (see step_newton3): above the ~0.032 m/s actuator feed speed so sustained
# squeeze presses are inert, below the omega x r of alignment-snap impacts.
V_REST_THRESH = 0.05
# Height-grid resolution over (x, z). The envelope is piecewise planar with
# its DOMINANT ridges on the 12 x-slab boundaries (every 2 cm over 0.24 m)
# and the mid-z split; bilinear interpolation CHOPS ridges that fall between
# nodes by up to (slope jump x cell/2) — at the old 64x32 (3.75 mm cells)
# that lost 1-2 mm at crests, enough to miss marginal late-onset grips
# (suite case 27). 193x65 puts nodes EXACTLY on the slab-boundary lines
# (192 = 12x16 intervals, 64 = 2x32), so the big ridges interpolate
# exactly; remaining interior facet ridges have near-tangent slope jumps.
HGRID_H, HGRID_W = 193, 65

# fitted contact parameters (scripts/calibrate_engine3d.py); see engine2d for
# the physical meaning of each knob
UNLOAD3 = 0.0
ROUGH3 = 0.0
K_MULT3 = 1.0

# contact surface model for the fingers (host-side bake/fit switch):
# "envelope" = the decomposition-mean convex-hull envelope
# (geom/envelope3d.py) — what MuJoCo/V-HACD actually contacts; "smooth" =
# the bare B-spline sheet (round-2 behavior; misses late-onset contacts by
# the hull-chord millimeters).
CONTACT_SURFACE_3D = "envelope"


# Fitted for the coupled Newton solver by held-out random search through
# the fused Pallas kernel (scripts/search_calib_3d.py --budget 150
# --refine 60) against the 30-case prism-oracle suite scored vs the
# 12x2-decomposition sim the engine models exactly (envelope contact,
# geom/envelope3d.py). Round 5 refit at the shipped kernel config
# (num_points=192, newton_iters=1 — 2.11x the NIT6 throughput;
# runs/calib/calib3d_search_nit1_p192.json): full-suite corr 0.697 /
# ratio 0.978 / agree 0.783, held-out val corr 0.768 — at the round-3b
# NIT6 fit's statistics (0.705/0.963/0.791, val 0.659). NIT=3 and NIT=2
# refits land in the same band (corr 0.709/0.702 — calib3d_search_nit
# {3,2}_p192.json): truncation is absorbed by the calibration, so the
# fastest count ships. The faster 128-point refit was REJECTED on
# fidelity (calib3d_search_nit3_p128.json: full corr 0.623, val 0.613 <
# the 0.62 CI floor).
FITTED_3D_NEWTON = {
    "mu_plane": 0.1098595585158766,
    "mu_finger": 0.16985552065762255,
    # NOTE: mu_torsion is INERT in the 3D Newton path — torsional plane
    # friction (oracle condim=4) is supplied implicitly by the multi-point
    # patch contacts, and neither engine3d nor pallas3d reads calib.mu_torsion
    # in the Newton solve. The value below is a fitted no-op retained for
    # Calib-struct compatibility; it is excluded from the calibration search.
    "mu_torsion": 0.00458153,
    "k_contact": 15724.569062772094,
    "b_contact": 115.80794925673753,
    "unload": 2.702276478255927,
    "rough": 126.34874804571092,
    "c_r": 0.3690845085780728,
}


# Fitted for the pyramidal-cone solver (step_newton3_pyramid) by held-out
# engine-side random search (scripts/search_calib_pyramid.py, 60 configs,
# 20 train / 10 val; runs/calib/calib3d_pyramid.json): full-suite corr
# 0.701 / ratio 1.08 / agree 0.76 (val corr 0.730) — statistical parity
# with the Huber-Newton default (0.705/0.96/0.79), so the default stays
# Newton. Note the fitted per-edge compliance c_r = 0.73 ~= 4x the Newton
# row's 0.1376: four parallel edge rows share the load, exactly the
# multiplicity the round-3b measurement predicted.
FITTED_3D_PYRAMID = {
    "mu_plane": 0.559093,
    "mu_finger": 1.117325,
    "k_contact": 2397.16,
    "b_contact": 302.934,
    "unload": 0.751029,
    "c_r": 0.729647,
}


def default_calib3() -> Calib:
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    if SOLVER3 == "pyramid":
        vals = dict(FITTED_3D_NEWTON, rough=0.0, **FITTED_3D_PYRAMID)
        return Calib(**{k: f32(v) for k, v in vals.items()})
    if SOLVER3 == "newton":
        return Calib(**{k: f32(v) for k, v in FITTED_3D_NEWTON.items()})
    return Calib(
        mu_plane=f32(SIM.friction_slide),
        mu_finger=f32(SIM.friction_slide),
        mu_torsion=f32(SIM.friction_torsion),
        k_contact=f32(K_CONTACT * K_MULT3),
        b_contact=f32(B_CONTACT * K_MULT3),
        unload=f32(UNLOAD3),
        rough=f32(ROUGH3),
        c_r=f32(0.0526),   # used by the Newton solvers only (shared pytree)
    )


def finger_masses_3d(yl: np.ndarray, yr: np.ndarray,
                     decomps=((12, 2),)) -> np.ndarray:
    """Exact per-jaw masses of the oracle scene: MuJoCo convex-hulls every
    vertex-only mesh, so a jaw = hull(visual sheet) + the slab hulls
    (sim/oracle3d.py); the engine models the 12x2 decomposition exactly
    (geom/envelope3d.DEFAULT_DECOMPS — see the note there on why ONE
    decomposition, not the mean). The value matches the 12x2 MjModel to
    machine precision (tests/test_oracle3d.py). The per-finger mass sets
    the kp=10 servo arrival time — first-order for where in the grip
    transient the 800-step profile lands."""
    from scipy.spatial import ConvexHull

    from dgdm_tpu.sim.oracle3d import _finger_slab_meshes, _surface_grid

    g = GRIPPER_3D
    out = []
    for y in (yl, yr):
        grid = _surface_grid(np.asarray(y)).reshape(-1, 3)
        vis = ConvexHull(
            np.concatenate([grid, grid + [0, g.width, 0]])
        ).volume
        per_dec = []
        for nx_s, nz_s in decomps:
            vol = vis
            for slab in _finger_slab_meshes(np.asarray(y), nx_s, num_z=nz_s):
                vol += ConvexHull(slab).volume
            per_dec.append(SIM.density * vol)
        out.append(float(np.mean(per_dec)))
    return np.asarray(out)


def bake_height_grids(yl: np.ndarray, yr: np.ndarray) -> np.ndarray:
    """Evaluate both finger surfaces + slopes on a dense (x, z) lattice.

    Returns (2, H, W, 3): [height, dh/dx, dh/dz]. Bilinear interpolation of
    this grid replaces per-step B-spline basis evaluation in the hot loop
    (surface curvature is mild: interpolation error << contact tolerances)."""
    import jax as _jax

    g = GRIPPER_3D
    xs = np.linspace(g.ctrl_x_min, g.ctrl_x_max, HGRID_H)
    zs = np.linspace(g.ctrl_z_min, g.ctrl_z_max, HGRID_W)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    out = np.zeros((2, HGRID_H, HGRID_W, 3), dtype=np.float32)
    flat_x = jnp.asarray(gx.reshape(-1), jnp.float32)
    flat_z = jnp.asarray(gz.reshape(-1), jnp.float32)

    @_jax.jit
    def eval_one(yc):
        h = _SURF.height(yc, flat_x, flat_z)
        sx, sz = _SURF.slopes(yc, flat_x, flat_z)
        return h, sx, sz

    use_env = CONTACT_SURFACE_3D == "envelope"
    for i, y in enumerate((yl, yr)):
        if use_env:
            from dgdm_tpu.geom.envelope3d import finger_envelope

            h, sx, sz = finger_envelope(
                np.asarray(y), gx.reshape(-1), gz.reshape(-1),
                side="upper" if i == 0 else "lower",
            )
        else:
            yc = jnp.asarray(np.asarray(y).reshape(g.nu, g.nv), jnp.float32)
            h, sx, sz = eval_one(yc)
        out[i, ..., 0] = np.asarray(h).reshape(HGRID_H, HGRID_W)
        out[i, ..., 1] = np.asarray(sx).reshape(HGRID_H, HGRID_W)
        out[i, ..., 2] = np.asarray(sz).reshape(HGRID_H, HGRID_W)
    return out


def _bilerp(grid: jnp.ndarray, x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """grid (H, W, 3); x, z (P,) clipped coords -> (P, 3)."""
    g = GRIPPER_3D
    fx = (x - g.ctrl_x_min) / (g.ctrl_x_max - g.ctrl_x_min) * (HGRID_H - 1)
    fz = (z - g.ctrl_z_min) / (g.ctrl_z_max - g.ctrl_z_min) * (HGRID_W - 1)
    fx = jnp.clip(fx, 0.0, HGRID_H - 1.0)
    fz = jnp.clip(fz, 0.0, HGRID_W - 1.0)
    i0 = jnp.clip(fx.astype(jnp.int32), 0, HGRID_H - 2)
    j0 = jnp.clip(fz.astype(jnp.int32), 0, HGRID_W - 2)
    wx = (fx - i0)[:, None]
    wz = (fz - j0)[:, None]
    # jnp view: scenes now carry host-numpy leaves, and numpy arrays cannot
    # be fancy-indexed by tracers when the grid enters a trace as a constant
    flat = jnp.asarray(grid).reshape(-1, 3)
    idx = i0 * HGRID_W + j0
    g00 = flat[idx]
    g01 = flat[idx + 1]
    g10 = flat[idx + HGRID_W]
    g11 = flat[idx + HGRID_W + 1]
    return ((1 - wx) * ((1 - wz) * g00 + wz * g01)
            + wx * ((1 - wz) * g10 + wz * g11))


def object_properties_3d(verts: np.ndarray, faces: np.ndarray,
                         num_points: int = 256, seed: int = 0):
    """Object-side host work of make_scene (mass/inertia integration +
    surface point sampling). Compute ONCE per object and pass to make_scene
    via ``obj_props`` when building a gripper block — the per-pair recompute
    dominated small-batch 3D datagen (VERDICT r2 weak #5)."""
    from dgdm_tpu.geom import mesh3d

    mass, com, inertia = mesh3d.mass_properties(verts, faces, SIM.density)
    mass *= SIM.mass_factor
    inertia = inertia * SIM.mass_factor
    pts = mesh3d.sample_surface(verts, faces, num_points, seed=seed)
    return mass, com, inertia, pts, corner_weights_3d(pts)


def corner_weights_3d(pts: np.ndarray, z_tol: float = 2e-3,
                      r_tol: float = 2.5e-3) -> np.ndarray:
    """Per-point plane-support corner weight in [0, 1]: 1 for sampled
    surface points on the bottom face near a footprint convex-hull vertex,
    0 elsewhere. MuJoCo contacts the plane at 3-4 hull CORNERS, not a
    dense patch — the round-4 snap trace (docs/PARITY.md) shows the
    engine's 60+-point patch tilt-braces the pivot-lift MuJoCo's sparse
    corner support allows. Consumed by the Calib.plane_corner gated
    reweighting in step_newton3 (default 0.0 = exact no-op)."""
    pts = np.asarray(pts, np.float64)
    zmin = pts[:, 2].min()
    bottom = pts[:, 2] <= zmin + z_tol
    w = np.zeros(pts.shape[0], np.float32)
    bxy = pts[bottom, :2]
    if bxy.shape[0] >= 3:
        try:
            from scipy.spatial import ConvexHull

            hull_xy = bxy[ConvexHull(bxy).vertices]
        except Exception:
            hull_xy = bxy
        d2 = ((pts[:, None, :2] - hull_xy[None]) ** 2).sum(-1).min(-1)
        w = (bottom & (d2 <= r_tol**2)).astype(np.float32)
    if w.sum() < 3.0:                       # degenerate: keep the patch
        w = bottom.astype(np.float32)
    return w


# Per-gripper host work (envelope bake + exact hull masses) costs ~2.7 s of
# CPU per jaw pair — with the production workload (301 objects x 2,000
# grippers, sim/run_sim_3d.sh) recomputing it per PAIR would be ~450 host
# hours. The LRU below makes it once per gripper: cli/datagen3d.py loops
# gripper blocks OUTER, objects inner, so a block's geometry is reused for
# every object before eviction. Keyed on the raw control points + the
# contact-surface mode (bake_height_grids reads CONTACT_SURFACE_3D).
_GRIP_CACHE: "dict[bytes, tuple]" = {}
_GRIP_CACHE_MAX = 1024          # ~300 MB of (193, 65, 3) f32 grids


def _gripper_host_work(yl: np.ndarray, yr: np.ndarray):
    key = (yl.tobytes() + yr.tobytes()
           + CONTACT_SURFACE_3D.encode())
    hit = _GRIP_CACHE.pop(key, None)
    if hit is not None:
        _GRIP_CACHE[key] = hit          # pop+reinsert: true LRU, not FIFO
        return hit
    out = (bake_height_grids(yl, yr), finger_masses_3d(yl, yr))
    if len(_GRIP_CACHE) >= _GRIP_CACHE_MAX:
        _GRIP_CACHE.pop(next(iter(_GRIP_CACHE)))
    _GRIP_CACHE[key] = out
    return out


def make_scene(
    yl: np.ndarray,
    yr: np.ndarray,
    verts: np.ndarray,
    faces: np.ndarray,
    num_points: int = 192,
    seed: int = 0,
    obj_props=None,
) -> Scene3D:
    """yl/yr: (21,) finger ctrl y values (x-major grid order); verts/faces:
    the object mesh (watertight).

    ``num_points`` is the CONTACT sample count (the dynamics model's input
    clouds are sampled separately, train/data.py). Round 5: the calibration
    is now fitted AT 192 points / NIT=3 through the fused kernel
    (runs/calib/calib3d_search_nit3_p192.json, full corr 0.709 / val
    0.762), so 192 is both the production default and the CI-guarded
    config (tests/test_oracle3d.py). 128 points was refit the same way and
    rejected on fidelity (corr 0.623 — calib3d_search_nit3_p128.json)."""
    g = GRIPPER_3D
    hgrid, fmass = _gripper_host_work(np.asarray(yl), np.asarray(yr))
    # the oracle body = visual + collision copies of the same (hulled) mesh:
    # exactly 2x the mesh mass for convex objects (scan objects are used via
    # their V-HACD hulls in the reference too)
    if obj_props is None:
        obj_props = object_properties_3d(verts, faces, num_points, seed)
    if len(obj_props) == 4:             # pre-round-4 caller without weights
        mass, com, inertia, pts = obj_props
        corner_w = corner_weights_3d(np.asarray(pts))
    else:
        mass, com, inertia, pts, corner_w = obj_props
    # HOST numpy leaves: scenes are built in host loops and batched with
    # np.stack before one device transfer of the stacked arrays
    # (sim/pipeline.py, datagen3d.profile_pairs_3d). Device leaves here cost
    # 11 eager tunnel round-trips per scene at build + one pull per leaf at
    # stack time (~15 s per 48-scene wave, scripts/probe_demo3d_rate.py).
    # jit/vmap consumers accept numpy inputs unchanged.
    f32 = functools.partial(np.asarray, dtype=np.float32)
    return Scene3D(
        yl=f32(np.asarray(yl).reshape(g.nu, g.nv)),
        yr=f32(np.asarray(yr).reshape(g.nu, g.nv)),
        hgrid=f32(hgrid),
        points=f32(pts),
        com=f32(com),
        mass=f32(mass),
        inertia=f32(inertia),
        inv_inertia=f32(np.linalg.inv(inertia)),
        bottom_pts=f32(pts[:1]),      # unused: plane contact uses all points
        bottom_w=f32(corner_w),       # (P,) footprint-corner support weights
        finger_mass=f32(fmass),
    )


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def quat_integrate(q: jnp.ndarray, om: jnp.ndarray, dt: float) -> jnp.ndarray:
    """q <- normalize(q + dt/2 * om_quat * q), om in world frame."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    ox, oy, oz = om[0], om[1], om[2]
    dq = 0.5 * jnp.array(
        [
            -ox * x - oy * y - oz * z,
            ox * w + oy * z - oz * y,
            -ox * z + oy * w + oz * x,
            ox * y - oy * x + oz * w,
        ]
    )
    q = q + dt * dq
    return q / jnp.sqrt(jnp.sum(q * q) + 1e-12)


def init_state(scene: Scene3D, pose: jnp.ndarray) -> State3D:
    """pose = (x, y, theta): body origin offset + z-rotation
    (sim/sim_3d.py:138-145; z position starts at 0)."""
    th = pose[2]
    q = jnp.stack(
        [jnp.cos(th / 2), jnp.zeros(()), jnp.zeros(()), jnp.sin(th / 2)]
    )
    rot = quat_to_mat(q)
    origin = jnp.stack([pose[0], pose[1], jnp.zeros(())])
    return State3D(
        pos=origin + rot @ scene.com,
        quat=q,
        vel=jnp.zeros(3, jnp.float32),
        om=jnp.zeros(3, jnp.float32),
        q=jnp.zeros(2, jnp.float32),
        qd=jnp.zeros(2, jnp.float32),
    )


# contact solver selection, like engine2d.SOLVER (read at trace time).
# Newton is the default since round 2: the Jacobi path's explicit elastic
# kicks pump spin energy at grip onset (measured suite ratio 4-100x vs the
# MuJoCo oracle); the coupled Newton solve is stable and calibrated to
# corr 0.62 / ratio 0.74 / agree 0.79 pooled (val 0.78/0.82/0.87).
SOLVER3 = "newton"


def step(
    scene: Scene3D,
    state: State3D,
    ctrl: jnp.ndarray,
    dt: float = SIM.dt,
    regrasp: jnp.ndarray | None = None,
    solver_iters: int = SOLVER_ITERS,
    calib: Calib | None = None,
) -> State3D:
    if SOLVER3 == "newton":
        return step_newton3(scene, state, ctrl, dt, regrasp=regrasp,
                            calib=calib)
    if SOLVER3 == "pyramid":
        return step_newton3_pyramid(scene, state, ctrl, dt, regrasp=regrasp,
                                    calib=calib)
    return step_jacobi3(scene, state, ctrl, dt, regrasp=regrasp,
                        solver_iters=solver_iters, calib=calib)


def step_jacobi3(
    scene: Scene3D,
    state: State3D,
    ctrl: jnp.ndarray,
    dt: float = SIM.dt,
    regrasp: jnp.ndarray | None = None,
    solver_iters: int = SOLVER_ITERS,
    calib: Calib | None = None,
) -> State3D:
    if calib is None:
        calib = default_calib3()
    g = GRIPPER_3D
    m, fm = scene.mass, scene.finger_mass
    inv_m, inv_fm = 1.0 / m, 1.0 / fm
    rot = quat_to_mat(state.quat)
    inv_i = rot @ scene.inv_inertia @ rot.T                  # world frame

    r = (scene.points - scene.com) @ rot.T                   # (P, 3) world
    pw = state.pos + r

    x, y, z = pw[:, 0], pw[:, 1], pw[:, 2]
    in_dom = (
        (x >= g.ctrl_x_min) & (x <= g.ctrl_x_max)
        & (z >= g.ctrl_z_min) & (z <= g.ctrl_z_max)
    )
    xc = jnp.clip(x, g.ctrl_x_min, g.ctrl_x_max)
    zc = jnp.clip(z, g.ctrl_z_min, g.ctrl_z_max)

    hl = _bilerp(scene.hgrid[0], xc, zc)
    hr = _bilerp(scene.hgrid[1], xc, zc)
    f_l, sx_l, sz_l = hl[:, 0], hl[:, 1], hl[:, 2]
    f_r, sx_r, sz_r = hr[:, 0], hr[:, 1], hr[:, 2]

    surf_l = -g.jaw_offset + state.q[0] + f_l + g.width
    surf_r = g.jaw_offset + state.q[1] + f_r
    inv_nl = jax.lax.rsqrt(1.0 + sx_l**2 + sz_l**2)
    inv_nr = jax.lax.rsqrt(1.0 + sx_r**2 + sz_r**2)
    n_l = jnp.stack([-sx_l, jnp.ones_like(sx_l), -sz_l], -1) * inv_nl[:, None]
    n_r = jnp.stack([sx_r, -jnp.ones_like(sx_r), sz_r], -1) * inv_nr[:, None]
    depth_l = (surf_l - y) * inv_nl
    depth_r = (y - surf_r) * inv_nr
    act_l = ((depth_l > 0.0) & in_dom).astype(jnp.float32)
    act_r = ((depth_r > 0.0) & in_dom).astype(jnp.float32)

    # plane contacts: all surface points against z = plane_z
    depth_p = SIM.plane_z - z
    act_p = (depth_p > 0.0).astype(jnp.float32)

    depth = jnp.stack([depth_l, depth_r, depth_p])           # (3, P)
    n = jnp.stack(
        [n_l, n_r, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n_l.shape)]
    )                                                        # (3, P, 3)
    act = jnp.stack([act_l, act_r, act_p])
    cnt = jnp.maximum(act.sum(axis=1, keepdims=True), 1.0)
    w_c = act / cnt

    # effective mass along normals; finger coupling only for rows 0/1
    rxn = jnp.cross(jnp.broadcast_to(r, n.shape), n)          # (3, P, 3)
    ang = jnp.einsum("cpi,ij,cpj->cp", rxn, inv_i, rxn)
    fing_inv = jnp.stack(
        [n_l[:, 1] ** 2 * inv_fm[0], n_r[:, 1] ** 2 * inv_fm[1],
         jnp.zeros_like(depth_p)]
    )
    m_eff_n = 1.0 / (inv_m + ang + fing_inv)

    k_c = jnp.array([K_CONTACT, K_CONTACT, K_PLANE3])[:, None]
    b_c = jnp.array([B_CONTACT, B_CONTACT, B_PLANE3])[:, None]

    vf = jnp.stack(
        [
            state.qd[0] * jnp.array([0.0, 1.0, 0.0]),
            state.qd[1] * jnp.array([0.0, 1.0, 0.0]),
            jnp.zeros(3),
        ]
    )                                                        # (3, 3)
    vp0 = state.vel + jnp.cross(state.om, r)                 # (P, 3)
    vrel0 = vp0[None] - vf[:, None, :]
    vn0 = jnp.sum(vrel0 * n, axis=-1)
    d_imp = IMPEDANCE
    target_n = (1.0 - d_imp * b_c * dt) * vn0 + d_imp * dt * k_c * depth

    # Explicit elastic wedge on the FINGER rows (see engine2d.step: MuJoCo's
    # decomposition multiplicity makes its sustained grip forces scale with
    # the overlapping-pair count; the calib gains absorb that). The plane row
    # stays implicit. Wrench-clamped so multi-point sums cannot overshoot.
    el_row = jnp.array([1.0, 1.0, 0.0])[:, None]
    depth_el = el_row * act * jnp.clip(depth, 0.0, DEPTH_EL_CAP)
    v_cap = d_imp * dt * calib.k_contact * depth_el
    dv_el = jnp.clip(
        d_imp * dt * (calib.k_contact * depth_el - calib.b_contact * vn0),
        0.0,
        jnp.maximum(v_cap - vn0, 0.0),
    ) * el_row * act
    imp_mag = m_eff_n * dv_el                                # (3, P)
    imp_el = imp_mag[..., None] * n                          # (3, P, 3)
    dvel_u = jnp.sum(imp_el, axis=(0, 1)) * inv_m            # (3,)
    dom_u = inv_i @ jnp.sum(
        jnp.cross(jnp.broadcast_to(r, imp_el.shape), imp_el), axis=(0, 1)
    )
    dqd_u = -jnp.stack(
        [jnp.sum(imp_el[0, :, 1]), jnp.sum(imp_el[1, :, 1])]
    ) * inv_fm                                               # (2,)
    dv_pts = dvel_u + jnp.cross(dom_u, r)                    # (P, 3)
    dqd_rows = jnp.stack(
        [dqd_u[0] * jnp.array([0.0, 1.0, 0.0]),
         dqd_u[1] * jnp.array([0.0, 1.0, 0.0]),
         jnp.zeros(3)]
    )                                                        # (3, 3)
    dvn_ind = jnp.sum((dv_pts[None] - dqd_rows[:, None, :]) * n, axis=-1)
    headroom = jnp.maximum(v_cap - vn0, 0.0)
    take_el = (dv_el > 0) & (dvn_ind > 1e-9)
    denom = jnp.where(take_el, dvn_ind, 1.0)
    s_el = jnp.clip(
        jnp.min(jnp.where(take_el, headroom / denom, jnp.inf)), 0.0, 1.0
    )
    imp_mag = s_el * imp_mag
    imp_el = s_el * imp_el

    # mean-field plane unloading of the plane-row friction cap (2D analog;
    # in 3D most of the lift-off emerges from the real 6-DOF solve, so the
    # fitted gain stays small)
    grip_ratio = jnp.sum(imp_mag) / (dt * m * SIM.gravity)
    plane_fric_scale = 1.0 / (1.0 + calib.unload * grip_ratio)

    # unconstrained update
    ctrl_c = jnp.clip(
        ctrl, jnp.array([0.0, -g.ctrl_clamped]), jnp.array([g.ctrl_clamped, 0.0])
    )
    f_fing = g.kp * (ctrl_c - state.q) - g.joint_damping * state.qd
    vel = state.vel + dt * jnp.array([0.0, 0.0, -SIM.gravity]) \
        + jnp.sum(imp_el, axis=(0, 1)) * inv_m
    om = state.om + inv_i @ jnp.sum(
        jnp.cross(jnp.broadcast_to(r, imp_el.shape), imp_el), axis=(0, 1)
    )
    qd = state.qd + dt * f_fing * inv_fm - jnp.stack(
        [jnp.sum(imp_el[0, :, 1]), jnp.sum(imp_el[1, :, 1])]
    ) * inv_fm

    lam_n = jnp.zeros_like(depth)
    lam_t = jnp.zeros(depth.shape + (3,), jnp.float32)

    def solve(carry, _):
        vel, om, qd, lam_n, lam_t = carry
        vp = vel + jnp.cross(om, r)
        vf = jnp.stack(
            [
                qd[0] * jnp.array([0.0, 1.0, 0.0]),
                qd[1] * jnp.array([0.0, 1.0, 0.0]),
                jnp.zeros(3),
            ]
        )
        vrel = vp[None] - vf[:, None, :]
        vn = jnp.sum(vrel * n, axis=-1)
        d_lam = w_c * m_eff_n * (target_n - vn)
        new_n = jnp.maximum(lam_n + d_lam, 0.0)
        d_n = new_n - lam_n

        # friction: tangential component, vector cone clamp; effective mass
        # approximated by the normal-direction m_eff (standard PGS shortcut).
        # Caps include the elastic wedge load, crack capture on finger rows,
        # and the unload scale on the plane row.
        vt = vrel - vn[..., None] * n
        d_lam_t = -w_c[..., None] * m_eff_n[..., None] * vt
        cand = lam_t + d_lam_t
        mu_row = jnp.stack(
            [calib.mu_finger, calib.mu_finger,
             calib.mu_plane * plane_fric_scale]
        )[:, None]
        cap = mu_row * (new_n + imp_mag) \
            + calib.rough * el_row * m_eff_n * jnp.minimum(depth_el, ROUGH_SAT)
        nrm = jnp.sqrt(jnp.sum(cand * cand, -1) + 1e-20)
        cand = cand * jnp.minimum(1.0, cap / nrm)[..., None]
        d_t = cand - lam_t

        imp = d_n[..., None] * n + d_t                       # (3, P, 3)
        vel = vel + jnp.sum(imp, axis=(0, 1)) * inv_m
        om = om + inv_i @ jnp.sum(
            jnp.cross(jnp.broadcast_to(r, imp.shape), imp), axis=(0, 1)
        )
        qd = qd - jnp.stack(
            [jnp.sum(imp[0, :, 1]), jnp.sum(imp[1, :, 1])]
        ) * inv_fm
        return (vel, om, qd, new_n, cand), None

    (vel, om, qd, lam_n, lam_t), _ = jax.lax.scan(
        solve, (vel, om, qd, lam_n, lam_t), None, length=solver_iters
    )

    new = State3D(
        pos=state.pos + dt * vel,
        quat=quat_integrate(state.quat, om, dt),
        vel=vel,
        om=om,
        q=state.q + dt * qd,
        qd=qd,
    )
    if regrasp is not None:
        zero2 = jnp.zeros(2, jnp.float32)
        zero3 = jnp.zeros(3, jnp.float32)
        new = new.replace(
            q=jnp.where(regrasp, zero2, new.q),
            qd=jnp.where(regrasp, zero2, new.qd),
            vel=jnp.where(regrasp, zero3, new.vel),
            om=jnp.where(regrasp, zero3, new.om),
        )
    return new


# Round 5: 6 -> 1 full-solve iterations, recalibrated held-out at the
# shipped kernel config (FITTED_3D_NEWTON note above) — 2.11x kernel
# rollouts/s at full-suite corr 0.697 / val 0.768 vs 0.705 / 0.659 (the
# engine path mirrors the kernel so both see the SAME fitted dynamics;
# the no-finger-contact plane subproblem keeps its 3 iterations in both).
NEWTON_ITERS3 = 1
_LS_ALPHAS3 = (1.0, 0.5)


def step_newton3(
    scene: Scene3D,
    state: State3D,
    ctrl: jnp.ndarray,
    dt: float = SIM.dt,
    regrasp: jnp.ndarray | None = None,
    calib: Calib | None = None,
    return_diag: bool = False,
) -> State3D:
    """Coupled semi-smooth Newton step on the 8-DOF system u = (v, omega, qd).

    3D counterpart of ``engine2d.step_newton`` — MuJoCo's convex
    soft-constraint energy minimized exactly (8x8 PD solves + line search)
    instead of the mass-split Jacobi approximation: normals as one-sided
    quadratics with compliance r_i = c_r * A_ii, friction as vector Huber
    potentials in the contact tangent plane (cone caps lagged one iteration),
    plane-row caps scaled by the mean-field unload gain. No explicit elastic
    term, no global energy clamp."""
    if calib is None:
        calib = default_calib3()
    g = GRIPPER_3D
    m, fm = scene.mass, scene.finger_mass
    inv_m, inv_fm = 1.0 / m, 1.0 / fm
    rot = quat_to_mat(state.quat)
    inv_i = rot @ scene.inv_inertia @ rot.T
    i_w = rot @ scene.inertia @ rot.T

    r = (scene.points - scene.com) @ rot.T                   # (P, 3)
    pw = state.pos + r
    x, y, z = pw[:, 0], pw[:, 1], pw[:, 2]
    in_dom = (
        (x >= g.ctrl_x_min) & (x <= g.ctrl_x_max)
        & (z >= g.ctrl_z_min) & (z <= g.ctrl_z_max)
    )
    xc = jnp.clip(x, g.ctrl_x_min, g.ctrl_x_max)
    zc = jnp.clip(z, g.ctrl_z_min, g.ctrl_z_max)
    hl = _bilerp(scene.hgrid[0], xc, zc)
    hr = _bilerp(scene.hgrid[1], xc, zc)
    f_l, sx_l, sz_l = hl[:, 0], hl[:, 1], hl[:, 2]
    f_r, sx_r, sz_r = hr[:, 0], hr[:, 1], hr[:, 2]
    surf_l = -g.jaw_offset + state.q[0] + f_l + g.width
    surf_r = g.jaw_offset + state.q[1] + f_r
    inv_nl = jax.lax.rsqrt(1.0 + sx_l**2 + sz_l**2)
    inv_nr = jax.lax.rsqrt(1.0 + sx_r**2 + sz_r**2)
    n_l = jnp.stack([-sx_l, jnp.ones_like(sx_l), -sz_l], -1) * inv_nl[:, None]
    n_r = jnp.stack([sx_r, -jnp.ones_like(sx_r), sz_r], -1) * inv_nr[:, None]
    depth_l = (surf_l - y) * inv_nl
    depth_r = (y - surf_r) * inv_nr
    act_l = ((depth_l > 0.0) & in_dom).astype(jnp.float32)
    act_r = ((depth_r > 0.0) & in_dom).astype(jnp.float32)
    depth_p = SIM.plane_z - z
    act_p = (depth_p > 0.0).astype(jnp.float32)

    depth = jnp.stack([depth_l, depth_r, depth_p])           # (3, P)
    n = jnp.stack(
        [n_l, n_r, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), n_l.shape)]
    )
    act = jnp.stack([act_l, act_r, act_p])

    # velocity map G: u (8,) -> vrel (3,) per row x point
    P = r.shape[0]
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (3, P, 3, 3))
    rx, ry, rz = r[:, 0], r[:, 1], r[:, 2]
    zz = jnp.zeros_like(rx)
    nskew = jnp.stack([
        jnp.stack([zz, rz, -ry], -1),
        jnp.stack([-rz, zz, rx], -1),
        jnp.stack([ry, -rx, zz], -1),
    ], -2)                                                    # (P, 3, 3) = -skew(r)
    nskew = jnp.broadcast_to(nskew, (3, P, 3, 3))
    e_y = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    fing = jnp.stack([
        jnp.stack([-e_y, jnp.zeros(3)], -1),                  # row 0: qd_l
        jnp.stack([jnp.zeros(3), -e_y], -1),                  # row 1: qd_r
        jnp.zeros((3, 2)),                                    # plane row
    ])                                                        # (3, 3, 2)
    fing = jnp.broadcast_to(fing[:, None], (3, P, 3, 2))
    G = jnp.concatenate([eye3, nskew, fing], axis=-1)         # (3, P, 3, 8)
    Jn = jnp.einsum("cpi,cpik->cpk", n, G, precision="highest")

    rxn = jnp.cross(jnp.broadcast_to(r, n.shape), n)
    ang = jnp.einsum("cpi,ij,cpj->cp", rxn, inv_i, rxn, precision="highest")
    fing_inv = jnp.stack(
        [n_l[:, 1] ** 2 * inv_fm[0], n_r[:, 1] ** 2 * inv_fm[1],
         jnp.zeros_like(depth_p)]
    )
    a_nn = inv_m + ang + fing_inv
    w_n = act / (calib.c_r * a_nn)
    # finger-row enforcement multiplicity (probe; 1.0 = exact no-op):
    # a MuJoCo condim-4 pyramidal contact is 4 edge rows in parallel
    el_w = jnp.array([1.0, 1.0, 0.0])[:, None]
    w_n = w_n * (1.0 + (calib.w_fmult - 1.0) * el_w)

    # ---- corner-support plane contact (round 4; docs/PARITY.md r4) ----
    # blend the plane row's per-point weight toward the footprint
    # hull-corner set (scene.bottom_w), total active stiffness preserved:
    # MuJoCo supports the object on 3-4 hull corners, the engine on a
    # 60+-point patch whose tilt brace pins the snap's pivot-lift.
    # calib.plane_corner = 0.0 is an exact no-op.
    act_p_row = act[2]
    cw = scene.bottom_w * act_p_row
    corner_full = cw * (jnp.sum(act_p_row)
                        / jnp.maximum(jnp.sum(cw), 1e-6))
    pc = calib.plane_corner
    plane_scale = (1.0 - pc) + pc * corner_full
    w_n = w_n * jnp.stack([jnp.ones_like(plane_scale),
                           jnp.ones_like(plane_scale), plane_scale])

    # ---- clamp-regime coupled bracing (round 4; docs/PARITY.md r3b) ----
    # MuJoCo's clamp press moves ~2.6x more momentum per step than the
    # free-body diagonal admittance a_nn admits: its coupled solve develops
    # jaw-row force against the PLANE-BRACED effective mass — the object is
    # pinned by the plane patch, so a jaw push works against the pivot
    # inertia, not the free body. Model it exactly: for finger rows closing
    # faster than V_REST_THRESH (genuine impacts, not feed-rate presses),
    # amplify the enforcement weight by the braced admittance ratio
    # a_nn / a_b, where a_b_i = Jn_i (M + Jp^T Wp Jp)^-1 Jn_i^T is the
    # diagonal of the Delassus Schur complement over the active plane block
    # (normal rows + tangential stick rows at production weights).
    # calib.clamp_k = 0.0 is an exact no-op.
    u0 = jnp.concatenate([state.vel, state.om, state.qd])
    vn0 = jnp.einsum("cpk,k->cp", Jn, u0, precision="highest")
    wp_b = w_n[2] * act[2]                                   # (P,)
    Gp = G[2]                                                # (P, 3, 8)
    Jp_rows = jnp.stack([Gp[:, 2, :], Gp[:, 0, :], Gp[:, 1, :]])  # n,t1,t2
    wp_rows = jnp.broadcast_to(wp_b, (3, wp_b.shape[0]))
    Mb = jnp.zeros((8, 8), jnp.float32)
    Mb = Mb.at[:3, :3].set(m * jnp.eye(3))
    Mb = Mb.at[3:6, 3:6].set(i_w)
    Mb = Mb.at[6:, 6:].set(jnp.diag(fm))
    Mb = Mb + jnp.einsum("rp,rpk,rpl->kl", wp_rows, Jp_rows, Jp_rows,
                         precision="highest")
    Jf = Jn[:2].reshape(-1, 8)                               # (2P, 8)
    X = jnp.linalg.solve(Mb, Jf.T)                           # (8, 2P)
    a_b = jnp.maximum(jnp.sum(Jf * X.T, -1), 1e-9).reshape(2, -1)
    exc_f = jnp.maximum(-vn0[:2] - V_REST_THRESH, 0.0)
    g_f = exc_f / (V_REST_THRESH + exc_f)                    # (2,P) in [0,1)
    boost = (1.0 + calib.clamp_k * g_f * (a_nn[:2] / a_b - 1.0)) \
        * (1.0 + g_f * (calib.clamp_w - 1.0))
    w_n = w_n * jnp.concatenate([boost, jnp.ones_like(w_n[2:])])

    w_t = w_n                                                 # PGS shortcut

    k_c = jnp.stack([calib.k_contact, calib.k_contact,
                     jnp.float32(K_PLANE3)])[:, None]
    b_c = jnp.stack([calib.b_contact, calib.b_contact,
                     jnp.float32(B_PLANE3)])[:, None]
    d_imp = IMPEDANCE
    target = (1.0 - d_imp * b_c * dt) * vn0 + d_imp * dt * k_c * depth
    # finger-row restitution: MuJoCo's final clamp snap is ballistic (pinch
    # kick -> free spin -> far-corner recruitment, docs/PARITY.md r3); an
    # outgoing-velocity bonus proportional to the EXCESS closing speed
    # reproduces the kick. The threshold sits above the actuator feed speed
    # (~0.032 m/s) so ordinary squeeze presses — which close at feed rate
    # every step — stay inert; only genuine impacts (corner slams at
    # omega x r) exceed it.
    el_row_ = jnp.array([1.0, 1.0, 0.0])[:, None]
    target = target + calib.restitution * el_row_ * jnp.maximum(
        -vn0 - V_REST_THRESH, 0.0)
    # ram-contact inelastic absorption — probed and REJECTED (suite flat,
    # scripts/probe_snap_3d.py --gate R; docs/PARITY.md round 3b): finger
    # contacts closing faster than V_REST_THRESH blend their velocity
    # target toward 0 (rigid inelastic limit, never restitutive). The
    # momentum transfer stays m_eff-limited, which is exactly what the
    # measurement shows the engine lacks vs MuJoCo's coupled-cone solve.
    # ram = 0 is an exact no-op.
    exc = jnp.maximum(-vn0 - V_REST_THRESH, 0.0)
    w_ram = calib.ram * el_row_ * exc / (V_REST_THRESH + exc)
    target = (1.0 - w_ram) * target
    # clamp-press target override (round 4; docs/PARITY.md r3b): the
    # measured MuJoCo clamp snap is a critically-damped SUSTAINED press —
    # closing velocity decays 0.8x/step over ~8 steps at 6-8.5 N (solref
    # (0.02, 1): b_mj = 2/0.02, k_mj = 1/0.02^2) — while the engine's
    # fitted b_contact = 798 gives d*b*dt = 1.44 > 1, a restitutive spike
    # that pops the object off the press in one step and triggers the
    # plane-friction momentum wipe. During fast-closing finger impacts,
    # blend the velocity target toward the TRUE solref decay; paired with
    # the clamp_w/clamp_k weight boost this is the velocity-level coupled
    # press. clamp_press = 0 is an exact no-op.
    b_mj, k_mj = 100.0, 2500.0
    tgt_mj = (1.0 - d_imp * b_mj * dt) * vn0 + d_imp * dt * k_mj * depth
    g_cp = calib.clamp_press * el_row_ * (exc / (V_REST_THRESH + exc))
    target = (1.0 - g_cp) * target + g_cp * tgt_mj

    el_row = jnp.array([1.0, 1.0, 0.0])[:, None]
    depth_el = el_row * act * jnp.clip(depth, 0.0, DEPTH_EL_CAP)
    m_eff = 1.0 / a_nn
    # depth-proportional crack-capture capacity (see engine2d.step_newton)
    cap_rough = calib.rough * m_eff * depth_el

    # ballistic-snap friction gates — probed and REJECTED (suite sweeps in
    # scripts/probe_snap_3d.py; docs/PARITY.md round 3b). All are exact
    # no-ops at their Calib defaults: om_release (body-spin mu release),
    # v_gate (closing-speed mu gate), lam_sat (pressure-saturating cap,
    # applied in forces()).
    om_sp = jnp.sqrt(jnp.sum(state.om * state.om) + 1e-12)
    rel_b = calib.mu_ballistic + (1.0 - calib.mu_ballistic) / (
        1.0 + (om_sp * calib.om_release) ** 2)
    gate_c = (calib.v_gate > 0.0) & ((-vn0 - calib.v_gate) > 0.0)
    rel_c = jnp.where(gate_c, calib.mu_ballistic, 1.0)
    fric_scale = el_row * (rel_b * rel_c) + (1.0 - el_row)       # (3, P)

    ctrl_c = jnp.clip(
        ctrl, jnp.array([0.0, -g.ctrl_clamped]), jnp.array([g.ctrl_clamped, 0.0])
    )
    f_fing = g.kp * (ctrl_c - state.q) - g.joint_damping * state.qd
    u_unc = u0 + dt * jnp.concatenate([
        jnp.array([0.0, 0.0, -SIM.gravity]), jnp.zeros(3), f_fing * inv_fm,
    ])

    hm = jnp.zeros((8, 8), jnp.float32)
    hm = hm.at[:3, :3].set(m * jnp.eye(3))
    hm = hm.at[3:6, 3:6].set(i_w)
    hm = hm.at[6:, 6:].set(jnp.diag(fm))
    mg_dt = jnp.maximum(m * SIM.gravity * dt, 1e-9)

    def forces(u):
        vrel = jnp.einsum("cpik,k->cpi", G, u, precision="highest")
        vn = jnp.sum(vrel * n, -1)
        vt = vrel - vn[..., None] * n
        res = jnp.maximum(target - vn, 0.0)
        lam_n = w_n * res
        grip = jnp.sum(el_row * lam_n) / mg_dt
        scale_p = 1.0 / (1.0 + calib.unload * grip)
        mu_row = jnp.stack([calib.mu_finger, calib.mu_finger,
                            calib.mu_plane * scale_p])[:, None]
        lam_c = jnp.where(
            calib.lam_sat > 0.0,
            calib.lam_sat * jnp.tanh(lam_n / jnp.maximum(calib.lam_sat, 1e-9)),
            lam_n)
        lam_fric = el_row * lam_c + (1.0 - el_row) * lam_n
        cap_t = (mu_row * lam_fric + cap_rough) * fric_scale
        vt_norm = jnp.sqrt(jnp.sum(vt * vt, -1) + 1e-16)
        fac = jnp.minimum(w_t, cap_t / vt_norm)
        return vrel, vn, vt, res, lam_n, cap_t, vt_norm, fac

    def energy(u, cap_t):
        vrel = jnp.einsum("cpik,k->cpi", G, u, precision="highest")
        vn = jnp.sum(vrel * n, -1)
        vt = vrel - vn[..., None] * n
        res = jnp.maximum(target - vn, 0.0)
        e_n = 0.5 * w_n * res * res
        vt_norm = jnp.sqrt(jnp.sum(vt * vt, -1) + 1e-16)
        q_br = 0.5 * w_t * vt_norm**2
        lin = cap_t * vt_norm - 0.5 * cap_t**2 / jnp.maximum(w_t, 1e-12)
        e_t = jnp.where(w_t * vt_norm <= cap_t, q_br, lin)
        du = u - u_unc
        e_u = 0.5 * du @ (hm @ du)
        return e_u + jnp.sum(e_n) + jnp.sum(e_t)

    def newton_iter(u, _):
        vrel, vn, vt, res, lam_n, cap_t, vt_norm, fac = forces(u)
        f_t = fac[..., None] * vt
        grad = hm @ (u - u_unc)
        grad = grad - jnp.einsum("cp,cpk->k", lam_n, Jn, precision="highest")
        grad = grad + jnp.einsum("cpi,cpik->k", f_t, G, precision="highest")
        on_n = w_n * (res > 0.0)
        H = hm + jnp.einsum("cp,cpk,cpl->kl", on_n, Jn, Jn,
                            precision="highest")
        H = H + jnp.einsum("cp,cpik,cpil->kl", fac, G, G,
                           precision="highest")
        H = H - jnp.einsum("cp,cpk,cpl->kl", fac, Jn, Jn,
                           precision="highest")
        delta = jnp.linalg.solve(H, -grad)
        cands = jnp.stack([u + a * delta for a in _LS_ALPHAS3] + [u])
        evals = jax.vmap(lambda uu: energy(uu, cap_t))(cands)
        return cands[jnp.argmin(evals)], None

    # no-finger-contact fast phase: with no finger contacts the full
    # iteration reduces to exactly the plane-row subproblem, so 3 iterations
    # suffice during the drop/travel phase (~80% of a squeeze). NOTE: this
    # engine gates per pose; the Pallas kernel gates per 128-lane block (one
    # contacting lane runs the full solve for the whole block) — converged
    # results agree, only the cost saving is block-granular there.
    any_f = jnp.sum(act[:2]) > 0.0
    nit = jnp.where(any_f, NEWTON_ITERS3, 3)

    def body(u, i):
        u2, _ = newton_iter(u, None)
        return jnp.where(i < nit, u2, u), None

    # scan length covers BOTH regimes: full solves run NEWTON_ITERS3
    # iterations, the no-finger-contact plane subproblem always gets 3
    # (matching the kernel's fixed range(3) cheap path)
    u, _ = jax.lax.scan(body, u_unc, jnp.arange(max(NEWTON_ITERS3, 3)))
    vel, om, qd = u[:3], u[3:6], u[6:]

    if return_diag:
        # reconstruct converged contact impulses for offline diagnostics
        # (scripts/diag_snap3d.py): per-row normal/friction torque about z
        vrel, vn, vt, res, lam_n, cap_t, vt_norm, fac = forces(u)
        # Stationarity: hm(u - u_unc) = Jn^T lam_n - G^T (fac * vt), so the
        # friction impulse ON THE OBJECT is -fac*vt (it opposes slip).
        f_t = -fac[..., None] * vt                      # (3, P, 3) impulse
        tq_n = jnp.einsum("cp,cpi->ci", lam_n, rxn)     # torque-impulse (3,3)
        rxf = jnp.cross(jnp.broadcast_to(r, f_t.shape), f_t)
        tq_t = jnp.sum(rxf, axis=1)                     # (3, 3)
        diag = {
            "lam_n": jnp.sum(lam_n, axis=1),            # per-row normal imp.
            "fric": jnp.sum(fac * vt_norm, axis=1),     # per-row |friction|
            "nact": jnp.sum(act, axis=1),               # active points/row
            "tqz_n": tq_n[:, 2],                        # z torque: normals
            "tqz_t": tq_t[:, 2],                        # z torque: friction
            "depth_max": jnp.max(depth * act, axis=1),
            # per-point dumps for contact-level comparison vs mj_contactForce
            "lam_pt": lam_n,                            # (3, P)
            "n_pt": n,                                  # (3, P, 3)
            "pw": pw,                                   # (P, 3)
            # solver internals (row x point): admittance, weight, targets
            "a_nn": a_nn,
            "target": target,
            "vn0": vn0,
            "vn1": vn,                                  # achieved at u+
        }
    else:
        diag = None

    new = State3D(
        pos=state.pos + dt * vel,
        quat=quat_integrate(state.quat, om, dt),
        vel=vel,
        om=om,
        q=state.q + dt * qd,
        qd=qd,
    )
    if regrasp is not None:
        zero2 = jnp.zeros(2, jnp.float32)
        zero3 = jnp.zeros(3, jnp.float32)
        new = new.replace(
            q=jnp.where(regrasp, zero2, new.q),
            qd=jnp.where(regrasp, zero2, new.qd),
            vel=jnp.where(regrasp, zero3, new.vel),
            om=jnp.where(regrasp, zero3, new.om),
        )
    return (new, diag) if return_diag else new


def step_newton3_pyramid(
    scene: Scene3D,
    state: State3D,
    ctrl: jnp.ndarray,
    dt: float = SIM.dt,
    regrasp: jnp.ndarray | None = None,
    calib: Calib | None = None,
) -> State3D:
    """Pyramidal-cone finger contacts — the STRUCTURAL snap candidate.

    The round-3b contact-level measurement (docs/PARITY.md) showed the
    clamp-snap stall is a force-amplification deficit: MuJoCo's condim-4
    PYRAMIDAL contact is 4+ one-sided edge rows in parallel, coupling the
    normal and tangential responses, where ``step_newton3`` has one normal
    row + a decoupled Huber friction potential. This solver replaces each
    finger contact with the 4 pyramid edge rows

        e_i = (n + mu s_i) / sqrt(1 + mu^2),  s_i in {+t1, -t1, +t2, -t2}

    each a one-sided quadratic with its OWN edge-projected admittance and
    the shared penetration target — MuJoCo's actual pyramidal efc layout.
    Friction emerges from the edge geometry (|f_t| <= mu f_n by
    construction, sticking contacts are stiff in ALL directions); the
    ``rough`` crack term is inert here. Plane contact keeps the
    ``step_newton3`` model (normal one-sided row + Huber tangent + unload).
    Selected via SOLVER3 = "pyramid" (trace-time). Geometry preamble is
    deliberately duplicated from step_newton3 (probe isolation).
    """
    if calib is None:
        calib = default_calib3()
    g = GRIPPER_3D
    m, fm = scene.mass, scene.finger_mass
    inv_m, inv_fm = 1.0 / m, 1.0 / fm
    rot = quat_to_mat(state.quat)
    inv_i = rot @ scene.inv_inertia @ rot.T
    i_w = rot @ scene.inertia @ rot.T

    r = (scene.points - scene.com) @ rot.T                   # (P, 3)
    pw = state.pos + r
    x, y, z = pw[:, 0], pw[:, 1], pw[:, 2]
    in_dom = (
        (x >= g.ctrl_x_min) & (x <= g.ctrl_x_max)
        & (z >= g.ctrl_z_min) & (z <= g.ctrl_z_max)
    )
    xc = jnp.clip(x, g.ctrl_x_min, g.ctrl_x_max)
    zc = jnp.clip(z, g.ctrl_z_min, g.ctrl_z_max)
    hl = _bilerp(scene.hgrid[0], xc, zc)
    hr = _bilerp(scene.hgrid[1], xc, zc)
    f_l, sx_l, sz_l = hl[:, 0], hl[:, 1], hl[:, 2]
    f_r, sx_r, sz_r = hr[:, 0], hr[:, 1], hr[:, 2]
    surf_l = -g.jaw_offset + state.q[0] + f_l + g.width
    surf_r = g.jaw_offset + state.q[1] + f_r
    inv_nl = jax.lax.rsqrt(1.0 + sx_l**2 + sz_l**2)
    inv_nr = jax.lax.rsqrt(1.0 + sx_r**2 + sz_r**2)
    n_l = jnp.stack([-sx_l, jnp.ones_like(sx_l), -sz_l], -1) * inv_nl[:, None]
    n_r = jnp.stack([sx_r, -jnp.ones_like(sx_r), sz_r], -1) * inv_nr[:, None]
    depth_l = (surf_l - y) * inv_nl
    depth_r = (y - surf_r) * inv_nr
    act_l = ((depth_l > 0.0) & in_dom).astype(jnp.float32)
    act_r = ((depth_r > 0.0) & in_dom).astype(jnp.float32)
    depth_p = SIM.plane_z - z
    act_p = (depth_p > 0.0).astype(jnp.float32)

    P = r.shape[0]
    rx, ry, rz = r[:, 0], r[:, 1], r[:, 2]
    zz = jnp.zeros_like(rx)
    nskew2 = jnp.stack([
        jnp.stack([zz, rz, -ry], -1),
        jnp.stack([-rz, zz, rx], -1),
        jnp.stack([ry, -rx, zz], -1),
    ], -2)                                                    # (P, 3, 3)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (P, 3, 3))
    e_y = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    # per-jaw G maps u (8,) -> point velocity relative to that jaw (P, 3, 8)
    fing_l = jnp.broadcast_to(
        jnp.stack([-e_y, jnp.zeros(3)], -1), (P, 3, 2))
    fing_r = jnp.broadcast_to(
        jnp.stack([jnp.zeros(3), -e_y], -1), (P, 3, 2))
    G_l = jnp.concatenate([eye3, nskew2, fing_l], axis=-1)    # (P, 3, 8)
    G_r = jnp.concatenate([eye3, nskew2, fing_r], axis=-1)
    G_p = jnp.concatenate([eye3, nskew2, jnp.zeros((P, 3, 2))], axis=-1)
    G_f = jnp.stack([G_l, G_r])                               # (2, P, 3, 8)

    # pyramid edge directions per finger contact
    n_f = jnp.stack([n_l, n_r])                               # (2, P, 3)
    act_f = jnp.stack([act_l, act_r])
    depth_f = jnp.stack([depth_l, depth_r])
    xhat = jnp.array([1.0, 0.0, 0.0], jnp.float32)
    t1 = jnp.cross(n_f, jnp.broadcast_to(xhat, n_f.shape))
    t1 = t1 * jax.lax.rsqrt(jnp.sum(t1 * t1, -1, keepdims=True) + 1e-12)
    t2 = jnp.cross(n_f, t1)
    mu = calib.mu_finger
    c_e = jax.lax.rsqrt(1.0 + mu * mu)
    sdir = jnp.stack([t1, -t1, t2, -t2], axis=2)              # (2, P, 4, 3)
    e_dir = (n_f[:, :, None, :] + mu * sdir) * c_e            # (2, P, 4, 3)
    J_e = jnp.einsum("cpei,cpik->cpek", e_dir, G_f,
                     precision="highest")                     # (2, P, 4, 8)
    rxe = jnp.cross(jnp.broadcast_to(r[None, :, None, :], e_dir.shape),
                    e_dir)
    ang_e = jnp.einsum("cpei,ij,cpej->cpe", rxe, inv_i, rxe,
                       precision="highest")
    fing_e = e_dir[..., 1] ** 2 * inv_fm[:, None, None]
    a_e = inv_m + ang_e + fing_e                              # (2, P, 4)
    w_e = act_f[:, :, None] / (calib.c_r * a_e)

    u0 = jnp.concatenate([state.vel, state.om, state.qd])
    d_imp = IMPEDANCE
    ve0 = jnp.einsum("cpek,k->cpe", J_e, u0, precision="highest")
    tgt_e = (1.0 - d_imp * calib.b_contact * dt) * ve0 \
        + d_imp * dt * calib.k_contact * depth_f[:, :, None]

    # plane row: step_newton3's model (one-sided normal + Huber tangent)
    n_p = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    Jn_p = G_p[:, 2, :]                                       # (P, 8)
    rxn_p = jnp.cross(r, jnp.broadcast_to(n_p, r.shape))
    ang_p = jnp.einsum("pi,ij,pj->p", rxn_p, inv_i, rxn_p,
                       precision="highest")
    a_p = inv_m + ang_p
    w_p = act_p / (calib.c_r * a_p)
    vn0_p = Jn_p @ u0
    tgt_p = (1.0 - d_imp * B_PLANE3 * dt) * vn0_p \
        + d_imp * dt * K_PLANE3 * depth_p

    ctrl_c = jnp.clip(
        ctrl, jnp.array([0.0, -g.ctrl_clamped]), jnp.array([g.ctrl_clamped, 0.0])
    )
    f_fing = g.kp * (ctrl_c - state.q) - g.joint_damping * state.qd
    u_unc = u0 + dt * jnp.concatenate([
        jnp.array([0.0, 0.0, -SIM.gravity]), jnp.zeros(3), f_fing * inv_fm,
    ])

    hm = jnp.zeros((8, 8), jnp.float32)
    hm = hm.at[:3, :3].set(m * jnp.eye(3))
    hm = hm.at[3:6, 3:6].set(i_w)
    hm = hm.at[6:, 6:].set(jnp.diag(fm))
    mg_dt = jnp.maximum(m * SIM.gravity * dt, 1e-9)

    def forces(u):
        ve = jnp.einsum("cpek,k->cpe", J_e, u, precision="highest")
        res_e = jnp.maximum(tgt_e - ve, 0.0)
        lam_e = w_e * res_e
        vrel_p = jnp.einsum("pik,k->pi", G_p, u, precision="highest")
        vn_p = vrel_p[:, 2]
        vt_p = vrel_p.at[:, 2].set(0.0)
        res_p = jnp.maximum(tgt_p - vn_p, 0.0)
        lam_p = w_p * res_p
        grip = jnp.sum(lam_e) * c_e / mg_dt
        scale_p = 1.0 / (1.0 + calib.unload * grip)
        cap_p = calib.mu_plane * scale_p * lam_p
        vt_norm = jnp.sqrt(jnp.sum(vt_p * vt_p, -1) + 1e-16)
        fac_p = jnp.minimum(w_p, cap_p / vt_norm)
        return res_e, lam_e, res_p, lam_p, cap_p, vt_p, vt_norm, fac_p

    def energy(u, cap_p):
        ve = jnp.einsum("cpek,k->cpe", J_e, u, precision="highest")
        res_e = jnp.maximum(tgt_e - ve, 0.0)
        vrel_p = jnp.einsum("pik,k->pi", G_p, u, precision="highest")
        vn_p = vrel_p[:, 2]
        vt_p = vrel_p.at[:, 2].set(0.0)
        res_p = jnp.maximum(tgt_p - vn_p, 0.0)
        vt_norm = jnp.sqrt(jnp.sum(vt_p * vt_p, -1) + 1e-16)
        q_br = 0.5 * w_p * vt_norm**2
        lin = cap_p * vt_norm - 0.5 * cap_p**2 / jnp.maximum(w_p, 1e-12)
        e_t = jnp.where(w_p * vt_norm <= cap_p, q_br, lin)
        du = u - u_unc
        return (0.5 * du @ (hm @ du) + 0.5 * jnp.sum(w_e * res_e * res_e)
                + 0.5 * jnp.sum(w_p * res_p * res_p) + jnp.sum(e_t))

    def newton_iter(u, _):
        res_e, lam_e, res_p, lam_p, cap_p, vt_p, vt_norm, fac_p = forces(u)
        grad = hm @ (u - u_unc)
        grad = grad - jnp.einsum("cpe,cpek->k", lam_e, J_e,
                                 precision="highest")
        grad = grad - lam_p @ Jn_p
        grad = grad + jnp.einsum("pi,pik->k", fac_p[:, None] * vt_p, G_p,
                                 precision="highest")
        on_e = w_e * (res_e > 0.0)
        H = hm + jnp.einsum("cpe,cpek,cpel->kl", on_e, J_e, J_e,
                            precision="highest")
        on_p = w_p * (res_p > 0.0)
        H = H + jnp.einsum("p,pk,pl->kl", on_p, Jn_p, Jn_p,
                           precision="highest")
        H = H + jnp.einsum("p,pik,pil->kl", fac_p, G_p, G_p,
                           precision="highest")
        H = H - jnp.einsum("p,pk,pl->kl", fac_p, Jn_p, Jn_p,
                           precision="highest")
        delta = jnp.linalg.solve(H, -grad)
        cands = jnp.stack([u + a * delta for a in _LS_ALPHAS3] + [u])
        evals = jax.vmap(lambda uu: energy(uu, cap_p))(cands)
        return cands[jnp.argmin(evals)], None

    any_f = jnp.sum(act_f) > 0.0
    nit = jnp.where(any_f, NEWTON_ITERS3, 3)

    def body(u, i):
        u2, _ = newton_iter(u, None)
        return jnp.where(i < nit, u2, u), None

    u, _ = jax.lax.scan(body, u_unc, jnp.arange(max(NEWTON_ITERS3, 3)))
    vel, om, qd = u[:3], u[3:6], u[6:]

    new = State3D(
        pos=state.pos + dt * vel,
        quat=quat_integrate(state.quat, om, dt),
        vel=vel,
        om=om,
        q=state.q + dt * qd,
        qd=qd,
    )
    if regrasp is not None:
        zero2 = jnp.zeros(2, jnp.float32)
        zero3 = jnp.zeros(3, jnp.float32)
        new = new.replace(
            q=jnp.where(regrasp, zero2, new.q),
            qd=jnp.where(regrasp, zero2, new.qd),
            vel=jnp.where(regrasp, zero3, new.vel),
            om=jnp.where(regrasp, zero3, new.om),
        )
    return new


def _z_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle magnitude for near-z rotations in [0, 2pi) — matches
    transforms3d quat2axangle's angle output for z-axis quats
    (sim/sim_3d.py:167)."""
    return jnp.mod(2.0 * jnp.arctan2(q[3], q[0]), 2.0 * jnp.pi)


def rollout(
    scene: Scene3D,
    pose: jnp.ndarray,
    steps: int = SIM.steps_3d,
    dt: float = SIM.dt,
    regrasp_every: int = 0,
    solver_iters: int = SOLVER_ITERS,
    calib: Calib | None = None,
):
    """Returns (delta_theta, delta_pos (2,), final_theta, valid) where valid
    is False on tip-over (quat x/y beyond the reference's 1e-2 tolerance)."""
    state0 = init_state(scene, pose)
    ctrl = jnp.array([SIM.ctrl_3d, -SIM.ctrl_3d], jnp.float32)

    def body(state, i):
        if regrasp_every:
            rg = (i % regrasp_every == 0) & (i > 0)
        else:
            rg = None
        return step(scene, state, ctrl, dt, regrasp=rg,
                    solver_iters=solver_iters, calib=calib), None

    state, _ = jax.lax.scan(body, state0, jnp.arange(steps))
    theta0 = pose[2]
    theta_f = _z_angle(state.quat)
    d_theta = theta_f - jnp.mod(theta0, 2 * jnp.pi)
    d_theta = d_theta - 2 * jnp.pi * jnp.round(d_theta / (2 * jnp.pi))
    rot = quat_to_mat(state.quat)
    origin = state.pos - rot @ scene.com
    d_pos = origin[:2] - pose[:2]
    valid = (jnp.abs(state.quat[1]) < SIM.tipover_atol) & (
        jnp.abs(state.quat[2]) < SIM.tipover_atol
    )
    return d_theta, d_pos, theta_f, valid


@functools.partial(jax.jit, static_argnames=("steps", "every", "regrasp_every"))
def rollout_trace3d(
    scene: Scene3D,
    pose: jnp.ndarray,
    steps: int = SIM.steps_3d,
    every: int = 20,
    regrasp_every: int = 0,
    calib: Calib | None = None,
):
    """Trajectory-capturing 3D rollout for visualization: per-sampled-step
    (pos (3,), quat (4,), q (2,)) concatenated to a (T, 9) array — feeds
    ``eval.viz.render_scene_3d`` / ``rollout_video_3d`` (the reference's 3D
    RGB render path, dynamics/sim_test_mj_3d.py + sim/render_mesh.py:39-65)."""
    state0 = init_state(scene, pose)
    ctrl = jnp.array([SIM.ctrl_3d, -SIM.ctrl_3d], jnp.float32)

    def body(state, i):
        if regrasp_every:
            rg = (i % regrasp_every == 0) & (i > 0)
        else:
            rg = None
        new = step(scene, state, ctrl, regrasp=rg, calib=calib)
        return new, jnp.concatenate([new.pos, new.quat, new.q])

    _, tr = jax.lax.scan(body, state0, jnp.arange(steps))
    return tr[::every]


@functools.partial(jax.jit, static_argnames=("steps", "regrasp_every", "solver_iters"))
def profile(
    scene: Scene3D,
    poses: jnp.ndarray,
    steps: int = SIM.steps_3d,
    regrasp_every: int = 0,
    solver_iters: int = SOLVER_ITERS,
    calib: Calib | None = None,
):
    return jax.vmap(
        lambda p: rollout(
            scene, p, steps=steps, regrasp_every=regrasp_every,
            solver_iters=solver_iters, calib=calib,
        )
    )(poses)


@functools.partial(jax.jit, static_argnames=("steps",))
def profile_batch(scenes: Scene3D, poses: jnp.ndarray, steps: int = SIM.steps_3d,
                  calib: Calib | None = None):
    return jax.vmap(lambda sc: profile(sc, poses, steps=steps, calib=calib))(scenes)

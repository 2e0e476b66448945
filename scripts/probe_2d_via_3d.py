"""Probe: is the planar (3-DOF) object model the 2D fidelity bottleneck?

Runs the 2D oracle-suite scenes through the FULL 6-DOF 3D Newton engine —
extruded prism objects, z-constant finger heightfields, same servo/plane —
and measures suite correlation vs the decomposition-mean target. MuJoCo's 2D
scenes are physically 3D (objects tilt, rock, and get tossed vertically at
grip onset); a planar engine cannot represent that. A large jump over the
planar engine's ~0.40 means the missing physics is the out-of-plane DOFs.

    python scripts/probe_2d_via_3d.py --cases 24
"""

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import GRIPPER_2D, OBJECT_2D, SIM
from dgdm_tpu.geom import polygon as polygon_lib
from dgdm_tpu.geom.contour import ensure_ccw
from dgdm_tpu.geom.polygon import ear_clip
from dgdm_tpu.geom.spline import cubic_basis_matrix, cubic_coef_operator
from dgdm_tpu.sim import engine3d
from dgdm_tpu.sim.types import Scene3D

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def prism_mesh(contour, height):
    """Extruded prism (verts, faces) from a CCW polygon contour."""
    poly = ensure_ccw(np.asarray(contour, np.float64))
    n = len(poly)
    verts = np.concatenate([
        np.concatenate([poly, np.zeros((n, 1))], -1),
        np.concatenate([poly, np.full((n, 1), height)], -1),
    ])
    tris = ear_clip(poly)
    faces = []
    for (a, b, c) in tris:
        faces.append([a, c, b])                  # bottom (normal -z)
        faces.append([n + a, n + b, n + c])      # top (+z)
    for i in range(n):
        j = (i + 1) % n
        faces.append([i, j, n + j])
        faces.append([i, n + j, n + i])
    return verts, np.asarray(faces, np.int32)


def scene_2d_as_3d(yl, yr, contour, num_points=384):
    """Scene3D with z-constant finger heightfields from the 2D cubic spline
    and the 2D MuJoCo-parity mass model."""
    g = GRIPPER_2D
    verts, faces = prism_mesh(contour, OBJECT_2D.height)
    from dgdm_tpu.geom import mesh3d

    # heightfield: f(x) constant along z over the finger height
    coef_op = cubic_coef_operator(g.num_ctrl, g.ctrl_x_min, g.ctrl_x_max)
    H, W = engine3d.HGRID_H, engine3d.HGRID_W
    xs = np.linspace(g.ctrl_x_min, g.ctrl_x_max, H)
    basis = cubic_basis_matrix(g.num_ctrl, g.ctrl_x_min, g.ctrl_x_max, xs)
    # derivative via finite difference of dense evaluation
    def grids(y):
        f = basis @ np.asarray(y, np.float64)
        df = np.gradient(f, xs)
        grid = np.stack([
            np.repeat(f[:, None], W, 1),
            np.repeat(df[:, None], W, 1),
            np.zeros((H, W)),
        ], -1)
        return grid

    hgrid = np.stack([grids(yl), grids(yr)])

    poly = ensure_ccw(np.asarray(contour, np.float64))
    area, com2, i0 = polygon_lib.object_mass_properties_2d(poly)
    mass = SIM.density * area * OBJECT_2D.height
    izz = SIM.density * OBJECT_2D.height * i0
    # thin-plate x/y inertia about the COM (uniform over the extrusion)
    h = OBJECT_2D.height
    # planar second moments about com (numerically from triangles)
    tris = ear_clip(poly)
    ixx_p, iyy_p = 0.0, 0.0
    for t in tris:
        p = poly[list(t)] - com2
        a2 = (p[1, 0] - p[0, 0]) * (p[2, 1] - p[0, 1]) \
            - (p[2, 0] - p[0, 0]) * (p[1, 1] - p[0, 1])
        a = 0.5 * abs(a2)
        cy2 = (np.sum(p[:, 1] ** 2) + p[0, 1] * p[1, 1]
               + p[1, 1] * p[2, 1] + p[0, 1] * p[2, 1]) / 6.0
        cx2 = (np.sum(p[:, 0] ** 2) + p[0, 0] * p[1, 0]
               + p[1, 0] * p[2, 0] + p[0, 0] * p[2, 0]) / 6.0
        ixx_p += a * cy2
        iyy_p += a * cx2
    rho_a = SIM.density * h
    ixx = rho_a * ixx_p + mass * h * h / 12.0
    iyy = rho_a * iyy_p + mass * h * h / 12.0
    inertia = np.diag([ixx, iyy, izz])
    com = np.array([com2[0], com2[1], h / 2.0])

    pts = mesh3d.sample_surface(verts, faces, num_points, seed=0)
    fmass = np.array([
        SIM.density * g.height * polygon_lib.finger_cross_section_area(
            basis @ np.asarray(y, np.float64), xs, g.width)
        for y in (yl, yr)
    ])
    f32 = lambda v: jnp.asarray(v, jnp.float32)
    return Scene3D(
        yl=f32(np.zeros((7, 3))), yr=f32(np.zeros((7, 3))),
        hgrid=f32(hgrid), points=f32(pts), com=f32(com), mass=f32(mass),
        inertia=f32(inertia), inv_inertia=f32(np.linalg.inv(inertia)),
        bottom_pts=f32(pts[:1]), bottom_w=f32(np.ones(1)),
        finger_mass=f32(fmass),
    )


def sm(x, w=5):
    k = np.ones(w) / w
    return np.convolve(np.concatenate([x[-w:], x, x[:w]]), k, "same")[w:-w]


def cls(x, th=0.03):
    return np.where(x > th, 2, np.where(x < -th, 0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=24)
    ap.add_argument("--solver", default="newton")
    ap.add_argument("--calib", default=None)
    args = ap.parse_args()
    engine3d.SOLVER3 = args.solver

    # the 3D engine reads GRIPPER_3D for jaw geometry — give it the 2D specs
    g2 = GRIPPER_2D
    engine3d.GRIPPER_3D = types.SimpleNamespace(
        ctrl_x_min=g2.ctrl_x_min, ctrl_x_max=g2.ctrl_x_max,
        ctrl_z_min=0.0, ctrl_z_max=g2.height,
        width=g2.width, jaw_offset=g2.jaw_offset,
        ctrl_clamped=g2.ctrl_clamped, kp=g2.kp,
        joint_damping=g2.joint_damping,
    )

    d = np.load(os.path.join(OUT, "oracle2d_suite.npz"))
    alt = np.load(os.path.join(OUT, "oracle2d_suite_s100.npz"))["delta_theta"]
    target = 0.5 * (d["delta_theta"] + alt)
    ths = d["thetas"]
    steps = int(d["steps"])
    poses = jnp.asarray(np.stack([0 * ths, 0 * ths, ths], -1), jnp.float32)

    calib = engine3d.default_calib3()
    if args.calib:
        with open(args.calib) as f:
            fitted = json.load(f)["fitted"]
        calib = calib.replace(**{k: jnp.float32(v) for k, v in fitted.items()})

    idx = [i for i in range(len(target)) if target[i].std() > 0.01][: args.cases]

    ctrl = jnp.array([SIM.ctrl_2d, -SIM.ctrl_2d], jnp.float32)

    @jax.jit
    def run_case(sc):
        def one(pose):
            st = engine3d.init_state(sc, pose)

            def body(s, _):
                return engine3d.step(sc, s, ctrl, calib=calib), None

            st, _ = jax.lax.scan(body, st, None, length=steps)
            th0 = pose[2]
            thf = engine3d._z_angle(st.quat)
            dth = thf - jnp.mod(th0, 2 * jnp.pi)
            dth = dth - 2 * jnp.pi * jnp.round(dth / (2 * jnp.pi))
            tilt = jnp.abs(st.quat[1]) + jnp.abs(st.quat[2])
            return dth, tilt

        return jax.vmap(one)(poses)

    cs, rs, ags, tilts = [], [], [], []
    for i in idx:
        sc = scene_2d_as_3d(d["yl"][i], d["yr"][i], d["contours"][i])
        en, tilt = run_case(sc)
        en = np.asarray(en)
        c = np.corrcoef(sm(en), sm(target[i]))[0, 1]
        cs.append(0.0 if not np.isfinite(c) else c)
        rs.append(en.std() / target[i].std())
        ags.append((cls(en) == cls(target[i])).mean())
        tilts.append(float(np.asarray(tilt).max()))
        print(f"case {i:2d}: corr {cs[-1]:+.3f} ratio {rs[-1]:.2f} "
              f"agree {ags[-1]:.2f} max_tilt {tilts[-1]:.3f}", flush=True)
    print(f"\n6-DOF engine vs mean target: corr {np.mean(cs):.3f} "
          f"ratio {np.median(rs):.3f} agree {np.mean(ags):.3f} (n={len(idx)})")


if __name__ == "__main__":
    main()

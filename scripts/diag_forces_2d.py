"""Diagnose MuJoCo 2D contact-force structure vs the engine's assumptions.

Records, per step of a squeeze rollout: total plane normal force, total
finger normal force, the vertical (z) component of finger friction, object
z-position and tilt — to quantify the "plane unloading" hypothesis from
round 1 (docs/PARITY.md): once pinched, finger friction carries part of the
object's weight, so plane friction (which resists rotation) drops.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.geom.fingers import sample_gripper_2d
from dgdm_tpu.sim.oracle import Oracle2D
from tests.util_icons import make_icon


def diag_rollout(oracle, theta0, steps=200):
    import mujoco

    m, d = oracle.model, oracle.data
    adr = oracle._obj_adr
    d.qpos[:] = oracle._reset_qpos
    d.qvel[:] = oracle._reset_qvel
    d.qfrc_applied[:] = 0.0
    d.qpos[adr: adr + 3] = [0.0, 0.0, 0.0]
    d.qpos[adr + 3: adr + 7] = [np.cos(theta0 / 2), 0, 0, np.sin(theta0 / 2)]
    mujoco.mj_forward(m, d)
    d.ctrl[0], d.ctrl[1] = 0.2, -0.2

    # geom classification: plane geom id, finger geom ids, object geom ids
    plane_gid = None
    finger_bodies = set()
    obj_body = None
    for b in range(m.nbody):
        name = m.body(b).name
        if name in ("left_jaw", "right_jaw"):
            finger_bodies.add(b)
        if name == "object":
            obj_body = b
        if name == "plane":
            plane_body = b
    rows = []
    fbuf = np.zeros(6)
    for t in range(steps):
        mujoco.mj_step(m, d)
        f_plane = 0.0
        f_fing_n = 0.0
        f_fing_z = 0.0
        f_plane_tan = 0.0
        ncon_p = 0
        ncon_f = 0
        for ci in range(d.ncon):
            con = d.contact[ci]
            b1 = m.geom_bodyid[con.geom1]
            b2 = m.geom_bodyid[con.geom2]
            mujoco.mj_contactForce(m, d, ci, fbuf)
            # fbuf is in contact frame: [normal, tan1, tan2, torsion...]
            frame = con.frame.reshape(3, 3)  # rows: normal, tan1, tan2
            f_world = frame.T @ fbuf[:3]
            pair = {b1, b2}
            if plane_body in pair and obj_body in pair:
                f_plane += fbuf[0]
                f_plane_tan += np.hypot(fbuf[1], fbuf[2])
                ncon_p += 1
            elif obj_body in pair and (pair & finger_bodies):
                f_fing_n += fbuf[0]
                f_fing_z += f_world[2]
                ncon_f += 1
        quat = d.qpos[adr + 3: adr + 7]
        tilt = np.hypot(quat[1], quat[2])
        rows.append(
            (t, f_plane, f_fing_n, f_fing_z, f_plane_tan,
             d.qpos[adr + 2], tilt, ncon_p, ncon_f)
        )
    return np.array(rows)


def main():
    contour = extract_contours(make_icon(3))
    yl, yr = sample_gripper_2d(0)
    oracle = Oracle2D(yl, yr, contour)
    mg = oracle.body_mass("object") * 9.81
    print(f"object weight m*g = {mg:.4f} N")
    for theta0 in (0.0, 1.2, 2.5):
        rows = diag_rollout(oracle, theta0)
        print(f"\n=== theta0={theta0} ===")
        print("  t  f_plane  f_fing_n  f_fing_z  f_pl_tan     z      tilt  ncp ncf")
        for t in (0, 5, 10, 20, 30, 50, 75, 100, 150, 199):
            r = rows[t]
            print(
                f"{int(r[0]):4d} {r[1]:8.4f} {r[2]:9.4f} {r[3]:9.4f} "
                f"{r[4]:8.4f} {r[5]:9.5f} {r[6]:7.4f} {int(r[7]):3d} {int(r[8]):3d}"
            )
        # summary: mean plane normal force while gripped (t>=50) vs weight
        grip = rows[50:]
        print(
            f"mean t>=50: f_plane={grip[:,1].mean():.4f} ({grip[:,1].mean()/mg*100:.0f}% of mg), "
            f"f_fing_n={grip[:,2].mean():.3f}, f_fing_z={grip[:,3].mean():.4f}, "
            f"tilt={grip[:,6].mean():.4f}"
        )


if __name__ == "__main__":
    main()

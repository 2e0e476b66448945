"""Per-step z-torque decomposition, engine (Newton) vs MuJoCo, at a snap.

For one suite case + orientation: prints, over time, the net torque about
the object COM from finger contacts and from plane contacts in BOTH sims,
plus omega_z and theta — localizing whether the snap-direction error comes
from the grip torque or the plane-friction response.

    python scripts/diag_torque_2d.py --case 18 --theta_idx auto
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.sim import engine2d
from dgdm_tpu.sim.oracle import Oracle2D

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def mj_torques(oracle, theta0, steps):
    import mujoco

    m, d, adr = oracle.model, oracle.data, oracle._obj_adr
    d.qpos[:] = oracle._reset_qpos
    d.qvel[:] = oracle._reset_qvel
    d.qfrc_applied[:] = 0.0
    d.qpos[adr: adr + 3] = [0.0, 0.0, 0.0]
    d.qpos[adr + 3: adr + 7] = [np.cos(theta0 / 2), 0, 0, np.sin(theta0 / 2)]
    mujoco.mj_forward(m, d)
    d.ctrl[0], d.ctrl[1] = 0.2, -0.2

    body_of_geom = m.geom_bodyid
    name = {b: m.body(b).name for b in range(m.nbody)}
    obj_bid = [b for b in range(m.nbody) if name[b] == "object"][0]
    obj_root = obj_bid
    fbuf = np.zeros(6)
    rows = []
    for t in range(steps):
        mujoco.mj_step(m, d)
        com = d.xipos[obj_bid]
        tq_f, tq_p, n_con = 0.0, 0.0, 0
        for ci in range(d.ncon):
            con = d.contact[ci]
            b1, b2 = body_of_geom[con.geom1], body_of_geom[con.geom2]
            names = {name[b1], name[b2]}
            if "object" not in names:
                continue
            mujoco.mj_contactForce(m, d, ci, fbuf)
            frame = con.frame.reshape(3, 3)
            f_world = frame.T @ fbuf[:3]
            # force on body2 is -f along the frame; object may be either
            sgn = 1.0 if name[b2] == "object" else -1.0
            f_obj = sgn * f_world * -1.0
            rvec = con.pos - com
            tq = rvec[0] * f_obj[1] - rvec[1] * f_obj[0]
            if "plane" in names:
                tq_p += tq
            else:
                tq_f += tq
                n_con += 1
        quat = d.qpos[adr + 3: adr + 7]
        th = 2.0 * np.arctan2(quat[3], quat[0])
        rows.append((tq_f, tq_p, d.qvel[m.joint("object_root").dofadr[0] + 5],
                     th, n_con))
        if t == 50:   # sign-convention check: plane carries the weight
            fz = 0.0
            for ci in range(d.ncon):
                con = d.contact[ci]
                b1, b2 = body_of_geom[con.geom1], body_of_geom[con.geom2]
                names = {name[b1], name[b2]}
                if "object" in names and "plane" in names:
                    mujoco.mj_contactForce(m, d, ci, fbuf)
                    f_world = con.frame.reshape(3, 3).T @ fbuf[:3]
                    sgn = 1.0 if name[b2] == "object" else -1.0
                    fz += sgn * -f_world[2]
            print(f"[check] plane->object Fz at t=50: {fz:+.3f} "
                  f"(mg = {float(m.body('object').mass[0]) * 9.81:+.3f})")
    return np.asarray(rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", type=int, default=18)
    ap.add_argument("--theta_idx", type=int, default=-1)
    ap.add_argument("--calib", default=os.path.join(OUT, "calib2d_newton.json"))
    args = ap.parse_args()
    engine2d.SOLVER = "newton"

    d = np.load(os.path.join(OUT, "oracle2d_suite.npz"))
    i = args.case
    yl, yr, contour = d["yl"][i], d["yr"][i], d["contours"][i]
    ths = d["thetas"]
    steps = int(d["steps"])
    mj_prof = d["delta_theta"][i]

    calib = engine2d.default_calib()
    with open(args.calib) as f:
        calib = calib.replace(**{k: jnp.float32(v)
                                 for k, v in json.load(f)["fitted"].items()})

    scene = engine2d.make_scene(yl, yr, contour)
    j = args.theta_idx
    if j < 0:
        poses = jnp.asarray(np.stack([0 * ths, 0 * ths, ths], -1), jnp.float32)
        en_prof = np.asarray(engine2d.profile(scene, poses, steps=steps,
                                              calib=calib)[0])
        j = int(np.argmax(np.abs(en_prof - mj_prof)))
        print(f"worst theta idx {j}: en {en_prof[j]:+.3f} mj {mj_prof[j]:+.3f}")
    th0 = float(ths[j])

    @jax.jit
    def en_trace(pose):
        st = engine2d.init_state(scene, pose)
        ctrl = jnp.array([0.2, -0.2], jnp.float32)

        def body(s, _):
            s2, diag = engine2d.step_newton(scene, s, ctrl, calib=calib,
                                            return_forces=True)
            return s2, jnp.stack([diag["torque_fing"], diag["torque_plane"],
                                  s2.om, s2.theta, diag["n_active"]])

        _, tr = jax.lax.scan(body, st, None, length=steps)
        return tr

    en = np.asarray(en_trace(jnp.asarray([0.0, 0.0, th0], jnp.float32)))
    oracle = Oracle2D(yl, yr, contour)
    mj = mj_torques(oracle, th0, steps)

    print(f"case {i} theta0={th0:.2f}")
    print(f"{'t':>4s} | {'en tq_f':>9s} {'en tq_p':>9s} {'en om':>8s} "
          f"{'en dth':>8s} {'nc':>4s} | {'mj tq_f':>9s} {'mj tq_p':>9s} "
          f"{'mj om':>8s} {'mj dth':>8s} {'nc':>4s}")
    for t in range(100, steps, 4):
        print(f"{t:4d} | {en[t,0]:+9.4f} {en[t,1]:+9.4f} {en[t,2]:+8.3f} "
              f"{np.unwrap(en[:,3])[t]-th0:+8.4f} {en[t,4]:4.0f} | "
              f"{mj[t,0]:+9.4f} {mj[t,1]:+9.4f} {mj[t,2]:+8.3f} "
              f"{np.unwrap(mj[:,3])[t]-th0:+8.4f} {mj[t,4]:4.0f}")


if __name__ == "__main__":
    main()

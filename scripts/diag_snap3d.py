"""Per-step contact-torque decomposition of a 3D clamp snap, engine vs
MuJoCo — the measurement behind the round-3/4 snap work (docs/PARITY.md).

For one suite case + orientation this dumps, per step:
  MuJoCo: dtheta, omega_z, z, ncon, and the z-torque about the object COM
          split by contact class (left jaw / right jaw / plane) and
          component (normal force vs friction force), via mj_contactForce.
  Engine: dtheta, omega_z, z, active points per row, and the same z-torque
          split from the converged Newton impulses
          (engine3d.step_newton3 return_diag=True).

The split answers WHERE the engine's snap stall dissipates the rotational
energy MuJoCo delivers (finger friction vs plane friction vs normal-torque
under-drive).

    python scripts/diag_snap3d.py --case 29 [--orient -1] [--t0 600]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import SIM
from dgdm_tpu.sim import engine3d
from dgdm_tpu.sim.oracle3d import Oracle3D

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def mujoco_trace(oracle, theta0, steps):
    mujoco, m, d = oracle._mujoco, oracle.model, oracle.data
    adr = oracle._obj_adr
    d.qpos[:] = oracle._reset_qpos
    d.qvel[:] = 0.0
    d.qfrc_applied[:] = 0.0
    d.qpos[adr: adr + 3] = [0.0, 0.0, 0.0]
    d.qpos[adr + 3: adr + 7] = [np.cos(theta0 / 2), 0, 0, np.sin(theta0 / 2)]
    mujoco.mj_forward(m, d)
    d.ctrl[0], d.ctrl[1] = SIM.ctrl_3d, -SIM.ctrl_3d

    obj_body = m.body("object").id
    jaw_l, jaw_r = m.body("left_jaw").id, m.body("right_jaw").id
    geom_body = m.geom_bodyid

    rows = []
    for t in range(steps):
        mujoco.mj_step(m, d)
        quat = d.qpos[adr + 3: adr + 7]
        th = np.unwrap([theta0, (2 * np.arctan2(quat[3], quat[0]))])[1]
        com = d.xipos[obj_body]
        # z-torque split: [L, R, plane] x [normal, friction]
        tq = np.zeros((3, 2))
        fmag = np.zeros(3)
        nc = np.zeros(3, int)
        f6 = np.zeros(6)
        jaw_cons = []
        for ci in range(d.ncon):
            con = d.contact[ci]
            b1, b2 = geom_body[con.geom1], geom_body[con.geom2]
            if obj_body not in (b1, b2):
                continue
            other = b2 if b1 == obj_body else b1
            cls_i = 0 if other == jaw_l else (1 if other == jaw_r else 2)
            mujoco.mj_contactForce(m, d, ci, f6)
            frame = con.frame.reshape(3, 3)      # rows: normal, tan1, tan2
            fn_w = f6[0] * frame[0]
            ft_w = f6[1] * frame[1] + f6[2] * frame[2]
            sgn = 1.0 if b2 == obj_body else -1.0
            r = con.pos - com
            tq[cls_i, 0] += sgn * np.cross(r, fn_w)[2]
            tq[cls_i, 1] += sgn * np.cross(r, ft_w)[2]
            fmag[cls_i] += abs(f6[0])
            nc[cls_i] += 1
            if cls_i < 2:
                jaw_cons.append(dict(
                    side="LR"[cls_i], pos=con.pos.copy().tolist(),
                    n=(sgn * frame[0]).tolist(), fn=float(f6[0]),
                    ft=float(np.hypot(f6[1], f6[2])),
                    dist=float(con.dist)))
        jnames = [m.joint(jj).name for jj in range(m.njnt)]
        ql_adr = m.joint(jnames.index("left_grip")).qposadr[0]
        qv_adr = m.joint(jnames.index("left_grip")).dofadr[0]
        dof = m.joint(jnames.index("object_root")).dofadr[0]
        rows.append(dict(
            t=t, dth=float(th - theta0), om=float(d.qvel[adr + 5]),
            z=float(d.qpos[adr + 2]), ncon=nc.tolist(),
            fn=fmag.tolist(), tq=tq.tolist(), jaw_cons=jaw_cons,
            ql=float(d.qpos[ql_adr]), qdl=float(d.qvel[qv_adr]),
            fact=float(d.actuator_force[0]),
            vx=float(d.qvel[dof]), vy=float(d.qvel[dof + 1]),
            y=float(d.qpos[adr + 1]),
        ))
    return rows


def engine_trace(scene, theta0, steps, calib):
    ctrl = jnp.array([0.5, -0.5], jnp.float32)

    @jax.jit
    def run(pose):
        st = engine3d.init_state(scene, pose)

        def body(s, _):
            s2, dg = engine3d.step_newton3(scene, s, ctrl, calib=calib,
                                           return_diag=True)
            out = (engine3d._z_angle(s2.quat), s2.om[2], s2.pos[2],
                   s2.q[0], s2.qd[0], s2.vel[1], dg)
            return s2, out

        _, out = jax.lax.scan(body, st, None, length=steps)
        return out

    th, om, z, ql, qdl, vy, dg = run(
        jnp.asarray([0.0, 0.0, theta0], jnp.float32))
    th = np.unwrap(np.asarray(th)) - theta0
    return (np.asarray(th), np.asarray(om), np.asarray(z),
            np.asarray(ql), np.asarray(qdl), np.asarray(vy),
            {k: np.asarray(v) for k, v in dg.items()})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", type=int, default=29)
    ap.add_argument("--orient", type=int, default=-1,
                    help="-1 = orientation with max |mj target|")
    ap.add_argument("--t0", type=int, default=0, help="print from this step")
    ap.add_argument("--stride", type=int, default=25)
    ap.add_argument("--detail", type=int, default=0,
                    help="print per-contact pos/normal/force for this many "
                         "steps from --t0")
    ap.add_argument("--set", action="append", default=[],
                    help="calib override, e.g. --set b_contact=100")
    args = ap.parse_args()

    d = np.load(os.path.join(OUT, "oracle3d_suite.npz"))
    i = args.case
    target = d["delta_theta_s12"][i]
    mask = d["upright_s12"][i].astype(bool)
    ths = d["thetas"]
    steps = int(d["steps"])
    j = args.orient if args.orient >= 0 else int(
        np.argmax(np.abs(target) * mask))
    th0 = float(ths[j])
    print(f"case {i} orient {j} theta0={th0:.3f} mj_target={target[j]:+.4f}")

    verts = d["verts"][i][: d["nv"][i]].astype(np.float64)
    faces = d["faces"][i][: d["nf"][i]]

    oracle = Oracle3D(d["yl"][i], d["yr"][i], verts, faces,
                      num_slabs=12, num_z=2)
    mj = mujoco_trace(oracle, th0, steps)

    scene = engine3d.make_scene(d["yl"][i], d["yr"][i], verts, faces,
                                num_points=256)
    print(f"scene: m_obj={float(scene.mass):.4f} kg  "
          f"fm={np.asarray(scene.finger_mass)}  "
          f"I_diag={np.diag(np.asarray(scene.inertia))}")
    calib = engine3d.default_calib3()
    for kv in args.set:
        k, v = kv.split("=")
        calib = calib.replace(**{k: jnp.float32(float(v))})
    (th_e, om_e, z_e, ql_e, qdl_e, vy_e,
     dg) = engine_trace(scene, th0, steps, calib)
    dt = SIM.dt

    print(f"{'t':>5} | {'mj dth':>8} {'om':>7} {'z':>7} {'nc':>8} "
          f"{'tqzL n/t':>15} {'tqzR n/t':>15} {'tqzP n/t':>15} | "
          f"{'en dth':>8} {'om':>7} {'z':>7} {'nact':>11} "
          f"{'tqzL n/t':>15} {'tqzR n/t':>15} {'tqzP n/t':>15}")
    for t in range(args.t0, steps, args.stride):
        r = mj[t]
        nc = "/".join(str(x) for x in r["ncon"])
        mjt = " ".join(f"{r['tq'][c][0]:+6.3f}/{r['tq'][c][1]:+6.3f}"
                       for c in range(3))
        na = "/".join(f"{int(x)}" for x in dg["nact"][t])
        # engine stores torque-IMPULSE: divide by dt for torque
        ent = " ".join(
            f"{dg['tqz_n'][t, c]/dt:+6.3f}/{dg['tqz_t'][t, c]/dt:+6.3f}"
            for c in range(3))
        print(f"{t:5d} | {r['dth']:+8.4f} {r['om']:+7.3f} {r['z']:+7.4f} "
              f"{nc:>8} {mjt} | {th_e[t]:+8.4f} {om_e[t]:+7.3f} "
              f"{z_e[t]:+7.4f} {na:>11} {ent}")
    if args.detail:
        dt_ = SIM.dt
        for t in range(args.t0, min(args.t0 + args.detail, steps)):
            r = mj[t]
            print(f"-- t={t} mj om={r['om']:+.3f} vy={r['vy']:+.4f} "
                  f"ql={r['ql']:+.5f} qd={r['qdl']:+.4f} | "
                  f"en om={om_e[t]:+.3f} vy={vy_e[t]:+.4f} "
                  f"ql={ql_e[t]:+.5f} qd={qdl_e[t]:+.4f}")
            for c in mj[t]["jaw_cons"]:
                p, n = c["pos"], c["n"]
                print(f"   mj {c['side']} pos=({p[0]:+.4f},{p[1]:+.4f},"
                      f"{p[2]:+.4f}) n=({n[0]:+.3f},{n[1]:+.3f},{n[2]:+.3f}) "
                      f"fn={c['fn']:7.3f} ft={c['ft']:7.3f} "
                      f"dist={c['dist']*1e3:+.3f}mm")
            lam = dg["lam_pt"][t]
            for row in (0, 1):
                for p_i in np.nonzero(lam[row] > 1e-8)[0]:
                    pw = dg["pw"][t, p_i]
                    nv = dg["n_pt"][t, row, p_i]
                    print(f"   en {'LR'[row]} pos=({pw[0]:+.4f},{pw[1]:+.4f},"
                          f"{pw[2]:+.4f}) n=({nv[0]:+.3f},{nv[1]:+.3f},"
                          f"{nv[2]:+.3f}) fn={lam[row, p_i]/dt_:7.3f} "
                          f"depth={dg['depth_max'][t, row]*1e3:+.3f}mm "
                          f"a={dg['a_nn'][t, row, p_i]:.3f} "
                          f"vn0={dg['vn0'][t, row, p_i]:+.4f} "
                          f"tgt={dg['target'][t, row, p_i]:+.4f} "
                          f"vn1={dg['vn1'][t, row, p_i]:+.4f}")
    print(f"final: mj {mj[-1]['dth']:+.4f}  engine {th_e[-1]:+.4f}")


if __name__ == "__main__":
    main()

"""Per-step theta-trace comparison, engine vs MuJoCo, for one suite case.

Distinguishes the two under-rotation hypotheses:
  - torque under-drive (engine theta rises too slowly the whole way), vs
  - premature stall (engine tracks then freezes while MuJoCo keeps turning).

    python scripts/diag_case_2d.py --case 18 --thetas 4
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.sim import engine2d
from dgdm_tpu.sim.oracle import Oracle2D

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", type=int, default=18)
    ap.add_argument("--thetas", type=int, default=4,
                    help="how many worst-orientation traces to print")
    args = ap.parse_args()

    d = np.load(os.path.join(OUT, "oracle2d_suite.npz"))
    yl, yr, contour = d["yl"][args.case], d["yr"][args.case], d["contours"][args.case]
    ths = d["thetas"]
    steps = int(d["steps"])
    mj_prof = d["delta_theta"][args.case]

    scene = engine2d.make_scene(yl, yr, contour)
    calib = engine2d.default_calib()
    poses = jnp.asarray(np.stack([0 * ths, 0 * ths, ths], -1), jnp.float32)
    en_prof = np.asarray(engine2d.profile(scene, poses, steps=steps,
                                          calib=calib)[0])

    gap = np.abs(en_prof - mj_prof)
    worst = np.argsort(-gap)[: args.thetas]
    print(f"case {args.case}: worst orientations by |en-mj| gap:")
    for i in worst:
        print(f"  theta={ths[i]:.2f}: en {en_prof[i]:+.3f} mj {mj_prof[i]:+.3f}")

    oracle = Oracle2D(yl, yr, contour)

    @jax.jit
    def en_trace(pose):
        state0 = engine2d.init_state(scene, pose)
        ctrl = jnp.array([0.2, -0.2], jnp.float32)

        def body(s, _):
            s2 = engine2d.step(scene, s, ctrl, calib=calib)
            return s2, jnp.stack([s2.theta, s2.q[0], s2.q[1],
                                  s2.com[0], s2.com[1]])

        _, tr = jax.lax.scan(body, state0, None, length=steps)
        return tr

    adr = oracle._obj_adr
    m = oracle.model
    jnames = [m.joint(j).name for j in range(m.njnt)]
    print("joints:", jnames)
    fl_adr = m.joint([n for n in jnames if "l" in n.lower() and "obj" not in n.lower()][0]).qposadr[0] \
        if any("l" in n.lower() and "obj" not in n.lower() for n in jnames) else None
    # robust: take the two slide joints (type 2)
    slide = [j for j in range(m.njnt) if m.joint(j).type[0] == 2]
    fl_adr, fr_adr = (m.joint(slide[0]).qposadr[0], m.joint(slide[1]).qposadr[0])
    for i in worst:
        th0 = float(ths[i])
        tr_en = np.asarray(en_trace(jnp.asarray([0.0, 0.0, th0], jnp.float32)))
        _, _, _, traj = oracle.rollout(0.0, 0.0, th0, steps=steps, trace=True)
        quat = traj[:, adr + 3: adr + 7]
        th_mj = 2.0 * np.arctan2(quat[:, 3], quat[:, 0])
        th_mj = np.unwrap(th_mj) - th0
        th_en = np.unwrap(tr_en[:, 0]) - th0
        print(f"\ntheta0={th0:.2f} (en_final {th_en[-1]:+.3f}, "
              f"mj_final {th_mj[-1]:+.3f})")
        print("  t:   " + " ".join(f"{t:7d}" for t in range(0, steps, 20)))
        print("  en:  " + " ".join(f"{th_en[t]:+7.3f}" for t in range(0, steps, 20)))
        print("  mj:  " + " ".join(f"{th_mj[t]:+7.3f}" for t in range(0, steps, 20)))
        # gripper positions at matching times (servo timing check)
        ql_mj = traj[:, fl_adr]
        print("  qlE: " + " ".join(f"{tr_en[t,1]:+7.4f}" for t in range(0, steps, 20)))
        print("  qlM: " + " ".join(f"{ql_mj[t]:+7.4f}" for t in range(0, steps, 20)))


if __name__ == "__main__":
    main()

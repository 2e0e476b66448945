"""Per-case 3D fidelity diagnostics vs the MuJoCo prism-oracle suite.

    python scripts/diag_suite_3d.py [--solver newton] [--trace CASE]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.sim import engine3d

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def cls(x, th=0.02):
    return np.where(x > th, 2, np.where(x < -th, 0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default=None, choices=("jacobi", "newton"))
    ap.add_argument("--calib", default=None)
    ap.add_argument("--chunk", type=int, default=6)
    ap.add_argument("--trace", type=int, default=-1,
                    help="print theta(t) engine-vs-oracle for this case")
    ap.add_argument("--cpu", action="store_true",
                    help="pin to host CPU (never touches the TPU tunnel)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.solver:
        engine3d.SOLVER3 = args.solver

    d = np.load(os.path.join(OUT, "oracle3d_suite.npz"))
    # engine contacts the 12x2 envelope exactly (envelope3d.DEFAULT_DECOMPS)
    # -> score against the 12x2 sim; the 12x3 run is the ceiling reference
    target = d["delta_theta_s12"]
    mask = d["upright_s12"].astype(bool)
    ths = d["thetas"]
    steps = int(d["steps"])

    calib = engine3d.default_calib3()
    if args.calib:
        with open(args.calib) as f:
            fitted = json.load(f)["fitted"]
        calib = calib.replace(**{k: jnp.float32(v) for k, v in fitted.items()})

    scenes = []
    for i in range(len(d["yl"])):
        verts = d["verts"][i][: d["nv"][i]].astype(np.float64)
        faces = d["faces"][i][: d["nf"][i]]
        scenes.append(engine3d.make_scene(d["yl"][i], d["yr"][i], verts,
                                          faces, num_points=256))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    poses = jnp.asarray(np.stack([0 * ths, 0 * ths, ths], -1), jnp.float32)

    if args.trace >= 0:
        i = args.trace
        sc = scenes[i]
        gap = np.abs(target[i] - 0.0) * mask[i]
        j = int(np.argmax(np.abs(target[i]) * mask[i]))
        th0 = float(ths[j])
        print(f"case {i} theta0={th0:.2f} mj target {target[i][j]:+.4f}")

        @jax.jit
        def tr(pose):
            st = engine3d.init_state(sc, pose)
            ctrl = jnp.array([0.5, -0.5], jnp.float32)

            def body(s, _):
                s2 = engine3d.step(sc, s, ctrl, calib=calib)
                return s2, jnp.stack([engine3d._z_angle(s2.quat),
                                      s2.q[0], s2.pos[2],
                                      jnp.abs(s2.quat[1]) + jnp.abs(s2.quat[2])])

            _, out = jax.lax.scan(body, st, None, length=steps)
            return out

        out = np.asarray(tr(jnp.asarray([0.0, 0.0, th0], jnp.float32)))
        th_en = np.unwrap(out[:, 0]) - th0
        for t in range(0, steps, steps // 16):
            print(f"  t={t:4d} dth={th_en[t]:+8.4f} ql={out[t,1]:+.4f} "
                  f"z={out[t,2]:+.4f} tilt={out[t,3]:.4f}")
        # oracle trace
        from dgdm_tpu.sim.oracle3d import Oracle3D
        oracle = Oracle3D(d["yl"][i], d["yr"][i],
                          d["verts"][i][: d["nv"][i]].astype(np.float64),
                          d["faces"][i][: d["nf"][i]], num_slabs=12, num_z=2)
        res = oracle.rollout(0.0, 0.0, th0, steps=steps, trace=True)
        traj = res[-1]
        adr = oracle._obj_adr
        quat = traj[:, adr + 3: adr + 7]
        th_mj = np.unwrap(2.0 * np.arctan2(quat[:, 3], quat[:, 0])) - th0
        tilt_mj = np.abs(quat[:, 1]) + np.abs(quat[:, 2])
        z_mj = traj[:, adr + 2]
        m = oracle.model
        slide = [j for j in range(m.njnt) if m.joint(j).type[0] == 2]
        ql_mj = traj[:, m.joint(slide[0]).qposadr[0]]
        for t in range(0, steps, steps // 16):
            print(f"  t={t:4d} mj dth={th_mj[t]:+8.4f} ql={ql_mj[t]:+.4f} "
                  f"z={z_mj[t]:+.4f} tilt={tilt_mj[t]:.4f}")
        return

    fn = jax.jit(lambda sc: engine3d.profile_batch(sc, poses, steps=steps,
                                                   calib=calib)[0])
    en = []
    for s in range(0, len(scenes), args.chunk):
        sub = jax.tree.map(lambda x: x[s:s + args.chunk], stacked)
        en.append(np.asarray(fn(sub)))
    en = np.concatenate(en)

    corrs, ratios, agrees = [], [], []
    rows = []
    for i in range(len(scenes)):
        v = mask[i]
        e, t = en[i][v], target[i][v]
        if v.sum() < 6:
            continue
        a = float((cls(e) == cls(t)).mean())
        agrees.append(a)
        if t.std() > 0.005:
            c = np.corrcoef(e, t)[0, 1]
            c = 0.0 if not np.isfinite(c) else float(c)
            corrs.append(c)
            ratios.append(float(e.std() / t.std()))
            rows.append((i, c, ratios[-1], a, float(t.std())))
    print(f"cases with signal: {len(corrs)}/{len(scenes)}")
    print(f"corr {np.mean(corrs):.3f}  ratio(med) {np.median(ratios):.3f}  "
          f"agree {np.mean(agrees):.3f}")
    for i, c, r, a, s in sorted(rows, key=lambda x: x[1])[:10]:
        print(f"  case {i:2d} corr {c:+.3f} ratio {r:6.2f} agree {a:.2f} "
              f"mj_std {s:.4f}")


if __name__ == "__main__":
    main()

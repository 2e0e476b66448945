"""Focused (mu_finger, b_contact) grid for the 3D snap mechanism.

Per-case tail traces (docs/PARITY.md round-3) show the engine's remaining
3D error is the final clamp snap: MuJoCo converts jaw advance into
alignment rotation ~2.6x faster, recruiting the second jaw through a
positive-feedback pinch. Probes show the snap completes at low finger
friction or high contact damping. This grid scans exactly those two axes
with everything else pinned at the r3b fit, scoring the full suite vs the
12x2 oracle — cheaper and more interpretable than re-running the broad
random search.

    python scripts/grid_calib_3d.py [--out runs/calib/calib3d_grid.json]
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.sim import engine3d, pallas3d

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")

MU_F = (0.10, 0.18, 0.30, 0.50, 0.836)
B_C = (798.0, 1600.0, 3000.0)


def cls(x, th=0.02):
    return np.where(x > th, 2, np.where(x < -th, 0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(OUT, "calib3d_grid.json"))
    args = ap.parse_args()

    d = np.load(os.path.join(OUT, "oracle3d_suite.npz"))
    target = d["delta_theta_s12"]
    mask = d["upright_s12"].astype(bool)
    ths = d["thetas"]
    steps = int(d["steps"])
    scenes = []
    for i in range(len(d["yl"])):
        verts = d["verts"][i][: d["nv"][i]].astype(np.float64)
        faces = d["faces"][i][: d["nf"][i]]
        scenes.append(engine3d.make_scene(d["yl"][i], d["yr"][i], verts,
                                          faces, num_points=256))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    n_pad = pallas3d.LANE
    th_pad = np.zeros(n_pad, np.float32)
    th_pad[: len(ths)] = ths
    poses = jnp.asarray(np.stack([0 * th_pad, 0 * th_pad, th_pad], -1))

    def eval_calib(vals):
        calib = engine3d.default_calib3().replace(
            **{k: jnp.float32(v) for k, v in vals.items()})
        coefs, points, scal = pallas3d.scene_arrays_3d(stacked, calib=calib)
        dth, _, _, valid, _ = pallas3d.profile_batch_pallas3d(
            coefs, points, scal, poses, steps=steps, solver="newton")
        return np.asarray(dth)[:, : len(ths)]

    def score(en):
        corrs, ratios, agrees = [], [], []
        for i in range(en.shape[0]):
            v = mask[i]
            e, t = en[i][v], target[i][v]
            if v.sum() < 6:
                continue
            agrees.append((cls(e) == cls(t)).mean())
            if t.std() > 0.005:
                c = np.corrcoef(e, t)[0, 1]
                corrs.append(0.0 if not np.isfinite(c) else c)
                ratios.append(e.std() / t.std())
        c, r, a = np.mean(corrs), np.median(ratios), np.mean(agrees)
        return (float(c + a - 0.5 * abs(np.log(max(r, 1e-6)))),
                float(c), float(r), float(a))

    rows = []
    t0 = time.time()
    for mu_f, b_c in itertools.product(MU_F, B_C):
        vals = {"mu_finger": mu_f, "b_contact": b_c}
        en = eval_calib(vals)
        if not np.isfinite(en).all():
            continue
        tot, c, r, a = score(en)
        rows.append({"mu_finger": mu_f, "b_contact": b_c, "score": tot,
                     "corr": c, "ratio": r, "agree": a})
        print(f"mu_f={mu_f:.3f} b={b_c:6.0f} score {tot:+.3f} corr {c:.3f} "
              f"ratio {r:.2f} agree {a:.3f}  [{time.time()-t0:.0f}s]",
              flush=True)
    rows.sort(key=lambda x: -x["score"])
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print("BEST", json.dumps(rows[0]), flush=True)


if __name__ == "__main__":
    main()

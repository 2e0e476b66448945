"""MuJoCo self-sensitivity ceiling for the 3D oracle suite.

Reruns the suite's 12x2-decomposition oracle with a tiny initial-pose
perturbation (default: x0 += 0.2 mm, ~1/500 of the object extent) and
scores it against the committed unperturbed run with the SAME statistics
the engine is scored with. The result bounds the correlation ANY
simulator — including MuJoCo itself — can achieve on this suite: squeeze
outcomes ride bifurcations (bistable alignment snaps, plane-rocking limit
cycles), so two runs of the identical physics from ε-different states
decorrelate wherever the suite is chaos-dominated (cf. the decomposition
ceiling, 12x2-vs-12x3 corr 0.937).

    JAX_PLATFORMS=cpu python scripts/mj_sensitivity_3d.py [--dx 2e-4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def cls(x, th=0.02):
    return np.where(x > th, 2, np.where(x < -th, 0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dx", type=float, default=2e-4,
                    help="initial x offset (m) for the perturbed run")
    ap.add_argument("--out",
                    default=os.path.join(OUT, "mj_sensitivity_3d.json"))
    args = ap.parse_args()

    from dgdm_tpu.sim.oracle3d import Oracle3D

    d = np.load(os.path.join(OUT, "oracle3d_suite.npz"))
    target = d["delta_theta_s12"]
    mask = d["upright_s12"].astype(bool)
    ths = d["thetas"]
    steps = int(d["steps"])

    corrs, ratios, agrees, rows = [], [], [], []
    for i in range(len(d["yl"])):
        o = Oracle3D(d["yl"][i], d["yr"][i],
                     d["verts"][i][: d["nv"][i]].astype(np.float64),
                     d["faces"][i][: d["nf"][i]], num_slabs=12, num_z=2)
        pert = np.asarray(
            [o.rollout(args.dx, 0.0, th, steps=steps)[0] for th in ths]
        )
        v = mask[i]
        e, t = pert[v], target[i][v]
        row = {"case": i, "valid": int(v.sum())}
        if v.sum() >= 6 and t.std() > 0.005:
            c = np.corrcoef(e, t)[0, 1]
            row.update({
                "corr": float(0.0 if not np.isfinite(c) else c),
                "ratio": float(e.std() / t.std()),
                "agree": float((cls(e) == cls(t)).mean()),
            })
            corrs.append(row["corr"])
            ratios.append(row["ratio"])
            agrees.append(row["agree"])
            print(json.dumps(row), flush=True)
        rows.append(row)

    pooled = {
        "dx": args.dx,
        "corr": float(np.mean(corrs)),
        "ratio": float(np.median(ratios)),
        "agree": float(np.mean(agrees)),
        "cases": len(corrs),
    }
    print("POOLED", json.dumps(pooled), flush=True)
    with open(args.out, "w") as f:
        json.dump({"cases": rows, "pooled": pooled}, f, indent=1)


if __name__ == "__main__":
    main()

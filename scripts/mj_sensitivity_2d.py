"""MuJoCo self-sensitivity ceiling for the 2D oracle suite.

2D analog of scripts/mj_sensitivity_3d.py: rerun the suite oracle with a
tiny initial-pose perturbation (default x0 += 0.2 mm) and score against
the committed run with the engine's statistics. Separates the chaos
component of the 2D correlation ceiling from the decomposition component
(the committed ceiling argument compares DIFFERENT ear-clip
decompositions; this compares the SAME decomposition from ε-different
states).

    JAX_PLATFORMS=cpu python scripts/mj_sensitivity_2d.py [--dx 2e-4]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def cls(x, th=0.03):
    return np.where(x > th, 2, np.where(x < -th, 0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dx", type=float, default=2e-4)
    ap.add_argument("--out",
                    default=os.path.join(OUT, "mj_sensitivity_2d.json"))
    args = ap.parse_args()

    from dgdm_tpu.sim.oracle import Oracle2D

    d = np.load(os.path.join(OUT, "oracle2d_suite.npz"))
    target = d["delta_theta"]
    ths = d["thetas"]
    steps = int(d["steps"])

    corrs, ratios, agrees, rows = [], [], [], []
    for i in range(len(d["yl"])):
        o = Oracle2D(d["yl"][i], d["yr"][i], d["contours"][i])
        pert = np.asarray(
            [o.rollout(args.dx, 0.0, th, steps=steps)[0] for th in ths]
        )
        t = target[i]
        row = {"case": i}
        if t.std() > 0.005:
            c = np.corrcoef(pert, t)[0, 1]
            row.update({
                "corr": float(0.0 if not np.isfinite(c) else c),
                "ratio": float(pert.std() / t.std()),
                "agree": float((cls(pert) == cls(t)).mean()),
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

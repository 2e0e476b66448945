"""Build the MuJoCo oracle fidelity suite for 2D engine calibration.

For each of N object x gripper cases, runs a reference-equivalent MuJoCo
orientation sweep (``sim/sim_2d.py:144-171`` inner loop at the grid center)
and stores the target interaction profiles. The engine is calibrated and
regression-tested against this file (scripts/calibrate_engine.py,
tests/test_engine2d.py).

    python scripts/build_oracle_suite.py --cases 60 --n_theta 24
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.geom.fingers import sample_gripper_2d
from dgdm_tpu.geom.shapes import suite_icon

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=60)
    ap.add_argument("--n_theta", type=int, default=24)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default=os.path.join(OUT, "oracle2d_suite.npz"))
    ap.add_argument("--num_slabs", type=int, default=50,
                    help="finger decomposition resolution (vary to measure "
                         "MuJoCo's own decomposition-noise ceiling)")
    ap.add_argument("--obj_variant", default="default",
                    help="object triangulation variant ('rolled' re-ear-clips "
                         "from a rolled start vertex: same geometry, "
                         "different crack topology)")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)

    from dgdm_tpu.sim.oracle import Oracle2D

    ths = np.linspace(0, 2 * np.pi, args.n_theta, endpoint=False)
    contours, yls, yrs, dths, dposs = [], [], [], [], []
    t0 = time.time()
    for i in range(args.cases):
        contour = extract_contours(suite_icon(i))
        # vary gripper independently of the object
        yl, yr = sample_gripper_2d(1000 + 7 * i)
        oracle = Oracle2D(yl, yr, contour, num_slabs=args.num_slabs,
                          obj_variant=args.obj_variant)
        rows = [oracle.rollout(0.0, 0.0, th, steps=args.steps) for th in ths]
        contours.append(contour)
        yls.append(yl)
        yrs.append(yr)
        dths.append([r[0] for r in rows])
        dposs.append([r[1][:2] for r in rows])
        if (i + 1) % 10 == 0:
            print(f"{i+1}/{args.cases} cases ({time.time()-t0:.0f}s)", flush=True)

    np.savez_compressed(
        args.out,
        contours=np.asarray(contours, np.float32),      # (C, 100, 2)
        yl=np.asarray(yls, np.float32),                 # (C, 7)
        yr=np.asarray(yrs, np.float32),
        thetas=ths.astype(np.float32),                  # (T,)
        delta_theta=np.asarray(dths, np.float32),       # (C, T)
        delta_pos=np.asarray(dposs, np.float32),        # (C, T, 2)
        steps=np.int32(args.steps),
    )
    print(f"wrote {args.out} ({args.cases} cases x {args.n_theta} thetas, "
          f"{time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()

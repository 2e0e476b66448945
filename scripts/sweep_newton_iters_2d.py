"""Fidelity + throughput sweep over the 2D kernel's Newton iteration count,
against the MuJoCo oracle suite and the datagen workload. Picks the
shipping NEWTON_KERNEL_ITERS for pallas2d. (A cap warm-start variant was
tried in round 3 and rejected — see the NEWTON_KERNEL_ITERS comment in
pallas2d.py — so only cold configs remain.)

    python scripts/sweep_newton_iters_2d.py --configs 5,4,3,2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.geom.fingers import sample_gripper_2d
from dgdm_tpu.sim import engine2d, pallas2d
from dgdm_tpu.sim.datagen import stack_scenes
from scripts.search_calib_2d import score

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="5,4,3,2",
                    help="comma list of Newton iteration counts")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    # fidelity workload: oracle suite
    d = np.load(os.path.join(OUT, "oracle2d_suite.npz"))
    alt = np.load(os.path.join(OUT, "oracle2d_suite_s100.npz"))["delta_theta"]
    target = 0.5 * (d["delta_theta"] + alt)
    sig_mask = target.std(-1) > 0.01
    ths = d["thetas"].astype(np.float32)
    steps = int(d["steps"])
    scenes = [engine2d.make_scene(yl, yr, c)
              for yl, yr, c in zip(d["yl"], d["yr"], d["contours"])]
    st = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    arrs = pallas2d.scene_arrays(st)
    pad = (-len(ths)) % pallas2d.LANE
    th_p = np.concatenate([ths, np.full(pad, ths[-1], np.float32)])
    poses_f = jnp.asarray(np.stack([0 * th_p, 0 * th_p, th_p], -1))

    # throughput workload: bench shape (64 pairs x 9216 poses, 200 steps)
    ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    rad = 0.035 * (1 + 0.25 * np.sin(3 * ang) + 0.1 * np.sin(7 * ang))
    contour = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)
    grips = [sample_gripper_2d(i) for i in range(64)]
    bst = stack_scenes([engine2d.make_scene(yl, yr, contour)
                        for yl, yr in grips])
    barrs = pallas2d.scene_arrays(bst)
    grid = engine2d.pose_grid(grid_size=360, num_pos=5)
    npad = (-grid.shape[0]) % pallas2d.LANE
    bposes = jnp.asarray(np.concatenate(
        [grid, np.tile(grid[-1:], (npad, 1))]).astype(np.float32))
    total = 64 * grid.shape[0]

    results = []
    for cfg in args.configs.split(","):
        iters = int(cfg.rstrip("c"))
        kw = dict(newton_iters=iters, solver="newton")
        dth = pallas2d.profile_batch_pallas(*arrs, poses_f, steps=steps, **kw)[0]
        en = np.asarray(dth)[:, : len(ths)]
        total_s, corr, ratio, agree = score(en, target, sig_mask)

        run = lambda: jax.block_until_ready(
            pallas2d.profile_batch_pallas(*barrs, bposes, steps=200, **kw))
        run()
        t0 = time.time()
        run(); run()
        rate = 2 * total / (time.time() - t0)
        row = {"config": cfg, "iters": iters,
               "corr": corr, "ratio": ratio, "agree": agree,
               "score": total_s, "rollouts_per_sec": rate}
        print(json.dumps(row), flush=True)
        results.append(row)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

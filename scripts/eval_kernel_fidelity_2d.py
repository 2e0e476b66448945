"""Score the fused 2D Pallas kernel directly against the MuJoCo oracle suite
(same pooled corr/ratio/agree as scripts/search_calib_2d.py, which fits
through the pure-JAX engine) — guards kernel-level solver changes (warm
start, iteration count) at the fidelity level, not just engine parity.

    python scripts/eval_kernel_fidelity_2d.py            # TPU
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.sim import engine2d, pallas2d
from scripts.search_calib_2d import score

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--cold", action="store_true")
    args = ap.parse_args()

    d = np.load(os.path.join(OUT, "oracle2d_suite.npz"))
    alt = np.load(os.path.join(OUT, "oracle2d_suite_s100.npz"))["delta_theta"]
    target = 0.5 * (d["delta_theta"] + alt)
    sig_mask = target.std(-1) > 0.01
    ths = d["thetas"].astype(np.float32)
    steps = int(d["steps"])

    scenes = [engine2d.make_scene(yl, yr, c)
              for yl, yr, c in zip(d["yl"], d["yr"], d["contours"])]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    arrs = pallas2d.scene_arrays(stacked)

    pad = (-len(ths)) % pallas2d.LANE
    th_p = np.concatenate([ths, np.full(pad, ths[-1], np.float32)])
    poses = jnp.asarray(np.stack([0 * th_p, 0 * th_p, th_p], -1))

    kw = {"newton_iters": args.iters} if args.iters else {}
    if args.cold:
        kw["warm_caps"] = False
    dth, _, _, _ = pallas2d.profile_batch_pallas(
        *arrs, poses, steps=steps, solver="newton", **kw)
    en = np.asarray(dth)[:, : len(ths)]

    total, corr, ratio, agree = score(en, target, sig_mask)
    res = {"newton_kernel_iters": args.iters or pallas2d.NEWTON_KERNEL_ITERS,
           "warm_caps": not args.cold,
           "score": total, "corr": corr, "ratio": ratio, "agree": agree}
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()

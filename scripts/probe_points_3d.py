"""Contact-point-count trade for the 3D engine/kernel (round 4).

The contact phase runs near the VPU roofline (runs/calib/mfu_3d.json) and
its cost is linear in P, the per-object contact sample count
(engine3d.make_scene num_points, default 256 — "fidelity statistics were
fitted at this density"). This probe measures what that density actually
buys: full-suite corr/ratio/agree via the pure-JAX engine at P in
{256, 192, 128} (same calibration), plus fused-kernel throughput at the
bench shape for each P.

    python scripts/probe_points_3d.py [--points 256 192 128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_dgdm")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.sim import engine3d, pallas3d

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")
FAMILY = (4, 7, 17, 25, 27, 29)


def cls(x, th=0.02):
    return np.where(x > th, 2, np.where(x < -th, 0, 1))


def score(en, target, mask):
    corrs, ratios, agrees, fam = [], [], [], {}
    for i in range(en.shape[0]):
        v = mask[i]
        e, t = en[i][v], target[i][v]
        if v.sum() < 6:
            continue
        agrees.append(float((cls(e) == cls(t)).mean()))
        if t.std() > 0.005:
            c = np.corrcoef(e, t)[0, 1]
            c = 0.0 if not np.isfinite(c) else float(c)
            r = float(e.std() / t.std())
            corrs.append(c)
            ratios.append(r)
            if i in FAMILY:
                fam[i] = (c, r)
    return (float(np.mean(corrs)), float(np.median(ratios)),
            float(np.mean(agrees)), fam)


def kernel_rate(num_points, num_pairs=8, num_poses=1152):
    from dgdm_tpu.geom.fingers import sample_gripper_3d
    from dgdm_tpu.geom.mesh3d import box_mesh

    verts, faces = box_mesh()
    scenes = [
        engine3d.make_scene(*sample_gripper_3d(i), verts, faces,
                            num_points=num_points)
        for i in range(num_pairs)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    rng = np.random.RandomState(0)
    poses = np.stack(
        [rng.uniform(-0.03, 0.03, num_poses),
         rng.uniform(-0.03, 0.03, num_poses),
         rng.uniform(0, 2 * np.pi, num_poses)], -1).astype(np.float32)
    arrs = pallas3d.scene_arrays_3d(stacked)

    def run():
        o = pallas3d.profile_batch_pallas3d(*arrs, jnp.asarray(poses))
        jax.block_until_ready(o)

    run()
    ts = []
    for _ in range(3):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    return num_pairs * num_poses / float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, nargs="+", default=[256, 192, 128])
    ap.add_argument("--chunk", type=int, default=6)
    ap.add_argument("--out", default=os.path.join(OUT, "probe_points_3d.json"))
    args = ap.parse_args()

    d = np.load(os.path.join(OUT, "oracle3d_suite.npz"))
    target = d["delta_theta_s12"]
    mask = d["upright_s12"].astype(bool)
    ths = d["thetas"]
    steps = int(d["steps"])
    poses = jnp.asarray(np.stack([0 * ths, 0 * ths, ths], -1), jnp.float32)

    rows = []
    for npts in args.points:
        scenes = []
        for i in range(len(d["yl"])):
            verts = d["verts"][i][: d["nv"][i]].astype(np.float64)
            faces = d["faces"][i][: d["nf"][i]]
            scenes.append(engine3d.make_scene(
                d["yl"][i], d["yr"][i], verts, faces, num_points=npts))
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
        en = []
        for s in range(0, len(scenes), args.chunk):
            sub = jax.tree.map(lambda x: x[s:s + args.chunk], stacked)
            dth = engine3d.profile_batch(sub, poses, steps=steps)[0]
            en.append(np.asarray(dth))
        c, r, a, fam = score(np.concatenate(en), target, mask)
        rate = kernel_rate(npts)
        row = {"num_points": npts, "corr": c, "ratio": r, "agree": a,
               "family": fam, "kernel_rollouts_per_sec": rate}
        rows.append(row)
        print(json.dumps(row), flush=True)

    os.makedirs(OUT, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()

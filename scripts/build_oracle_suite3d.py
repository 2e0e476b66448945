"""Build the MuJoCo oracle fidelity suite for 3D engine calibration.

Cases are convex prisms (boxes + regular k-gon prisms of varied size/aspect,
standing in for the reference's scanned objects whose collision geometry is
V-HACD hulls anyway) x sampled B-spline-surface grippers, swept over initial
orientations (``sim/sim_3d.py:127-155``). Two finger-decomposition
resolutions (12 and 24 slabs) are stored so calibration can target their
mean — fitting one decomposition alone overfits its contact noise (measured
in 2D, docs/PARITY.md).

    python scripts/build_oracle_suite3d.py --cases 30 --n_theta 16
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# host-side MuJoCo + geometry only: pin JAX to CPU so this never claims the
# TPU (an unpinned import blocks while another client holds the chip)
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from dgdm_tpu.geom.fingers import sample_gripper_3d

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


def prism_mesh(k: int, radius: float, hz: float, aspect: float = 1.0,
               phase: float = 0.0):
    """Watertight convex k-gon prism: base at z=0, top at z=hz."""
    ang = np.linspace(0, 2 * np.pi, k, endpoint=False) + phase
    base = np.stack([radius * np.cos(ang), aspect * radius * np.sin(ang)], -1)
    lo = np.concatenate([base, np.zeros((k, 1))], -1)
    hi = np.concatenate([base, np.full((k, 1), hz)], -1)
    verts = np.concatenate([lo, hi])
    faces = []
    for i in range(k):
        j = (i + 1) % k
        faces.append([i, j, k + j])
        faces.append([i, k + j, k + i])
    for i in range(1, k - 1):           # caps (fan)
        faces.append([0, i + 1, i])
        faces.append([k, k + i, k + i + 1])
    return verts.astype(np.float64), np.asarray(faces, np.int64)


def suite_object_3d(i: int):
    rng = np.random.RandomState(1000 + i)
    kind = i % 3
    if kind == 0:       # box
        hx, hy = rng.uniform(0.025, 0.06, 2)
        hz = rng.uniform(0.04, 0.1)
        from dgdm_tpu.geom.mesh3d import box_mesh

        verts, faces = box_mesh(hx, hy, hz / 2, hz / 2)  # grounded: z in [0, hz]
        return verts, faces
    if kind == 1:       # k-gon prism
        k = rng.randint(5, 9)
        return prism_mesh(k, rng.uniform(0.03, 0.06), rng.uniform(0.05, 0.1),
                          aspect=rng.uniform(0.7, 1.0), phase=rng.uniform(0, 1))
    # elongated low prism
    return prism_mesh(6, rng.uniform(0.04, 0.065), rng.uniform(0.03, 0.05),
                      aspect=rng.uniform(0.5, 0.8), phase=rng.uniform(0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=30)
    ap.add_argument("--n_theta", type=int, default=16)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--out", default=os.path.join(OUT, "oracle3d_suite.npz"))
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)

    from dgdm_tpu.sim.oracle3d import Oracle3D

    ths = np.linspace(0, 2 * np.pi, args.n_theta, endpoint=False)
    data = {"yl": [], "yr": [], "verts": [], "faces": [],
            "nv": [], "nf": []}
    dths, uprights = {12: [], 24: []}, {12: [], 24: []}
    t0 = time.time()
    for i in range(args.cases):
        verts, faces = suite_object_3d(i)
        yl, yr = sample_gripper_3d(500 + 3 * i)
        # two V-HACD-budget-faithful finger decompositions (12x2=24 and
        # 12x3=36 hulls; round 3 — the old full-z 12/24 slabs overfilled
        # z-concavities by 4-5.5 mm mean and agreed with each other only
        # because they shared that error; geom/envelope3d.py). npz keys keep
        # the historical s12/s24 names.
        for slabs, (nx_s, nz_s) in ((12, (12, 2)), (24, (12, 3))):
            o = Oracle3D(yl, yr, verts, faces, num_slabs=nx_s, num_z=nz_s)
            rows = [o.rollout(0.0, 0.0, th, steps=args.steps) for th in ths]
            dths[slabs].append([r[0] for r in rows])
            uprights[slabs].append([r[3] for r in rows])
        data["yl"].append(yl)
        data["yr"].append(yr)
        # pad vertices/faces to common max for one npz
        data["verts"].append(verts)
        data["faces"].append(faces)
        data["nv"].append(len(verts))
        data["nf"].append(len(faces))
        if (i + 1) % 5 == 0:
            print(f"{i+1}/{args.cases} ({time.time()-t0:.0f}s)", flush=True)

    nv_max = max(data["nv"])
    nf_max = max(data["nf"])
    verts_p = np.zeros((args.cases, nv_max, 3), np.float32)
    faces_p = np.zeros((args.cases, nf_max, 3), np.int64)
    for i, (v, f) in enumerate(zip(data["verts"], data["faces"])):
        verts_p[i, : len(v)] = v
        faces_p[i, : len(f)] = f
    np.savez_compressed(
        args.out,
        yl=np.asarray(data["yl"], np.float32),
        yr=np.asarray(data["yr"], np.float32),
        verts=verts_p, faces=faces_p,
        nv=np.asarray(data["nv"]), nf=np.asarray(data["nf"]),
        thetas=ths.astype(np.float32),
        delta_theta_s12=np.asarray(dths[12], np.float32),
        delta_theta_s24=np.asarray(dths[24], np.float32),
        upright_s12=np.asarray(uprights[12]),
        upright_s24=np.asarray(uprights[24]),
        steps=np.int32(args.steps),
    )
    print(f"wrote {args.out} ({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()

"""Random-search calibration of the 3D Newton engine on the full oracle
suite, evaluated through the fused Pallas kernel (calibration parameters
ride in the scene scalar arrays — no recompile between configs, ~1 s per
config after the first).

    python scripts/search_calib_3d.py --budget 150 --refine 60
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

from dgdm_tpu.sim import engine3d, pallas3d

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")

RANGES = {
    # r4: widened DOWN to ~0.15 — the round-4 snap trace (docs/PARITY.md)
    # shows the engine's plane patch wipes the kick's momentum one step
    # after contact, and mu_plane=0.2 was the only knob that moved the
    # case-29 final (+0.0287 -> +0.0342 vs mj +0.0616)
    "mu_plane": (np.log10(0.5), 0.55),
    # r3c: widened DOWN — the r3b fit (0.836) sat against a floor of 0.40,
    # and case-level probes show the final alignment snap is finger-friction
    # bound: mu_finger 0.05 completes case 29's snap to +0.126 (mj saturates
    # +0.098) where 0.836 stalls it at +0.028. OUTCOME (grid_calib_3d.py):
    # every snap-completing setting explodes sustained-grip ratios 3-31x —
    # pooled score peaks back at the r3b fit; kept wide for completeness.
    "mu_finger": (np.log10(0.35), 0.55),
    # mu_torsion intentionally absent: inert in the Newton path (patch
    # contacts supply effective torsion; see engine3d.FITTED_3D_NEWTON note)
    "k_contact": (np.log10(6000.0), 0.8),
    # r3c: widened UP — b_contact 3000 (above the old 1265 cap) also
    # completes the snap (+0.111) by damping the approach instead of
    # locking the slide.
    # r4: widened DOWN to ~80 — MuJoCo's measured clamp press is solref
    # (0.02, 1): b_mj ~ 100, a critically-damped SUSTAINED press (fn ~ b*vn
    # over ~8 deepening steps), where the fitted 798 (d*b*dt = 1.44 > 1)
    # spikes once and recoils; the r3 search floor of 225 never saw the
    # soft regime with the rest of the calibration free to refit around it.
    "b_contact": (np.log10(475.0), 0.78),
    "unload": (np.log10(0.2), 0.7),
    "rough": (np.log10(40.0), 0.9),
    "c_r": (np.log10(0.05), 0.6),
}


def cls(x, th=0.02):
    return np.where(x > th, 2, np.where(x < -th, 0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=150)
    ap.add_argument("--refine", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(OUT, "calib3d_search.json"))
    ap.add_argument("--val_frac", type=float, default=1 / 3,
                    help="held-out case fraction (fit scores on train only)")
    ap.add_argument("--num_points", type=int, default=256,
                    help="per-object contact sample count (r4: 192 measured "
                         "1.39x faster at statistically identical pooled "
                         "fidelity, runs/calib/probe_points_3d.json)")
    ap.add_argument("--newton_iters", type=int,
                    default=pallas3d.NEWTON_KERNEL_ITERS3,
                    help="full-solve damped-Newton iterations to refit at "
                         "(round-5 throughput sweep: 6 -> 4 is +26%%, "
                         "6 -> 3 is +46%% rollouts/s)")
    args = ap.parse_args()

    d = np.load(os.path.join(OUT, "oracle3d_suite.npz"))
    # engine contacts the 12x2 envelope exactly (envelope3d.DEFAULT_DECOMPS)
    # -> fit against the 12x2 sim; the 12x3 run is the ceiling reference
    target = d["delta_theta_s12"]
    mask = d["upright_s12"].astype(bool)
    ths = d["thetas"]
    steps = int(d["steps"])
    scenes = []
    for i in range(len(d["yl"])):
        verts = d["verts"][i][: d["nv"][i]].astype(np.float64)
        faces = d["faces"][i][: d["nf"][i]]
        scenes.append(engine3d.make_scene(d["yl"][i], d["yr"][i], verts,
                                          faces,
                                          num_points=args.num_points))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)

    # pad the 16 suite thetas to one kernel LANE
    n_pad = pallas3d.LANE
    th_pad = np.zeros(n_pad, np.float32)
    th_pad[: len(ths)] = ths
    poses = jnp.asarray(np.stack([0 * th_pad, 0 * th_pad, th_pad], -1))

    def eval_calib(vals):
        calib = engine3d.default_calib3().replace(
            **{k: jnp.float32(v) for k, v in vals.items()})
        coefs, points, scal = pallas3d.scene_arrays_3d(stacked, calib=calib)
        dth, _, _, valid, _ = pallas3d.profile_batch_pallas3d(
            coefs, points, scal, poses, steps=steps, solver="newton",
            newton_iters=args.newton_iters)
        return np.asarray(dth)[:, : len(ths)]

    def score(en, case_idx=None):
        corrs, ratios, agrees = [], [], []
        cases = range(en.shape[0]) if case_idx is None else case_idx
        for i in cases:
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

    n_cases = target.shape[0]
    perm = np.random.RandomState(7).permutation(n_cases)
    n_val = int(round(args.val_frac * n_cases))
    val_idx = np.sort(perm[:n_val]).tolist()
    tr_idx = np.sort(perm[n_val:]).tolist()
    print(f"split: {len(tr_idx)} train / {len(val_idx)} val cases", flush=True)

    rng = np.random.RandomState(args.seed)

    def sample(center=None, shrink=1.0):
        vals = {}
        for k, (c, hw) in RANGES.items():
            if center is not None:
                c = np.log10(center[k])
            vals[k] = float(10 ** (c + rng.uniform(-hw, hw) * shrink))
        return vals

    results = []
    t0 = time.time()
    seeds = [dict(engine3d.FITTED_3D_NEWTON)]
    for trial in range(args.budget):
        vals = seeds[trial] if trial < len(seeds) else sample()
        en = eval_calib(vals)
        if not np.isfinite(en).all():
            continue
        tot, c, r, a = score(en, tr_idx)
        results.append((tot, c, r, a, vals, en))
        results.sort(key=lambda x: -x[0])
        if trial % 20 == 0 or (tot, c, r, a) == results[0][:4]:
            print(f"[{trial:3d}] {time.time()-t0:5.0f}s best {results[0][0]:+.3f} "
                  f"this corr {c:.3f} ratio {r:.2f} agree {a:.3f}", flush=True)
    for trial in range(args.refine):
        base = results[trial % min(3, len(results))][4]
        vals = sample(center=base, shrink=0.25)
        en = eval_calib(vals)
        if not np.isfinite(en).all():
            continue
        tot, c, r, a = score(en, tr_idx)
        results.append((tot, c, r, a, vals, en))
        results.sort(key=lambda x: -x[0])
    best = results[0]
    vt, vc, vr, va = score(best[5], val_idx)
    ft, fc, fr, fa = score(best[5])
    out = {"fitted": best[4],
           "train": {"cases": len(tr_idx), "score": best[0], "corr": best[1],
                     "ratio": best[2], "agree": best[3]},
           "val": {"cases": len(val_idx), "score": vt, "corr": vc,
                   "ratio": vr, "agree": va},
           "full": {"score": ft, "corr": fc, "ratio": fr, "agree": fa},
           "score": ft, "corr": fc, "ratio": fr, "agree": fa,
           "newton_iters": args.newton_iters,
           "num_points": args.num_points,
           "budget": args.budget + args.refine}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()

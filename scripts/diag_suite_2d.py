"""Per-case fidelity diagnostics for the 2D engine vs the MuJoCo suite.

Reports per-family and per-case (corr, ratio, agree) against the
decomposition-mean target, plus the worst cases — where to look for missing
physics. Optionally dumps engine-vs-oracle profiles for the worst cases.

    python scripts/diag_suite_2d.py [--calib runs/calib/calib2d.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.sim import engine2d

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")
FAMILIES = ("star", "ellipse", "polygon", "peanut", "notch")


def sm(x, w=5):
    k = np.ones(w) / w
    return np.convolve(np.concatenate([x[-w:], x, x[:w]]), k, "same")[w:-w]


def cls(x, th=0.03):
    return np.where(x > th, 2, np.where(x < -th, 0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calib", default=None)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--dump", type=int, default=0, help="dump N worst profiles")
    ap.add_argument("--upsample", type=int, default=1)
    ap.add_argument("--steps", type=int, default=0, help="override rollout steps")
    ap.add_argument("--iters", type=int, default=0, help="override solver iters")
    ap.add_argument("--solver", default=None, choices=("jacobi", "newton"))
    args = ap.parse_args()

    if args.iters:
        engine2d.SOLVER_ITERS = args.iters
    if args.solver:
        engine2d.SOLVER = args.solver
    d = np.load(os.path.join(OUT, "oracle2d_suite.npz"))
    alt = np.load(os.path.join(OUT, "oracle2d_suite_s100.npz"))["delta_theta"]
    mj50 = d["delta_theta"]
    target = 0.5 * (mj50 + alt)
    ths = d["thetas"]
    steps = args.steps or int(d["steps"])

    calib = engine2d.default_calib()
    if args.calib:
        with open(args.calib) as f:
            fitted = json.load(f)["fitted"]
        calib = calib.replace(**{k: jnp.float32(v) for k, v in fitted.items()})

    scenes = [engine2d.make_scene(yl, yr, c, contour_upsample=args.upsample)
              for yl, yr, c in zip(d["yl"], d["yr"], d["contours"])]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    poses = jnp.asarray(
        np.stack([np.zeros_like(ths), np.zeros_like(ths), ths], -1), jnp.float32)

    fn = jax.jit(lambda sc: engine2d.profile_batch(sc, poses, steps=steps,
                                                   calib=calib)[0])
    en = []
    n = mj50.shape[0]
    for s in range(0, n, args.chunk):
        sub = jax.tree.map(lambda x: x[s:s + args.chunk], stacked)
        en.append(np.asarray(fn(sub)))
    en = np.concatenate(en)

    rows = []
    for i in range(n):
        e, m = en[i], target[i]
        se, smm = sm(e), sm(m)
        c = np.corrcoef(se, smm)[0, 1]
        c = 0.0 if not np.isfinite(c) else c
        rows.append({
            "case": i, "family": FAMILIES[i % 5],
            "corr": float(c),
            "ratio": float(e.std() / max(m.std(), 1e-9)),
            "agree": float((cls(e) == cls(m)).mean()),
            "mj_std": float(m.std()),
            # MuJoCo self-agreement for this case (decomposition ceiling)
            "ceil_corr": float(np.nan_to_num(
                np.corrcoef(sm(mj50[i]), sm(alt[i]))[0, 1])),
            "ceil_agree": float((cls(mj50[i]) == cls(alt[i])).mean()),
        })

    sig = [r for r in rows if r["mj_std"] > 0.01]
    print(f"{len(sig)}/{n} cases with oracle signal (std>0.01)")
    print(f"{'family':8s} {'n':>2s} {'corr':>6s} {'ceil':>6s} "
          f"{'ratio':>6s} {'agree':>6s} {'ceilA':>6s}")
    for fam in FAMILIES:
        fr = [r for r in sig if r["family"] == fam]
        fa = [r for r in rows if r["family"] == fam]
        if not fr:
            continue
        print(f"{fam:8s} {len(fr):2d} "
              f"{np.mean([r['corr'] for r in fr]):6.3f} "
              f"{np.mean([r['ceil_corr'] for r in fr]):6.3f} "
              f"{np.median([r['ratio'] for r in fr]):6.3f} "
              f"{np.mean([r['agree'] for r in fa]):6.3f} "
              f"{np.mean([r['ceil_agree'] for r in fa]):6.3f}")
    print(f"{'ALL':8s} {len(sig):2d} "
          f"{np.mean([r['corr'] for r in sig]):6.3f} "
          f"{np.mean([r['ceil_corr'] for r in sig]):6.3f} "
          f"{np.median([r['ratio'] for r in sig]):6.3f} "
          f"{np.mean([r['agree'] for r in rows]):6.3f} "
          f"{np.mean([r['ceil_agree'] for r in rows]):6.3f}")

    worst = sorted(sig, key=lambda r: r["corr"])[:12]
    print("\nworst cases by corr:")
    for r in worst:
        print(f"  case {r['case']:2d} {r['family']:8s} corr {r['corr']:+.3f} "
              f"(ceil {r['ceil_corr']:+.3f}) ratio {r['ratio']:.2f} "
              f"agree {r['agree']:.2f} mj_std {r['mj_std']:.3f}")

    if args.dump:
        os.makedirs(os.path.join(OUT, "diag"), exist_ok=True)
        for r in worst[:args.dump]:
            i = r["case"]
            np.savez(os.path.join(OUT, "diag", f"case{i:02d}.npz"),
                     en=en[i], mj50=mj50[i], mj100=alt[i], thetas=ths)
        print(f"dumped {args.dump} worst-case profiles to runs/calib/diag/")


if __name__ == "__main__":
    main()

"""Probe the ear-clip crack-fan anchor model on the 2D oracle suite.

The round-2 decisive experiment showed the per-orientation snap direction
beyond corr ~0.45 is carried by the crack topology of ONE PARTICULAR object
triangulation (docs/PARITY.md): MuJoCo agrees with itself at only 0.218
across object decompositions, and the engine's decomposition-agnostic
crack capture (uniform ``rough``) matches that cross-decomposition
ceiling (0.419). This probe tests the 3D-envelope playbook applied to 2D:
model the oracle's ACTUAL ear-clip decomposition, per-vertex, via
``Scene2D.anchor`` (geom/polygon.py:earclip_anchor_weights).

The falsifiable prediction: an engine built with the DEFAULT triangulation
anchors should score higher against the default-triangulation oracle
(suite s50) than the uniform engine does, while an engine built with the
ROLLED triangulation anchors should score higher against the rolled-start
oracle (objroll) — and the cross pairings should NOT improve.

    python scripts/probe_anchor_2d.py
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


def sm(x, w=5):
    k = np.ones(w) / w
    return np.convolve(np.concatenate([x[-w:], x, x[:w]]), k, "same")[w:-w]


def cls(x, th=0.03):
    return np.where(x > th, 2, np.where(x < -th, 0, 1))


def score(en, target):
    corrs, ratios, agrees = [], [], []
    for i in range(en.shape[0]):
        e, m = en[i], target[i]
        if m.std() <= 0.01:
            continue
        c = np.corrcoef(sm(e), sm(m))[0, 1]
        corrs.append(0.0 if not np.isfinite(c) else c)
        ratios.append(e.std() / max(m.std(), 1e-9))
        agrees.append((cls(e) == cls(m)).mean())
    return (float(np.mean(corrs)), float(np.median(ratios)),
            float(np.mean(agrees)), len(corrs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--gain", type=float, default=1.0,
                    help="extra exponent on the anchor weights")
    ap.add_argument("--out", default=os.path.join(OUT, "probe_anchor_2d.json"))
    args = ap.parse_args()

    d = np.load(os.path.join(OUT, "oracle2d_suite.npz"))
    tgt_std = d["delta_theta"]                       # default triangulation
    tgt_roll = np.load(
        os.path.join(OUT, "oracle2d_suite_objroll.npz"))["delta_theta"]
    ths = d["thetas"]
    steps = int(d["steps"])
    poses = jnp.asarray(
        np.stack([np.zeros_like(ths), np.zeros_like(ths), ths], -1),
        jnp.float32)
    calib = engine2d.default_calib()

    def run_suite(triangulation):
        scenes = []
        for yl, yr, c in zip(d["yl"], d["yr"], d["contours"]):
            sc = engine2d.make_scene(yl, yr, c, triangulation=triangulation)
            if args.gain != 1.0 and triangulation != "uniform":
                sc = sc.replace(anchor=jnp.asarray(
                    np.asarray(sc.anchor) ** args.gain, jnp.float32))
            scenes.append(sc)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
        fn = jax.jit(lambda s: engine2d.profile_batch(
            s, poses, steps=steps, calib=calib)[0])
        en = []
        for s in range(0, len(scenes), args.chunk):
            sub = jax.tree.map(lambda x: x[s:s + args.chunk], stacked)
            en.append(np.asarray(fn(sub)))
        return np.concatenate(en)

    rows = {}
    # make_scene's "uniform" triangulation yields anchor == 1 exactly
    # (decomposition-agnostic), so all three variants go through run_suite.
    variants = ("uniform", "default", "rolled")
    for name in variants:
        en = run_suite(name)
        for tname, tgt in (("s50", tgt_std), ("objroll", tgt_roll)):
            c, r, a, n = score(en, tgt)
            rows[f"{name}->{tname}"] = {"corr": c, "ratio": r, "agree": a}
            print(f"{name:8s} -> {tname:8s}: corr {c:.3f} ratio {r:.3f} "
                  f"agree {a:.3f}  (n={n})", flush=True)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()

"""Probe: does MuJoCo's slab-hull geometry (not the smooth spline) decide the
snap-onset torque direction?

Replaces the engine's smooth-spline finger heightfield with the 50-slab
convex-hull envelope (per-slab upper convex envelope of the inner curve =
the face MuJoCo's hulls actually present to the object) and measures suite
correlation vs the 50-slab oracle specifically. A large jump = the fidelity
gap is first-touch geometry; flat = the gap is elsewhere.

    python scripts/probe_slab_heightfield.py [--solver newton] [--slabs 50]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import GRIPPER_2D
from dgdm_tpu.sim import engine2d

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")


class SlabEnvelopeSpline:
    """Drop-in for geom.spline.CubicSplineFamily.evaluate_with_derivative:
    evaluates the per-slab upper convex envelope of the cubic curve on a
    dense grid, then answers queries by linear interpolation.

    ``sign`` = +1 for the left finger (object above: upper envelope),
    -1 for the right (lower envelope). The engine calls one shared object
    for both fingers, so we dispatch on a wrapper pair instead."""

    def __init__(self, base, num_slabs, sign):
        g = GRIPPER_2D
        self.base = base
        self.sign = float(sign)
        self.n_grid = g.num_curve_points                       # 200
        self.xg = np.linspace(g.ctrl_x_min, g.ctrl_x_max, self.n_grid)
        self.dx = self.xg[1] - self.xg[0]
        bounds = np.linspace(0, self.n_grid - 1, num_slabs + 1).astype(int)
        self.spans = [(bounds[i], bounds[i + 1]) for i in range(num_slabs)]
        self.xg_j = jnp.asarray(self.xg, jnp.float32)

    def _envelope(self, y):
        """Upper convex envelope per slab, evaluated at the grid points.
        env_j = max over chords (i,k) spanning j of the chord value at x_j."""
        sgn = self.sign
        y = sgn * y
        out = y
        for lo, hi in self.spans:
            xs = self.xg[lo:hi + 1]
            ys = y[lo:hi + 1]
            m = len(xs)
            vals = [ys]
            for i in range(m):
                for k in range(i + 2, m):
                    tfrac = (xs[i + 1:k] - xs[i]) / (xs[k] - xs[i])
                    chord = ys[i] * (1 - tfrac) + ys[k] * tfrac
                    pad = jnp.concatenate([
                        jnp.full(i + 1, -jnp.inf), chord,
                        jnp.full(m - k, -jnp.inf),
                    ])
                    vals.append(pad)
            env = jnp.max(jnp.stack(vals), axis=0)
            out = out.at[lo:hi + 1].set(jnp.maximum(out[lo:hi + 1], env))
        return sgn * out

    def evaluate_with_derivative(self, coef, x):
        yg = self.base.evaluate_with_derivative(coef, self.xg_j)[0]
        yg = self._envelope(yg)
        u = (x - self.xg[0]) / self.dx
        j = jnp.clip(u.astype(jnp.int32), 0, self.n_grid - 2)
        f = u - j
        y0, y1 = yg[j], yg[j + 1]
        slope = (y1 - y0) / self.dx
        return y0 + f * (y1 - y0), slope


class PairDispatch:
    """engine2d calls _SPLINE once per finger with different coefs; we track
    which call is which by order (left first — see _finger_contacts)."""

    def __init__(self, left, right):
        self.left, self.right = left, right
        self._flip = 0

    def evaluate_with_derivative(self, coef, x):
        ev = self.left if self._flip % 2 == 0 else self.right
        self._flip += 1
        return ev.evaluate_with_derivative(coef, x)


def sm(x, w=5):
    k = np.ones(w) / w
    return np.convolve(np.concatenate([x[-w:], x, x[:w]]), k, "same")[w:-w]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="newton")
    ap.add_argument("--slabs", type=int, default=50)
    ap.add_argument("--cases", type=int, default=24)
    ap.add_argument("--calib", default=os.path.join(OUT, "calib2d_newton.json"))
    args = ap.parse_args()
    engine2d.SOLVER = args.solver

    d = np.load(os.path.join(OUT, "oracle2d_suite.npz"))
    mj50 = d["delta_theta"]
    ths = d["thetas"]
    steps = int(d["steps"])
    poses = jnp.asarray(np.stack([0 * ths, 0 * ths, ths], -1), jnp.float32)

    calib = engine2d.default_calib()
    if args.calib and os.path.exists(args.calib):
        with open(args.calib) as f:
            fitted = json.load(f)["fitted"]
        calib = calib.replace(**{k: jnp.float32(v) for k, v in fitted.items()})

    idx = [i for i in range(len(mj50)) if mj50[i].std() > 0.01][: args.cases]

    base = engine2d._SPLINE
    disp = PairDispatch(SlabEnvelopeSpline(base, args.slabs, +1),
                        SlabEnvelopeSpline(base, args.slabs, -1))

    def run(spline):
        jax.clear_caches()   # engine2d.profile is module-jitted; force retrace
        engine2d._SPLINE = spline
        fn = jax.jit(lambda sc: engine2d.profile(sc, poses, steps=steps,
                                                 calib=calib)[0])
        prof = []
        for i in idx:
            sc = engine2d.make_scene(d["yl"][i], d["yr"][i], d["contours"][i])
            prof.append(np.asarray(fn(sc)))
        engine2d._SPLINE = base
        return np.stack(prof)

    en_smooth = run(base)
    en_slab = run(disp)

    for name, en in (("smooth", en_smooth), ("slab-env", en_slab)):
        cs, rs = [], []
        for k, i in enumerate(idx):
            c = np.corrcoef(sm(en[k]), sm(mj50[i]))[0, 1]
            cs.append(0.0 if not np.isfinite(c) else c)
            rs.append(en[k].std() / mj50[i].std())
        print(f"{name:9s} vs mj50: corr {np.mean(cs):.3f} "
              f"ratio {np.median(rs):.3f} (n={len(idx)})")


if __name__ == "__main__":
    main()

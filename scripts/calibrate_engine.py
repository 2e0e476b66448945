"""Gradient-based calibration of the 2D contact engine against MuJoCo.

The engine is end-to-end differentiable (a capability the reference's MuJoCo
pipeline lacks entirely), so its effective-parameter knobs (``engine2d.Calib``:
frictions, elastic contact gains, plane-unloading gain) are FITTED to oracle
interaction profiles by gradient descent instead of hand-tuning. The contact
gains absorb MuJoCo's decomposition multiplicity (overlapping geom pairs on
one physical patch multiply its effective stiffness ~10-30x — see
docs/PARITY.md), which is why their fitted values sit far above the nominal
solref gains.

    python scripts/build_oracle_suite.py --cases 60     # once (slow, MuJoCo)
    python scripts/calibrate_engine.py                  # fit + held-out eval

Writes fitted parameters + before/after train/val statistics to
runs/calib/calib2d.json. Loss = smoothed-profile MSE (suppresses the
contact-chaos component; see docs/PARITY.md) + soft 3-class agreement term.
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
SUITE = os.path.join(OUT, "oracle2d_suite.npz")


def smooth_circular(x, w=5):
    """Circular moving average along the last (orientation) axis."""
    k = jnp.ones(w) / w
    pad = jnp.concatenate([x[..., -w:], x, x[..., :w]], axis=-1)
    out = jnp.apply_along_axis(lambda v: jnp.convolve(v, k, "same"), -1, pad)
    return out[..., w:-w]


def soft_class(x, th=0.03, tau=0.012):
    """Differentiable 3-class surrogate: ~-2 (cw), 0 (none), +2 (ccw)."""
    return jnp.tanh((x - th) / tau) + jnp.tanh((x + th) / tau)


def stats(en, mj, th=0.03):
    """Per-case fidelity statistics (numpy)."""
    def sm(x, w=5):
        k = np.ones(w) / w
        return np.convolve(np.concatenate([x[-w:], x, x[:w]]), k, "same")[w:-w]

    def cls(x):
        return np.where(x > th, 2, np.where(x < -th, 0, 1))

    corrs, ratios, agrees = [], [], []
    for e, m in zip(en, mj):
        se, sm_ = sm(e), sm(m)
        c = np.corrcoef(se, sm_)[0, 1]
        # cases with no oracle signal (symmetric objects that barely move)
        # carry no correlation/ratio information
        if m.std() > 0.01:
            corrs.append(0.0 if not np.isfinite(c) else c)
            ratios.append(e.std() / m.std())
        agrees.append((cls(e) == cls(m)).mean())
    return (float(np.mean(corrs)), float(np.median(ratios)),
            float(np.mean(agrees)))


def load_suite(path=SUITE):
    """Returns (scenes, thetas, target, steps, alt) where ``target`` is the
    MEAN of the 50- and 100-slab oracle profiles when both suites exist —
    fitting against one decomposition alone overfits its specific contact
    noise (measured: corr 0.51 to the fitted decomposition vs 0.29 to the
    other); the mean estimates the shared deterministic signal. ``alt`` is
    the 100-slab profile for held-out decomposition evaluation."""
    d = np.load(path)
    scenes = [
        engine2d.make_scene(yl, yr, c)
        for yl, yr, c in zip(d["yl"], d["yr"], d["contours"])
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    target = d["delta_theta"]
    alt = None
    alt_path = path.replace(".npz", "_s100.npz")
    if os.path.exists(alt_path):
        alt = np.load(alt_path)["delta_theta"]
        target = 0.5 * (target + alt)
    return stacked, d["thetas"], target, int(d["steps"]), alt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt_steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.06)
    ap.add_argument("--chunk", type=int, default=6, help="cases per grad eval")
    # NOT a multiple of 5: the suite cycles 5 shape families, so stride-5
    # holdout would alias to a single family
    ap.add_argument("--holdout_every", type=int, default=6)
    ap.add_argument("--cls_weight", type=float, default=0.25)
    ap.add_argument("--init_mult", type=float, default=8.0,
                    help="initial contact-gain multiplicity")
    ap.add_argument("--init_unload", type=float, default=1.0)
    ap.add_argument("--init_rough", type=float, default=30.0)
    ap.add_argument("--init_json", type=str, default=None,
                    help="warm-start from a previous calib2d.json 'fitted'")
    ap.add_argument("--solver", default=None, choices=("jacobi", "newton"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.solver:
        engine2d.SOLVER = args.solver
    os.makedirs(OUT, exist_ok=True)

    scenes, ths, mj, steps, mj_alt = load_suite()
    n_cases = mj.shape[0]
    val_idx = np.arange(0, n_cases, args.holdout_every)
    train_idx = np.setdiff1d(np.arange(n_cases), val_idx)
    print(f"{n_cases} cases: {len(train_idx)} train / {len(val_idx)} val",
          flush=True)

    poses = jnp.asarray(
        np.stack([np.zeros_like(ths), np.zeros_like(ths), ths], -1), jnp.float32
    )

    ck_step = jax.checkpoint(engine2d.step, static_argnums=(3,))

    def case_profile(calib, scene):
        def one(pose):
            state = engine2d.init_state(scene, pose)
            ctrl = jnp.array([0.2, -0.2], jnp.float32)

            def body(s, _):
                return ck_step(scene, s, ctrl, 0.002, None, calib), None

            state, _ = jax.lax.scan(body, state, None, length=steps)
            dth = state.theta - pose[2]
            return dth - 2 * jnp.pi * jnp.round(dth / (2 * jnp.pi))

        return jax.vmap(one)(poses)

    def chunk_loss(log_p, scenes_chunk, mj_chunk):
        """Metric-aligned: correlation + log-magnitude + soft class terms.
        (A plain profile MSE is minimized by SHRINKING amplitude whenever
        correlation is imperfect — regression to the mean — which is exactly
        the failure mode the held-out ratio metric would flag.)"""
        calib = jax.tree.map(jnp.exp, log_p)
        en = jax.vmap(lambda sc: case_profile(calib, sc))(scenes_chunk)
        se = smooth_circular(en)
        sm = smooth_circular(mj_chunk)
        sec = se - se.mean(-1, keepdims=True)
        smc = sm - sm.mean(-1, keepdims=True)
        nse = sec * jax.lax.rsqrt(jnp.sum(sec**2, -1, keepdims=True) + 1e-8)
        nsm = smc * jax.lax.rsqrt(jnp.sum(smc**2, -1, keepdims=True) + 1e-8)
        sig = jnp.sqrt(jnp.mean(smc**2, -1))          # per-case oracle signal
        w = sig / (sig + 0.01)                        # downweight no-signal
        corr_l = jnp.mean(w * (1.0 - jnp.sum(nse * nsm, -1)))
        std_en = jnp.sqrt(jnp.var(en, -1) + 1e-8)   # sqrt(var+eps): finite
        std_mj = jnp.sqrt(jnp.var(mj_chunk, -1) + 1e-8)  # grad at zero signal
        mag_l = jnp.mean(w * jnp.log(std_en / std_mj) ** 2)
        cls = jnp.mean((soft_class(en) - soft_class(mj_chunk)) ** 2)
        return corr_l + 0.5 * mag_l + args.cls_weight * cls

    grad_fn = jax.jit(jax.value_and_grad(chunk_loss))
    profile_fn = jax.jit(
        lambda log_p, sc: jax.vmap(
            lambda s: case_profile(jax.tree.map(jnp.exp, log_p), s)
        )(sc)
    )

    def take(tree, idx):
        return jax.tree.map(lambda x: x[idx], tree)

    init = engine2d.default_calib().replace(
        k_contact=jnp.float32(engine2d.K_CONTACT * args.init_mult),
        b_contact=jnp.float32(engine2d.B_CONTACT * args.init_mult),
        unload=jnp.float32(args.init_unload),
        rough=jnp.float32(args.init_rough),
    )
    if args.init_json:
        with open(args.init_json) as f:
            fitted0 = json.load(f)["fitted"]
        init = init.replace(**{k: jnp.float32(v) for k, v in fitted0.items()})
    lp = jax.tree.map(jnp.log, init)

    def eval_split(lp, idx, label):
        en = []
        for s in range(0, len(idx), args.chunk):
            ii = idx[s: s + args.chunk]
            en.append(np.asarray(profile_fn(lp, take(scenes, ii))))
        en = np.concatenate(en)
        c, r, a = stats(en, mj[idx])
        out = {"corr": c, "ratio": r, "agree": a}
        msg = f"  {label}: corr {c:.3f} ratio {r:.3f} agree {a:.3f}"
        if mj_alt is not None:
            c2, r2, a2 = stats(en, mj_alt[idx])
            out["corr_alt_decomp"] = c2
            out["agree_alt_decomp"] = a2
            msg += f" | vs-100-slab corr {c2:.3f} agree {a2:.3f}"
        print(msg, flush=True)
        return out

    print("before fit:", flush=True)
    before = {
        "train": eval_split(lp, train_idx, "train"),
        "val": eval_split(lp, val_idx, "val"),
    }

    import optax

    tx = optax.chain(
        optax.zero_nans(), optax.clip_by_global_norm(3.0), optax.adam(args.lr)
    )
    opt_state = tx.init(lp)
    rng = np.random.RandomState(0)
    mjj = jnp.asarray(mj)
    for it in range(args.opt_steps):
        ii = rng.choice(train_idx, size=args.chunk, replace=False)
        loss, g = grad_fn(lp, take(scenes, ii), mjj[ii])
        updates, opt_state = tx.update(g, opt_state)
        lp = jax.tree.map(lambda a, b: a + b, lp, updates)
        if it % 5 == 0:
            vals = {k: float(np.exp(v)) for k, v in
                    zip(engine2d.CALIB_FIELDS, jax.tree.leaves(lp))}
            print(f"step {it}: loss {float(loss):.4f} {vals}", flush=True)

    print("after fit:", flush=True)
    after = {
        "train": eval_split(lp, train_idx, "train"),
        "val": eval_split(lp, val_idx, "val"),
    }
    fitted = jax.tree.map(lambda v: float(jnp.exp(v)), lp)
    result = {
        "fitted": {k: getattr(fitted, k) for k in engine2d.CALIB_FIELDS},
        "init": {k: float(getattr(init, k)) for k in engine2d.CALIB_FIELDS},
        "before": before,
        "after": after,
        "n_cases": int(n_cases),
        "opt_steps": args.opt_steps,
    }
    with open(args.out or os.path.join(OUT, "calib2d.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1), flush=True)


if __name__ == "__main__":
    main()

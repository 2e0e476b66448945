"""Probe the three ballistic-snap friction gates on the 3D oracle suite.

MuJoCo's final clamp snap is a discrete impulse exchange (pinch kick ->
free spin -> far-corner slam; docs/PARITY.md r3) that the engine's
sustained Coulomb caps brake — measured: the stall is friction-bound, but
no GLOBAL mu serves both the snap and sustained-grip regimes (focused
(mu_finger, b_contact) grid, r3). This probe sweeps three STATE-GATED
friction reductions, each an exact no-op at its Calib default:

  A. lam_sat       — per-point friction capacity saturates past a normal
                     impulse lam_sat (the snap drives 4.6-6.6 N through ONE
                     contact; sustained grips spread force over the patch)
  B. om_release    — finger mu decays toward mu_ballistic with body spin
                     (the snap spins to ~1 rad/s; sustained creep ~1e-2)
  C. v_gate        — per-contact closing-speed gate (corner slams close at
                     omega x r >> the actuator feed speed)

Runs the pure-JAX engine over the full 30-case suite per config and prints
pooled corr/ratio/agree plus the snap-family cases (4, 7, 17, 25, 27, 29
— every ratio < 0.7 in runs/calib/diag3d_cases_r3b.json).

    python scripts/probe_snap_3d.py [--gate A|B|C|all]
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

from dgdm_tpu.sim import engine3d

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "calib")
FAMILY = (4, 7, 17, 25, 27, 29)


def cls(x, th=0.02):
    return np.where(x > th, 2, np.where(x < -th, 0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", default="all")
    ap.add_argument("--chunk", type=int, default=6)
    ap.add_argument("--out", default=os.path.join(OUT, "probe_snap_3d.json"))
    args = ap.parse_args()

    d = np.load(os.path.join(OUT, "oracle3d_suite.npz"))
    target = d["delta_theta_s12"]
    mask = d["upright_s12"].astype(bool)
    ths = d["thetas"]
    steps = int(d["steps"])
    scenes = []
    for i in range(len(d["yl"])):
        verts = d["verts"][i][: d["nv"][i]].astype(np.float64)
        faces = d["faces"][i][: d["nf"][i]]
        scenes.append(engine3d.make_scene(d["yl"][i], d["yr"][i], verts,
                                          faces, num_points=256))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    poses = jnp.asarray(np.stack([0 * ths, 0 * ths, ths], -1), jnp.float32)

    def run(calib):
        en = []
        for s in range(0, len(scenes), args.chunk):
            sub = jax.tree.map(lambda x: x[s:s + args.chunk], stacked)
            dth = engine3d.profile_batch(sub, poses, steps=steps, calib=calib)[0]
            en.append(np.asarray(dth))
        return np.concatenate(en)

    def score(en):
        corrs, ratios, agrees, fam = [], [], [], {}
        for i in range(en.shape[0]):
            v = mask[i]
            e, t = en[i][v], target[i][v]
            if v.sum() < 6:
                continue
            a = float((cls(e) == cls(t)).mean())
            agrees.append(a)
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

    base = engine3d.default_calib3()
    configs = [("baseline", {})]
    if args.gate in ("A", "all"):
        for ls in (0.003, 0.01, 0.03, 0.1):
            configs.append((f"A lam_sat={ls}", {"lam_sat": ls}))
    if args.gate in ("B", "all"):
        for om0, mb in ((5.0, 0.3), (10.0, 0.3), (20.0, 0.3),
                        (10.0, 0.1), (20.0, 0.1)):
            configs.append((f"B om_release={om0} mu_b={mb}",
                            {"om_release": om0, "mu_ballistic": mb}))
    if args.gate in ("C", "all"):
        for vg, mb in ((0.05, 0.3), (0.1, 0.3), (0.2, 0.3),
                       (0.1, 0.1)):
            configs.append((f"C v_gate={vg} mu_b={mb}",
                            {"v_gate": vg, "mu_ballistic": mb}))
    if args.gate == "D":
        # sustained-press hypothesis (diag_snap3d.py case 29): the fitted
        # b_contact=798 gives d*b*dt = 1.44 > 1 — finger contacts REVERSE
        # closing velocity in one step (restitutive spike), slamming the
        # object into the plane (friction brake) and recoiling the jaw.
        # MuJoCo's solref (0.02, 1) is critically damped: b_eff ~ 100,
        # absorbing the press over ~10 steps at sustained ~8 N. The search
        # never explored b < 225 (RANGES halfwidth).
        for b in (100.0, 200.0, 350.0, 500.0):
            configs.append((f"D b_contact={b}", {"b_contact": b}))
        for b, k in ((100.0, 2500.0), (150.0, 2500.0)):
            configs.append((f"D b={b} k={k}",
                            {"b_contact": b, "k_contact": k}))
    if args.gate == "P":
        # plane-friction binding hypothesis: MuJoCo's snap is semi-airborne
        # (pinch kick pops the object off the plane -> near-zero plane force
        # mid-snap), while the engine's overdamped plane patch stays planted
        # and brakes the spin through distributed plane friction.
        for mp in (0.45, 0.3, 0.15):
            configs.append((f"P mu_plane={mp}", {"mu_plane": mp}))
        for un in (0.6, 1.5, 4.0):
            configs.append((f"P unload={un}", {"unload": un}))

    if args.gate == "Z":
        # plane-row-only enforcement stiffening (tilt bracing): global c_r
        # division combined with the inverse finger multiplicity leaves
        # finger rows unchanged and stiffens ONLY the plane patch — the
        # hypothesis that MuJoCo's 2.6x contact-force amplification is the
        # plane rows rigidifying tilt (m_eff 0.14 -> 0.8 at the kick).
        for k in (2.0, 4.0, 8.0):
            configs.append((f"Z plane x{k}",
                            {"c_r": 0.137570 / k, "w_fmult": 1.0 / k}))
    if args.gate == "Y":
        # pyramidal-cone finger contacts (step_newton3_pyramid) — the
        # structural candidate from the round-3b measurement.
        for vals in ({}, {"b_contact": 100.0}, {"b_contact": 350.0},
                     {"mu_finger": 0.5}, {"mu_finger": 1.0},
                     {"c_r": 0.0526}, {"c_r": 0.0526, "b_contact": 100.0},
                     {"mu_finger": 1.0, "c_r": 0.0526}):
            configs.append((f"Y pyr {vals}", {"_SOLVER3": "pyramid", **vals}))
    if args.gate == "W":
        # finger-row-only enforcement multiplicity (the E probe divided c_r
        # GLOBALLY, over-stiffening the already point-multiplied plane
        # patch; the pyramid-edge multiplicity belongs to finger rows).
        for wf in (2.0, 3.0, 4.0):
            configs.append((f"W w_fmult={wf}", {"w_fmult": wf}))
        configs.append(("W w_fmult=3 b=350",
                        {"w_fmult": 3.0, "b_contact": 350.0}))
        configs.append(("W w_fmult=3 b=100",
                        {"w_fmult": 3.0, "b_contact": 100.0}))
    if args.gate == "E":
        # pyramid-edge multiplicity: a MuJoCo condim-4 pyramidal contact is
        # 4 edge rows all containing the normal direction — parallel
        # compliances, so the effective per-contact stiffness is 2-4x the
        # single-row R = (1-d)/d * A_ii. Engine equivalent: divide c_r.
        for cr in (0.069, 0.034, 0.017):
            configs.append((f"E c_r={cr}", {"c_r": cr}))
        configs.append(("E c_r=0.034 b=350",
                        {"c_r": 0.034, "b_contact": 350.0}))
        configs.append(("E c_r=0.034 b=100 k=2500",
                        {"c_r": 0.034, "b_contact": 100.0,
                         "k_contact": 2500.0}))
    if args.gate == "R":
        # ram-contact inelastic absorption: blend fast-closing finger-row
        # velocity targets toward 0 (rigid inelastic momentum exchange).
        for ram in (0.3, 0.6, 0.85, 1.0):
            configs.append((f"R ram={ram}", {"ram": ram}))
        configs.append(("R ram=1.0 b=350",
                        {"ram": 1.0, "b_contact": 350.0}))
    if args.gate == "U":
        # bracing hypothesis (diag_snap3d.py solver internals): MuJoCo
        # needs 2.6x more force for the same closing-velocity decay — its
        # object is braced by plane friction (XML mu=1.0 vs fitted 0.699),
        # so the ram push converts to rotation about the braced pivot
        # instead of y-translation escape. Sweep plane/finger mu UP.
        for mp in (1.0, 1.4):
            configs.append((f"U mu_plane={mp}", {"mu_plane": mp}))
        configs.append(("U mu_p=1.0 mu_f=1.0",
                        {"mu_plane": 1.0, "mu_finger": 1.0}))
        configs.append(("U mu_p=1.0 b=100",
                        {"mu_plane": 1.0, "b_contact": 100.0}))
        configs.append(("U mu_p=1.0 mu_f=1.0 b=100",
                        {"mu_plane": 1.0, "mu_finger": 1.0,
                         "b_contact": 100.0}))
    if args.gate == "K":
        # clamp-regime coupled bracing (round 4): fast-closing finger rows'
        # enforcement amplified by the plane-braced admittance ratio
        # a_nn/a_b (full Delassus Schur complement over the plane block) —
        # the geometry-derived, regime-gated version of the W/E scalar
        # multiplicity probes, targeting MuJoCo's measured ~2.6x coupled
        # force amplification in the snap.
        for ck in (0.25, 0.5, 1.0):
            configs.append((f"K clamp_k={ck}", {"clamp_k": ck}))
        configs.append(("K ck=1 ram=0.85",
                        {"clamp_k": 1.0, "ram": 0.85}))
        configs.append(("K ck=1 ram=1.0",
                        {"clamp_k": 1.0, "ram": 1.0}))
        configs.append(("K ck=0.5 ram=0.85",
                        {"clamp_k": 0.5, "ram": 0.85}))
        configs.append(("K ck=1 b=350",
                        {"clamp_k": 1.0, "b_contact": 350.0}))
        configs.append(("K ck=1 ram=0.85 b=350",
                        {"clamp_k": 1.0, "ram": 0.85, "b_contact": 350.0}))
    if args.gate == "K2":
        # clamp-press velocity-level coupled solve (round 4): gated target
        # override to MuJoCo's critically-damped solref decay + gated
        # weight boost (scalar clamp_w or braced clamp_k) — the sustained
        # 8-step press the round-3b measurement shows, enforced against
        # the plane-braced effective mass.
        for cp in (0.5, 1.0):
            configs.append((f"K2 press={cp}", {"clamp_press": cp}))
        for cw in (3.0, 8.0, 20.0):
            configs.append((f"K2 press=1 w={cw}",
                            {"clamp_press": 1.0, "clamp_w": cw}))
        configs.append(("K2 press=1 ck=1",
                        {"clamp_press": 1.0, "clamp_k": 1.0}))
        configs.append(("K2 press=1 ck=1 w=3",
                        {"clamp_press": 1.0, "clamp_k": 1.0,
                         "clamp_w": 3.0}))
        configs.append(("K2 press=1 ck=1 w=8",
                        {"clamp_press": 1.0, "clamp_k": 1.0,
                         "clamp_w": 8.0}))
        configs.append(("K2 w=8 (no press)", {"clamp_w": 8.0}))
    if args.gate == "Q":
        # corner-support plane contact (round 4): plane-row weight
        # concentrated on the footprint hull corners (scene.bottom_w),
        # total patch stiffness preserved — the structural version of the
        # tilt-brace/pivot-lift finding in the round-4 snap trace.
        for pc in (0.5, 1.0):
            configs.append((f"Q plane_corner={pc}", {"plane_corner": pc}))
        configs.append(("Q pc=1 mu_p=0.35",
                        {"plane_corner": 1.0, "mu_plane": 0.35}))
        configs.append(("Q pc=1 mu_p=0.2",
                        {"plane_corner": 1.0, "mu_plane": 0.2}))
        configs.append(("Q pc=1 ram=0.85",
                        {"plane_corner": 1.0, "ram": 0.85}))
        configs.append(("Q pc=1 b=350",
                        {"plane_corner": 1.0, "b_contact": 350.0}))
        configs.append(("Q pc=1 mu_p=0.35 ram=0.85",
                        {"plane_corner": 1.0, "mu_plane": 0.35,
                         "ram": 0.85}))
    if args.gate == "H":
        # hop hypothesis (diag_snap3d.py case 29): MuJoCo's snap coasts
        # because the kicked object HOPS off its 3-4 hull-corner plane
        # contacts (ncon -> 0 mid-snap), killing plane friction; the
        # engine's overdamped 51-point plane patch never lets go (measured
        # brake ~0.33 N.m vs MuJoCo's ~0.03). Sweep the plane damping down
        # (module constant -> clear jit caches per config).
        for bp in (50.0, 100.0, 200.0):
            configs.append((f"H B_PLANE3={bp}", {"_B_PLANE3": bp}))
        for bp, kp in ((100.0, 1.0e4), (100.0, 5.0e4)):
            configs.append((f"H B_PLANE3={bp} K_PLANE3={kp}",
                            {"_B_PLANE3": bp, "_K_PLANE3": kp}))

    rows = []
    t0 = time.time()
    bp0, kp0, sv0 = engine3d.B_PLANE3, engine3d.K_PLANE3, engine3d.SOLVER3
    prev = (bp0, kp0, sv0)
    for name, vals in configs:
        vals = dict(vals)
        cur = (vals.pop("_B_PLANE3", bp0), vals.pop("_K_PLANE3", kp0),
               vals.pop("_SOLVER3", sv0))
        engine3d.B_PLANE3, engine3d.K_PLANE3, engine3d.SOLVER3 = cur
        if cur != prev:
            jax.clear_caches()   # constants are baked at trace time
        prev = cur
        calib = base.replace(**{k: jnp.float32(v) for k, v in vals.items()})
        en = run(calib)
        if not np.isfinite(en).all():
            print(f"{name}: NON-FINITE", flush=True)
            continue
        c, r, a, fam = score(en)
        famstr = " ".join(f"{i}:{fc:+.2f}/{fr:.2f}" for i, (fc, fr)
                          in sorted(fam.items()))
        print(f"{name:28s} corr {c:.3f} ratio {r:.3f} agree {a:.3f} | "
              f"{famstr}  [{time.time()-t0:.0f}s]", flush=True)
        rows.append({"name": name, **vals, "corr": c, "ratio": r, "agree": a,
                     "family": {str(k): v for k, v in fam.items()}})
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()

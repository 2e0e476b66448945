"""2D dynamics-model accuracy attribution (round 4; VERDICT r3 item 9).

runs/demo2d reports val_acc_ori 0.616 for the engine-label-trained 2D
profile model. This experiment decomposes that number into its three
bounded causes, mirroring the round-3c protocol (scripts/fidelity_task_3d)
at a scale where MuJoCo labels are affordable:

  1. LABEL NOISE — on a fixed 2-object x 32-gripper x 360-orientation set,
     label every pair BOTH ways (engine datagen vs the MuJoCo oracle,
     reference sim/sim_2d.py:144-171 semantics) and train the same
     ProfileForward2D on each; the val-acc delta on MuJoCo-labeled held-out
     grippers is the cost of engine labels (round-2 measured ~3 points at
     grid 48; this rerun uses the production 360 grid).
  2. DATA SCALE — train engine-label models on nested dataset sizes
     (3/12/24 objects x 128 grippers from the demo2d cache) and report the
     engine-val accuracy curve: still climbing => data-bound, flat =>
     task/model-bound.
  3. CHAOS CEILING — MuJoCo 3-class agreement with itself under a 0.2 mm
     initial perturbation (runs/calib/mj_sensitivity_2d.json): no model
     can score above this against any one oracle instance.

Stages (MuJoCo labelling is CPU-bound, the rest wants the TPU):
    JAX_PLATFORMS=cpu python scripts/fidelity_acc_2d.py --stage mj
    python scripts/fidelity_acc_2d.py --stage cache   # demo-scale engine datagen
    python scripts/fidelity_acc_2d.py --stage train
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_dgdm")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import time

import jax
import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "fidelity_acc2d")
MJ_CACHE = os.path.join(OUT, "mj_labels.npz")
N_OBJECTS = 2
N_GRIPPERS = 32
VAL_GRIPPERS = 8
GRID = 360
DYN_STEPS = 3000


def contours_of():
    from dgdm_tpu.cli.datagen import synthetic_icon
    from dgdm_tpu.geom.contour import extract_contours

    return [extract_contours(synthetic_icon(i)) for i in range(N_OBJECTS)]


def stage_mj():
    """Label the fixed set with the MuJoCo oracle (CPU; ~23k rollouts)."""
    if "cpu" not in str(jax.devices()[0]).lower():
        jax.config.update("jax_platforms", "cpu")
    from dgdm_tpu.sim.engine2d import pose_grid

    sys.path.insert(0, os.path.dirname(__file__))
    from fidelity_task_2d import mj_records

    thetas = pose_grid(grid_size=GRID, num_pos=1)[:, 2]
    os.makedirs(OUT, exist_ok=True)
    t0 = time.time()
    recs = []
    for oi, c in enumerate(contours_of()):
        recs += mj_records(c, list(range(N_GRIPPERS)), np.asarray(thetas))
        print(f"mj object {oi} done {time.time()-t0:.0f}s", flush=True)
    np.savez_compressed(
        MJ_CACHE, n=len(recs),
        **{f"{k}_{i}": r[k] for i, r in enumerate(recs) for k in r})
    print(f"-> {MJ_CACHE} ({time.time()-t0:.0f}s)", flush=True)


def stage_cache():
    """Engine-label 24 objects x 128 grippers at the full demo grid.

    Produces runs/demo2d/datagen_24x128.npz for the data-scale arm: the
    demo2d pipeline trains on exactly this distribution (synthetic icons,
    seed-indexed grippers, 360x25 pose grid) but never persisted its
    datagen output.  ~10 min on one TPU chip at bench throughput.
    """
    from dgdm_tpu.cli.datagen import synthetic_icon
    from dgdm_tpu.geom.contour import extract_contours
    from dgdm_tpu.sim.datagen import generate_2d

    cache = os.path.join(os.path.dirname(__file__), "..", "runs", "demo2d",
                         "datagen_24x128.npz")
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    keys = ("ctrlpts", "obj_theta", "obj_pos", "delta_theta", "delta_pos",
            "object_vertices")
    t0 = time.time()
    recs = []
    for oi in range(24):
        contour = extract_contours(synthetic_icon(oi))
        recs += generate_2d(oi, contour, list(range(128)))
        print(f"cache object {oi} done {time.time()-t0:.0f}s", flush=True)
    np.savez_compressed(
        cache, n=len(recs),
        **{f"{k}_{i}": r[k] for i, r in enumerate(recs) for k in keys})
    n_roll = len(recs) * recs[0]["delta_theta"].shape[0]
    print(f"-> {cache}: {len(recs)} records, {n_roll} rollouts, "
          f"{time.time()-t0:.0f}s", flush=True)


def load_mj_records():
    z = np.load(MJ_CACHE)
    keys = ("ctrlpts", "object_vertices", "obj_pos", "obj_theta",
            "delta_theta", "delta_pos")
    return [{k: z[f"{k}_{i}"] for k in keys} for i in range(int(z["n"]))]


def stage_train(arm="all"):
    from dgdm_tpu.sim.datagen import generate_2d
    from dgdm_tpu.sim.engine2d import pose_grid
    from dgdm_tpu.train.data import normalize_record_2d

    sys.path.insert(0, os.path.dirname(__file__))
    # fidelity_task_2d pins jax to CPU at import unless told otherwise;
    # this stage wants the TPU for datagen + training
    os.environ["FIDELITY_TASK_CPU"] = "0"
    from fidelity_task_2d import train_dynamics

    os.makedirs(OUT, exist_ok=True)
    sum_path = os.path.join(OUT, "summary.json")
    summary = {}
    if os.path.exists(sum_path):
        with open(sum_path) as f:
            summary = json.load(f)
    summary["config"] = {"objects": N_OBJECTS, "grippers": N_GRIPPERS,
                         "val_grippers": VAL_GRIPPERS, "grid": GRID,
                         "dyn_steps": DYN_STEPS}

    def save():
        with open(sum_path, "w") as f:
            json.dump(summary, f, indent=1)

    contours = contours_of()

    if arm in ("label", "all"):
        _arm_label(summary, contours, train_dynamics, generate_2d,
                   normalize_record_2d)
        save()
    if arm in ("scale", "all"):
        _arm_scale(summary, train_dynamics, normalize_record_2d)
        save()
    if arm in ("ceiling", "all"):
        _arm_ceiling(summary)
        save()
    print(json.dumps(summary, indent=1), flush=True)


def _arm_label(summary, contours, train_dynamics, generate_2d,
               normalize_record_2d):
    # ---- arm 1: label noise at the production 360 grid -------------------
    rec_b = load_mj_records()
    t0 = time.time()
    rec_a = []
    for oi, c in enumerate(contours):
        rec_a += generate_2d(oi, c, list(range(N_GRIPPERS)),
                             grid_size=GRID, num_pos=1)
    summary["engine_datagen_seconds"] = time.time() - t0

    from dgdm_tpu.core.config import NORM
    from dgdm_tpu.eval.metrics import three_class

    da = np.stack([r["delta_theta"] for r in rec_a])
    db = np.stack([r["delta_theta"] for r in rec_b])
    summary["label_agreement"] = {
        "corr": float(np.corrcoef(da.reshape(-1), db.reshape(-1))[0, 1]),
        "std_ratio": float(da.std() / db.std()),
        "class_agree": float(
            (three_class(da, NORM.threshold_2d[0])
             == three_class(db, NORM.threshold_2d[0])).mean()),
    }
    print("labels:", summary["label_agreement"], flush=True)

    def split(recs):
        tr, va = [], []
        for i, r in enumerate(recs):
            (va if i % N_GRIPPERS >= N_GRIPPERS - VAL_GRIPPERS
             else tr).append(normalize_record_2d(r))
        return tr, va

    tra, _ = split(rec_a)
    trb, vab = split(rec_b)
    _, _, _, stats_a = train_dynamics(tra, vab, seed=0, steps=DYN_STEPS)
    print("engine-trained on mj-val:", stats_a, flush=True)
    _, _, _, stats_b = train_dynamics(trb, vab, seed=0, steps=DYN_STEPS)
    print("mujoco-trained on mj-val:", stats_b, flush=True)
    summary["val_on_mujoco_labels"] = {
        "engine_trained": stats_a, "mujoco_trained": stats_b,
        "label_cost_acc_ori": stats_b["acc_ori"] - stats_a["acc_ori"]}

    # engine-trained model also scored on ENGINE-labeled val of the same
    # grippers: the domain-matched reference point
    _, _, _, stats_aa = train_dynamics(tra, split(rec_a)[1], seed=0,
                                       steps=DYN_STEPS)
    summary["val_on_engine_labels"] = {"engine_trained": stats_aa}


def _arm_scale(summary, train_dynamics, normalize_record_2d):
    # ---- arm 2: data-scale curve from the demo2d cache --------------------
    cache = os.path.join(os.path.dirname(__file__), "..", "runs", "demo2d",
                         "datagen_24x128.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        n_rec = int(z["n"])
        keys = ("ctrlpts", "obj_theta", "obj_pos", "delta_theta",
                "delta_pos", "object_vertices")
        demo_recs = [{k: z[f"{k}_{i}"] for k in keys} for i in range(n_rec)]

        def sub_rows(rec, stride=25):
            # one position per orientation (the demo grid is theta-major in
            # 25-position blocks): bounds host memory — full demo rows would
            # be 27.6M x ~860 B
            rows = normalize_record_2d(rec)
            return {k: v[::stride].copy() for k, v in rows.items()}

        curve = []
        for n_obj in (3, 12, 24):
            recs = demo_recs[: n_obj * 128]
            val_n = max(1, len(recs) // 10)
            va = [sub_rows(r) for r in recs[:val_n]]
            tr = [sub_rows(r) for r in recs[val_n:]]
            _, _, _, st = train_dynamics(tr, va, seed=0, steps=DYN_STEPS)
            curve.append({"objects": n_obj, "pairs": len(recs) - val_n,
                          **st})
            print("scale", n_obj, st, flush=True)
        summary["engine_scale_curve"] = curve
    else:
        summary["engine_scale_curve"] = f"missing {cache}"


def _arm_ceiling(summary):
    # ---- arm 3: chaos ceiling ---------------------------------------------
    sens = os.path.join(os.path.dirname(__file__), "..", "runs", "calib",
                        "mj_sensitivity_2d.json")
    with open(sens) as f:
        cases = json.load(f)["cases"]
    agrees = [c["agree"] for c in cases if "agree" in c]
    summary["mj_chaos_class_agree"] = {
        "mean": float(np.mean(agrees)),
        "p25": float(np.percentile(agrees, 25)),
        "p75": float(np.percentile(agrees, 75)),
        "n_cases": len(agrees),
        "note": "MuJoCo delta_theta 3-class agreement with itself under a "
                "0.2 mm initial-x perturbation — the accuracy ceiling any "
                "model faces against one oracle instance",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=["mj", "cache", "train", "all"])
    ap.add_argument("--arm", default="all",
                    choices=["label", "scale", "ceiling", "all"])
    args = ap.parse_args()
    if args.stage in ("mj", "all") and not os.path.exists(MJ_CACHE):
        stage_mj()
    if args.stage == "cache" or (args.stage == "all" and not os.path.exists(
            os.path.join(os.path.dirname(__file__), "..", "runs", "demo2d",
                         "datagen_24x128.npz"))):
        stage_cache()
    if args.stage in ("train", "all"):
        stage_train(arm=args.arm)


if __name__ == "__main__":
    main()

"""Task-level fidelity experiment (VERDICT r2 item 2): does a dynamics model
trained on ENGINE-generated interaction profiles match one trained on
MuJoCo-generated profiles, on the pipeline's own terms?

On a fixed object x gripper x pose set:
  dataset A = engine labels (the framework's datagen path)
  dataset B = MuJoCo oracle labels (the reference's datagen,
              sim/sim_2d.py:144-171)
Then:
  (a) train the same ProfileForward2D on each; report both models' 3-class
      accuracy on MUJOCO-labeled held-out pairs (dynamics/main.py:17-52);
  (b) guided-sample grippers with each classifier and verify BOTH sample
      sets in the MUJOCO oracle (generator/diffusion.py:577-580) — the
      experiment that settles whether engine labels train equally useful
      guidance classifiers.

Writes runs/fidelity_task/summary.json.

    JAX_PLATFORMS=cpu python scripts/fidelity_task_2d.py   # oracle is CPU;
    # drop the env prefix to run engine datagen + training on the TPU
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import os as _os

_os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax

# the axon harness overrides the JAX_PLATFORMS env var; pin via config so
# this script never competes with TPU jobs (the oracle is CPU-bound anyway)
if _os.environ.get("JAX_PLATFORMS", "") == "cpu" or         _os.environ.get("FIDELITY_TASK_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from dgdm_tpu.cli.datagen import synthetic_icon
from dgdm_tpu.core.config import GUIDANCE, NORM
from dgdm_tpu.design.guidance import GuidedSampler
from dgdm_tpu.eval.metrics import metric2objective, three_class, wrap_pi
from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.geom.fingers import denormalize_y, sample_gripper_2d
from dgdm_tpu.models.profile2d import ProfileForward2D
from dgdm_tpu.models.unet1d import ConditionalUnet1D
from dgdm_tpu.sim import engine2d
from dgdm_tpu.sim.datagen import generate_2d
from dgdm_tpu.sim.oracle import Oracle2D
from dgdm_tpu.train.data import mirror_rows_2d, normalize_record_2d, \
    procedural_grippers
from dgdm_tpu.train.dynamics import DynamicsTrainer
from dgdm_tpu.train.generator import GeneratorTrainer

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "fidelity_task")
N_OBJECTS = 3
N_GRIPPERS = 24          # last VAL_GRIPPERS held out per object
VAL_GRIPPERS = 6
GRID = 48                # orientations (reference: 360)
DYN_STEPS = 900
DIFF_STEPS = 1200
OBJECTIVES = ("rotate_clockwise", "shift_left")
N_SAMPLES = 16


def mj_records(contour, gripper_indices, thetas, steps=200):
    """MuJoCo-labeled records in the reference npz layout (one per pair)."""
    from dgdm_tpu.geom.fingers import ctrlpts_2d

    records = []
    for gi in gripper_indices:
        yl, yr = sample_gripper_2d(gi)
        oracle = Oracle2D(yl, yr, contour)
        dth = np.zeros(len(thetas), np.float32)
        dpos = np.zeros((len(thetas), 3), np.float32)
        for j, th in enumerate(thetas):
            d, dp, _ = oracle.rollout(0.0, 0.0, float(th), steps=steps)
            dth[j] = d
            dpos[j] = dp
        records.append({
            "ctrlpts": ctrlpts_2d(yl, yr).astype(np.float32),
            "object_vertices": np.asarray(contour, np.float32),
            "obj_pos": np.zeros((len(thetas), 3), np.float32),
            "obj_theta": thetas.astype(np.float32),
            "delta_theta": dth,
            "delta_pos": dpos,
        })
    return records


def train_dynamics(rows_train, rows_val, seed=0, steps=DYN_STEPS):
    classifier = ProfileForward2D()
    dtr = DynamicsTrainer(classifier, learning_rate=3e-4, total_steps=steps)
    train_rows = rows_train + [mirror_rows_2d(r) for r in rows_train]

    def stack(rs):
        return {k: np.concatenate([r[k] for r in rs], 0) for k in rs[0]}

    tr = stack(train_rows)
    va = {k: jnp.asarray(v) for k, v in stack(rows_val).items()}
    n = tr["ctrl"].shape[0]
    rng = np.random.RandomState(seed)
    dstate = dtr.init(jax.random.PRNGKey(seed),
                      {k: jnp.asarray(v[:256]) for k, v in tr.items()})
    key = jax.random.PRNGKey(seed + 1)
    bs = min(16384, n)
    # the whole training set lives on device; batches are device-side
    # gathers. A host-side gather + transfer per step (the first version)
    # queued thousands of unreleased 14 MB transfer buffers through the
    # axon tunnel and OOM-killed the host at 130 GB RSS; the periodic
    # block bounds the in-flight dispatch queue.
    tr_dev = {k: jnp.asarray(v) for k, v in tr.items()}
    del tr
    for s in range(steps):
        idx = jnp.asarray(rng.randint(0, n, bs))
        key, k = jax.random.split(key)
        dstate, m = dtr.train_step(
            dstate, {k2: jnp.take(v, idx, axis=0)
                     for k2, v in tr_dev.items()}, k)
        if s % 100 == 99:
            jax.block_until_ready(m)
    vm = dtr.eval_step(dstate, va, key)
    stats = {kk: float(vm[kk]) for kk in
             ("loss", "acc_ori", "acc_x", "acc_y")}
    return classifier, dstate, dtr, stats


def oracle_eval(samples, contour, thetas, objective, steps=200):
    """Verify normalized samples in the MuJoCo oracle; per-gripper
    objective table (the reference's sim_test verification,
    generator/diffusion.py:577-580, first-squeeze profile)."""
    th = NORM.threshold_2d
    y = np.asarray(denormalize_y(np.asarray(samples)[..., 0]))
    n = y.shape[1] // 2
    tables = []
    for i in range(y.shape[0]):
        oracle = Oracle2D(y[i, :n], y[i, n:], contour)
        dth = np.zeros(len(thetas))
        dpos = np.zeros((len(thetas), 3))
        fth = np.zeros(len(thetas))
        for j, t0 in enumerate(thetas):
            d, dp, f = oracle.rollout(0.0, 0.0, float(t0), steps=steps)
            dth[j], dpos[j], fth[j] = d, dp, f
        fdt = np.asarray([wrap_pi(f - t0) for f, t0 in zip(fth, thetas)])
        metric = {
            "delta_theta": dth * 180 / np.pi,
            "delta_pos": dpos[:, :2] * 100,
            "profile": three_class(dth, th[0]),
            "profile_x": three_class(dpos[:, 0], th[1]),
            "profile_y": three_class(dpos[:, 1], th[2]),
            "final_theta": fth * 180 / np.pi,
            "final_delta_theta": fdt * 180 / np.pi,
            "final_pos": dpos[:, :2] * 100,
        }
        tables.append(metric2objective(metric, objective))
    sr = [t["success_rate"] for t in tables]
    return {"mean_success": float(np.mean(sr)),
            "best_success": float(np.max(sr))}


def main():
    os.makedirs(OUT, exist_ok=True)
    summary = {"config": {"objects": N_OBJECTS, "grippers": N_GRIPPERS,
                          "val_grippers": VAL_GRIPPERS, "grid": GRID}}
    contours = [extract_contours(synthetic_icon(i)) for i in range(N_OBJECTS)]
    thetas = engine2d.pose_grid(grid_size=GRID, num_pos=1)[:, 2]

    # ---- dataset A: engine labels ----------------------------------------
    t0 = time.time()
    rec_a = []
    for oi, c in enumerate(contours):
        rec_a += generate_2d(oi, c, list(range(N_GRIPPERS)),
                             grid_size=GRID, num_pos=1)
    summary["engine_datagen_seconds"] = time.time() - t0
    print("engine datagen done", summary["engine_datagen_seconds"], flush=True)

    # ---- dataset B: MuJoCo labels ----------------------------------------
    t0 = time.time()
    rec_b = []
    for oi, c in enumerate(contours):
        rec_b += mj_records(c, list(range(N_GRIPPERS)), np.asarray(thetas))
        print(f"mj object {oi} done {time.time()-t0:.0f}s", flush=True)
    summary["mujoco_datagen_seconds"] = time.time() - t0

    # agreement of the two label sets on identical pairs
    da = np.stack([r["delta_theta"] for r in rec_a])
    db = np.stack([r["delta_theta"] for r in rec_b])
    cls_a = three_class(da, NORM.threshold_2d[0])
    cls_b = three_class(db, NORM.threshold_2d[0])
    summary["label_agreement"] = {
        "corr": float(np.corrcoef(da.reshape(-1), db.reshape(-1))[0, 1]),
        "std_ratio": float(da.std() / db.std()),
        "class_agree": float((cls_a == cls_b).mean()),
    }
    print("labels:", summary["label_agreement"], flush=True)

    # ---- split by gripper; val labels ALWAYS MuJoCo ----------------------
    def split(recs):
        tr, va = [], []
        for i, r in enumerate(recs):
            (va if i % N_GRIPPERS >= N_GRIPPERS - VAL_GRIPPERS else tr).append(
                normalize_record_2d(r))
        return tr, va

    tra, _ = split(rec_a)
    trb, vab = split(rec_b)

    # ---- (a) train on each, evaluate on MuJoCo-labeled val ---------------
    cls_a_model, dstate_a, dtr_a, stats_a = train_dynamics(tra, vab, seed=0)
    print("model A (engine):", stats_a, flush=True)
    cls_b_model, dstate_b, dtr_b, stats_b = train_dynamics(trb, vab, seed=0)
    print("model B (mujoco):", stats_b, flush=True)
    summary["val_on_mujoco_labels"] = {"engine_trained": stats_a,
                                       "mujoco_trained": stats_b}

    # ---- (b) guided design, verified in the MuJoCo oracle ----------------
    train_g, _ = procedural_grippers(20000)
    unet = ConditionalUnet1D()
    gtr = GeneratorTrainer(unet, total_steps=DIFF_STEPS)
    gstate = gtr.init(jax.random.PRNGKey(0), jnp.asarray(train_g[:512]))
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(11)
    for _ in range(DIFF_STEPS):
        idx = rng.randint(0, len(train_g), 512)
        key, k = jax.random.split(key)
        gstate, _gm = gtr.train_step(gstate, jnp.asarray(train_g[idx]), k)
    noise = jax.random.normal(jax.random.PRNGKey(7), (N_SAMPLES, 14, 1))
    unguided = gtr.sample(gstate, noise)
    test_contour = contours[0]
    obj_flat = jnp.asarray(test_contour.reshape(-1) / NORM.object_extent_2d)
    th_eval = np.asarray(thetas)

    design = {}
    for objective in OBJECTIVES:
        scale = jnp.asarray(GUIDANCE.scale(False, objective))
        row = {"unguided": oracle_eval(unguided, test_contour, th_eval,
                                       objective)}
        for tag, cls_m, dstate in (("engine_classifier", cls_a_model, dstate_a),
                                   ("mujoco_classifier", cls_b_model, dstate_b)):
            sampler = GuidedSampler(unet, cls_m)
            cv = {"params": dstate.params, "batch_stats": dstate.batch_stats}
            samples = sampler.sample(
                gstate.ema_params, cv, noise, obj_flat, objective, scale)
            row[tag] = oracle_eval(samples, test_contour, th_eval, objective)
        design[objective] = row
        print(objective, row, flush=True)
    summary["design_verified_in_mujoco"] = design

    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

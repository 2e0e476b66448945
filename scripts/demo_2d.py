"""End-to-end 2D demo at realistic (small) scale on TPU.

Runs the full pipeline with REAL training: datagen -> dynamics training ->
diffusion training -> guided sampling for several objectives -> on-device
sim verification; writes metrics to runs/demo2d/summary.json.

    python scripts/demo_2d.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.cli.datagen import synthetic_icon
from dgdm_tpu.core.config import GUIDANCE, NORM
from dgdm_tpu.design.guidance import GuidedSampler
from dgdm_tpu.eval.metrics import best_ids_all_metrics
from dgdm_tpu.eval.simeval import objectives_table, sim_eval_batch_2d
from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.models.profile2d import ProfileForward2D
from dgdm_tpu.models.unet1d import ConditionalUnet1D
from dgdm_tpu.sim.datagen import generate_2d
from dgdm_tpu.train.data import normalize_record_2d, procedural_grippers
from dgdm_tpu.train.dynamics import DynamicsTrainer
from dgdm_tpu.train.generator import GeneratorTrainer

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "demo2d")
# round 3: scaled 4x (3x24 -> 8x48 pairs) for classifier accuracy, then 8x
# again (24x128) once training moved device-side. The historical "ccw
# guidance loses to unguided" puzzle was an EVAL bug, not a guidance
# failure: metric2objective scored rotate_counterclockwise as clockwise
# (see tests/test_metrics.py::test_rotate_ccw_scores_ccw_class).
N_OBJECTS = 24
N_GRIPPERS = 128
DYN_STEPS = 12000
DIFF_STEPS = 1500
OBJECTIVES = ("rotate_clockwise", "rotate_counterclockwise", "shift_left")


def main():
    os.makedirs(OUT, exist_ok=True)
    summary = {}

    # ---- datagen ----------------------------------------------------------
    t0 = time.time()
    contours = [extract_contours(synthetic_icon(i)) for i in range(N_OBJECTS)]
    cache = os.path.join(OUT, f"datagen_{N_OBJECTS}x{N_GRIPPERS}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        n_rec = int(z["n"])
        records = [
            {k: z[f"{k}_{i}"] for k in
             ("ctrlpts", "obj_theta", "obj_pos", "delta_theta", "delta_pos",
              "object_vertices")}
            for i in range(n_rec)
        ]
    else:
        records = []
        for oi, contour in enumerate(contours):
            records += generate_2d(oi, contour, list(range(N_GRIPPERS)))
        np.savez_compressed(
            cache, n=len(records),
            **{f"{k}_{i}": r[k] for i, r in enumerate(records)
               for k in ("ctrlpts", "obj_theta", "obj_pos", "delta_theta",
                         "delta_pos", "object_vertices")},
        )
    dg_time = time.time() - t0
    n_roll = len(records) * records[0]["obj_theta"].shape[0]
    summary["datagen"] = {
        "pairs": len(records),
        "rollouts": n_roll,
        "seconds": dg_time,
        "rollouts_per_sec": n_roll / dg_time,
        "delta_theta_std": float(
            np.std([r["delta_theta"] for r in records])
        ),
    }
    print("datagen:", summary["datagen"], flush=True)

    # ---- dynamics training -------------------------------------------------
    # Training data stays COMPACT per pair (ctrl/obj are constant across a
    # pair's 9,000 poses); batches are assembled by on-device gather inside
    # the jitted step. The earlier host-side row materialization + per-step
    # numpy gather cost 0.4 s/step at 16k rows — 30x the device step itself.
    from dgdm_tpu.train.data import mirror_rows_2d

    val_n = max(1, len(records) // 10)
    val_recs, train_recs = records[:val_n], records[val_n:]

    def compact(recs, mirror):
        ctrls, objs, oris, poss, scores = [], [], [], [], []
        for r in recs:
            rows = normalize_record_2d(r)
            variants = [rows]
            if mirror:
                # mirror-symmetry augmentation: enforces cw/ccw balance in
                # the classifier (the sampled objects are chiral; without it
                # guided ccw underperforms its cw twin at demo data scale)
                variants.append(mirror_rows_2d(rows))
            for v in variants:
                # copy the slices: views would pin each record's full
                # 9,000-row tiled parents (~8 MB/record, ~40 GB total)
                ctrls.append(v["ctrl"][0].copy())
                objs.append(v["obj"][0].copy())
                oris.append(v["ori"][:, 0].copy())
                poss.append(v["pos"])
                scores.append(v["score"])
        return (jnp.asarray(np.stack(ctrls)), jnp.asarray(np.stack(objs)),
                jnp.asarray(np.stack(oris)), jnp.asarray(np.stack(poss)),
                jnp.asarray(np.stack(scores)))

    d_ctrl, d_obj, d_ori, d_pos, d_score = compact(train_recs, mirror=True)
    n_pairs, n_poses = d_ori.shape
    classifier = ProfileForward2D()
    dtr = DynamicsTrainer(classifier, learning_rate=3e-4,
                          total_steps=DYN_STEPS)
    bs = 16384
    first = {
        "ctrl": d_ctrl[:256], "obj": d_obj[:256],
        "ori": d_ori[:256, 0][:, None], "pos": d_pos[:256, 0],
        "score": d_score[:256, 0],
    }
    dstate = dtr.init(jax.random.PRNGKey(0), first)

    # data arrays are jit ARGUMENTS, not closure captures: captured device
    # arrays are inlined into the HLO as constants, and the ~0.6 GB score
    # table blows the axon remote-compile request limit (HTTP 413)
    @jax.jit
    def dyn_step(state, key, d_ctrl, d_obj, d_ori, d_pos, d_score):
        k1, k2, k3 = jax.random.split(key, 3)
        pi = jax.random.randint(k1, (bs,), 0, n_pairs)
        ri = jax.random.randint(k2, (bs,), 0, n_poses)
        batch = {
            "ctrl": d_ctrl[pi], "obj": d_obj[pi],
            "ori": d_ori[pi, ri][:, None], "pos": d_pos[pi, ri],
            "score": d_score[pi, ri],
        }
        return dtr.train_step(state, batch, k3)

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    first_loss = None
    for step in range(DYN_STEPS):
        key, k = jax.random.split(key)
        dstate, m = dyn_step(dstate, k, d_ctrl, d_obj, d_ori, d_pos,
                             d_score)
        if step == 0:
            first_loss = float(m["loss"])
        elif step % 2000 == 0:
            print(f"  dyn step {step} loss {float(m['loss']):.4f}",
                  flush=True)
    # validation on a fixed row subsample of the held-out pairs
    v_ctrl, v_obj, v_ori, v_pos, v_score = compact(val_recs, mirror=False)
    vrng = np.random.RandomState(3)
    vp = vrng.randint(0, v_ori.shape[0], bs)
    vr = vrng.randint(0, n_poses, bs)
    val_all = {
        "ctrl": v_ctrl[vp], "obj": v_obj[vp],
        "ori": v_ori[vp, vr][:, None], "pos": v_pos[vp, vr],
        "score": v_score[vp, vr],
    }
    vm = dtr.eval_step(dstate, val_all, key)
    from dgdm_tpu.train import checkpoints as _ckpt

    _ckpt.save(os.path.join(OUT, "ckpt_dynamics"), dstate)
    summary["dynamics"] = {
        "steps": DYN_STEPS,
        "rows_per_batch": bs,
        "seconds": time.time() - t0,
        "first_loss": first_loss,
        "final_loss": float(m["loss"]),
        "val_loss": float(vm["loss"]),
        "val_acc_ori": float(vm["acc_ori"]),
        "val_acc_x": float(vm["acc_x"]),
        "val_acc_y": float(vm["acc_y"]),
    }
    print("dynamics:", summary["dynamics"], flush=True)

    # ---- diffusion training -------------------------------------------------
    train_g, val_g = procedural_grippers(20000)
    rng = np.random.RandomState(0)
    unet = ConditionalUnet1D()
    gtr = GeneratorTrainer(unet, total_steps=DIFF_STEPS)
    gstate = gtr.init(jax.random.PRNGKey(0), jnp.asarray(train_g[:512]))
    t0 = time.time()
    gfirst = None
    for step in range(DIFF_STEPS):
        idx = rng.randint(0, len(train_g), 512)
        key, k = jax.random.split(key)
        gstate, gm = gtr.train_step(gstate, jnp.asarray(train_g[idx]), k)
        if step == 0:
            gfirst = float(gm["loss"])
    _ckpt.save(os.path.join(OUT, "ckpt_diffusion"), gstate)
    summary["diffusion"] = {
        "steps": DIFF_STEPS,
        "seconds": time.time() - t0,
        "first_loss": gfirst,
        "final_loss": float(gm["loss"]),
    }
    print("diffusion:", summary["diffusion"], flush=True)

    # unguided samples should look like real grippers (within [-1, 1])
    # 64 seeds: success-rate sem ~0.025, so guided-vs-unguided gaps >0.05
    # are outside seed noise
    noise = jax.random.normal(jax.random.PRNGKey(7), (64, 14, 1))
    unguided = gtr.sample(gstate, noise)
    summary["unguided_sample_range"] = [
        float(jnp.min(unguided)), float(jnp.max(unguided))
    ]

    # ---- guided sampling + sim verification --------------------------------
    sampler = GuidedSampler(unet, classifier)
    cls_vars = {"params": dstate.params, "batch_stats": dstate.batch_stats}
    guided_summary = {}
    test_contour = contours[0]
    obj_flat = jnp.asarray(
        test_contour.reshape(-1) / NORM.object_extent_2d
    )
    # unguided baseline metrics
    t0 = time.time()
    m_un = sim_eval_batch_2d(np.asarray(unguided)[..., 0], [test_contour])
    eval_time = time.time() - t0
    for objective in OBJECTIVES:
        scale = jnp.asarray(GUIDANCE.scale(False, objective))
        t0 = time.time()
        samples = sampler.sample(
            gstate.ema_params, cls_vars, noise, obj_flat, objective, scale
        )
        jax.block_until_ready(samples)
        sample_time = time.time() - t0
        metrics = sim_eval_batch_2d(np.asarray(samples)[..., 0], [test_contour])
        objs = objectives_table(metrics, objective)
        objs_un = objectives_table(m_un, objective)
        sr = float(np.mean([o["success_rate"] for o in objs]))
        sr_un = float(np.mean([o["success_rate"] for o in objs_un]))
        best = best_ids_all_metrics(objs, objective)
        best_sr = objs[best["success_rate"]]["success_rate"]
        guided_summary[objective] = {
            "guided_mean_success": sr,
            "unguided_mean_success": sr_un,
            "guided_best_success": best_sr,
            "sample_seconds": sample_time,
        }
        print(objective, guided_summary[objective], flush=True)
    summary["guided"] = guided_summary
    summary["sim_eval_seconds_64x360x8000steps"] = eval_time

    # ---- chirality check ---------------------------------------------------
    # The demo icons are chiral: if counterclockwise underperforms clockwise,
    # that is object physics, not a guidance asymmetry. Proof by symmetry:
    # guiding ccw ON THE MIRRORED OBJECT must recover the cw success numbers
    # (the sampler's exact-mirror property is separately unit-tested).
    mirror_contour = (test_contour * np.asarray([-1.0, 1.0]))[::-1].copy()
    obj_flat_m = jnp.asarray(mirror_contour.reshape(-1) / NORM.object_extent_2d)
    scale = jnp.asarray(GUIDANCE.scale(False, "rotate_counterclockwise"))
    samples_m = sampler.sample(
        gstate.ema_params, cls_vars, noise, obj_flat_m,
        "rotate_counterclockwise", scale
    )
    m_m = sim_eval_batch_2d(np.asarray(samples_m)[..., 0], [mirror_contour])
    objs_m = objectives_table(m_m, "rotate_counterclockwise")
    sr_m = float(np.mean([o["success_rate"] for o in objs_m]))
    best_m = best_ids_all_metrics(objs_m, "rotate_counterclockwise")
    summary["chirality_check"] = {
        "ccw_on_mirrored_object_mean": sr_m,
        "ccw_on_mirrored_object_best":
            objs_m[best_m["success_rate"]]["success_rate"],
        "cw_on_original_mean":
            guided_summary["rotate_clockwise"]["guided_mean_success"],
        "note": "to the extent these match cw_on_original, the cw/ccw gap "
                "is object chirality (ratchet shapes); a residual gap is "
                "classifier capacity (the engine mirror symmetry itself is "
                "exact, tests/test_engine2d.py)",
    }
    print("chirality_check:", summary["chirality_check"], flush=True)

    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

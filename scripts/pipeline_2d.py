"""Production-shaped 2D pipeline run — sustained datagen -> train -> sample.

VERDICT r4 item 5: demo2d generated at 48.6k rollouts/s, 5x under the
243.7k bench headline, because bake -> dispatch -> save were serial. This
run drives ``sim/pipeline.py`` (host bake of wave i+1 + npz writes of wave
i-1 overlapped under wave i's device time) at a production-shaped scale —
default 100 objects x 256 grippers ~ 232M rollouts, a quarter of the
reference's 1,001 x 1,000 ``sim/run_sim_2d.sh`` campaign per 512-gripper
wave — then trains the dynamics + diffusion stack on a demo2d-sized
subsample and guided-samples one objective as an end-to-end check.

    python scripts/pipeline_2d.py                 # full (TPU, ~30 min)
    python scripts/pipeline_2d.py --objects 4 --grippers 16 --smoke
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

from dgdm_tpu.cli.datagen import synthetic_icon
from dgdm_tpu.core.config import GUIDANCE, NORM
from dgdm_tpu.design.guidance import GuidedSampler
from dgdm_tpu.eval.metrics import best_ids_all_metrics
from dgdm_tpu.eval.simeval import objectives_table, sim_eval_batch_2d
from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.models.profile2d import ProfileForward2D
from dgdm_tpu.models.unet1d import ConditionalUnet1D
from dgdm_tpu.sim.pipeline import pipeline_2d
from dgdm_tpu.train import checkpoints
from dgdm_tpu.train.data import (mirror_rows_2d, normalize_record_2d,
                                 procedural_grippers)
from dgdm_tpu.train.dynamics import DynamicsTrainer
from dgdm_tpu.train.generator import GeneratorTrainer

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "pipeline2d")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", type=int, default=100)
    ap.add_argument("--grippers", type=int, default=256)
    ap.add_argument("--train_pairs", type=int, default=3200,
                    help="subsample size for training (demo2d used 3,072)")
    ap.add_argument("--dyn_steps", type=int, default=12000)
    ap.add_argument("--diff_steps", type=int, default=1500)
    ap.add_argument("--save_dir", default=os.path.join(OUT, "shards"))
    ap.add_argument("--no_save", action="store_true",
                    help="skip npz shards (throughput probe only)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny training budgets + pose grid for an "
                         "end-to-end check")
    args = ap.parse_args()
    grid_kw = {}
    if args.smoke:
        args.dyn_steps, args.diff_steps = 200, 100
        args.train_pairs = min(args.train_pairs,
                               args.objects * args.grippers)
        grid_kw = {"grid_size": 16, "num_pos": 1}
    os.makedirs(OUT, exist_ok=True)
    summary = {"config": vars(args)}

    # ---- pipelined datagen ------------------------------------------------
    contours = [extract_contours(synthetic_icon(i))
                for i in range(args.objects)]
    # training subsample: spread evenly over objects AND grippers
    keep_every = max(1, (args.objects * args.grippers) // args.train_pairs)
    kept = []

    def on_records(oi, records):
        for b, rec in enumerate(records):
            if (oi * args.grippers + b) % keep_every == 0:
                kept.append(rec)

    dg = pipeline_2d(
        list(enumerate(contours)), list(range(args.grippers)),
        save_dir=None if args.no_save else args.save_dir,
        on_records=on_records, **grid_kw,
    )
    summary["datagen"] = dg
    summary["datagen"]["train_pairs_kept"] = len(kept)
    print("datagen:", dg, flush=True)

    # ---- dynamics training (demo2d recipe: compact rows + on-device
    # gather; scripts/demo_2d.py) ------------------------------------------
    val_n = max(1, len(kept) // 10)
    val_recs, train_recs = kept[:val_n], kept[val_n:]

    def compact(recs, mirror):
        ctrls, objs, oris, poss, scores = [], [], [], [], []
        for r in recs:
            rows = normalize_record_2d(r)
            variants = [rows]
            if mirror:
                variants.append(mirror_rows_2d(rows))
            for v in variants:
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
                          total_steps=args.dyn_steps)
    bs = 16384 if not args.smoke else 512
    dstate = dtr.init(jax.random.PRNGKey(0), {
        "ctrl": d_ctrl[:256], "obj": d_obj[:256],
        "ori": d_ori[:256, 0][:, None], "pos": d_pos[:256, 0],
        "score": d_score[:256, 0],
    })

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
    for step in range(args.dyn_steps):
        key, k = jax.random.split(key)
        dstate, m = dyn_step(dstate, k, d_ctrl, d_obj, d_ori, d_pos,
                             d_score)
        if step % 2000 == 0:
            print(f"  dyn step {step} loss {float(m['loss']):.4f}",
                  flush=True)
    v_ctrl, v_obj, v_ori, v_pos, v_score = compact(val_recs, mirror=False)
    vrng = np.random.RandomState(3)
    vp = vrng.randint(0, v_ori.shape[0], bs)
    vr = vrng.randint(0, n_poses, bs)
    vm = dtr.eval_step(dstate, {
        "ctrl": v_ctrl[vp], "obj": v_obj[vp],
        "ori": v_ori[vp, vr][:, None], "pos": v_pos[vp, vr],
        "score": v_score[vp, vr],
    }, key)
    checkpoints.save(os.path.join(OUT, "ckpt_dynamics"), dstate)
    summary["dynamics"] = {
        "steps": args.dyn_steps, "seconds": time.time() - t0,
        "final_loss": float(m["loss"]), "val_loss": float(vm["loss"]),
        "val_acc_ori": float(vm["acc_ori"]),
        "val_acc_x": float(vm["acc_x"]), "val_acc_y": float(vm["acc_y"]),
    }
    print("dynamics:", summary["dynamics"], flush=True)

    # ---- diffusion + one guided objective ---------------------------------
    train_g, _ = procedural_grippers(20000)
    rng = np.random.RandomState(0)
    unet = ConditionalUnet1D()
    gtr = GeneratorTrainer(unet, total_steps=args.diff_steps)
    gstate = gtr.init(jax.random.PRNGKey(0), jnp.asarray(train_g[:512]))
    t0 = time.time()
    for _ in range(args.diff_steps):
        idx = rng.randint(0, len(train_g), 512)
        key, k = jax.random.split(key)
        gstate, gm = gtr.train_step(gstate, jnp.asarray(train_g[idx]), k)
    summary["diffusion"] = {"steps": args.diff_steps,
                            "seconds": time.time() - t0,
                            "final_loss": float(gm["loss"])}
    print("diffusion:", summary["diffusion"], flush=True)

    sampler = GuidedSampler(unet, classifier)
    cls_vars = {"params": dstate.params, "batch_stats": dstate.batch_stats}
    noise = jax.random.normal(jax.random.PRNGKey(7), (64, 14, 1))
    test_contour = contours[0]
    obj_flat = jnp.asarray(test_contour.reshape(-1) / NORM.object_extent_2d)
    objective = "shift_left"
    samples = sampler.sample(
        gstate.ema_params, cls_vars, noise, obj_flat, objective,
        jnp.asarray(GUIDANCE.scale(False, objective)))
    eval_kw = {"total_steps": 400, "regrasp_every": 200} if args.smoke else {}
    metrics = sim_eval_batch_2d(np.asarray(samples)[..., 0], [test_contour],
                                **eval_kw)
    objs = objectives_table(metrics, objective)
    un = gtr.sample(gstate, noise)
    m_un = sim_eval_batch_2d(np.asarray(un)[..., 0], [test_contour],
                             **eval_kw)
    objs_un = objectives_table(m_un, objective)
    best = best_ids_all_metrics(objs, objective)
    summary["guided"] = {objective: {
        "guided_mean_success": float(np.mean([o["success_rate"]
                                              for o in objs])),
        "unguided_mean_success": float(np.mean([o["success_rate"]
                                                for o in objs_un])),
        "guided_best_success": objs[best["success_rate"]]["success_rate"],
    }}
    print("guided:", summary["guided"], flush=True)

    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""End-to-end 3D demo on one TPU chip: datagen -> dynamics (PointNet++)
training -> diffusion training -> guided sampling -> on-device 3D sim
verification -> runs/demo3d/summary.json (+ a rendered rollout frame).

Mirrors scripts/demo_2d.py in 3D (the reference flagship path
``generator/guided_sample_3d.sh`` + ``dynamics/sim_test_mj_3d.py:229-277``),
with grounded convex prisms standing in for the scanned-object dataset.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import GUIDANCE, NORM
from dgdm_tpu.design.guidance import GuidedSampler
from dgdm_tpu.eval.metrics import best_ids_all_metrics
from dgdm_tpu.eval.simeval import objectives_table
from dgdm_tpu.eval.simeval3d import sim_eval_batch_3d
from dgdm_tpu.geom.fingers import sample_gripper_3d
from dgdm_tpu.geom import mesh3d
from dgdm_tpu.models.profile3d import ProfileForward3D
from dgdm_tpu.models.unet1d import ConditionalUnet1D
from dgdm_tpu.train.data import normalize_record_3d, procedural_grippers
from dgdm_tpu.train.dynamics import DynamicsTrainer
from dgdm_tpu.train.generator import GeneratorTrainer

OUT = os.path.join(os.path.dirname(__file__), "..", "runs", "demo3d")
N_GRIPPERS = 48
# Newton-engine labels carry ~2x the motion signal of the round-1 Jacobi
# labels; the PointNet++ classifier needs more steps at demo scale. The
# round-3 envelope-contact physics needed a further 2x (grippers 24 -> 48,
# steps 1800 -> 4000): at 24x1800 val_acc_ori fell to 0.60 and guided lost
# both rotation objectives to unguided — the same capacity failure the 2D
# demo showed before its 4x scaling (docs/PARITY.md).
DYN_STEPS = 4000
DIFF_STEPS = 1600
# shift_left is saturated on these demo objects (unguided success ~0.77 —
# most random grippers already shift them left); shift_right leaves
# guidance headroom
OBJECTIVES = ("rotate_clockwise", "rotate_counterclockwise", "shift_right")
GRID = 45          # guided_sample_3d.sh grid size
EVAL_ROT = 90


def demo_objects():
    import importlib.util as ilu

    spec = ilu.spec_from_file_location(
        "suite3d", os.path.join(os.path.dirname(__file__),
                                "build_oracle_suite3d.py"))
    m = ilu.module_from_spec(spec)
    spec.loader.exec_module(m)
    objs = [
        mesh3d.box_mesh(0.04, 0.05, 0.035, 0.035),       # grounded box
        m.prism_mesh(6, 0.05, 0.07, aspect=0.75),        # hex prism
    ]
    return objs


def main():
    os.makedirs(OUT, exist_ok=True)
    summary = {}

    objects = demo_objects()
    # ---- 3D datagen (software-pipelined: bake of object i+1 + record
    # assembly overlap object i's device waves, sim/pipeline.py) ------------
    t0 = time.time()
    records, clouds = [], []
    obj_pts = {oi: mesh3d.sample_surface(v, f, 512, seed=oi)
               for oi, (v, f) in enumerate(objects)}

    def on_records(oi, recs):
        for r in recs:
            if r is not None:
                records.append(r)
                clouds.append(obj_pts[oi])

    from dgdm_tpu.sim.pipeline import pipeline_3d

    pipeline_3d(
        [(oi, f"demo{oi}", v, f) for oi, (v, f) in enumerate(objects)],
        list(range(N_GRIPPERS)), grid_size=40, num_pos=3,
        on_records=on_records,
    )
    dg_time = time.time() - t0
    n_roll = len(records) * records[0]["obj_theta"].shape[0]
    summary["datagen"] = {
        "pairs_valid": len(records),
        "pairs_total": len(objects) * N_GRIPPERS,
        "rollouts": n_roll,
        "seconds": dg_time,
        "rollouts_per_sec": n_roll / dg_time,
        "delta_theta_std": float(
            np.std([r["delta_theta"] for r in records])
        ),
    }
    print("datagen:", summary["datagen"], flush=True)

    # ---- dynamics (PointNet++) training ------------------------------------
    rows = [normalize_record_3d(r, c) for r, c in zip(records, clouds)]
    val_n = max(1, len(rows) // 8)

    def stack(rs):
        return {k: np.concatenate([r[k] for r in rs], 0) for k in rs[0]}

    train_all = stack(rows[val_n:])
    val_rows = stack(rows[:val_n])
    n_rows = train_all["ctrl"].shape[0]
    classifier = ProfileForward3D(params_ch=42)
    dtr = DynamicsTrainer(classifier, learning_rate=3e-4,
                          total_steps=DYN_STEPS, fingers_3d=True)
    rng = np.random.RandomState(0)
    # 256 rows x 512-pt clouds: PointNet++'s ball-query activations are
    # (bs, npoint, nsample, ch) — 1024-row batches exceed single-chip HBM
    # in the backward pass (measured 18.7G vs 15.75G)
    bs = 256
    first = {k: jnp.asarray(v[:64]) for k, v in train_all.items()}
    dstate = dtr.init(jax.random.PRNGKey(0), first)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    first_loss = None
    for step in range(DYN_STEPS):
        idx = rng.randint(0, n_rows, bs)
        batch = {k: jnp.asarray(v[idx]) for k, v in train_all.items()}
        key, k = jax.random.split(key)
        dstate, m = dtr.train_step(dstate, batch, k)
        if step == 0:
            first_loss = float(m["loss"])
    vidx = rng.randint(0, val_rows["ctrl"].shape[0], bs)
    vm = dtr.eval_step(
        dstate, {k: jnp.asarray(v[vidx]) for k, v in val_rows.items()}, key
    )
    summary["dynamics"] = {
        "steps": DYN_STEPS,
        "rows_per_batch": bs,
        "seconds": time.time() - t0,
        "first_loss": first_loss,
        "final_loss": float(m["loss"]),
        "val_loss": float(vm["loss"]),
        "val_acc_ori": float(vm["acc_ori"]),
    }
    print("dynamics:", summary["dynamics"], flush=True)

    # ---- diffusion training (42-d ctrl vectors) ----------------------------
    train_g, _ = procedural_grippers(20000, fingers_3d=True)
    unet = ConditionalUnet1D()
    gtr = GeneratorTrainer(unet, total_steps=DIFF_STEPS)
    gstate = gtr.init(jax.random.PRNGKey(0), jnp.asarray(train_g[:256]))
    t0 = time.time()
    gfirst = None
    for step in range(DIFF_STEPS):
        idx = rng.randint(0, len(train_g), 256)
        key, k = jax.random.split(key)
        gstate, gm = gtr.train_step(gstate, jnp.asarray(train_g[idx]), k)
        if step == 0:
            gfirst = float(gm["loss"])
    summary["diffusion"] = {
        "steps": DIFF_STEPS,
        "seconds": time.time() - t0,
        "first_loss": gfirst,
        "final_loss": float(gm["loss"]),
    }
    print("diffusion:", summary["diffusion"], flush=True)

    noise = jax.random.normal(jax.random.PRNGKey(7), (8, 42, 1))
    unguided = gtr.sample(gstate, noise)

    # ---- guided sampling + on-device 3D sim verification -------------------
    sampler = GuidedSampler(unet, classifier, grid_size=GRID,
                            num_pos=GUIDANCE.num_pos)
    cls_vars = {"params": dstate.params, "batch_stats": dstate.batch_stats}
    verts, faces = objects[0]
    pts = mesh3d.sample_surface(verts, faces, 512, seed=0)
    e = NORM.object_extent_3d_xy
    pts_n = np.array(pts)
    pts_n[:, 0] = (pts_n[:, 0] + e) / (2 * e) * 2 - 1
    pts_n[:, 1] = (pts_n[:, 1] + e) / (2 * e) * 2 - 1
    pts_n[:, 2] = (
        (pts_n[:, 2] - NORM.object_z_min_3d)
        / (NORM.object_z_max_3d - NORM.object_z_min_3d) * 2 - 1
    )
    obj_flat = jnp.asarray(pts_n.astype(np.float32))

    t0 = time.time()
    m_un = sim_eval_batch_3d(np.asarray(unguided)[..., 0], [objects[0]],
                             num_rot=EVAL_ROT)
    eval_time = time.time() - t0
    guided_summary = {}
    for objective in OBJECTIVES:
        scale = jnp.asarray(GUIDANCE.scale(True, objective))
        t0 = time.time()
        samples = sampler.sample(
            gstate.ema_params, cls_vars, noise, obj_flat, objective, scale
        )
        jax.block_until_ready(samples)
        sample_time = time.time() - t0
        metrics = sim_eval_batch_3d(np.asarray(samples)[..., 0],
                                    [objects[0]], num_rot=EVAL_ROT)
        objs = objectives_table(metrics, objective)
        objs_un = objectives_table(m_un, objective)
        sr = float(np.mean([o["success_rate"] for o in objs]))
        sr_un = float(np.mean([o["success_rate"] for o in objs_un]))
        best = best_ids_all_metrics(objs, objective)
        guided_summary[objective] = {
            "guided_mean_success": sr,
            "unguided_mean_success": sr_un,
            "guided_best_success": objs[best["success_rate"]]["success_rate"],
            "sample_seconds": sample_time,
        }
        print(objective, guided_summary[objective], flush=True)
    summary["guided"] = guided_summary
    summary["sim_eval_seconds"] = eval_time

    # rendered rollout of the best clockwise gripper (3D viz path)
    try:
        from dgdm_tpu.eval import viz
        from dgdm_tpu.geom.fingers import denormalize_y
        from dgdm_tpu.sim import engine3d

        yb = np.asarray(denormalize_y(
            np.asarray(samples)[0, :, 0], fingers_3d=True))
        scene = engine3d.make_scene(yb[:21], yb[21:], verts, faces)
        tr = np.asarray(engine3d.rollout_trace3d(
            scene, jnp.array([0.0, 0.0, 0.7], jnp.float32), steps=800,
            every=100,
        ))
        summary["render"] = viz.rollout_video_3d(
            np.asarray(scene.points), np.asarray(scene.com), yb[:21], yb[21:],
            tr, os.path.join(OUT, "rollout3d.mp4"),
        )
    except Exception as exc:  # rendering must not sink the demo
        summary["render_error"] = str(exc)[:200]

    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

"""Guided-sampling CLI — counterpart of ``generator/guided_sample_2d.sh`` /
``guided_sample_3d.sh`` (``generator/train.py --mode=test
--classifier_guidance``).

Loads the trained diffusion (EMA) and dynamics checkpoints, runs unguided +
guided DDIM for the 12 reference objectives over the test objects, verifies
every sample with on-device simulation, and writes per-objective best-gripper
tables as JSON.

Example:
    python -m dgdm_tpu.cli.sample --diffusion_checkpoint_path runs/diff2d/ckpt/last \
        --checkpoint_path runs/dyn2d/ckpt/best --save_dir runs/guided2d \
        --num_fingers 16 --batch_size 16
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.config import GUIDANCE, GUIDED_OBJECTIVES, NORM, SIM
from dgdm_tpu.core.flags import build_parser
from dgdm_tpu.design.guidance import GuidedSampler
from dgdm_tpu.eval.metrics import average_objectives, best_ids_all_metrics
from dgdm_tpu.eval.simeval import objectives_table, sim_eval_batch_2d
from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.models.profile2d import ProfileForward2D
from dgdm_tpu.models.unet1d import ConditionalUnet1D
from dgdm_tpu.train import checkpoints
from dgdm_tpu.train.dynamics import DynamicsTrainer
from dgdm_tpu.train.generator import GeneratorTrainer


def load_test_objects(args):
    from dgdm_tpu.cli.datagen import load_icon, synthetic_icon
    from dgdm_tpu.core.config import ICON_TEST_OBJECT_IDS

    ids = list(ICON_TEST_OBJECT_IDS)
    if args.num_test_objects:
        ids = ids[: args.num_test_objects]
    contours = []
    for oid in ids:
        img = (
            load_icon(args.object_dir, oid)
            if args.object_dir
            else synthetic_icon(oid)
        )
        contours.append(extract_contours(img))
    return ids, contours


def load_test_objects_3d(args):
    """Test-split scanned objects (reference: object_names_test.txt names
    under object_dir, generator/train.py:100-109)."""
    from dgdm_tpu.geom import mesh3d

    names_file = os.path.join(args.object_dir, "object_names_test.txt")
    with open(names_file) as f:
        names = [ln.strip() for ln in f if ln.strip()]
    if args.num_test_objects:
        names = names[: args.num_test_objects]
    meshes, clouds = [], []
    for name in names:
        verts, faces = mesh3d.load_obj(
            os.path.join(args.object_dir, name, "model.obj")
        )
        meshes.append((verts, faces))
        pts = mesh3d.sample_surface(verts, faces, args.object_max_num_vertices)
        e = NORM.object_extent_3d_xy
        pts = np.array(pts)
        pts[:, 0] = (pts[:, 0] + e) / (2 * e) * 2 - 1
        pts[:, 1] = (pts[:, 1] + e) / (2 * e) * 2 - 1
        pts[:, 2] = (
            (pts[:, 2] - NORM.object_z_min_3d)
            / (NORM.object_z_max_3d - NORM.object_z_min_3d) * 2 - 1
        )
        clouds.append(pts.astype(np.float32))
    return names, meshes, clouds


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.save_dir, exist_ok=True)

    unet = ConditionalUnet1D(input_dim=1)
    if args.fingers_3d:
        from dgdm_tpu.models.profile3d import ProfileForward3D

        classifier = ProfileForward3D(params_ch=args.ctrlpts_dim)
    else:
        classifier = ProfileForward2D(
            params_ch=args.ctrlpts_dim,
            object_ch=2 * args.object_max_num_vertices,
        )
    gtr = GeneratorTrainer(unet, num_train_timesteps=args.num_train_timesteps)
    dtr = DynamicsTrainer(classifier,
                          num_train_timesteps=args.num_train_timesteps)

    b = args.batch_size
    gstate = gtr.init(jax.random.PRNGKey(0), jnp.zeros((b, args.ctrlpts_dim, 1)))
    gstate = checkpoints.restore(args.diffusion_checkpoint_path, gstate)
    obj_ex = (
        jnp.zeros((2, args.object_max_num_vertices, 3))
        if args.fingers_3d
        else jnp.zeros((2, 2 * args.object_max_num_vertices))
    )
    ex = {
        "ctrl": jnp.zeros((2, args.ctrlpts_dim)),
        "ori": jnp.zeros((2, 1)),
        "pos": jnp.zeros((2, 2)),
        "obj": obj_ex,
        "score": jnp.zeros((2, 3)),
    }
    dstate = dtr.init(jax.random.PRNGKey(0), ex)
    dstate = checkpoints.restore(args.checkpoint_path, dstate)
    cls_vars = {"params": dstate.params, "batch_stats": dstate.batch_stats}

    if args.fingers_3d:
        ids, meshes, clouds = load_test_objects_3d(args)
        obj_flats = jnp.asarray(np.stack(clouds))
    else:
        ids, contours = load_test_objects(args)
        obj_flats = jnp.asarray(
            np.stack([c.reshape(-1) / NORM.object_extent_2d for c in contours])
        )

    # --sub_bs = rows per pose-grid chunk (the reference's sub-batching,
    # generator/diffusion.py:493-499) -> number of lax.map chunks here
    n_poses = args.grid_size * args.num_pos**2
    pose_chunks = max(1, -(-n_poses // max(args.sub_bs, 1)))
    # multi-chip: shard the pose grid over an 'sp' mesh axis (the CP analog;
    # XLA psums the objective gradient over ICI) when devices are available
    # and the grid divides evenly — else single-device with lax.map chunking
    import jax as _jax

    from dgdm_tpu.parallel.mesh import make_mesh

    mesh = None
    if _jax.device_count() > 1:
        cand = make_mesh(axes=("dp", "sp"))
        if args.grid_size % cand.shape["sp"] == 0:
            mesh = cand
    sampler = GuidedSampler(
        unet, classifier, grid_size=args.grid_size, num_pos=args.num_pos,
        num_train_timesteps=args.num_train_timesteps,
        num_inference_steps=args.num_inference_steps,
        pose_chunks=pose_chunks, mesh=mesh,
    )
    ema_params = gstate.ema_params
    if mesh is not None:
        # orbax-restored arrays are committed to device 0; replicate them
        # across the mesh so the sp sharding constraint can apply
        from dgdm_tpu.parallel.mesh import replicate

        ema_params = replicate(mesh, ema_params)
        cls_vars = replicate(mesh, cls_vars)

    # --eval_steps > 0 overrides the reference rollout length (8k 2D / 32k
    # 3D) — used by tests to exercise the full CLI on tiny shapes
    eval_kw = {}
    if args.eval_steps:
        eval_kw["total_steps"] = args.eval_steps
        eval_kw["regrasp_every"] = max(1, args.eval_steps // 2)

    def sim_eval(samples, oi):
        if args.fingers_3d:
            from dgdm_tpu.eval.simeval3d import sim_eval_batch_3d

            return sim_eval_batch_3d(
                np.asarray(samples)[..., 0], [meshes[oi]],
                num_rot=args.grid_size, **eval_kw,
            )
        return sim_eval_batch_2d(
            np.asarray(samples)[..., 0], [contours[oi]],
            num_rot=args.grid_size, **eval_kw,
        )

    def objs_entry(objs, objective):
        best = best_ids_all_metrics(objs, objective)
        succ = [o.get("success_rate", 0.0) for o in objs]
        return {
            "best_ids": best,
            "best_objectives": {k: objs[v] for k, v in best.items()},
            "mean_success": float(np.mean(succ)) if succ else 0.0,
        }

    def table_entry(metrics, objective):
        return objs_entry(objectives_table(metrics, objective), objective)

    # fixed-seed noise like the reference validation (diffusion.py:182-183)
    rs = np.random.RandomState(args.seed)
    noise = jnp.asarray(
        rs.randn(b, args.ctrlpts_dim, 1).astype(np.float32)
    )
    if args.render_video:
        # per-step denoising snapshots (reference dumps the sample scatter at
        # every DDIM step during validation, diffusion.py:258-292)
        from dgdm_tpu.eval import viz

        unguided, traj = gtr.sample_trajectory(
            gstate, noise, args.num_inference_steps
        )
        np.save(os.path.join(args.save_dir, "denoise_steps.npy"),
                np.asarray(traj))
        viz.visualize_denoise_steps(
            np.asarray(traj), os.path.join(args.save_dir, "denoise_steps.png")
        )
    else:
        unguided = gtr.sample(gstate, noise, args.num_inference_steps)

    # unguided baseline: sim-evaluate the unguided samples on every test
    # object ONCE (reference diffusion.py:302-305) — reused for the
    # guided-vs-unguided comparison table of every objective (:307-336)
    unguided_metrics = [sim_eval(unguided, oi) for oi in range(len(ids))]

    report = {}
    thr0 = NORM.threshold_std(args.fingers_3d)[0]
    objectives = (
        [o for o in args.objectives.split(",") if o]
        if args.objectives else list(GUIDED_OBJECTIVES)
    )
    # fused design sweep: every (objective, object) pair except convergence
    # rides ONE compiled program (objectives as data — the reference loops 12
    # serial guided_sample calls, generator/diffusion.py:307-339)
    import time as _time

    sweep_samples = {}
    sweep_names = [o for o in objectives if o != "convergence"]
    if sweep_names:
        obj_feats, s_weights, s_rsq, s_scales, s_labels = sampler.sweep_inputs(
            cls_vars, sweep_names, obj_flats, args.fingers_3d
        )
        t0 = _time.perf_counter()
        sweep_out = jax.block_until_ready(
            sampler.sample_sweep(
                ema_params, cls_vars, noise, obj_feats, s_weights, s_rsq,
                s_scales,
            )
        )
        sweep_seconds = _time.perf_counter() - t0
        print(
            f"design sweep: {len(s_labels)} (objective x object) pairs "
            f"sampled in {sweep_seconds:.2f}s (incl. compile)", flush=True,
        )
        sweep_samples = {lab: sweep_out[i] for i, lab in enumerate(s_labels)}
    for objective in objectives:
        per_object = {}
        for oi, oid in enumerate(ids):
            if (objective, oi) in sweep_samples:
                samples = sweep_samples[(objective, oi)]
            else:  # convergence: per-sample pose re-centering, serial path
                centers = sampler.find_convergence_centers(
                    cls_vars, unguided, obj_flats[oi], thr0
                )
                samples = sampler.sample(
                    ema_params, cls_vars, noise, obj_flats[oi], objective,
                    jnp.asarray(GUIDANCE.scale(args.fingers_3d, objective)),
                    centers=centers,
                )
            metrics = sim_eval(samples, oi)
            te = table_entry(metrics, objective)
            per_object[str(oid)] = {
                **te,
                "unguided": table_entry(unguided_metrics[oi], objective),
            }
            np.save(
                os.path.join(args.save_dir, f"samples_{objective}_{oid}.npy"),
                np.asarray(samples),
            )
            if args.render_video and args.fingers_3d:
                # 3D imagery for the best-success gripper: initial-scene
                # render + squeeze rollout video (the reference renders RGB
                # rollouts + contour overlays per generated gripper,
                # dynamics/sim_test_mj_3d.py:164-196, sim/render_mesh.py:39-65,
                # logged in tables generator/diffusion.py:698-709)
                from dgdm_tpu.eval import viz
                from dgdm_tpu.geom.fingers import denormalize_y
                from dgdm_tpu.sim import engine3d

                bi = int(te["best_ids"].get("success_rate", 0))
                yb = np.asarray(denormalize_y(
                    np.asarray(samples)[bi, :, 0], fingers_3d=True))
                stem = os.path.join(args.save_dir, f"{objective}_{oid}")
                verts, faces = meshes[oi]
                scene3 = engine3d.make_scene(yb[:21], yb[21:], verts, faces)
                vid_steps = args.eval_steps or SIM.steps_3d
                tr = np.asarray(engine3d.rollout_trace3d(
                    scene3, jnp.array([0.0, 0.0, 0.7], jnp.float32),
                    steps=vid_steps, every=max(1, vid_steps // 40),
                ))
                viz.render_scene_3d(
                    np.asarray(scene3.points), np.asarray(scene3.com),
                    yb[:21], yb[21:], tr[0], stem + "_scene.png",
                )
                viz.visualize_profile(
                    metrics[bi]["profile"] - 1, stem + "_profile.png"
                )
                viz.rollout_video_3d(
                    np.asarray(scene3.points), np.asarray(scene3.com),
                    yb[:21], yb[21:], tr, stem + "_rollout.mp4",
                )
            if args.render_video and not args.fingers_3d:
                # imagery for the best-success gripper (reference logs wandb
                # tables with these images + a rollout video,
                # generator/diffusion.py:606-619, dynamics/sim_test_mj.py:174-233)
                from dgdm_tpu.eval import viz
                from dgdm_tpu.geom.fingers import denormalize_y
                from dgdm_tpu.sim import engine2d

                bi = int(te["best_ids"].get("success_rate", 0))
                yb = np.asarray(
                    denormalize_y(np.asarray(samples)[bi, :, 0])
                )
                nn_ = len(yb) // 2
                stem = os.path.join(args.save_dir, f"{objective}_{oid}")
                viz.render_gripper_2d(yb[:nn_], yb[nn_:], stem + "_gripper.png")
                viz.visualize_profile(
                    metrics[bi]["profile"] - 1, stem + "_profile.png"
                )
                viz.visualize_finals(
                    metrics[bi]["final_theta"], stem + "_final.png"
                )
                # every-36th-orientation object silhouettes
                # (dynamics/sim_test_mj.py:174-178 renders segmentation
                # images for every 36th rotation)
                sil_th = np.linspace(-1.0, 1.0, args.grid_size) * np.pi + np.pi
                sil = np.stack([
                    viz.render_object_silhouette(contours[oi], float(th))
                    for th in sil_th[:: max(1, args.grid_size // 10)]
                ])
                np.save(stem + "_silhouettes.npy", sil)
                # rollout video of the best gripper at the mid orientation
                vid_steps = args.eval_steps or SIM.eval_steps_2d
                scene = engine2d.make_scene(yb[:nn_], yb[nn_:], contours[oi])
                tr = np.asarray(engine2d.rollout_trace(
                    scene, jnp.array([0.0, 0.0, np.pi], jnp.float32),
                    steps=vid_steps,
                    every=max(1, vid_steps // 100),
                    regrasp_every=eval_kw.get(
                        "regrasp_every", SIM.eval_regrasp_2d),
                ))
                viz.rollout_video_2d(
                    contours[oi], yb[:nn_], yb[nn_:], tr,
                    stem + "_rollout.mp4", stride=1,
                )
        entry = {"objects": per_object}
        # multi-object guided sampling: gradient averaged over ALL test
        # objects (reference guided_sample_multi_object, diffusion.py:621-709;
        # convergence is per-object-centered so it is excluded there too)
        if objective != "convergence":
            scale = jnp.asarray(GUIDANCE.scale(args.fingers_3d, objective))
            msamples = sampler.sample_multi_object(
                ema_params, cls_vars, noise, obj_flats, objective, scale
            )
            mo_objs = [
                objectives_table(sim_eval(msamples, oi), objective)
                for oi in range(len(ids))
            ]
            entry["multi_object"] = {
                str(oid): objs_entry(mo_objs[oi], objective)
                for oi, oid in enumerate(ids)
            }
            # reference picks the best multi-object grippers from the
            # OBJECT-AVERAGED objective table (diffusion.py:686-694)
            avg = average_objectives(mo_objs)
            entry["multi_object_average"] = objs_entry(avg, objective)
            np.save(
                os.path.join(args.save_dir, f"samples_{objective}_multi.npy"),
                np.asarray(msamples),
            )
        report[objective] = entry
        print(f"objective {objective} done", flush=True)
    if sweep_names:
        report["design_sweep"] = {
            "pairs": len(s_labels),
            "seconds_incl_compile": sweep_seconds,
        }
    with open(os.path.join(args.save_dir, "guided_report.json"), "w") as f:
        json.dump(report, f, indent=1, default=str)


if __name__ == "__main__":
    main()

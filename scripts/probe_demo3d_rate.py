"""Decompose demo3d datagen wall time: bake vs dispatch vs fetch.

Round-5 item 6 probe: runs/demo3d datagen measured 77 rollouts/s steady
(425 s for 2 objects x 48 grippers x 360 poses, ~warm kernel) against a
30.8k/s bench rate — this script times each pipeline_3d stage at the demo
shape to find the 400 s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from dgdm_tpu.geom import mesh3d
from dgdm_tpu.geom.fingers import ctrlpts_3d, sample_gripper_3d
from dgdm_tpu.sim import datagen3d, engine2d, engine3d


def main():
    import importlib.util as ilu
    spec = ilu.spec_from_file_location(
        "suite3d", os.path.join(os.path.dirname(__file__),
                                "build_oracle_suite3d.py"))
    m = ilu.module_from_spec(spec)
    spec.loader.exec_module(m)
    objects = [mesh3d.box_mesh(0.04, 0.05, 0.035, 0.035),
               m.prism_mesh(6, 0.05, 0.07, aspect=0.75)]
    N_G = 48
    poses = engine2d.pose_grid(grid_size=40, num_pos=3)
    print("poses", poses.shape, flush=True)

    grips = [sample_gripper_3d(i) for i in range(N_G)]

    # --- stage A: gripper-only geometry (cold then warm) -------------------
    t = time.time()
    ctrl = [ctrlpts_3d(yl, yr) for yl, yr in grips]
    allp = [datagen3d.surface_points_3d(yl, yr) for yl, yr in grips]
    print("gripper pts: %.2fs" % (time.time() - t), flush=True)

    for oi, (v, f) in enumerate(objects):
        t = time.time()
        props = engine3d.object_properties_3d(v, f)
        t_props = time.time() - t
        t = time.time()
        scenes = [engine3d.make_scene(yl, yr, v, f, obj_props=props)
                  for yl, yr in grips]
        t_scene = time.time() - t
        t = time.time()
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *scenes)
        t_stack = time.time() - t
        t = time.time()
        res = datagen3d.profile_pairs_3d(stacked, poses, block=False)
        t_disp = time.time() - t
        t = time.time()
        out = datagen3d.fetch_pairs_3d(res)
        t_fetch = time.time() - t
        n_roll = N_G * poses.shape[0]
        print("obj%d: props %.2fs scenes %.2fs stack %.2fs dispatch %.2fs "
              "fetch(wait) %.2fs -> device rollouts/s %.0f, "
              "total-stage rollouts/s %.0f"
              % (oi, t_props, t_scene, t_stack, t_disp, t_fetch,
                 n_roll / max(t_disp + t_fetch, 1e-9),
                 n_roll / (t_props + t_scene + t_stack + t_disp + t_fetch)),
              flush=True)
        # second fetch on identical scene: warm-path device rate
        t = time.time()
        res = datagen3d.profile_pairs_3d(stacked, poses, block=False)
        out = datagen3d.fetch_pairs_3d(res)
        print("obj%d warm redispatch+fetch: %.2fs (%.0f rollouts/s)"
              % (oi, time.time() - t, n_roll / (time.time() - t)),
              flush=True)


if __name__ == "__main__":
    main()

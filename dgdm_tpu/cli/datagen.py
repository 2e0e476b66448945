"""Datagen CLI — the counterpart of ``sim/run_sim_2d.sh`` + ``sim/sim_2d.py``.

One invocation sweeps a range of objects x grippers through the batched TPU
engine and writes reference-format npz shards. Objects come from an
Icons-50.npy file (same format the reference expects, ``sim/sim_2d.py:24``)
or, absent that, from deterministic synthetic icons for smoke runs.

Example (reference: 1000 objects x 1000 grippers):
    python -m dgdm_tpu.cli.datagen --object_dir Icons-50.npy \
        --num_objects 1000 --num_fingers 1000 --save_dir data/sim2d
"""

from __future__ import annotations

import time

import numpy as np

from dgdm_tpu.core.flags import build_parser
from dgdm_tpu.geom.contour import extract_contours


def load_icon(object_dir: str, idx: int) -> np.ndarray:
    data = np.load(object_dir, allow_pickle=True).item()
    return data["image"][idx].transpose((1, 2, 0))


def synthetic_icon(idx: int, size: int = 64) -> np.ndarray:
    rng = np.random.RandomState(idx)
    yy, xx = np.mgrid[0:size, 0:size]
    c = size / 2
    ang = np.arctan2(yy - c, xx - c)
    r = np.hypot(xx - c, yy - c)
    rad = size * 0.35 * (
        1 + 0.25 * np.sin(3 * ang + rng.uniform(0, 6)) + 0.1 * np.sin(7 * ang)
    )
    img = np.where(r < rad, 30, 255).astype(np.uint8)
    return np.stack([img] * 3, -1)


def main(argv=None):
    p = build_parser()
    p.add_argument("--num_objects", type=int, default=1)
    p.add_argument("--object_start", type=int, default=0)
    p.add_argument("--gripper_start", type=int, default=0)
    args = p.parse_args(argv)

    # software-pipelined (sim/pipeline.py): bake of the next object's wave
    # and the previous wave's npz writes hide under the current wave's
    # device time — same npz output as the serial generate_2d path (tested)
    from dgdm_tpu.sim.pipeline import pipeline_2d

    def objects():
        for oi in range(args.object_start,
                        args.object_start + args.num_objects):
            image = (load_icon(args.object_dir, oi) if args.object_dir
                     else synthetic_icon(oi))
            yield oi, extract_contours(image)

    total_pairs = 0
    t0 = time.time()
    for g0 in range(
        args.gripper_start, args.gripper_start + args.num_fingers,
        args.pairs_per_batch,
    ):
        gidx = list(
            range(g0, min(g0 + args.pairs_per_batch,
                          args.gripper_start + args.num_fingers))
        )
        out = pipeline_2d(
            list(objects()), gidx, save_dir=args.save_dir,
            grid_size=args.grid_size, num_pos=args.num_pos,
        )
        total_pairs += out["pairs"]
        rate = total_pairs * args.grid_size * args.num_pos**2 / (
            time.time() - t0
        )
        print(
            f"grippers {gidx[0]}..{gidx[-1]} x {args.num_objects} objects "
            f"done ({rate:,.0f} rollouts/s cumulative)",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Diffusion-generator training CLI — counterpart of ``generator/train.py`` +
``generator/train_diffusion_2d.sh`` (200k procedural grippers, batch 2048,
1000 epochs, DDIM 15 train timesteps, EMA power 0.85).

Example:
    python -m dgdm_tpu.cli.train_diffusion --num_fingers 200000 \
        --batch_size 2048 --num_epochs 1000 --save_dir runs/diff2d
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from dgdm_tpu.core.flags import build_parser
from dgdm_tpu.core.profiling import StepTimer, TraceWindow
from dgdm_tpu.models.unet1d import ConditionalUnet1D
from dgdm_tpu.parallel import mesh as meshlib
from dgdm_tpu.train import checkpoints
from dgdm_tpu.train.data import procedural_grippers
from dgdm_tpu.train.generator import GeneratorTrainer
from dgdm_tpu.train.logging import MetricSink


def main(argv=None):
    args = build_parser().parse_args(argv)
    # multi-host: no-op single-host; on a pod/fleet the mesh below spans all
    # hosts (reference reads NODE_RANK for Lightning DDP, generator/train.py:35)
    from dgdm_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    train, val = procedural_grippers(args.num_fingers, args.fingers_3d)
    model = ConditionalUnet1D(input_dim=1)
    steps_per_epoch = max(1, len(train) // args.batch_size)
    trainer = GeneratorTrainer(
        model,
        learning_rate=args.learning_rate,
        total_steps=args.num_epochs * steps_per_epoch,
        num_train_timesteps=args.num_train_timesteps,
        ema_power=args.ema_power,
        warmup_steps=args.lr_warmup_steps,
    )
    state = trainer.init(
        jax.random.PRNGKey(args.seed), jnp.asarray(train[: args.batch_size])
    )
    if args.diffusion_checkpoint_path:
        state = checkpoints.restore(args.diffusion_checkpoint_path, state)

    # multi-device data parallelism (reference: generator/train.py:152 runs
    # Lightning DDP with devices=-1 by default) — params replicate, batches
    # shard on dp, XLA inserts the gradient psum over ICI
    mesh = meshlib.data_parallel_mesh()
    if mesh is not None:
        state = meshlib.replicate(mesh, state)
        if jax.process_index() == 0:
            print(f"data-parallel over {mesh.shape['dp']} devices"
                  f" ({jax.process_count()} processes)")

    def shard(batch):
        # multi-host: every process builds the same global batch (same seed)
        # and shard_global_batch keeps its block — DDP-sampler analog
        if mesh is None:
            return batch
        return meshlib.shard_global_batch(mesh, batch, "dp")

    sink = MetricSink(args.save_dir, project="gripper_diffusion",
                      run_name=args.wandb_id)
    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed + 1)
    step = 0
    best: list = []  # (val_loss, path) top-k checkpoints
    timer = StepTimer()
    tracer = TraceWindow(args.profile_dir)
    for epoch in range(args.num_epochs):
        order = rng.permutation(len(train))
        for lo in range(0, len(order) - args.batch_size + 1, args.batch_size):
            batch = jnp.asarray(train[order[lo : lo + args.batch_size]])
            key, k = jax.random.split(key)
            tracer.step(step)
            state, metrics = trainer.train_step(state, shard(batch), k)
            step += 1
            timer.tick(args.batch_size)
            if step % 50 == 0:
                sink.log({f"train/{m}": v for m, v in metrics.items()}, step)
                sink.log({"perf/grippers_per_second": timer.rate()}, step)
        if epoch % args.val_step == 0 and len(val) >= args.batch_size:
            key, k = jax.random.split(key)
            vbatch = shard(jnp.asarray(val[: args.batch_size]))
            vm = trainer.eval_step(state, vbatch, k)
            vm.update(trainer.recon_metrics(
                state, vbatch, k, args.num_inference_steps
            ))
            sink.log({f"val/{m}": float(v) for m, v in vm.items()}, step)
            # top-k-by-val checkpointing (reference keeps top-10 by epoch,
            # generator/train.py:138-147; val loss is the better criterion)
            vloss = float(vm.get("loss", float("inf")))
            if len(best) < 10 or vloss < best[-1][0]:
                path = os.path.join(args.save_dir, "ckpt", f"best_e{epoch}")
                checkpoints.save(path, state)
                best.append((vloss, path))
                best.sort(key=lambda t: t[0])
                for _, stale in best[10:]:
                    import shutil

                    shutil.rmtree(stale, ignore_errors=True)
                best = best[:10]
        if (epoch + 1) % 50 == 0:
            checkpoints.save(
                os.path.join(args.save_dir, "ckpt", f"step_{step}"), state
            )
    tracer.close()
    checkpoints.save(os.path.join(args.save_dir, "ckpt", "last"), state)
    sink.close()


if __name__ == "__main__":
    main()

"""Dynamics-model training CLI — counterpart of ``dynamics/main.py`` +
``dynamics/train_dynamics_2d.sh``.

Example:
    python -m dgdm_tpu.cli.train_dynamics --data_dir data/sim2d \
        --test_data_dir data/sim2d_val --save_dir runs/dyn2d \
        --num_epochs 100 --batch_size 4
(batch_size counts PAIRS; each pair expands to grid_size*num_pos^2 rows like
the reference's in-loop reshape, dynamics/main.py:143-147.)
"""

from __future__ import annotations

import os

import jax
import numpy as np

from dgdm_tpu.core.flags import build_parser
from dgdm_tpu.core.profiling import StepTimer, TraceWindow
from dgdm_tpu.models.profile2d import ProfileForward2D
from dgdm_tpu.parallel import mesh as meshlib
from dgdm_tpu.train import checkpoints
from dgdm_tpu.train.data import DynamicsData
from dgdm_tpu.train.dynamics import DynamicsTrainer
from dgdm_tpu.train.logging import MetricSink


def _shard(mesh, batch):
    """Trim the row dim to a dp multiple and shard (replicated if no mesh).

    Multi-host: ``shard_global_batch`` keeps only this process's block of the
    seed-identical global batch (DDP-sampler analog) and builds global arrays.
    """
    if mesh is None:
        return batch
    return meshlib.shard_global_batch(mesh, batch, "dp")


def main(argv=None):
    args = build_parser().parse_args(argv)
    # multi-host: no-op single-host; on a pod/fleet the mesh below spans all
    # hosts (reference reads NODE_RANK for Lightning DDP, generator/train.py:35)
    from dgdm_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    train_data = DynamicsData(args.data_dir, args.object_max_num_vertices,
                              mirror_augment=args.mirror_augment)
    val_data = DynamicsData(args.test_data_dir, args.object_max_num_vertices)
    assert len(train_data) > 0, f"no npz shards under {args.data_dir}"

    import jax.numpy as jnp

    model = ProfileForward2D(
        params_ch=args.ctrlpts_dim,
        object_ch=2 * args.object_max_num_vertices,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
    )
    steps_per_epoch = max(1, len(train_data) // max(args.batch_size, 1))
    trainer = DynamicsTrainer(
        model,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        total_steps=args.num_epochs * steps_per_epoch,
        num_train_timesteps=args.num_train_timesteps,
        warmup_steps=args.lr_warmup_steps,
    )
    rng = np.random.RandomState(args.seed)
    first = next(train_data.batches(args.batch_size, rng))
    state = trainer.init(jax.random.PRNGKey(args.seed), first)
    if args.checkpoint_path:
        state = checkpoints.restore(args.checkpoint_path, state)

    # multi-device data parallelism (reference: dynamics/trainer.py:41-43
    # wraps every run in DataParallel) — params replicate, batches shard on
    # dp, XLA inserts the gradient psum over ICI
    mesh = meshlib.data_parallel_mesh()
    if mesh is not None:
        state = meshlib.replicate(mesh, state)
        if jax.process_index() == 0:
            print(f"data-parallel over {mesh.shape['dp']} devices"
                  f" ({jax.process_count()} processes)")

    sink = MetricSink(args.save_dir, project="dynamics_model",
                      run_name=args.wandb_id)
    key = jax.random.PRNGKey(args.seed + 1)

    def run_eval():
        nonlocal key
        ms = []
        for batch in val_data.batches(args.batch_size, rng, shuffle=False):
            key, k = jax.random.split(key)
            ms.append(trainer.eval_step(state, _shard(mesh, batch), k))
        return {
            f"val/{m}": float(np.mean([float(x[m]) for x in ms]))
            for m in ms[0]
        } if ms else {}

    if args.mode == "validate":
        print(run_eval())
        return

    best_val = float("inf")
    last_best = 0
    step = 0
    timer = StepTimer()
    tracer = TraceWindow(args.profile_dir)
    for epoch in range(args.num_epochs):
        for batch in train_data.batches(args.batch_size, rng):
            key, k = jax.random.split(key)
            rows = next(iter(jax.tree.leaves(batch))).shape[0]
            tracer.step(step)
            state, metrics = trainer.train_step(state, _shard(mesh, batch), k)
            step += 1
            timer.tick(rows)
            if step % 20 == 0:
                sink.log({f"train/{m}": v for m, v in metrics.items()}, step)
                sink.log({"perf/rows_per_second": timer.rate()}, step)
            if step % args.save_ckpt_step == 0:
                checkpoints.save(
                    os.path.join(args.save_dir, "ckpt", f"step_{step}"), state
                )
        if epoch % args.val_step == 0 and len(val_data) > 0:
            vm = run_eval()
            sink.log(vm, step)
            if vm.get("val/loss", float("inf")) < best_val:
                best_val = vm["val/loss"]
                checkpoints.save(os.path.join(args.save_dir, "ckpt", "best"),
                                 state)
                last_best = epoch
            elif epoch - last_best >= args.patience:
                print("early stopping")
                break
    tracer.close()
    checkpoints.save(os.path.join(args.save_dir, "ckpt", "last"), state)
    sink.close()


if __name__ == "__main__":
    main()

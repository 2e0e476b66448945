"""Subprocess harness for the multi-host smoke test (not a pytest module).

Each process: initializes ``jax.distributed`` from the reference-parity env
contract (``parallel/distributed.py``), builds the dp mesh over the GLOBAL
device set, replicates a GeneratorTrainer state, runs 3 train steps on
seed-identical global batches split per-process by ``shard_global_batch``,
and prints a param checksum — the parent asserts the 2-process run matches
the 1-process run (same global batch => same optimizer trajectory), and that
checkpoint/metric writes happened on rank 0 only.

Usage: python distributed_harness.py <rank> <nproc> <port> <outdir>
"""
import os
import sys

rank, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["DGDM_COORDINATOR"] = f"localhost:{port}"
os.environ["NODE_RANK"] = str(rank)
os.environ["DGDM_NUM_NODES"] = str(nproc)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_dgdm")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dgdm_tpu.models.unet1d import ConditionalUnet1D  # noqa: E402
from dgdm_tpu.parallel import mesh as meshlib  # noqa: E402
from dgdm_tpu.parallel.distributed import (  # noqa: E402
    maybe_initialize_distributed,
)
from dgdm_tpu.train import checkpoints  # noqa: E402
from dgdm_tpu.train.data import procedural_grippers  # noqa: E402
from dgdm_tpu.train.generator import GeneratorTrainer  # noqa: E402
from dgdm_tpu.train.logging import MetricSink  # noqa: E402

multi = maybe_initialize_distributed(verbose=False)
assert multi == (nproc > 1), (multi, nproc)
assert jax.process_count() == nproc
assert jax.device_count() == 2 * nproc, jax.device_count()

train, _ = procedural_grippers(64, fingers_3d=False)
model = ConditionalUnet1D(input_dim=1)
trainer = GeneratorTrainer(model, learning_rate=1e-3, total_steps=3,
                           num_train_timesteps=15)
state = trainer.init(jax.random.PRNGKey(0), jnp.asarray(train[:16]))

mesh = meshlib.data_parallel_mesh()
assert mesh is not None and mesh.shape["dp"] == 2 * nproc
state = meshlib.replicate(mesh, state)

key = jax.random.PRNGKey(1)
for step in range(3):
    # GLOBAL batch, identical on every process (same seed)
    batch = meshlib.shard_global_batch(
        mesh, jnp.asarray(train[step * 16 : (step + 1) * 16]), "dp"
    )
    key, k = jax.random.split(key)
    state, metrics = trainer.train_step(state, batch, k)

checksum = float(
    sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(state.params))
)
print(f"CHECKSUM {checksum:.10f}", flush=True)

# rank-gated metric sink: every rank opens one against its own dir, only
# rank 0 actually writes
sink = MetricSink(os.path.join(outdir, f"rank{rank}"), use_wandb=False)
sink.log({"smoke": 1.0}, 0)
sink.close()
# collective checkpoint save: ALL ranks call with the same path; orbax's
# primary host writes alone
checkpoints.save(os.path.join(outdir, "ckpt", "smoke"), state)
print("DONE", flush=True)

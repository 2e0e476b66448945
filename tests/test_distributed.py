"""Multi-host path smoke test: 2 CPU processes under ``jax.distributed``.

The reference's multi-node story is Lightning DDP reading ``NODE_RANK``
(``generator/train.py:35,152``) — per-rank data shards, NCCL grad all-reduce,
rank-zero-only logging/checkpointing. This test exercises the equivalents
for real: ``parallel/distributed.maybe_initialize_distributed``,
``mesh.shard_global_batch`` (per-process block of a seed-identical global
batch), ``mesh.replicate`` (multi-host path), rank-gated ``MetricSink`` and
``checkpoints.save`` — and asserts the 2-process optimizer trajectory matches
the 1-process one on the same global batches.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HARNESS = os.path.join(os.path.dirname(__file__), "distributed_harness.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(nproc, outdir):
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, HARNESS, str(r), str(nproc), str(port), outdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for r in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    sums = []
    for out in outs:
        assert "DONE" in out, out[-3000:]
        line = [ln for ln in out.splitlines() if ln.startswith("CHECKSUM")]
        assert line, out[-3000:]
        sums.append(float(line[0].split()[1]))
    return sums


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path):
    s2 = _run(2, str(tmp_path / "p2"))
    s1 = _run(1, str(tmp_path / "p1"))
    # both ranks agree bit-for-bit (replicated state)
    assert s2[0] == s2[1]
    # 2-process (4 devices) trajectory == 1-process (2 devices) trajectory
    # up to reduction-order float noise
    np.testing.assert_allclose(s2[0], s1[0], rtol=1e-4)

    # rank 0 wrote metrics; rank 1 did not; the collective save produced
    # exactly one checkpoint at the shared path
    p2 = tmp_path / "p2"
    assert (p2 / "rank0" / "metrics.jsonl").exists()
    rec = json.loads(
        (p2 / "rank0" / "metrics.jsonl").read_text().splitlines()[0]
    )
    assert rec["smoke"] == 1.0
    assert not (p2 / "rank1" / "metrics.jsonl").exists()
    assert (p2 / "ckpt" / "smoke").exists()

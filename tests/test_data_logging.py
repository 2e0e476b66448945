"""Coverage for shard-reading datasets and the metric sink."""

import json

import numpy as np

from dgdm_tpu.eval.viz import render_object_silhouette  # noqa: F401 (import check)
from dgdm_tpu.geom.contour import extract_contours
from dgdm_tpu.sim.datagen import generate_2d
from dgdm_tpu.train.data import DynamicsData
from dgdm_tpu.train.logging import MetricSink
from tests.util_icons import make_icon


def test_dynamics_data_reads_shards(tmp_path):
    contour = extract_contours(make_icon(2))
    generate_2d(
        5, contour, [0, 1, 2], save_dir=str(tmp_path), grid_size=4, num_pos=1
    )
    ds = DynamicsData(str(tmp_path))
    assert len(ds) == 3
    row = ds.load(0)
    assert row["ctrl"].shape == (4, 14)
    assert row["obj"].shape == (4, 200)
    assert np.abs(row["ctrl"]).max() <= 1.0 + 1e-6
    rng = np.random.RandomState(0)
    batches = list(ds.batches(2, rng))
    assert batches[0]["score"].shape == (8, 3)   # 2 pairs x 4 poses
    assert batches[1]["score"].shape == (4, 3)   # remainder


def test_metric_sink_jsonl(tmp_path):
    sink = MetricSink(str(tmp_path), use_wandb=False)
    sink.log({"loss": 1.5, "name": "x"}, step=3)
    sink.log({"loss": np.float32(0.5)}, step=4)
    sink.close()
    lines = [json.loads(l) for l in open(sink.path)]
    assert lines[0]["loss"] == 1.5 and lines[0]["step"] == 3
    assert lines[1]["loss"] == 0.5


def test_mirror_rows_preserves_padding_layout():
    """mirror_rows_2d must reverse only the real-vertex prefix: zero padding
    appended by normalize_record_2d stays at the TAIL of the mirrored row
    (ADVICE r2: a full-axis flip moved it to the front)."""
    from dgdm_tpu.train.data import mirror_rows_2d

    rng = np.random.RandomState(0)
    nv, vmax = 6, 10
    verts = np.zeros((vmax, 2), np.float32)
    verts[:nv] = rng.uniform(-1, 1, (nv, 2))
    rows = {
        "ctrl": rng.uniform(-1, 1, (1, 14)).astype(np.float32),
        "ori": np.zeros((1, 1), np.float32),
        "pos": rng.uniform(-1, 1, (1, 2)).astype(np.float32),
        "obj": verts.reshape(1, -1),
        "score": rng.randn(1, 3).astype(np.float32),
    }
    m = mirror_rows_2d(rows)
    mv = m["obj"].reshape(vmax, 2)
    # padding still at the tail
    assert (mv[nv:] == 0).all()
    # prefix is the x-flipped, order-reversed real contour
    expect = (verts[:nv] * np.asarray([-1.0, 1.0]))[::-1]
    np.testing.assert_allclose(mv[:nv], expect, atol=1e-7)
    # involution on the real prefix: mirroring twice restores the input
    m2 = mirror_rows_2d(m)
    np.testing.assert_allclose(
        m2["obj"].reshape(vmax, 2), verts, atol=1e-7)

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

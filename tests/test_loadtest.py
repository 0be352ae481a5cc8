"""Serving load-test harness (``infer/loadtest.py``).

Pins the machinery behind ``bench.py --mode serve`` and
``scripts/loadtest_serve.py`` (the BASELINE.md serving table): the
closed-loop clients complete without errors, latency percentiles are
ordered and positive, the reported throughput is consistent with the
request count, and the micro-batching stats (device batches, occupancy)
come from the server's own counters.
"""

import jax
import pytest

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.infer.export import (
    export_serving_artifact,
    load_serving_artifact,
)
from pdac_pathological_image_segmentation_tpu.infer.loadtest import (
    serve_and_loadtest,
)
from pdac_pathological_image_segmentation_tpu.models.registry import build_model
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)

TILE = 64


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = Config(model="unet", backbone="resnet18", img_size=TILE,
                 compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    path = str(tmp_path_factory.mktemp("lt") / "model.pdacsrv")
    export_serving_artifact(cfg, state, path, platforms=("cpu",))
    return load_serving_artifact(path)


def test_loadtest_micro_batched(artifact):
    res = serve_and_loadtest(
        artifact, buckets=(1, 4), max_wait_ms=20.0,
        concurrency=4, n_requests=24, aot=False)
    assert res["errors"] == 0
    assert res["requests"] == 24
    assert res["requests_per_s"] > 0
    assert 0 < res["latency_ms_p50"] <= res["latency_ms_p90"]
    assert res["latency_ms_p90"] <= res["latency_ms_p99"]
    # stats come from the server's own counters, delta'd over the run
    assert res["device_batches"] >= 1
    assert res["mean_batch_size"] >= 1.0
    assert 0 < res["mean_bucket_occupancy"] <= 1.0
    # with 4 concurrent closed-loop clients and a 20 ms window, at least
    # one dispatch must have coalesced more than one tile
    assert res["mean_batch_size"] > 1.0


def test_loadtest_single_dispatch_ab(artifact):
    """The no-micro-batching strawman: every request is its own bs=1
    dispatch, so batches == requests and occupancy is exactly 1."""
    res = serve_and_loadtest(
        artifact, buckets=(1,), max_wait_ms=0.0,
        concurrency=2, n_requests=10, aot=False)
    assert res["errors"] == 0
    assert res["device_batches"] == res["requests"]
    assert res["mean_batch_size"] == 1.0
    assert res["mean_bucket_occupancy"] == 1.0

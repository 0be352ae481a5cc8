"""Serving daemon (``infer/server.py``, ``cli/serve.py``).

An extension beyond the reference (no serving story there —
``/root/reference/test.py:94-135`` unpickles ``best.pth`` into the
training codebase).  Pinned here: HTTP responses match the direct
artifact call exactly (PNG quantization aside, the raw float32 path is
bit-equal), concurrent requests coalesce into shared bucket batches,
padding tiles never leak into results, resize-on-ingest, and the error
surface (bad content type, bad shape header, unknown route).
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.infer.export import (
    export_serving_artifact,
    load_serving_artifact,
)
from pdac_pathological_image_segmentation_tpu.infer.server import (
    MicroBatcher,
    SegmentationServer,
    _decode_body,
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
    path = str(tmp_path_factory.mktemp("srv") / "model.pdacsrv")
    export_serving_artifact(cfg, state, path, platforms=("cpu",))
    return load_serving_artifact(path)


@pytest.fixture(scope="module")
def server(artifact):
    srv = SegmentationServer(("127.0.0.1", 0), artifact,
                             buckets=(1, 4), max_wait_ms=20.0)
    srv.start(warmup=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _url(server, path):
    host, port = server.server_address[:2]
    return f"http://{host}:{port}{path}"


def _post(server, body, headers, path="/v1/segment"):
    req = urllib.request.Request(_url(server, path), data=body,
                                 headers=headers, method="POST")
    return urllib.request.urlopen(req, timeout=60)


def test_healthz_and_metadata(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["model"] == "unet"
    with urllib.request.urlopen(_url(server, "/v1/metadata"),
                                timeout=30) as r:
        meta = json.loads(r.read())
    assert meta["artifact"]["tile"] == TILE
    assert meta["buckets"] == [1, 4]


def test_raw_roundtrip_matches_artifact(server, artifact):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (TILE, TILE, 3), dtype=np.uint8)
    resp = _post(server, img.tobytes(), {
        "Content-Type": "application/octet-stream",
        "X-Image-Shape": f"{TILE},{TILE},3",
        "Accept": "application/octet-stream",
    })
    shape = tuple(int(v) for v in
                  resp.headers["X-Prob-Shape"].split(","))
    probs = np.frombuffer(resp.read(), np.float32).reshape(shape)
    direct = np.asarray(artifact(img[None]), np.float32)[0]
    np.testing.assert_allclose(probs, direct, atol=1e-6, rtol=0)
    frac = float(resp.headers["X-Tumor-Fraction"])
    assert frac == pytest.approx(float((direct >= 0.5).mean()), abs=1e-5)


def test_png_roundtrip(server, artifact):
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (TILE, TILE, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    resp = _post(server, buf.getvalue(), {"Content-Type": "image/png"})
    assert resp.headers["Content-Type"] == "image/png"
    mask = np.asarray(Image.open(io.BytesIO(resp.read())))
    direct = np.asarray(artifact(img[None]), np.float32)[0]
    expected = np.round(direct * 255.0).clip(0, 255).astype(np.uint8)
    np.testing.assert_array_equal(mask, expected)


def test_resize_on_ingest(server, artifact):
    """A 2×-size PNG is resized host-side to the tile before inference."""
    from PIL import Image

    rng = np.random.default_rng(2)
    big = rng.integers(0, 256, (2 * TILE, 2 * TILE, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(big).save(buf, format="PNG")
    resp = _post(server, buf.getvalue(), {"Content-Type": "image/png",
                                          "Accept": "application/octet-stream"})
    shape = tuple(int(v) for v in resp.headers["X-Prob-Shape"].split(","))
    assert shape == (TILE, TILE)
    small = np.asarray(
        Image.fromarray(big).resize((TILE, TILE), Image.BILINEAR), np.uint8)
    direct = np.asarray(artifact(small[None]), np.float32)[0]
    probs = np.frombuffer(resp.read(), np.float32).reshape(shape)
    np.testing.assert_allclose(probs, direct, atol=1e-6, rtol=0)


def test_concurrent_requests_coalesce(server, artifact):
    """8 parallel clients over buckets (1,4) finish in >=2 but <8 device
    batches — micro-batching shares MXU dispatches."""
    before = server.batcher.stats()
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (8, TILE, TILE, 3), dtype=np.uint8)
    results = [None] * 8
    errors = []

    def hit(i):
        try:
            resp = _post(server, imgs[i].tobytes(), {
                "Content-Type": "application/octet-stream",
                "X-Image-Shape": f"{TILE},{TILE},3",
                "Accept": "application/octet-stream",
            })
            results[i] = np.frombuffer(resp.read(), np.float32).reshape(
                TILE, TILE)
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    direct = np.asarray(artifact(imgs), np.float32)
    for i in range(8):
        np.testing.assert_allclose(results[i], direct[i], atol=1e-6, rtol=0)
    after = server.batcher.stats()
    n_batches = after["batches"] - before["batches"]
    assert 2 <= n_batches < 8, f"expected coalescing, got {n_batches} batches"


def test_error_surface(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, b"bytes", {"Content-Type": "text/plain"})
    assert e.value.code == 415
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, b"short", {"Content-Type": "application/octet-stream",
                                 "X-Image-Shape": f"{TILE},{TILE},3"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, b"x", {"Content-Type": "image/png"}, path="/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, b"not a png", {"Content-Type": "image/png"})
    assert e.value.code == 400


def test_stats_shape(server):
    with urllib.request.urlopen(_url(server, "/v1/stats"), timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 1
    assert stats["batches"] >= 1
    assert "latency_ms_p50" in stats


def test_decode_body_validation():
    with pytest.raises(ValueError, match="X-Image-Shape"):
        _decode_body(b"", "application/octet-stream", "", TILE)
    with pytest.raises(ValueError, match="3-channel"):
        _decode_body(b"\0" * (4 * 4 * 4), "application/octet-stream",
                     "4,4,4", TILE)
    with pytest.raises(TypeError, match="unsupported"):
        _decode_body(b"", "video/mp4", "", TILE)


def test_batcher_rejects_bad_tile(artifact):
    b = MicroBatcher(artifact, buckets=(1,))
    b.start(warmup=False)
    try:
        with pytest.raises(ValueError, match="expected uint8"):
            b.submit(np.zeros((TILE, TILE), np.uint8))
    finally:
        b.stop()


def test_batcher_stop_unblocks(artifact):
    b = MicroBatcher(artifact, buckets=(1,))
    with pytest.raises(RuntimeError, match="not running"):
        b.submit(np.zeros((TILE, TILE, 3), np.uint8))


def test_geojson_response(server, artifact):
    """Accept: application/geo+json returns QuPath annotation polygons
    that rasterize back to the thresholded probability map exactly."""
    from pdac_pathological_image_segmentation_tpu.data.geojson import (
        parse_geojson,
        rasterize_shapes,
    )

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (TILE, TILE, 3), dtype=np.uint8)
    resp = _post(server, img.tobytes(), {
        "Content-Type": "application/octet-stream",
        "X-Image-Shape": f"{TILE},{TILE},3",
        "Accept": "application/geo+json",
    })
    assert resp.headers["Content-Type"] == "application/geo+json"
    fc = json.loads(resp.read())
    assert fc["type"] == "FeatureCollection"
    direct = np.asarray(artifact(img[None]), np.float32)[0]
    mask = direct >= 0.5
    shapes = parse_geojson(fc)
    re_mask = rasterize_shapes(shapes, TILE, TILE).astype(bool)
    assert np.array_equal(re_mask, mask)
    if fc["features"]:
        meas = fc["features"][0]["properties"]["measurements"]
        assert meas["tumor_fraction"] == pytest.approx(
            float(resp.headers["X-Tumor-Fraction"]), abs=1e-5)


def test_u8_response_repr(server, artifact):
    """Accept: application/octet-stream;repr=u8 returns probabilities
    quantized to uint8 (4x smaller response — the thin-host serving
    lever), flagged via X-Prob-Repr."""
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (TILE, TILE, 3), dtype=np.uint8)
    resp = _post(server, img.tobytes(), {
        "Content-Type": "application/octet-stream",
        "X-Image-Shape": f"{TILE},{TILE},3",
        "Accept": "application/octet-stream;repr=u8",
    })
    assert resp.headers["X-Prob-Repr"] == "u8"
    shape = tuple(int(v) for v in resp.headers["X-Prob-Shape"].split(","))
    body = resp.read()
    assert len(body) == shape[0] * shape[1]  # 1 byte/px
    u8 = np.frombuffer(body, np.uint8).reshape(shape)
    direct = np.asarray(artifact(img[None]), np.float32)[0]
    np.testing.assert_array_equal(
        u8, np.round(direct * 255.0).clip(0, 255).astype(np.uint8))
    # the float32 default still reports its repr
    resp32 = _post(server, img.tobytes(), {
        "Content-Type": "application/octet-stream",
        "X-Image-Shape": f"{TILE},{TILE},3",
        "Accept": "application/octet-stream",
    })
    assert resp32.headers["X-Prob-Repr"] == "f32"

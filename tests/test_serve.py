"""Serving layer: DynamicBatcher coalescing/correctness and the HTTP
endpoint (``inference/server.py``, CLI ``serve``).

Correctness contract: a request served through the batcher (inside a padded
batch, possibly sharing the dispatch with other requests) must return
EXACTLY the rows the plain Detector produces for that image alone — the
NMS/decode path is per-image, so batching must be invisible.
"""

import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.inference import (DetectionServer, Detector,
                                       DynamicBatcher, detections_to_lists,
                                       make_batch_fn)
from yolofastest_tpu.models import load_variables, zoo_path

GOLDEN_DIR = "/root/reference/test_data"


def _golden_paths(n):
    if not os.path.isdir(GOLDEN_DIR):
        pytest.skip("reference golden images not present")
    names = sorted(f for f in os.listdir(GOLDEN_DIR) if f.endswith(".jpg"))
    return [os.path.join(GOLDEN_DIR, f) for f in names[:n]]


@pytest.fixture(scope="module")
def detector():
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    cfg = get_config("256x320")
    return Detector(cfg, variables=load_variables(zoo_path("256x320")),
                    fold_bn=True), cfg


def _expected_rows(det: Detector, net_in: np.ndarray):
    return detections_to_lists(det.run(net_in[None]))[0]


def _rows_close(a, b):
    assert len(a) == len(b)
    if a:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)


# ------------------------------------------------------------------ batcher
@pytest.mark.slow
def test_batcher_matches_plain_detector_and_coalesces(detector):
    det, cfg = detector
    paths = _golden_paths(4)
    nets = [det.preprocess_host(p)[0][0] for p in paths]
    expected = [_expected_rows(det, n) for n in nets]

    batcher = DynamicBatcher(make_batch_fn(det), cfg.io.input_hw,
                             max_batch=4, window_ms=400.0)
    try:
        # 4 concurrent requests released together: the 400 ms window
        # guarantees they coalesce into one padded batch.
        barrier = threading.Barrier(len(nets))
        results = [None] * len(nets)

        def client(i):
            barrier.wait()
            results[i] = batcher.submit(nets[i])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(nets))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        for got, want in zip(results, expected):
            assert got is not None
            _rows_close(got, want)
        assert batcher.stats["requests"] == len(nets)
        assert batcher.stats["max_batch_seen"] >= 2  # they really coalesced
        assert batcher.stats["errors"] == 0

        # a lone request through the padded batch must be identical too
        _rows_close(batcher.submit(nets[0]), expected[0])
    finally:
        batcher.close()


def test_batcher_rejects_wrong_shape():
    # stub batch_fn: shape validation needs no device (and no jit compile)
    batcher = DynamicBatcher(lambda batch, n: [[]] * n, (32, 32),
                             max_batch=1, window_ms=1.0)
    try:
        with pytest.raises(ValueError, match="expected net input"):
            batcher.submit(np.zeros((8, 8, 1), np.float32))
    finally:
        batcher.close()


def test_batcher_native_fn_sees_only_valid_rows():
    # the per-image (native) adapter contract: padding rows must never be
    # processed — the batch_fn receives n and slices
    seen = []

    def fn(batch, n):
        seen.append(n)
        return [[] for _ in batch[:n]]

    batcher = DynamicBatcher(fn, (32, 32), max_batch=8, window_ms=1.0)
    try:
        batcher.submit(np.zeros((32, 32, 1), np.float32))
        assert seen == [1, 1]  # warmup + the single request, never 8
    finally:
        batcher.close()


def test_batcher_surfaces_batch_fn_errors():
    calls = {"n": 0}

    def boom(batch, n):
        calls["n"] += 1
        if calls["n"] == 1:  # warmup call must succeed
            return [[] for _ in batch[:n]]
        raise RuntimeError("device fell over")

    batcher = DynamicBatcher(boom, (32, 32), max_batch=2, window_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="batch execution failed"):
            batcher.submit(np.zeros((32, 32, 1), np.float32))
        assert batcher.stats["errors"] == 1
        # the worker must survive an erroring batch and keep serving
        with pytest.raises(RuntimeError):
            batcher.submit(np.zeros((32, 32, 1), np.float32))
    finally:
        batcher.close()


def test_batcher_snapshot_and_prometheus_text():
    """Observability: latency quantiles + batch-occupancy histogram in both
    the JSON snapshot and the Prometheus exposition."""

    def echo(batch, n):
        return [[] for _ in batch[:n]]

    batcher = DynamicBatcher(echo, (8, 8), max_batch=4, window_ms=1.0)
    try:
        for _ in range(5):
            batcher.submit(np.zeros((8, 8, 1), np.float32))
        snap = batcher.snapshot()
        assert snap["requests"] == 5 and snap["errors"] == 0
        assert snap["latency_count"] == 5
        assert snap["latency_sum_ms"] > 0
        lat = snap["latency_ms"]
        assert 0 < lat["p50"] <= lat["p95"] <= lat["p99"] < 1000
        # single-threaded submits -> every batch had occupancy 1
        assert snap["batch_fill"] == {"1": snap["batches"]}

        text = batcher.prometheus_text()
        assert "# TYPE yf_requests_total counter" in text
        assert "yf_requests_total 5" in text
        assert 'yf_request_latency_ms{quantile="0.5"}' in text
        assert f"yf_request_latency_ms_count 5" in text
        # cumulative le buckets: le="4" and +Inf both equal total batches
        assert f'yf_batch_size_bucket{{le="4"}} {snap["batches"]}' in text
        assert f'yf_batch_size_bucket{{le="+Inf"}} {snap["batches"]}' in text
        assert f"yf_batch_size_sum 5" in text
        assert text.endswith("\n")
    finally:
        batcher.close()


# --------------------------------------------------------------------- HTTP
@pytest.mark.slow
def test_http_server_end_to_end(detector):
    det, cfg = detector
    path = _golden_paths(1)[0]
    net_in = det.preprocess_host(path)[0][0]
    expected = _expected_rows(det, net_in)

    batcher = DynamicBatcher(make_batch_fn(det), cfg.io.input_hw,
                             max_batch=2, window_ms=2.0)
    server = DetectionServer(batcher, cfg, port=0)  # free port
    server.start()
    base = f"http://127.0.0.1:{server.port}"
    try:
        health = json.load(urllib.request.urlopen(f"{base}/healthz", timeout=10))
        assert health["status"] == "ok"
        assert health["input_hw"] == list(cfg.io.input_hw)

        with open(path, "rb") as f:
            body = f.read()
        req = urllib.request.Request(f"{base}/detect", data=body, method="POST")
        reply = json.load(urllib.request.urlopen(req, timeout=60))
        assert reply["count"] == len(expected)
        got = [d["box_net"] + [d["conf"], d["cls_score"], d["cls"]]
               for d in reply["detections"]]
        _rows_close(got, expected)
        for d in reply["detections"]:
            assert d["name"] == cfg.io.class_names[d["cls"]]
            # original-image coords = net coords scaled by the jpg's size
            assert d["box"][2] >= d["box_net"][2]  # 512x640 jpg vs 256x320 net

        stats = json.load(urllib.request.urlopen(f"{base}/stats", timeout=10))
        assert stats["requests"] >= 1 and stats["errors"] == 0
        assert stats["latency_ms"]["p50"] > 0

        metrics = urllib.request.urlopen(f"{base}/metrics", timeout=10)
        assert metrics.headers["Content-Type"].startswith("text/plain")
        text = metrics.read().decode()
        assert "yf_requests_total" in text and "yf_batch_size_bucket" in text

        # error paths: undecodable body -> 400, unknown path -> 404
        bad = urllib.request.Request(f"{base}/detect", data=b"not an image",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=10)
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/nope", timeout=10)
        assert ei.value.code == 404
    finally:
        server.close()


# ------------------------------------------------------------ native adapter
@pytest.mark.slow
def test_batcher_native_backend(tmp_path):
    lib = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "cpp", "build", "libyf.so")
    if not os.path.exists(lib):
        pytest.skip("native library not built")
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    from yolofastest_tpu.export import save_native_weights
    from yolofastest_tpu.models import fold_batchnorm
    from yolofastest_tpu.native import NativeEngine

    cfg = get_config("256x320")
    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    yfb = str(tmp_path / "model.yfb")
    save_native_weights(folded, yfb)
    eng = NativeEngine(yfb, cfg)

    path = _golden_paths(1)[0]
    from yolofastest_tpu.inference.detector import load_net_input

    net_in = load_net_input(path, cfg.io)[0][0]
    expected = [list(map(float, r)) for r in eng.detect(net_in[..., 0])]

    batcher = DynamicBatcher(make_batch_fn(eng), cfg.io.input_hw,
                             max_batch=2, window_ms=1.0)
    try:
        _rows_close(batcher.submit(net_in), expected)
    finally:
        batcher.close()

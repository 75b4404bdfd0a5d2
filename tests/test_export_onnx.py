"""ONNX interchange format: folded graph -> .onnx -> independent consumer.

The reference's primary interchange is ONNX (``torch.onnx._export`` feeding
the ncnn toolchain, ``convert_model/pytorch_to_onnx.py:17-23``).  These
tests lock ours: the writer (``export/onnx.py``, a zero-dependency protobuf
wire-format serialiser) roundtrips through a from-scratch parser + numpy
executor (``tools/onnx_check.py``) in a fresh process and reproduces the
committed reference golden logits; the torch cross-check validates the
emitted ops/attributes against an unrelated implementation.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.export import export_onnx
from yolofastest_tpu.models import (
    YoloFastestLite,
    fold_batchnorm,
    folded_apply_lite,
    load_variables,
    zoo_path,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")


def _consume(model_path, imgs_nchw, tmp_path):
    """Run tools/onnx_check.py in a fresh process; return its output arrays."""
    imgs_path = str(tmp_path / "imgs.npy")
    out_path = str(tmp_path / "out.npz")
    np.save(imgs_path, imgs_nchw)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "onnx_check.py"),
         model_path, imgs_path, out_path],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "ONNX_CONSUMED_OK" in r.stdout
    return np.load(out_path)


@pytest.mark.slow
@pytest.mark.gate
def test_onnx_consumed_by_numpy_only_process(tmp_path):
    """External-runtime story: parse the .onnx with a from-scratch protobuf
    decoder, execute in numpy, match the committed reference logits."""
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    cfg = get_config("256x320")
    p = str(tmp_path / "model.onnx")
    export_onnx(folded, cfg.io.input_hw, p)

    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs = (fx["pre_imgs"][:2].astype(np.float32)[..., None] - 128.0) / 255.0
    out = _consume(p, imgs.transpose(0, 3, 1, 2), tmp_path)

    # vs the committed golden logits (produced by the reference torch model,
    # already NCHW): BN folding costs < 1e-3, same bound as checkpoint parity
    np.testing.assert_allclose(out["head_large"], fx["logits_large"][:2], atol=2e-3)
    np.testing.assert_allclose(out["head_small"], fx["logits_small"][:2], atol=2e-3)


def test_onnx_lite_arch(tmp_path):
    """Lite single-head graph exports and roundtrips (random init)."""
    model = YoloFastestLite(num_cls=3, num_anchors=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 1), jnp.float32), train=False)
    folded = fold_batchnorm(jax.device_get(variables))
    p = str(tmp_path / "lite.onnx")
    export_onnx(folded, (64, 96), p, arch="yolofastest-lite")

    x = np.random.default_rng(0).standard_normal((2, 64, 96, 1)).astype(np.float32)
    out = _consume(p, x.transpose(0, 3, 1, 2), tmp_path)
    assert list(out.keys()) == ["head_small"]
    j_out = folded_apply_lite(jax.tree.map(jnp.asarray, folded), jnp.asarray(x))
    np.testing.assert_allclose(out["head_small"],
                               np.asarray(j_out).transpose(0, 3, 1, 2),
                               rtol=1e-3, atol=1e-3)


def test_onnx_torch_cross_check(tmp_path):
    """The numpy executor and torch's ONNX-independent conv agree on the same
    artifact — catches attribute/layout encoding mistakes the roundtrip
    (writer and reader authored in the same repo) could in principle share."""
    torch = pytest.importorskip("torch")
    from yolofastest_tpu.export import build_torch_module

    model = YoloFastestLite(num_cls=3, num_anchors=3)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 64, 96, 1), jnp.float32), train=False)
    folded = fold_batchnorm(jax.device_get(variables))
    p = str(tmp_path / "lite.onnx")
    export_onnx(folded, (64, 96), p, arch="yolofastest-lite")

    x = np.random.default_rng(1).standard_normal((1, 1, 64, 96)).astype(np.float32)
    out = _consume(p, x, tmp_path)
    module = build_torch_module(folded, arch="yolofastest-lite")
    with torch.no_grad():
        t_out = module(torch.from_numpy(x))
    np.testing.assert_allclose(out["head_small"], t_out.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_onnx_qdq_int8_roundtrip(tmp_path):
    """QDQ-form int8 artifact: the numpy-only consumer executes the
    QuantizeLinear/DequantizeLinear graph and matches the DEVICE int8
    pipeline (`quantized_apply`) — same scales, same grid, so the QDQ
    fake-quant float execution equals the int8-accumulation execution up to
    accumulation precision."""
    from yolofastest_tpu.export import export_onnx_qdq
    from yolofastest_tpu.quant import calibrate, quantize_weights, quantized_apply

    model = YoloFastestLite(num_cls=3, num_anchors=3)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 64, 96, 1), jnp.float32), train=False)
    folded = fold_batchnorm(jax.device_get(variables))

    rng = np.random.default_rng(2)
    cal = rng.uniform(-0.5, 0.5, (2, 64, 96, 1)).astype(np.float32)
    act_scales = calibrate(folded, [cal], arch="lite")
    qparams = quantize_weights(folded)

    p = str(tmp_path / "lite_int8.onnx")
    export_onnx_qdq(qparams, act_scales, (64, 96), p, arch="yolofastest-lite")

    x = rng.uniform(-0.5, 0.5, (2, 64, 96, 1)).astype(np.float32)
    out = _consume(p, x.transpose(0, 3, 1, 2), tmp_path)
    ref = np.asarray(quantized_apply(
        jax.tree.map(jnp.asarray, qparams), act_scales, jnp.asarray(x),
        arch="lite")).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out["head_small"], ref, rtol=1e-4, atol=1e-4)

    # the int8 artifact must actually be int8-sized: ~4x smaller weights
    fp = str(tmp_path / "lite_fp.onnx")
    export_onnx(folded, (64, 96), fp, arch="yolofastest-lite")
    assert os.path.getsize(p) < 0.5 * os.path.getsize(fp)


@pytest.mark.slow
def test_onnx_qdq_zoo_matches_device_int8(tmp_path):
    """Real checkpoint: the QDQ artifact executed by the numpy-only consumer
    reproduces the DEVICE int8 pipeline (`quantized_apply`, the thing
    `detect --backend int8` runs and `tests/test_graph_quant.py` gates on
    golden recall) — the portable artifact IS the deployed quantisation."""
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    from yolofastest_tpu.export import export_onnx_qdq
    from yolofastest_tpu.quant import calibrate, quantize_weights, quantized_apply

    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    cfg = get_config("256x320")
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0

    # identical setup to tests/test_graph_quant.py's golden-recall gate:
    # calibrate on half the set, evaluate all 20 images
    act_scales = calibrate(folded, [imgs[:8]], arch="fastest")
    qparams = quantize_weights(folded)
    p = str(tmp_path / "model_int8.onnx")
    export_onnx_qdq(qparams, act_scales, cfg.io.input_hw, p)

    out = _consume(p, imgs.transpose(0, 3, 1, 2), tmp_path)

    # Logit-level: full-graph quantised pipelines only agree loosely ACROSS
    # implementations — one fp boundary flip mid-graph (numpy einsum vs XLA
    # conv rounding) moves that activation a whole grid step and cascades
    # (measured: bitwise-identical fake-quant activations for the first ~30
    # layers, then one flipped bin at res3_5/conv2).  Same effect class the
    # QAT notes document for fake-quant vs int8-accumulation.
    qa = quantized_apply(jax.tree.map(jnp.asarray, qparams), act_scales,
                         jnp.asarray(imgs), arch="fastest")
    for key, qa_head in zip(("head_large", "head_small"), qa):
        qa_head = np.asarray(qa_head).transpose(0, 3, 1, 2)
        assert np.abs(out[key] - qa_head).mean() < 0.2, key

    # Detection-level (the contract that matters): the consumed QDQ artifact
    # recovers >=90% of the reference's fp32 golden detections — the same
    # gate the device int8 executors pass (tests/test_graph_quant.py).
    from yolofastest_tpu.ops import batched_nms, decode_heads

    heads = tuple(jnp.asarray(out[k].transpose(0, 2, 3, 1))
                  for k in ("head_large", "head_small"))
    io = cfg.io
    boxes, conf, cls_score, cls_idx, valid = decode_heads(
        heads, io.anchors, io.input_hw, io.conf_thre, io.max_decode)
    det = jax.tree.map(np.asarray, batched_nms(
        boxes, conf, cls_score, cls_idx, valid,
        iou_thre=io.nms_thre, max_det=io.max_det))

    def iou(a, b):
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(x2 - x1, 0) * max(y2 - y1, 0)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / max(ua, 1e-9)

    golden = [r for r in fx["boxes"] if int(r[0]) < len(imgs)]
    matched = 0
    for row in golden:
        b = int(row[0])
        matched += any(
            int(det["cls_idx"][b, i]) == int(row[7])
            and iou(det["boxes"][b, i], row[1:5]) > 0.5
            for i in range(int(det["count"][b])))
    recall = matched / len(golden)
    assert recall >= 0.9, f"QDQ ONNX recovered only {recall:.2%} of golden"

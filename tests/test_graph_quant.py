"""Folded deployment graph + int8 PTQ: parity and accuracy bounds.

Uses the committed zoo weights (``weights/yolofastest_256x320.npz``,
converted once from the reference checkpoint by ``tools/make_zoo.py``) and
the committed golden fixtures — no torch, no reference mount needed.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.models import (
    YoloFastest,
    fold_batchnorm,
    folded_apply,
    load_variables,
    zoo_path,
)
from yolofastest_tpu.ops import batched_nms, decode_heads
from yolofastest_tpu.quant import calibrate, quantize_weights, quantized_apply

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def setup():
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    variables = load_variables(zoo_path("256x320"))
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
    return variables, fx, imgs


def test_zoo_roundtrip(tmp_path):
    from yolofastest_tpu.models import save_variables

    tree = {"params": {"a": {"k": np.arange(6.0).reshape(2, 3)}},
            "batch_stats": {"a": {"m": np.zeros(3)}}}
    p = str(tmp_path / "w.npz")
    save_variables(tree, p)
    back = load_variables(p)
    np.testing.assert_array_equal(back["params"]["a"]["k"], tree["params"]["a"]["k"])
    np.testing.assert_array_equal(back["batch_stats"]["a"]["m"], tree["batch_stats"]["a"]["m"])


def test_folded_graph_matches_flax_model(setup):
    variables, fx, imgs = setup
    model = YoloFastest(num_cls=3, num_anchors=3)
    ref_large, ref_small = model.apply(jax.tree.map(jnp.asarray, variables),
                                       jnp.asarray(imgs[:4]), train=False)
    folded = fold_batchnorm(variables)
    got_large, got_small = jax.jit(folded_apply)(folded, jnp.asarray(imgs[:4]))
    np.testing.assert_allclose(np.asarray(got_large), np.asarray(ref_large),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_small), np.asarray(ref_small),
                               rtol=1e-4, atol=2e-4)


def test_lite_folded_graph_matches_flax_model():
    from yolofastest_tpu.models import YoloFastestLite, folded_apply_lite

    model = YoloFastestLite(num_cls=3, num_anchors=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 96, 1)) * 0.3
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x, train=False)
    folded = fold_batchnorm(jax.tree.map(np.asarray, variables))
    got = jax.jit(folded_apply_lite)(folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=5e-3)


def test_folded_graph_matches_reference_logits(setup):
    variables, fx, imgs = setup
    folded = fold_batchnorm(variables)
    got_large, got_small = jax.jit(folded_apply)(folded, jnp.asarray(imgs[:4]))
    ref_large = np.transpose(fx["logits_large"], (0, 2, 3, 1))
    ref_small = np.transpose(fx["logits_small"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(got_large), ref_large, rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_small), ref_small, rtol=1e-3, atol=5e-4)


def _detect(heads, cfg):
    io = cfg.io
    boxes, conf, cls_score, cls_idx, valid = decode_heads(
        heads, io.anchors, io.input_hw, io.conf_thre, io.max_decode
    )
    det = batched_nms(boxes, conf, cls_score, cls_idx, valid,
                      iou_thre=io.nms_thre, max_det=io.max_det)
    return jax.tree.map(np.asarray, det)


def _iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def test_int8_quantized_detections_match_golden(setup):
    """The int8 graph must recover >=90% of the reference's fp32 golden
    detections at IOU>0.5 with the same class — the accuracy story of the
    NPU deployment path, now with real int8."""
    variables, fx, imgs = setup
    cfg = get_config("256x320")
    folded = fold_batchnorm(variables)
    qparams = quantize_weights(folded)
    scales = calibrate(folded, [imgs[:8]])  # calibrate on half the set

    heads = jax.jit(quantized_apply)(qparams, scales, jnp.asarray(imgs))
    det = _detect(heads, cfg)

    golden = fx["boxes"]  # rows: img_idx, x1, y1, x2, y2, conf, cls_score, cls
    matched = 0
    for row in golden:
        b = int(row[0])
        found = False
        for i in range(int(det["count"][b])):
            if int(det["cls_idx"][b, i]) != int(row[7]):
                continue
            if _iou(det["boxes"][b, i], row[1:5]) > 0.5:
                found = True
                break
        matched += found
    recall = matched / len(golden)
    assert recall >= 0.9, f"int8 recovered only {recall:.2%} of golden boxes"


def test_int8_fused_activations_detections_match_golden(setup):
    """End-to-end int8 activations (every inter-layer tensor int8 in HBM)
    must still recover >=90% of the golden fp32 detections."""
    from yolofastest_tpu.quant.ptq import quantized_apply_fused

    variables, fx, imgs = setup
    cfg = get_config("256x320")
    folded = fold_batchnorm(variables)
    qparams = quantize_weights(folded)
    scales = calibrate(folded, [imgs[:8]])
    assert any(k.startswith("out/") for k in scales), "output scales missing"

    heads = jax.jit(quantized_apply_fused)(qparams, scales, jnp.asarray(imgs))
    det = _detect(heads, cfg)

    golden = fx["boxes"]
    matched = 0
    for row in golden:
        b = int(row[0])
        found = any(
            int(det["cls_idx"][b, i]) == int(row[7])
            and _iou(det["boxes"][b, i], row[1:5]) > 0.5
            for i in range(int(det["count"][b]))
        )
        matched += found
    recall = matched / len(golden)
    assert recall >= 0.9, f"fused int8 recovered only {recall:.2%} of golden boxes"


def test_int8_logit_error_bounded(setup):
    variables, fx, imgs = setup
    folded = fold_batchnorm(variables)
    qparams = quantize_weights(folded)
    scales = calibrate(folded, [imgs[:8]])
    q_large, q_small = jax.jit(quantized_apply)(qparams, scales, jnp.asarray(imgs[:4]))
    f_large, f_small = jax.jit(folded_apply)(folded, jnp.asarray(imgs[:4]))
    for q, f in ((q_large, f_large), (q_small, f_small)):
        err = np.abs(np.asarray(q) - np.asarray(f))
        rng = float(np.max(np.abs(np.asarray(f))))
        assert float(np.mean(err)) < 0.05 * rng, "mean int8 error too large"

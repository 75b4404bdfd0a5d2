"""Shipped int8 deployment artifacts (`weights/yolofastest_int8_<res>.npz`).

Round-4 (VERDICT item 1): every int8 backend deploying the SHIPPED artifact
— refined folded weights + frozen activation scales, one config for all —
must match the fp pipeline's golden recall.  Built by
``tools/make_int8_zoo.py`` / ``tools/search_int8_recipe2.py``; consumed by
``tools/run_golden_suite.py`` (rows `int8`, `int8-fused`,
`native-cpp-int8`).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.ops import batched_nms, decode_heads
from yolofastest_tpu.quant import load_int8_zoo, quantize_weights
from yolofastest_tpu.quant.ptq import quantized_apply, quantized_apply_fused

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def _recall(det, golden):
    m = 0
    for row in golden:
        b = int(row[0])
        m += any(
            int(det["cls_idx"][b, i]) == int(row[7])
            and _iou(det["boxes"][b, i], row[1:5]) > 0.5
            for i in range(int(det["count"][b]))
        )
    return m


def test_cli_int8_zoo_flag(tmp_path):
    """`detect --backend native-int8 --int8-zoo` deploys the shipped
    artifact without any calibration data; misuse fails loud."""
    from yolofastest_tpu.cli import main
    from yolofastest_tpu.quant import load_int8_zoo

    if load_int8_zoo("256x320") is None:
        pytest.skip("int8 zoo artifact not present")
    if not os.path.exists(os.path.join(REPO, "cpp", "build", "libyf.so")):
        pytest.skip("native library not built")
    data = os.path.join(REPO, "tests", "fixtures")  # no .jpg here; use ref
    ref = "/root/reference/test_data"
    if not os.path.isdir(ref):
        pytest.skip("reference test data not mounted")
    out = str(tmp_path / "out")
    rc = main(["detect", "--config", "256x320", "--weights",
               os.path.join(REPO, "weights", "yolofastest_256x320.npz"),
               "--data", ref, "--out", out,
               "--backend", "native-int8", "--int8-zoo"])
    assert rc == 0
    assert any(f.startswith("result_") for f in os.listdir(out))

    # wrong backend and missing artifact both fail loud
    rc = main(["detect", "--config", "256x320", "--weights",
               os.path.join(REPO, "weights", "yolofastest_256x320.npz"),
               "--data", ref, "--out", out, "--int8-zoo"])
    assert rc == 2
    rc = main(["detect", "--config", "256x320", "--weights",
               os.path.join(REPO, "weights", "yolofastest_256x320.npz"),
               "--data", ref, "--out", out, "--backend", "native-int8",
               "--int8-zoo", str(tmp_path / "nope.npz")])
    assert rc == 2


@pytest.mark.slow
@pytest.mark.parametrize("res", ["256x320", "512x640"])
def test_int8_zoo_full_recall_all_backends(res):
    zoo = load_int8_zoo(res)
    if zoo is None:
        pytest.skip(f"int8 zoo artifact for {res} not present")
    folded, scales, keep_fp = zoo
    cfg = get_config(res)
    io = cfg.io
    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
    golden = fx["boxes"]
    n = len(golden)
    qp = jax.tree.map(jnp.asarray, quantize_weights(folded))
    x = jnp.asarray(imgs)

    def post(heads):
        b, c, s, ci, v = decode_heads(heads, io.anchors, io.input_hw,
                                      io.conf_thre, io.max_decode)
        return batched_nms(b, c, s, ci, v, iou_thre=io.nms_thre,
                           max_det=io.max_det)

    det = jax.tree.map(np.asarray,
                       jax.jit(lambda x: post(quantized_apply(qp, scales, x)))(x))
    assert _recall(det, golden) == n, "jax per-layer int8"
    detf = jax.tree.map(
        np.asarray,
        jax.jit(lambda x: post(quantized_apply_fused(qp, scales, x)))(x))
    assert _recall(detf, golden) == n, "jax fused int8"

    lib = os.path.join(REPO, "cpp", "build", "libyf.so")
    if not os.path.exists(lib):
        pytest.skip("native library not built (jax backends verified)")
    from yolofastest_tpu.export import save_native_weights
    from yolofastest_tpu.native import NativeEngine

    yfb = f"/tmp/int8zoo_{res}.yfb"
    save_native_weights(quantize_weights(folded), yfb, act_scales=scales)
    eng = NativeEngine(yfb, cfg)
    m = 0
    for b in range(len(imgs)):
        rows = eng.detect(imgs[b])
        for w in golden[golden[:, 0] == b]:
            m += any(int(r[6]) == int(w[7]) and _iou(r[:4], w[1:5]) > 0.5
                     for r in rows)
    assert m == n, f"native int8: {m}/{n}"


@pytest.mark.slow
def test_pruned_int8_zoo_full_recall_all_backends():
    """The LAST deployment-matrix cell (round-5 VERDICT 3): the pruned-0.4
    checkpoint ships a HYBRID int8 artifact (mse-12 scales + an embedded
    keep-fp set — pure int8 measured 33/33/34 at best, round 4) and every
    int8 backend reads FULL golden recall from it."""
    res = "256x320"
    path = os.path.join(REPO, "weights",
                        f"yolofastest_int8_pruned040_{res}.npz")
    zoo = load_int8_zoo(path)
    if zoo is None:
        pytest.skip("pruned int8 artifact not present")
    folded, scales, keep_fp = zoo
    assert keep_fp, "pruned artifact must carry its hybrid keep-fp set"
    from yolofastest_tpu.quant import mixed_native_tree
    from yolofastest_tpu.quant.sensitivity import (
        quantized_apply_fused_mixed, quantized_apply_mixed)

    cfg = get_config(res)
    io = cfg.io
    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
    golden = fx["boxes"]
    n = len(golden)
    qp = jax.tree.map(jnp.asarray, quantize_weights(folded))
    fp_sub = jax.tree.map(jnp.asarray, {k: folded[k] for k in keep_fp})
    x = jnp.asarray(imgs)

    def post(heads):
        b, c, s, ci, v = decode_heads(heads, io.anchors, io.input_hw,
                                      io.conf_thre, io.max_decode)
        return batched_nms(b, c, s, ci, v, iou_thre=io.nms_thre,
                           max_det=io.max_det)

    det = jax.tree.map(np.asarray, jax.jit(lambda x: post(
        quantized_apply_mixed(qp, fp_sub, scales, x, fp_layers=keep_fp)))(x))
    assert _recall(det, golden) == n, "jax per-layer hybrid int8"
    detf = jax.tree.map(np.asarray, jax.jit(lambda x: post(
        quantized_apply_fused_mixed(qp, fp_sub, scales, x,
                                    fp_layers=keep_fp)))(x))
    assert _recall(detf, golden) == n, "jax fused hybrid int8"

    lib = os.path.join(REPO, "cpp", "build", "libyf.so")
    if not os.path.exists(lib):
        pytest.skip("native library not built (jax backends verified)")
    from yolofastest_tpu.export import save_native_weights
    from yolofastest_tpu.native import NativeEngine

    tree, nscales = mixed_native_tree(folded, scales, keep_fp)
    yfb = f"/tmp/int8zoo_pruned_{res}.yfb"
    save_native_weights(tree, yfb, act_scales=nscales, io_config=io)
    eng = NativeEngine(yfb, cfg)
    assert eng.int8_layers > 0  # hybrid still runs real int8 arithmetic
    m = 0
    for b in range(len(imgs)):
        rows = eng.detect(imgs[b])
        for w in golden[golden[:, 0] == b]:
            m += any(int(r[6]) == int(w[7]) and _iou(r[:4], w[1:5]) > 0.5
                     for r in rows)
    assert m == n, f"native hybrid int8: {m}/{n}"


@pytest.mark.slow
def test_pruned_int8_zoo_cli_deploy(tmp_path):
    """`detect --backend int8 --int8-zoo <pruned artifact>` deploys the
    hybrid config end-to-end through the CLI."""
    res = "256x320"
    art = os.path.join(REPO, "weights",
                       f"yolofastest_int8_pruned040_{res}.npz")
    pruned = os.path.join(REPO, "weights",
                          f"yolofastest_pruned040_{res}.npz")
    if load_int8_zoo(art) is None or not os.path.exists(pruned):
        pytest.skip("pruned artifacts not present")
    ref = "/root/reference/test_data"
    if not os.path.isdir(ref):
        pytest.skip("reference test data not mounted")
    from yolofastest_tpu.cli import main

    out = str(tmp_path / "out")
    rc = main(["detect", "--config", res, "--weights", pruned,
               "--data", ref, "--out", out,
               "--backend", "int8", "--int8-zoo", art])
    assert rc == 0
    assert any(f.startswith("result_") for f in os.listdir(out))

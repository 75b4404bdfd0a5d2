"""Native StableHLO consumer (``cpp/build/yf_shlo``) parity.

The exported compiled graph itself — ``forward.mlir``, the textual twin of
``forward.stablehlo`` — must run natively (no Python, no XLA in the
process) and reproduce the JAX fp32 folded logits on the golden images.
This is the SURVEY §7 step-7 deliverable (native consumer of the exported
artifact; the reference analogue is the ncnn runtime consuming its
converted networks, ``main.cpp:7-59``).

Skips when ``cpp/build/yf_shlo`` hasn't been built (run ``cpp/build.sh``).
"""

import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.export import export_folded_forward, save_exported_mlir
from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path
from yolofastest_tpu.models.graph import folded_apply, folded_apply_lite

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHLO = os.path.join(REPO, "cpp", "build", "yf_shlo")


def _require_shlo():
    if not os.path.exists(SHLO):
        built = subprocess.run(
            [os.path.join(REPO, "cpp", "build.sh")], capture_output=True
        )
        if built.returncode != 0 or not os.path.exists(SHLO):
            pytest.skip("yf_shlo not built and build failed")


def _run(mlir, raw, prefix, reps=1):
    r = subprocess.run([SHLO, mlir, raw, prefix, str(reps)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return r.stdout


@pytest.mark.slow
def test_shlo_native_golden_logits(tmp_path):
    """yf_shlo on the exported fastest graph reproduces the jax fp32 folded
    logits on golden images, and prints the reference-format timing log."""
    res = "256x320"
    if not os.path.exists(zoo_path(res)):
        pytest.skip("zoo weights not present")
    _require_shlo()
    cfg = get_config(res)
    folded = fold_batchnorm(load_variables(zoo_path(res)))
    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
    imgs = (fx["pre_imgs"][:4].astype(np.float32)[..., None] - 128.0) / 255.0

    hl, hs = jax.jit(lambda v, x: folded_apply(v, x, jnp.float32))(
        jax.tree.map(jnp.asarray, folded), jnp.asarray(imgs))
    hl, hs = np.asarray(hl), np.asarray(hs)

    exp = export_folded_forward(folded, cfg, batch=len(imgs))
    mlir = str(tmp_path / "forward.mlir")
    save_exported_mlir(exp, mlir)
    raw = str(tmp_path / "in.raw")
    imgs.astype("<f4").tofile(raw)

    out = _run(mlir, raw, str(tmp_path / "o"), reps=2)
    # reference-format timing log (YOLO_ncnn.cpp / main.cpp style)
    assert "infer time :" in out and "avg_time:" in out

    o0 = np.fromfile(tmp_path / "o.out0.raw", "<f4").reshape(hl.shape)
    o1 = np.fromfile(tmp_path / "o.out1.raw", "<f4").reshape(hs.shape)
    np.testing.assert_allclose(o0, hl, atol=2e-4)
    np.testing.assert_allclose(o1, hs, atol=2e-4)


@pytest.mark.slow
def test_shlo_native_lite(tmp_path):
    """Lite (single-head) graph through the same consumer."""
    if not os.path.exists(zoo_path("lite_256x320")):
        pytest.skip("lite zoo weights not present")
    _require_shlo()
    cfg = get_config("256x320")
    folded = fold_batchnorm(load_variables(zoo_path("lite_256x320")))
    fx = np.load(os.path.join(FIXTURES, f"golden_256x320.npz"))
    imgs = (fx["pre_imgs"][:2].astype(np.float32)[..., None] - 128.0) / 255.0

    (hs,) = jax.jit(lambda v, x: (folded_apply_lite(v, x, jnp.float32),))(
        jax.tree.map(jnp.asarray, folded), jnp.asarray(imgs))
    hs = np.asarray(hs)

    exp = export_folded_forward(folded, cfg, batch=len(imgs), arch="lite")
    mlir = str(tmp_path / "forward_lite.mlir")
    save_exported_mlir(exp, mlir)
    raw = str(tmp_path / "in.raw")
    imgs.astype("<f4").tofile(raw)
    _run(mlir, raw, str(tmp_path / "o"))
    o0 = np.fromfile(tmp_path / "o.out0.raw", "<f4").reshape(hs.shape)
    np.testing.assert_allclose(o0, hs, atol=2e-4)


def test_shlo_native_fail_loud(tmp_path):
    """Corrupt module text / truncated input must exit non-zero with a
    diagnostic, never produce output silently (the importers' contract)."""
    _require_shlo()
    bad = tmp_path / "bad.mlir"
    bad.write_text("func.func public @main(%arg0: tensor<1x4x4x1xf32>) -> "
                   "(tensor<1x4x4x1xf32>) {\n"
                   "  %0 = stablehlo.frobnicate %arg0 : tensor<1x4x4x1xf32>\n"
                   "  return %0 : tensor<1x4x4x1xf32>\n}\n")
    raw = tmp_path / "in.raw"
    np.zeros(16, "<f4").tofile(raw)
    r = subprocess.run([SHLO, str(bad), str(raw), str(tmp_path / "o")],
                       capture_output=True, text=True)
    assert r.returncode != 0
    assert "unsupported op" in r.stderr

    # truncated input for a well-formed (op-free) module
    ok = tmp_path / "ok.mlir"
    ok.write_text("func.func public @main(%arg0: tensor<1x4x4x1xf32>) -> "
                  "(tensor<1x4x4x1xf32>) {\n"
                  "  return %arg0 : tensor<1x4x4x1xf32>\n}\n")
    short = tmp_path / "short.raw"
    np.zeros(3, "<f4").tofile(short)
    r = subprocess.run([SHLO, str(ok), str(short), str(tmp_path / "o")],
                       capture_output=True, text=True)
    assert r.returncode != 0
    assert "too small" in r.stderr


@pytest.mark.slow
@pytest.mark.parametrize("res", ["256x320", "512x640"])
def test_shlo_native_full_detect_pipeline(res, tmp_path):
    """THE round-5 deliverable: the exported FULL detect pipeline —
    preprocess, forward, sigmoid decode, conf top-k, NMS-as-while-loop,
    argsort compaction — executes natively from detect.mlir (uint8 frames
    in, final detections out, no Python/XLA in the process) and reproduces
    the jitted pipeline's detections exactly.  Native analogue of the
    reference's in-process decode+NMS (YOLO_ncnn.cpp:83-234), but driven
    from the compiled artifact rather than hand-written postprocessing."""
    if not os.path.exists(zoo_path(res)):
        pytest.skip("zoo weights not present")
    _require_shlo()
    from yolofastest_tpu.export import export_detect_pipeline
    from yolofastest_tpu.models import load_variables

    cfg = get_config(res)
    variables = load_variables(zoo_path(res))
    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
    frames = fx["pre_imgs"][:4]  # (4, H, W) uint8 gray at net input size

    exp = export_detect_pipeline(variables, cfg, batch=len(frames))
    want = exp.call(jnp.asarray(frames))
    want = jax.tree.map(np.asarray, want)

    mlir = str(tmp_path / "detect.mlir")
    save_exported_mlir(exp, mlir)
    raw = str(tmp_path / "frames.raw")
    frames.astype(np.uint8).tofile(raw)

    out = _run(mlir, raw, str(tmp_path / "d"))
    assert "avg_time:" in out
    B, K = len(frames), cfg.io.max_det
    got_boxes = np.fromfile(tmp_path / "d.out0.raw", "<f4").reshape(B, K, 4)
    got_cls = np.fromfile(tmp_path / "d.out1.raw", "<f4").reshape(B, K)
    got_score = np.fromfile(tmp_path / "d.out2.raw", "<f4").reshape(B, K)
    got_conf = np.fromfile(tmp_path / "d.out3.raw", "<f4").reshape(B, K)
    got_count = np.fromfile(tmp_path / "d.out4.raw", "<f4").reshape(B)

    np.testing.assert_array_equal(got_count.astype(np.int32),
                                  want["count"].astype(np.int32))
    for b in range(B):
        n = int(want["count"][b])
        np.testing.assert_allclose(got_boxes[b, :n], want["boxes"][b, :n],
                                   atol=1.0)
        np.testing.assert_array_equal(got_cls[b, :n].astype(np.int32),
                                      want["cls_idx"][b, :n])
        np.testing.assert_allclose(got_conf[b, :n], want["conf"][b, :n],
                                   atol=1e-3)
        np.testing.assert_allclose(got_score[b, :n], want["cls_score"][b, :n],
                                   atol=1e-3)

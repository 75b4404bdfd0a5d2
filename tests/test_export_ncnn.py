"""ncnn interchange format: folded graph -> .param/.bin -> independent consumer.

ncnn is the reference's embedded runtime (``ncnn_deploy/src/YOLO_ncnn.cpp``);
its repo ships final ``-opt`` artifacts under ``models/ncnn/``.  These tests
lock our format from both sides:

* consumer side — ``tools/ncnn_check.py`` (from-scratch numpy parser +
  executor) runs the REFERENCE'S OWN shipped artifacts, produced by
  onnx2ncnn + ncnnoptimize (an entirely independent producer), and
  reproduces the committed golden torch logits;
* producer side — our ``export_ncnn`` output roundtrips through that same
  consumer in a fresh process, matches the folded JAX graph, and emits the
  exact layer-type sequence of the reference's optimised param file.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.export import export_ncnn
from yolofastest_tpu.models import (
    YoloFastestLite,
    fold_batchnorm,
    folded_apply,
    folded_apply_lite,
    load_variables,
    zoo_path,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")
REF_NCNN = "/root/reference/models/ncnn/256x320/YOLO-Fastest_epoch_28-opt"


def _consume(param_path, bin_path, imgs_nchw, tmp_path):
    """Run tools/ncnn_check.py in a fresh process; return its output arrays."""
    imgs_path = str(tmp_path / "imgs.npy")
    out_path = str(tmp_path / "out.npz")
    np.save(imgs_path, imgs_nchw)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "ncnn_check.py"),
         param_path, bin_path, imgs_path, out_path],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "NCNN_CONSUMED_OK" in r.stdout
    return np.load(out_path)


def _norm_imgs(n):
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    return ((fx["pre_imgs"][:n].astype(np.float32)[:, None, :, :] - 128.0)
            / 255.0), fx


def test_ncnn_consumer_runs_reference_artifact(tmp_path):
    """The numpy consumer executes the reference's OWN shipped ncnn model
    (independent producer: torch -> ONNX -> onnx2ncnn -> ncnnoptimize) and
    reproduces the committed golden torch logits — parser and executor
    semantics are locked against external files we did not write."""
    if not os.path.exists(REF_NCNN + ".param"):
        pytest.skip("reference ncnn artifacts not present")
    imgs, fx = _norm_imgs(2)
    out = _consume(REF_NCNN + ".param", REF_NCNN + ".bin", imgs, tmp_path)
    # fp32 numpy vs the golden torch logits: ncnnoptimize's BN fold + einsum
    # accumulation order cost < 1e-3 (measured max 2e-4)
    np.testing.assert_allclose(out["head_large"], fx["logits_large"][:2],
                               atol=1e-3)
    np.testing.assert_allclose(out["head_small"], fx["logits_small"][:2],
                               atol=1e-3)


@pytest.mark.slow
def test_ncnn_consumer_runs_reference_artifact_512(tmp_path):
    """Same lock at the high resolution (epoch-27 checkpoint, shipped
    ``models/ncnn/512x640/``)."""
    ref = "/root/reference/models/ncnn/512x640/YOLO-Fastest_epoch_27-opt"
    if not os.path.exists(ref + ".param"):
        pytest.skip("reference ncnn artifacts not present")
    fx = np.load(os.path.join(FIXTURES, "golden_512x640.npz"))
    imgs = ((fx["pre_imgs"][:1].astype(np.float32)[:, None, :, :] - 128.0)
            / 255.0)
    out = _consume(ref + ".param", ref + ".bin", imgs, tmp_path)
    np.testing.assert_allclose(out["head_large"], fx["logits_large"][:1],
                               atol=1e-3)
    np.testing.assert_allclose(out["head_small"], fx["logits_small"][:1],
                               atol=1e-3)


@pytest.mark.slow
@pytest.mark.gate
def test_ncnn_roundtrip_zoo(tmp_path):
    """Our export -> fresh-process consumer -> folded JAX graph parity, and
    the emitted layer-type sequence equals the reference's ncnnoptimize
    output (same graph, same Split/BinaryOp/Deconvolution placement)."""
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    cfg = get_config("256x320")
    pp, bp = str(tmp_path / "m.param"), str(tmp_path / "m.bin")
    export_ncnn(folded, cfg.io.input_hw, pp, bp)

    imgs, _ = _norm_imgs(2)
    out = _consume(pp, bp, imgs, tmp_path)
    hl, hs = folded_apply(jax.tree.map(jnp.asarray, folded),
                          jnp.asarray(imgs.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(out["head_large"],
                               np.asarray(hl).transpose(0, 3, 1, 2), atol=1e-3)
    np.testing.assert_allclose(out["head_small"],
                               np.asarray(hs).transpose(0, 3, 1, 2), atol=1e-3)

    if os.path.exists(REF_NCNN + ".param"):
        def type_seq(path):
            return [ln.split()[0]
                    for ln in open(path).read().splitlines()[2:] if ln.strip()]
        assert type_seq(pp) == type_seq(REF_NCNN + ".param")


def test_ncnn_lite_arch(tmp_path):
    """Lite single-head graph exports and roundtrips (random init)."""
    model = YoloFastestLite(num_cls=3, num_anchors=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 1), jnp.float32), train=False)
    folded = fold_batchnorm(jax.device_get(variables))
    pp, bp = str(tmp_path / "lite.param"), str(tmp_path / "lite.bin")
    export_ncnn(folded, (64, 96), pp, bp, arch="yolofastest-lite")

    x = np.random.default_rng(0).standard_normal((2, 1, 64, 96)).astype(np.float32)
    out = _consume(pp, bp, x, tmp_path)
    assert list(out.keys()) == ["head_small"]
    j_out = folded_apply_lite(jax.tree.map(jnp.asarray, folded),
                              jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(out["head_small"],
                               np.asarray(j_out).transpose(0, 3, 1, 2),
                               rtol=1e-3, atol=1e-3)


def test_ncnn_int8_calibration_table(tmp_path):
    """model.table must let ncnn2int8 reproduce OUR quantisation exactly:
    per layer, round(kernel * table_weight_scale) equals our kernel_q and
    the input-blob multiplier is the inverse of our calibrated act scale;
    every Convolution/ConvolutionDepthWise in the .param is covered and
    Deconvolution (which ncnn keeps fp32) is absent."""
    from yolofastest_tpu.export import export_ncnn_table
    from yolofastest_tpu.quant import calibrate, quantize_weights

    cfg = get_config("256x320")
    folded = jax.device_get(fold_batchnorm(load_variables(zoo_path("256x320"))))
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs = (fx["pre_imgs"][:4].astype(np.float32)[..., None] - 128.0) / 255.0
    qparams = quantize_weights(folded)
    scales = calibrate(folded, [imgs])

    pp, bp = str(tmp_path / "m.param"), str(tmp_path / "m.bin")
    tp = str(tmp_path / "m.table")
    export_ncnn(folded, cfg.io.input_hw, pp, bp)
    export_ncnn_table(qparams, scales, tp)

    table = {}
    for ln in open(tp).read().splitlines():
        toks = ln.split()
        table[toks[0]] = np.array([float(t) for t in toks[1:]], np.float64)

    from yolofastest_tpu.export.ncnn import _parse_param
    for L in _parse_param(pp):
        name = L["name"]
        if L["type"] in ("Convolution", "ConvolutionDepthWise"):
            assert name + "_param_0" in table, name
            assert name in table and table[name].shape == (1,), name
        elif L["type"] == "Deconvolution":
            assert name + "_param_0" not in table and name not in table

    for name in ("conv0", "res3_5/conv2", "head_4"):
        w_mult = table[name + "_param_0"]
        k = np.asarray(folded[name]["kernel"], np.float64)
        assert w_mult.shape == (k.shape[-1],)
        # ncnn2int8's math with these multipliers == our kernel_q
        kq = np.clip(np.round(k * w_mult), -127, 127).astype(np.int8)
        np.testing.assert_array_equal(kq, qparams[name]["kernel_q"])
        np.testing.assert_allclose(table[name][0], 1.0 / scales[name],
                                   rtol=1e-6)

    with pytest.raises(ValueError, match="missing int8 scales"):
        export_ncnn_table(qparams, {}, str(tmp_path / "bad.table"))

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

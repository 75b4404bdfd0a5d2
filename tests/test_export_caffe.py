"""Caffe interchange format: folded graph -> .prototxt/.caffemodel ->
independent consumer.

The reference's second interchange target is Caffe: a vendored pytorch
tracer + generated protobuf API emit NetParameter artifacts
(``convert_model/pytorch_to_caffe.py:9-17``, ``Caffe/caffe_pb2.py``).
These tests lock ours: the writer (``export/caffe.py``) roundtrips through
a from-scratch prototxt parser + caffemodel decoder + numpy executor
(``tools/caffe_check.py``) in a fresh process and reproduces the committed
reference golden logits; the torch cross-check validates the emitted
layer semantics (incl. the Deconvolution ``(Cin, Cout, kh, kw)`` blob
layout) against an unrelated implementation.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.export import export_caffe
from yolofastest_tpu.models import (
    YoloFastest,
    YoloFastestLite,
    fold_batchnorm,
    folded_apply,
    folded_apply_lite,
    load_variables,
    zoo_path,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")


def _consume(prototxt, caffemodel, imgs_nchw, tmp_path):
    """Run tools/caffe_check.py in a fresh process; return its outputs."""
    imgs_path = str(tmp_path / "imgs.npy")
    out_path = str(tmp_path / "out.npz")
    np.save(imgs_path, imgs_nchw)
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run(
        [sys.executable, os.path.join(TOOLS, "caffe_check.py"),
         prototxt, caffemodel, imgs_path, out_path],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr
    assert "CAFFE_CONSUMED_OK" in r.stdout
    return np.load(out_path)


def _export(folded, hw, tmp_path, arch):
    p = str(tmp_path / "model.prototxt")
    c = str(tmp_path / "model.caffemodel")
    export_caffe(folded, hw, p, c, arch=arch)
    return p, c


@pytest.mark.gate
def test_caffe_full_arch_roundtrip(tmp_path):
    """Two-head graph (covers Deconvolution + Concat + Eltwise) at tiny
    size, random init, vs the folded JAX forward."""
    model = YoloFastest(num_cls=3, num_anchors=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 1), jnp.float32), train=False)
    folded = fold_batchnorm(jax.device_get(variables))
    p, c = _export(folded, (64, 96), tmp_path, "yolofastest")

    x = np.random.default_rng(0).standard_normal((2, 64, 96, 1)).astype(np.float32)
    out = _consume(p, c, x.transpose(0, 3, 1, 2), tmp_path)
    assert sorted(out.keys()) == ["head_large", "head_small"]
    j_large, j_small = folded_apply(jax.tree.map(jnp.asarray, folded),
                                    jnp.asarray(x))
    np.testing.assert_allclose(out["head_large"],
                               np.asarray(j_large).transpose(0, 3, 1, 2),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out["head_small"],
                               np.asarray(j_small).transpose(0, 3, 1, 2),
                               rtol=1e-3, atol=1e-3)


def test_caffe_lite_arch(tmp_path):
    """Lite single-head graph exports and roundtrips (random init)."""
    model = YoloFastestLite(num_cls=3, num_anchors=3)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 64, 96, 1), jnp.float32), train=False)
    folded = fold_batchnorm(jax.device_get(variables))
    p, c = _export(folded, (64, 96), tmp_path, "yolofastest-lite")

    x = np.random.default_rng(1).standard_normal((2, 64, 96, 1)).astype(np.float32)
    out = _consume(p, c, x.transpose(0, 3, 1, 2), tmp_path)
    assert list(out.keys()) == ["head_small"]
    j_out = folded_apply_lite(jax.tree.map(jnp.asarray, folded), jnp.asarray(x))
    np.testing.assert_allclose(out["head_small"],
                               np.asarray(j_out).transpose(0, 3, 1, 2),
                               rtol=1e-3, atol=1e-3)


def test_caffe_torch_cross_check(tmp_path):
    """The numpy executor and torch agree on the same artifact — catches
    layout/param encoding mistakes a same-repo roundtrip could share.
    Full arch so the Deconvolution blob layout is exercised."""
    torch = pytest.importorskip("torch")
    from yolofastest_tpu.export import build_torch_module

    model = YoloFastest(num_cls=3, num_anchors=3)
    variables = model.init(jax.random.PRNGKey(2),
                           jnp.zeros((1, 64, 96, 1), jnp.float32), train=False)
    folded = fold_batchnorm(jax.device_get(variables))
    p, c = _export(folded, (64, 96), tmp_path, "yolofastest")

    x = np.random.default_rng(2).standard_normal((1, 1, 64, 96)).astype(np.float32)
    out = _consume(p, c, x, tmp_path)
    module = build_torch_module(folded, arch="yolofastest")
    with torch.no_grad():
        t_large, t_small = module(torch.from_numpy(x))
    np.testing.assert_allclose(out["head_large"], t_large.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(out["head_small"], t_small.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_caffe_prototxt_structure(tmp_path):
    """The prototxt is the reference-shaped network description: named
    Input/Convolution/ReLU/Eltwise/Deconvolution/Concat layers, depthwise
    convs as group==num_output, in-place ReLU."""
    model = YoloFastest(num_cls=3, num_anchors=3)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 64, 96, 1), jnp.float32), train=False)
    folded = fold_batchnorm(jax.device_get(variables))
    p, c = _export(folded, (64, 96), tmp_path, "yolofastest")

    text = open(p).read()
    for typ in ("Input", "Convolution", "ReLU", "Eltwise", "Deconvolution",
                "Concat"):
        assert f'type: "{typ}"' in text, typ
    assert 'top: "head_large"' in text and 'top: "head_small"' in text
    assert "group:" in text  # depthwise convs

    # in-place ReLU: every ReLU layer's bottom equals its top (consumer's
    # own parser doubles as the structural reader here)
    sys.path.insert(0, TOOLS)
    try:
        import caffe_check
    finally:
        sys.path.pop(0)
    layers = caffe_check.parse_prototxt(p)
    relus = [L for L in layers if L["type"][0] == "ReLU"]
    assert relus and all(L["bottom"] == L["top"] for L in relus)
    # caffemodel carries blobs exactly for the weighted layers
    weights = caffe_check.load_caffemodel(c)
    weighted = {L["name"][0] for L in layers
                if L["type"][0] in ("Convolution", "Deconvolution")}
    assert set(weights) == weighted
    assert all(len(b) == 2 for b in weights.values())  # kernel + bias


@pytest.mark.slow
def test_caffe_consumed_matches_reference_golden(tmp_path):
    """External-runtime story: parse .prototxt/.caffemodel from scratch,
    execute in numpy, match the committed reference logits."""
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    cfg = get_config("256x320")
    p, c = _export(folded, cfg.io.input_hw, tmp_path, "yolofastest")

    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs = (fx["pre_imgs"][:2].astype(np.float32)[..., None] - 128.0) / 255.0
    out = _consume(p, c, imgs.transpose(0, 3, 1, 2), tmp_path)

    # vs the committed golden logits (produced by the reference torch
    # model): BN folding costs < 1e-3, same bound as checkpoint parity
    np.testing.assert_allclose(out["head_large"], fx["logits_large"][:2],
                               atol=2e-3)
    np.testing.assert_allclose(out["head_small"], fx["logits_small"][:2],
                               atol=2e-3)

"""Generic jaxpr→ONNX exporter (`export/generic_onnx.py`).

The reference exports *arbitrary* torch nets by monkey-patching ~30 ops
(`pytorch_to_caffe.py`); the TPU-native equivalent walks the jaxpr.  These
tests export models the hand-written topology walks have never seen — an
MLP, a conv/pool CNN — plus the full YoloFastest `model.apply` (no walk),
and verify each against the jax outputs through the from-scratch numpy
consumer (`tools/onnx_check.py`), in-process and once in a fresh process.
"""

import os
import subprocess
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolofastest_tpu.export import export_jax_onnx

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _run_onnx(path, feeds):
    import importlib

    oc = importlib.import_module("onnx_check")
    nodes, init, g_in, g_out = oc.load_model(path)
    env = oc.run(nodes, init, dict(zip(g_in, feeds)))
    return [env[o] for o in g_out]


def test_mlp_roundtrip(tmp_path):
    class MLP(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(16)(x)
            x = nn.tanh(x)
            x = nn.Dense(8)(x)
            x = nn.sigmoid(x)
            return nn.Dense(3)(x)

    m = MLP()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 10)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    fn = lambda x: m.apply(v, x)  # noqa: E731
    want = np.asarray(fn(x))
    path = str(tmp_path / "mlp.onnx")
    export_jax_onnx(fn, (x,), path)
    (got,) = _run_onnx(path, [np.asarray(x)])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cnn_with_pooling_roundtrip(tmp_path):
    class CNN(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), strides=(2, 2))(x)
            x = nn.relu(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = x.reshape((x.shape[0], -1))
            return nn.Dense(10)(x)

    m = CNN()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    fn = lambda x: m.apply(v, x)  # noqa: E731
    want = np.asarray(fn(x))
    path = str(tmp_path / "cnn.onnx")
    export_jax_onnx(fn, (x,), path)
    (got,) = _run_onnx(path, [np.asarray(x)])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_elementwise_zoo_roundtrip(tmp_path):
    """Broad op-coverage function: broadcasting, reductions, selects,
    comparisons, powers."""
    def fn(a, b):
        c = jnp.maximum(a, b) * jnp.exp(-jnp.abs(b)) + a / (1 + b ** 2)
        d = jnp.where(a > b, c, -c)
        e = d - jnp.log1p(jnp.exp(d))  # log-sigmoid-ish mix
        return e.sum(axis=1), e.max(axis=0) + jnp.sqrt(jnp.abs(a)).mean(axis=0)

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((5, 7)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((5, 7)), jnp.float32)
    want = [np.asarray(o) for o in fn(a, b)]
    path = str(tmp_path / "ew.onnx")
    export_jax_onnx(fn, (a, b), path)
    got = _run_onnx(path, [np.asarray(a), np.asarray(b)])
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, atol=1e-5)


@pytest.mark.slow
def test_full_model_generic_export(tmp_path):
    """The ENTIRE YoloFastest apply exports through the generic path — no
    hand-written topology walk — and reproduces the jax head logits in a
    FRESH-process consumer run (the reference's arbitrary-net tracer
    capability, closed TPU-natively)."""
    from yolofastest_tpu.models import YoloFastest, load_variables, zoo_path

    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    variables = jax.tree.map(jnp.asarray, load_variables(zoo_path("256x320")))
    model = YoloFastest(num_cls=3, num_anchors=3)
    fn = lambda x: model.apply(variables, x, train=False)  # noqa: E731

    fx = np.load(os.path.join(REPO, "tests", "fixtures", "golden_256x320.npz"))
    imgs = (fx["pre_imgs"][:2].astype(np.float32)[..., None] - 128.0) / 255.0
    x = jnp.asarray(imgs)
    want_l, want_s = (np.asarray(h) for h in fn(x))

    path = str(tmp_path / "yolo_generic.onnx")
    export_jax_onnx(fn, (x,), path)

    npy = str(tmp_path / "in.npy")
    np.save(npy, imgs)
    out = str(tmp_path / "out.npz")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "onnx_check.py"),
         path, npy, out], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "ONNX_CONSUMED_OK" in r.stdout
    res = np.load(out)
    got = [res[k] for k in sorted(res.files)]
    np.testing.assert_allclose(got[0], want_l, atol=2e-4)
    np.testing.assert_allclose(got[1], want_s, atol=2e-4)


def test_unsupported_primitive_fails_loud(tmp_path):
    def fn(x):
        return jax.lax.cumsum(x, axis=0)

    x = jnp.zeros((4, 3), jnp.float32)
    with pytest.raises(NotImplementedError, match="cumsum|cum"):
        export_jax_onnx(fn, (x,), str(tmp_path / "bad.onnx"))


def test_non_f32_io_and_consts_fail_loud(tmp_path):
    """The graph carries f32 tensors only; int inputs and non-f32-exact
    captured constants must raise instead of exporting wrong types
    (ADVICE round-4)."""
    xi = jnp.zeros((4,), jnp.int32)
    with pytest.raises(NotImplementedError, match="float32 inputs"):
        export_jax_onnx(lambda x: x.astype(jnp.float32),
                        (xi,), str(tmp_path / "bad_in.onnx"))

    with pytest.raises(NotImplementedError, match="float32 outputs"):
        export_jax_onnx(lambda x: x.astype(jnp.int32),
                        (jnp.zeros((4,), jnp.float32),),
                        str(tmp_path / "bad_out.onnx"))

    # captured int32 constant that is NOT exactly f32-representable
    big = jnp.asarray(np.asarray([2**31 - 1], np.int32))

    def bad_const(x):
        return (x.astype(jnp.int32) + big).astype(jnp.float32)

    with pytest.raises(NotImplementedError, match="not exactly"):
        export_jax_onnx(bad_const, (jnp.zeros((1,), jnp.float32),),
                        str(tmp_path / "bad_const.onnx"))

    # an exactly-representable int constant still exports fine
    small = np.asarray([1, 2, 3], np.int64)

    def fn(x):
        return x + jnp.asarray(small, jnp.float32)

    export_jax_onnx(fn, (jnp.zeros((3,), jnp.float32),),
                    str(tmp_path / "ok.onnx"))

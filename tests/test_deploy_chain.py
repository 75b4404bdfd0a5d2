"""Full produce->deploy chain on NON-reference weights and a NON-reference
resolution: init -> fold -> .yfb -> C++ engine, logits vs the JAX folded
graph.  Catches any shape assumption hard-wired to the shipped checkpoints.
"""

import os

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "cpp", "build", "libyf.so")


def test_fresh_weights_through_native_engine(tmp_path):
    if not os.path.exists(LIB):
        pytest.skip("native library not built")
    from yolofastest_tpu.configs import Config, IOConfig
    from yolofastest_tpu.export import save_native_weights
    from yolofastest_tpu.models import YoloFastest, fold_batchnorm, folded_apply
    from yolofastest_tpu.native import NativeEngine

    io = IOConfig(input_shape=(64, 96, 1))
    cfg = Config(io=io)
    model = YoloFastest(num_cls=3, num_anchors=3)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 96, 1)) * 0.3
    variables = model.init(jax.random.PRNGKey(0), x)

    folded = fold_batchnorm(jax.tree.map(np.asarray, variables))
    yfb = str(tmp_path / "fresh.yfb")
    save_native_weights(folded, yfb)
    eng = NativeEngine(yfb, cfg)

    ref_large, ref_small = jax.jit(folded_apply)(folded, x)
    got_large, got_small = eng.forward(np.asarray(x[0, :, :, 0]))
    np.testing.assert_allclose(got_large, np.asarray(ref_large)[0],
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(got_small, np.asarray(ref_small)[0],
                               rtol=1e-4, atol=2e-3)

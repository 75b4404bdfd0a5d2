"""Export round-trips: StableHLO artifacts and the native .yfb format."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.export import (
    export_detect_pipeline,
    export_folded_forward,
    load_exported,
    load_native_weights,
    save_exported,
    save_native_weights,
)
from yolofastest_tpu.models import fold_batchnorm, folded_apply, load_variables, zoo_path

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def setup():
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    variables = load_variables(zoo_path("256x320"))
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    return variables, fx


def test_native_weights_roundtrip(tmp_path, setup):
    variables, _ = setup
    folded = fold_batchnorm(variables)
    p = str(tmp_path / "model.yfb")
    save_native_weights(folded, p)
    back = load_native_weights(p)
    assert set(back) == set(folded)
    for layer in folded:
        for t in folded[layer]:
            np.testing.assert_array_equal(back[layer][t], np.asarray(folded[layer][t]))


def test_stablehlo_folded_forward_roundtrip(tmp_path, setup):
    variables, fx = setup
    cfg = get_config("256x320")
    folded = fold_batchnorm(variables)
    exp = export_folded_forward(folded, cfg, batch=2)
    p = str(tmp_path / "folded.stablehlo")
    save_exported(exp, p)
    loaded = load_exported(p)

    imgs = (fx["pre_imgs"][:2].astype(np.float32)[..., None] - 128.0) / 255.0
    got_large, got_small = loaded.call(jnp.asarray(imgs))
    ref_large, ref_small = jax.jit(folded_apply)(
        jax.tree.map(jnp.asarray, folded), jnp.asarray(imgs)
    )
    np.testing.assert_allclose(np.asarray(got_large), np.asarray(ref_large),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_small), np.asarray(ref_small),
                               rtol=1e-5, atol=1e-5)
    assert "stablehlo" in exp.mlir_module() or "func.func" in exp.mlir_module()


def test_stablehlo_detect_pipeline_roundtrip(tmp_path, setup):
    variables, fx = setup
    cfg = get_config("256x320")
    exp = export_detect_pipeline(variables, cfg, batch=4)
    p = str(tmp_path / "detect.stablehlo")
    save_exported(exp, p)
    loaded = load_exported(p)

    frames = jnp.asarray(fx["pre_imgs"][:4])  # (4, H, W) uint8
    det = loaded.call(frames)
    # fixture boxes for image 0 must be found in the exported pipeline output
    golden = fx["boxes"][fx["boxes"][:, 0] < 4]
    det = jax.tree.map(np.asarray, det)
    assert int(det["count"].sum()) >= len(golden) * 0.9

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


@pytest.mark.gate
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


def _match_golden_exact(det, golden, n_imgs):
    """Every golden box must appear (±1px, same class, conf within 1e-3)."""
    matched = 0
    for g in golden:
        b = int(g[0])
        for i in range(int(det["count"][b])):
            if (int(det["cls_idx"][b][i]) == int(g[7])
                    and max(abs(np.asarray(det["boxes"][b][i], np.float64) - g[1:5])) <= 1.0
                    and abs(float(det["conf"][b][i]) - g[5]) < 1e-3):
                matched += 1
                break
    assert matched == len(golden), f"{matched}/{len(golden)} golden boxes"


def test_stablehlo_detect_pipeline_roundtrip(tmp_path, setup):
    variables, fx = setup
    cfg = get_config("256x320")
    exp = export_detect_pipeline(variables, cfg, batch=4)
    p = str(tmp_path / "detect.stablehlo")
    save_exported(exp, p)
    loaded = load_exported(p)

    frames = jnp.asarray(fx["pre_imgs"][:4])  # (4, H, W) uint8
    det = jax.tree.map(np.asarray, loaded.call(frames))
    golden = fx["boxes"][fx["boxes"][:, 0] < 4]
    assert int(det["count"].sum()) == len(golden)
    _match_golden_exact(det, golden, 4)


@pytest.mark.gate
def test_stablehlo_consumed_by_fresh_process(tmp_path, setup):
    """The external-runtime story: a process that imports ONLY jax.export +
    numpy (no flax, no yolofastest_tpu, no configs) loads detect.stablehlo
    and reproduces the golden detections exactly — the capability the
    reference gets from its ONNX/Caffe/RKNN converter zoo."""
    import json
    import subprocess
    import sys
    import textwrap

    variables, fx = setup
    cfg = get_config("256x320")
    exp = export_detect_pipeline(variables, cfg, batch=4)
    p = str(tmp_path / "detect.stablehlo")
    save_exported(exp, p)
    np.save(tmp_path / "frames.npy", np.asarray(fx["pre_imgs"][:4]))

    script = tmp_path / "consume.py"
    script.write_text(textwrap.dedent(f"""
        import json, sys
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        from jax import export as jexport

        with open({p!r}, "rb") as f:
            loaded = jexport.deserialize(f.read())
        frames = np.load({str(tmp_path / 'frames.npy')!r})
        det = loaded.call(frames)
        out = {{k: np.asarray(v).tolist() for k, v in det.items()}}
        banned = [m for m in sys.modules
                  if "flax" in m or "yolofastest" in m]
        assert not banned, f"framework modules leaked in: {{banned}}"
        json.dump(out, open({str(tmp_path / 'out.json')!r}, "w"))
        print("CONSUMED_OK")
    """))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run([sys.executable, str(script)], capture_output=True,
                       text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    assert "CONSUMED_OK" in r.stdout

    det = {k: np.asarray(v) for k, v in
           json.load(open(tmp_path / "out.json")).items()}
    golden = fx["boxes"][fx["boxes"][:, 0] < 4]
    assert int(det["count"].sum()) == len(golden)
    _match_golden_exact(det, golden, 4)


def test_stablehlo_int8_forward(tmp_path, setup):
    """The int8 graph (weights + activation scales baked in) round-trips and
    matches the in-process int8 executor bit-for-bit."""
    from yolofastest_tpu.export import export_int8_forward
    from yolofastest_tpu.models import fold_batchnorm
    from yolofastest_tpu.quant import calibrate, quantize_weights
    from yolofastest_tpu.quant.ptq import quantized_apply

    variables, fx = setup
    cfg = get_config("256x320")
    imgs = (fx["pre_imgs"][:4].astype(np.float32)[..., None] - 128.0) / 255.0

    exp = export_int8_forward(variables, cfg, imgs, batch=4)
    p = str(tmp_path / "forward_int8.stablehlo")
    save_exported(exp, p)
    loaded = load_exported(p)
    got_large, got_small = loaded.call(jnp.asarray(imgs))

    folded = fold_batchnorm(variables)
    scales = calibrate(folded, [imgs])
    qparams = jax.tree.map(jnp.asarray, quantize_weights(folded))
    ref_large, ref_small = quantized_apply(qparams, scales, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(got_large), np.asarray(ref_large),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_small), np.asarray(ref_small),
                               rtol=1e-5, atol=1e-5)


def test_stablehlo_lite_forward_roundtrip(tmp_path):
    """Single-head lite graph exports and round-trips (the CLI's
    --arch lite path)."""
    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.models import YoloFastestLite, folded_apply_lite

    import dataclasses

    cfg = get_config("lite-256x320")
    io_small = dataclasses.replace(cfg.io, input_shape=(64, 96, 1))
    cfg = dataclasses.replace(cfg, io=io_small)

    model = YoloFastestLite(num_cls=cfg.io.num_cls, num_anchors=cfg.io.num_anchors)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 1), jnp.float32), train=False)
    folded = fold_batchnorm(jax.device_get(variables))

    exp = export_folded_forward(folded, cfg, batch=2, arch="lite")
    p = str(tmp_path / "lite.stablehlo")
    save_exported(exp, p)
    loaded = load_exported(p)

    x = np.random.default_rng(0).standard_normal((2, 64, 96, 1)).astype(np.float32) * 0.1
    (got,) = loaded.call(jnp.asarray(x))
    ref = folded_apply_lite(jax.tree.map(jnp.asarray, folded), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

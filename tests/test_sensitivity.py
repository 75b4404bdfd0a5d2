"""Per-layer int8 sensitivity + mixed-precision deployment
(``quant/sensitivity.py``).

The reference never quantised at all (its RKNN build ran fp16,
``rknn_deploy.py:43``); this covers the hybrid-quantization analogue we
add around the completed int8 story: the one-compile sensitivity sweep,
the static mixed executor's exact endpoints (all-int8 == quantized_apply
bitwise, all-fp == folded_apply bitwise), and the CLI/Detector wiring.
Random-init lite at 64x96 keeps every case cheap on the 1-core CPU.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.models import fold_batchnorm, folded_apply_lite
from yolofastest_tpu.quant import (
    calibrate,
    layer_sensitivity,
    quantize_weights,
    quantized_apply,
    quantized_apply_mixed,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def lite_small():
    from yolofastest_tpu.models import YoloFastestLite

    model = YoloFastestLite(num_cls=3, num_anchors=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 96, 1)) * 0.3
    variables = model.init(jax.random.PRNGKey(0), x)
    folded = fold_batchnorm(jax.tree.map(np.asarray, variables))
    batch = np.asarray(x, np.float32)
    scales = calibrate(folded, [batch], arch="lite")
    return folded, scales, batch


def test_mixed_all_int8_is_quantized_apply(lite_small):
    folded, scales, x = lite_small
    ref = jax.jit(
        lambda v: quantized_apply(v, scales, x, arch="lite")
    )(quantize_weights(folded))
    got = jax.jit(
        lambda q, f: quantized_apply_mixed(q, f, scales, x, fp_layers=(),
                                           arch="lite")
    )(quantize_weights(folded), folded)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mixed_all_fp_is_folded_apply(lite_small):
    folded, scales, x = lite_small
    q = quantize_weights(folded)
    ref = jax.jit(folded_apply_lite)(folded, x)
    got = jax.jit(
        lambda qp, f: quantized_apply_mixed(qp, f, scales, x,
                                            fp_layers=tuple(sorted(q)),
                                            arch="lite")
    )(q, folded)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mixed_unknown_layer_raises(lite_small):
    folded, scales, x = lite_small
    with pytest.raises(ValueError, match="unknown --keep-fp"):
        quantized_apply_mixed(quantize_weights(folded), folded, scales, x,
                              fp_layers=("nope",), arch="lite")


@pytest.fixture(scope="module")
def ranking(lite_small):
    folded, scales, x = lite_small
    return layer_sensitivity(folded, [x], arch="lite", act_scales=scales)


def test_sensitivity_covers_every_layer_sorted(lite_small, ranking):
    folded, scales, _ = lite_small
    assert {r["layer"] for r in ranking} == set(quantize_weights(folded))
    means = [r["mean_abs"] for r in ranking]
    assert means == sorted(means, reverse=True)
    assert all(np.isfinite(r["mean_abs"]) and r["mean_abs"] >= 0
               and np.isfinite(r["max_abs"]) for r in ranking)


def test_keeping_worst_layers_fp_reduces_damage(lite_small, ranking):
    """Deploy-time check: the sweep's ranking is actionable — keeping the
    worst offenders in float must shrink the head-logit error vs full
    int8."""
    folded, scales, x = lite_small
    q = quantize_weights(folded)
    fp_heads = np.asarray(jax.jit(folded_apply_lite)(folded, x))

    def damage(fp_layers):
        h = np.asarray(quantized_apply_mixed(q, folded, scales, x,
                                             fp_layers=fp_layers,
                                             arch="lite"))
        return float(np.abs(h - fp_heads).mean())

    full = damage(())
    worst3 = tuple(r["layer"] for r in ranking[:3])
    assert damage(worst3) < full
    # and the all-fp endpoint is exact
    assert damage(tuple(r["layer"] for r in ranking)) == 0.0


def test_detector_keep_fp_backend_guard():
    from yolofastest_tpu.inference import Detector

    cfg = get_config("lite-256x320")
    with pytest.raises(ValueError, match="keep_fp"):
        Detector(cfg, variables={"params": {}}, backend="fp",
                 arch="lite", keep_fp=("conv1_1",))


def _tiny_cfg_json(tmp_path):
    cfg = get_config("lite-256x320")
    cfg = dataclasses.replace(
        cfg, io=dataclasses.replace(cfg.io, input_shape=(64, 96, 1)))
    p = tmp_path / "tiny.json"
    p.write_text(cfg.to_json())
    return str(p)


def test_cli_sensitivity_and_keep_fp_detect(tmp_path):
    """End-to-end CLI: sensitivity table -> --keep-fp deployment, on a
    random-init lite checkpoint at 64x96."""
    import cv2

    from yolofastest_tpu.cli import main
    from yolofastest_tpu.models import YoloFastestLite, save_variables

    cfgj = _tiny_cfg_json(tmp_path)
    model = YoloFastestLite(num_cls=3, num_anchors=3)
    variables = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 1),
                                                    jnp.float32)))
    # Random-init heads decode to unbounded boxes (exp of raw logits) — tame
    # the head so no candidate passes the conf gate while its weights stay
    # nonzero (the sensitivity sweep measures damage THROUGH the head).
    head = variables["params"]["head_5"]
    head["kernel"] = head["kernel"] * 0.1
    head["bias"] = np.full_like(head["bias"], -6.0)
    wpath = str(tmp_path / "w.npz")
    save_variables(variables, wpath)

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(data / f"im{i}.jpg"),
                    rng.integers(0, 255, (64, 96, 3), np.uint8))

    json_out = str(tmp_path / "sens.json")
    rc = main(["sensitivity", "--config-json", cfgj, "--arch", "lite",
               "--weights", wpath, "--data", str(data), "--images", "2",
               "--top", "2", "--json-out", json_out])
    assert rc == 0
    import json

    rows = json.load(open(json_out))
    assert len(rows) > 10 and rows[0]["mean_abs"] >= rows[-1]["mean_abs"]
    worst = ",".join(r["layer"] for r in rows[:2])

    out = tmp_path / "out"
    rc = main(["detect", "--config-json", cfgj, "--arch", "lite",
               "--weights", wpath, "--data", str(data), "--out", str(out),
               "--backend", "int8", "--keep-fp", worst,
               "--calibration-cache", str(tmp_path / "cal.json")])
    assert rc == 0
    assert (out / "result_im0.jpg").exists()

    # the guard: --keep-fp without the int8 backend is a clean error
    rc = main(["detect", "--config-json", cfgj, "--arch", "lite",
               "--weights", wpath, "--data", str(data), "--out", str(out),
               "--keep-fp", worst])
    assert rc == 2

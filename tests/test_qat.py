"""Quantisation-aware fine-tuning: STE fake-quant parity and descent.

The fake-quant graph must (a) numerically mirror the deployed int8
executor, (b) be differentiable end to end, and (c) actually reduce
quantisation error when fine-tuned — on both the distillation and the
labelled-loss paths.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path
from yolofastest_tpu.quant import (calibrate, fake_quant_act,
                                   fake_quant_weight, qat_apply, qat_finetune,
                                   quantize_weights, quantized_apply)
from yolofastest_tpu.quant.qat import ste_round

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


# ------------------------------------------------------------- numeric units


def test_ste_round_value_and_gradient():
    x = jnp.asarray([-1.6, -0.5, 0.4, 2.5])
    np.testing.assert_array_equal(np.asarray(ste_round(x)),
                                  np.round(np.asarray(x)))
    g = jax.grad(lambda v: jnp.sum(ste_round(v) ** 2))(x)
    # straight-through: d/dx round(x)^2 == 2*round(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.round(np.asarray(x)))


def test_fake_quant_act_matches_int8_quant():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2, (64,)).astype(np.float32))
    s = 0.037
    got = np.asarray(fake_quant_act(x, s))
    ref = np.clip(np.round(np.asarray(x) / s), -127, 127) * s  # ptq._quant_in
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)
    # gradient: identity inside the range, zero outside
    g = np.asarray(jax.grad(lambda v: jnp.sum(fake_quant_act(v, s)))(x))
    inside = np.abs(np.asarray(x)) <= 127.0 * s
    np.testing.assert_array_equal(g, inside.astype(np.float32))


def test_fake_quant_weight_matches_quantize_weights():
    rng = np.random.default_rng(1)
    k = rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32)
    got = np.asarray(fake_quant_weight(jnp.asarray(k)))
    q = quantize_weights({"l": {"kernel": k, "bias": np.zeros(16, np.float32)}})
    ref = q["l"]["kernel_q"].astype(np.float32) * q["l"]["w_scale"]
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-7)


# --------------------------------------------------- small-model fixtures


@pytest.fixture(scope="module")
def lite_setup():
    """Random-init lite model at toy resolution: cheap full-graph tests."""
    from yolofastest_tpu.models import YoloFastestLite

    model = YoloFastestLite(num_cls=3, num_anchors=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 96, 1)) * 0.3
    variables = model.init(jax.random.PRNGKey(0), x)
    folded = fold_batchnorm(jax.tree.map(np.asarray, variables))
    imgs = np.asarray(x, np.float32)
    scales = calibrate(folded, [imgs], arch="lite")
    return folded, scales, imgs


def test_qat_single_conv_matches_int8_executor(lite_setup):
    """One op in isolation: fake-quant == int8 executor to fp-accumulation
    precision (no cascading-bin-flip noise at depth 1)."""
    from yolofastest_tpu.quant.ptq import Int8Executor
    from yolofastest_tpu.quant.qat import FakeQuantExecutor

    folded, scales, imgs = lite_setup
    x = jnp.asarray(imgs)
    fq = FakeQuantExecutor(folded, scales).conv(x, "conv0", 3, stride=2)
    i8 = Int8Executor(quantize_weights(folded), scales).conv(
        x, "conv0", 3, stride=2)
    np.testing.assert_allclose(np.asarray(fq), np.asarray(i8),
                               rtol=1e-5, atol=1e-5 * np.abs(i8).max())


def test_qat_forward_tracks_int8_executor(lite_setup):
    """Full graph: fp32-accumulated fake-quant and int32-exact int8 drift
    apart only via bin flips on rounding boundaries, which cascade — the
    honest contract is that their disagreement stays an order of magnitude
    below the PTQ error both are modelling."""
    folded, scales, imgs = lite_setup
    fq = np.asarray(qat_apply(folded, scales, jnp.asarray(imgs), arch="lite"))
    i8 = np.asarray(quantized_apply(quantize_weights(folded), scales,
                                    jnp.asarray(imgs), arch="lite"))
    from yolofastest_tpu.models import folded_apply_lite

    fp = np.asarray(folded_apply_lite(folded, jnp.asarray(imgs)))
    drift = np.abs(fq - i8).mean()
    ptq_err = np.abs(i8 - fp).mean()
    assert drift < 0.35 * ptq_err, (drift, ptq_err)


def test_qat_gradients_flow_to_every_layer(lite_setup):
    folded, scales, imgs = lite_setup

    def loss(p):
        return jnp.mean(qat_apply(p, scales, jnp.asarray(imgs),
                                  arch="lite") ** 2)

    g = jax.grad(loss)(jax.tree_util.tree_map(jnp.asarray, dict(folded)))
    flat = jax.tree_util.tree_leaves_with_path(g)
    assert flat
    for path, leaf in flat:
        arr = np.asarray(leaf)
        assert np.all(np.isfinite(arr)), path
    nonzero = [np.any(np.asarray(leaf) != 0) for _, leaf in flat]
    # every parameter that feeds the head must receive gradient
    assert np.mean(nonzero) > 0.9, f"{sum(nonzero)}/{len(nonzero)}"


def test_distillation_reduces_quant_error(lite_setup):
    folded, scales, imgs = lite_setup
    tuned, hist = qat_finetune(folded, scales, [imgs], arch="lite",
                               steps=40, lr=3e-4)
    assert len(hist) == 40 and np.all(np.isfinite(hist))
    # STE training is noisy step to step; the returned params are the
    # best-loss point, so the contract is on min(hist)
    assert min(hist) < hist[0] * 0.9, hist[:3] + hist[-3:]
    # the tuned weights round onto the SAME grid and still beat PTQ there
    from yolofastest_tpu.models import folded_apply_lite

    ref = np.asarray(folded_apply_lite(folded, jnp.asarray(imgs)))
    err0 = np.mean((np.asarray(quantized_apply(
        quantize_weights(folded), scales, jnp.asarray(imgs),
        arch="lite")) - ref) ** 2)
    err1 = np.mean((np.asarray(quantized_apply(
        quantize_weights(tuned), scales, jnp.asarray(imgs),
        arch="lite")) - ref) ** 2)
    assert err1 < err0, (err0, err1)


def test_conf_weighted_and_snapshots(lite_setup):
    """conf_weight reweights only the objectness channels (loss still
    descends); snapshot_every returns the periodic parameter snapshots for
    metric-based selection (tools/search_int8_recipe2.py)."""
    folded, scales, imgs = lite_setup
    tuned, hist, snaps = qat_finetune(folded, scales, [imgs], arch="lite",
                                      steps=20, lr=3e-4, conf_weight=4.0,
                                      snapshot_every=5)
    assert len(snaps) == 4
    # API-contract test: trajectory finite (descent is covered by
    # test_distillation_reduces_quant_error; 20 STE steps on a random-init
    # model are too noisy to assert descent on)
    assert np.all(np.isfinite(hist))
    # snapshots are real, distinct parameter trees on the same treedef
    t0 = jax.tree_util.tree_structure(folded)
    for s in snaps:
        assert jax.tree_util.tree_structure(s) == t0
    a = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(snaps[0])])
    b = np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(snaps[-1])])
    assert not np.array_equal(a, b)
    # default conf_weight keeps the 2-tuple return contract
    out = qat_finetune(folded, scales, [imgs], arch="lite", steps=2, lr=3e-4)
    assert len(out) == 2


def test_label_mode_loss_descends(lite_setup):
    folded, scales, imgs = lite_setup
    tgts = np.zeros((2, 8, 6), np.float32)
    tgts[:, 0] = [0.5, 0.5, 0.3, 0.3, 1, 255]  # one centred box, cls 1
    anchors = [[(12.0, 18.0), (37.0, 49.0), (52.0, 132.0)]]
    tuned, hist = qat_finetune(folded, scales, [imgs], arch="lite",
                               targets=[tgts], anchors=anchors,
                               input_hw=(64, 96), steps=20, lr=3e-4)
    assert np.all(np.isfinite(hist))
    assert min(hist) < hist[0], (hist[0], min(hist))


def test_qat_finetune_validation():
    with pytest.raises(ValueError):
        qat_finetune({}, {}, [])
    with pytest.raises(ValueError):
        qat_finetune({}, {}, [np.zeros((1, 8, 8, 1))],
                     targets=[np.zeros((1, 8, 6))])  # no anchors/input_hw
    with pytest.raises(ValueError):
        qat_finetune({}, {}, [np.zeros((1, 8, 8, 1))] * 2,
                     targets=[np.zeros((1, 8, 6))], anchors=[[(1, 1)]],
                     input_hw=(8, 8))  # 2 batches, 1 target


# ---------------------------------------------------------------- CLI wiring


@pytest.mark.slow
def test_cli_export_qat_refines_int8_artifacts(tmp_path, monkeypatch):
    """`export --qat-steps N --calib-data D` ships QAT-refined weights in the
    int8 artifacts while the fp artifacts keep the original checkpoint."""
    import cv2
    import jax
    import jax.numpy as jnp

    from tests.test_train import tiny_config
    from yolofastest_tpu import configs
    from yolofastest_tpu.cli import main
    from yolofastest_tpu.models import YoloFastest, save_variables

    cfg = tiny_config()
    monkeypatch.setattr(configs, "get_config", lambda name="256x320", **kw: cfg)

    model = YoloFastest(num_cls=cfg.io.num_cls, num_anchors=cfg.io.num_anchors)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *cfg.io.input_hw, 1), jnp.float32),
                           train=False)
    wpath = str(tmp_path / "w.npz")
    save_variables(jax.device_get(variables), wpath)

    data = tmp_path / "calib"
    data.mkdir()
    rng = np.random.default_rng(7)
    for i in range(2):
        img = rng.integers(0, 255, (64, 96, 3), np.uint8)
        cv2.imwrite(str(data / f"c{i}.jpg"), img)

    base, qat = tmp_path / "base", tmp_path / "qat"
    for out, extra in ((base, []), (qat, ["--qat-steps", "8"])):
        rc = main(["export", "--config", "256x320", "--weights", wpath,
                   "--out", str(out), "--batch", "1",
                   "--calib-data", str(data)] + extra)
        assert rc == 0
        assert os.path.exists(out / "forward_int8.stablehlo")
        assert os.path.exists(out / "model.table")  # ncnn2int8 calibration

    fp_a = (base / "model.yfb").read_bytes()
    fp_b = (qat / "model.yfb").read_bytes()
    assert fp_a == fp_b  # fp artifact untouched by QAT
    i8_a = (base / "model_int8.yfb").read_bytes()
    i8_b = (qat / "model_int8.yfb").read_bytes()
    assert i8_a != i8_b  # int8 artifact carries the refined weights

    # the ncnn2int8 calibration table is consumed together with the shipped
    # fp model.param/model.bin — it must be derived from the ORIGINAL fp
    # weights on the QAT path too (QAT-shrunk amax multipliers would clip
    # the fp weights ncnn2int8 quantises), i.e. identical across both runs
    assert (base / "model.param").read_bytes() == (qat / "model.param").read_bytes()
    assert (base / "model.table").read_bytes() == (qat / "model.table").read_bytes()


# ------------------------------------------------------------ real model


@pytest.mark.slow
def test_qat_improves_zoo_int8_parity():
    """On the shipped checkpoint + golden images, a short distillation run
    must shrink the int8 head error against the fp model."""
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    from yolofastest_tpu.models import folded_apply

    variables = load_variables(zoo_path("256x320"))
    folded = fold_batchnorm(variables)
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
    imgs = imgs[:2]
    scales = calibrate(folded, [imgs])

    def int8_err(params):
        qp = quantize_weights(params)
        rl, rs = folded_apply(folded, jnp.asarray(imgs))
        gl, gs = quantized_apply(qp, scales, jnp.asarray(imgs))
        return float(jnp.mean((gl - rl) ** 2) + jnp.mean((gs - rs) ** 2))

    before = int8_err(folded)
    tuned, hist = qat_finetune(folded, scales, [imgs], steps=12, lr=1e-4)
    after = int8_err(tuned)
    assert min(hist) < hist[0]
    assert after < before, (before, after)

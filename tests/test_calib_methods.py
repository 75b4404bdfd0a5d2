"""Calibration algorithms for int8 PTQ: amax / mse / percentile / entropy.

The quartet mirrors RKNN-Toolkit's ``quantized_algorithm`` choices
(normal / mmse / kl_divergence) — the toolkit behind the reference's NPU
deployment (``rknn_deploy.py:179-196``).  The measured story on this model
(see the ``calibrate`` docstring): mse reduces int8 logit error ~13% at
identical golden recall; aggressive fixed clipping (percentile/entropy)
destroys detections because the rare high activations ARE the signal.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolofastest_tpu.models import fold_batchnorm, folded_apply, load_variables, zoo_path
from yolofastest_tpu.quant import calibrate, quantize_weights, quantized_apply
from yolofastest_tpu.quant.ptq import (_kl_threshold, _mse_threshold,
                                       _percentile_threshold, _smooth)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


# ------------------------------------------------------------ threshold math
def test_percentile_threshold_ignores_outlier():
    # 10k values in [0,1) plus one outlier at 10 -> the 99.99th percentile
    # threshold sits near 1.0, not at the outlier
    vals = np.concatenate([np.random.RandomState(0).rand(10000), [10.0]])
    hist, _ = np.histogram(vals, bins=256, range=(0, vals.max()))
    t = _percentile_threshold(hist, 99.99)
    assert 0.9 <= t / 256 * vals.max() <= 1.2


def test_percentile_threshold_at_100_keeps_full_range():
    hist = np.ones(64, np.int64)
    assert _percentile_threshold(hist, 100.0) == 64


def test_thresholds_degenerate_empty_histogram():
    z = np.zeros(128, np.int64)
    assert _percentile_threshold(z, 99.9) == 128
    assert _kl_threshold(z, target=32) == 128
    assert _mse_threshold(z, 128) == 128


def test_mse_threshold_tight_distribution_keeps_range():
    # all mass near amax: clipping below the mass is a huge squared error,
    # so the chosen threshold covers it
    hist = np.zeros(256, np.int64)
    hist[250:] = 1000
    t = _mse_threshold(hist, 256)
    assert t >= 250


def test_mse_threshold_clips_a_lone_outlier():
    # 1e6 values dense in the first 1/8 of the range, a single far outlier:
    # balancing resolution gain N*(t/127)^2/12 against the one saturated
    # value's (1-t)^2 puts the optimum near t* ~ 0.16 amax (bin ~41)
    hist = np.zeros(256, np.int64)
    hist[:32] = 31250
    hist[255] = 1
    t = _mse_threshold(hist, 256)
    assert 16 <= t <= 96, t


def test_mse_threshold_keeps_range_for_lone_outlier_with_little_mass():
    # with only 32k dense values the saturation cost of the outlier exceeds
    # the resolution gain — the optimal threshold stays at full range
    hist = np.zeros(256, np.int64)
    hist[:32] = 1000
    hist[255] = 1
    assert _mse_threshold(hist, 256) > 200


def test_kl_threshold_bounds():
    rng = np.random.RandomState(1)
    hist = rng.poisson(5.0, size=256).astype(np.int64)
    t = _kl_threshold(hist, target=64, stride=8)
    assert 64 <= t <= 256


def test_smooth_is_a_distribution():
    p = np.zeros(100)
    p[3], p[50] = 5, 1
    s = _smooth(p)
    assert s.min() > 0
    np.testing.assert_allclose(s.sum(), 1.0, atol=1e-6)


# --------------------------------------------------------------- calibrate()
@pytest.fixture(scope="module")
def setup():
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    variables = load_variables(zoo_path("256x320"))
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
    return fold_batchnorm(variables), imgs


def test_calibrate_rejects_unknown_method(setup):
    folded, imgs = setup
    with pytest.raises(ValueError, match="unknown calibration method"):
        calibrate(folded, [imgs[:1]], method="minmax")


def test_calibrate_method_keysets_match_and_scales_bounded(setup):
    folded, imgs = setup
    cal = [imgs[:2]]
    s_amax = calibrate(folded, cal)
    s_mse = calibrate(folded, cal, method="mse", bins=512)
    s_pct = calibrate(folded, cal, method="percentile", percentile=99.9,
                      bins=512)
    assert set(s_amax) == set(s_mse) == set(s_pct)
    for k in s_amax:
        assert 0 < s_mse[k] <= s_amax[k] * 1.001
        assert 0 < s_pct[k] <= s_amax[k] * 1.001


def test_calibrate_default_is_amax(setup):
    folded, imgs = setup
    cal = [imgs[:2]]
    assert calibrate(folded, cal) == calibrate(folded, cal, method="amax")


@pytest.mark.slow
def test_mse_calibration_beats_amax_on_golden_logits(setup):
    """The headline claim: per-layer MSE thresholds reduce the int8
    deployment graph's logit error vs the fp folded graph."""
    folded, imgs = setup
    qparams = quantize_weights(folded)
    x = jnp.asarray(imgs[:12])
    fpL, fpS = jax.jit(folded_apply)(folded, x)
    apply_q = jax.jit(lambda q, s, xx: quantized_apply(q, s, xx))

    def err(scales):
        st = {k: jnp.float32(v) for k, v in scales.items()}
        L, S = apply_q(qparams, st, x)
        return float(jnp.mean(jnp.abs(L - fpL)) + jnp.mean(jnp.abs(S - fpS)))

    e_amax = err(calibrate(folded, [imgs[:8]]))
    e_mse = err(calibrate(folded, [imgs[:8]], method="mse"))
    assert e_mse < e_amax, (e_mse, e_amax)


# ----------------------------------------------------------------- CLI layer
def test_cache_path_encodes_method(tmp_path):
    from yolofastest_tpu.cli import _int8_cache_path, build_parser

    p = build_parser()
    base = ["detect", "--weights", "w.npz", "--data", "d", "--out", "o"]
    a = p.parse_args(base)
    assert _int8_cache_path(a) == "w.calib.json"  # historical name preserved
    a = p.parse_args(base + ["--calib-method", "mse"])
    assert _int8_cache_path(a) == "w.calib-mse.json"
    a = p.parse_args(base + ["--calib-method", "percentile",
                             "--calib-percentile", "99.9"])
    assert _int8_cache_path(a) == "w.calib-percentile99.9.json"
    a = p.parse_args(base + ["--calibration-cache", "explicit.json",
                             "--calib-method", "mse"])
    assert _int8_cache_path(a) == "explicit.json"  # explicit always wins

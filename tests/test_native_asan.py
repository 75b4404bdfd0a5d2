"""Sanitizer run of the native engine (ASan + UBSan).

The reference ships no build files, let alone sanitizer configs
(SURVEY.md §5 'race detection: absent').  Here `cpp/build.sh --sanitize`
produces an AddressSanitizer+UBSan build of the whole engine — including the
OpenMP-parallel convolution loops — and this test drives the full golden
20-image benchmark through it.  Any heap overflow, use-after-free, UB or
leak aborts the binary with a nonzero exit.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASAN_RUNNER = os.path.join(REPO, "cpp", "build-asan", "yf_runner")
TEST_DATA = "/root/reference/test_data"


@pytest.mark.slow
def test_native_engine_clean_under_asan(tmp_path):
    if not os.path.exists(ASAN_RUNNER):
        pytest.skip("asan build not present (cpp/build.sh --sanitize)")
    if not os.path.isdir(TEST_DATA):
        pytest.skip("reference test data not mounted")

    from yolofastest_tpu.export import save_native_weights
    from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path

    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    from yolofastest_tpu.configs import get_config
    yfb = str(tmp_path / "model.yfb")
    save_native_weights(fold_batchnorm(load_variables(zoo_path("256x320"))), yfb,
                        io_config=get_config("256x320").io)

    out = tmp_path / "out"
    out.mkdir()
    r = subprocess.run(
        [ASAN_RUNNER, yfb, TEST_DATA, str(out), "256", "320"],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "ASAN_OPTIONS": "detect_leaks=1"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "avg_time" in r.stdout
    assert "ERROR: AddressSanitizer" not in r.stderr
    assert "runtime error:" not in r.stderr  # UBSan


@pytest.mark.slow
def test_native_int8_engine_clean_under_asan(tmp_path):
    """The int8 VNNI path (quantise + dpbusd GEMM + epilogue) over the full
    golden set under ASan+UBSan — masked loads/stores at channel tails are
    exactly the kind of code ASan exists for."""
    if not os.path.exists(ASAN_RUNNER):
        pytest.skip("asan build not present (cpp/build.sh --sanitize)")
    if not os.path.isdir(TEST_DATA):
        pytest.skip("reference test data not mounted")

    import numpy as np

    from yolofastest_tpu.export import save_native_weights
    from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path
    from yolofastest_tpu.quant import calibrate, quantize_weights

    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    from yolofastest_tpu.configs import get_config
    yfb = str(tmp_path / "model_int8.yfb")
    save_native_weights(quantize_weights(folded), yfb,
                        act_scales=calibrate(folded, [imgs[:4]]),
                        io_config=get_config("256x320").io)

    out = tmp_path / "out"
    out.mkdir()
    r = subprocess.run(
        [ASAN_RUNNER, yfb, TEST_DATA, str(out), "256", "320"],
        capture_output=True, text=True, timeout=1200,
        env={**os.environ, "ASAN_OPTIONS": "detect_leaks=1"},
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "avg_time" in r.stdout
    assert "ERROR: AddressSanitizer" not in r.stderr
    assert "runtime error:" not in r.stderr  # UBSan

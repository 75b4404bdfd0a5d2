"""ThreadSanitizer run of the native engine under concurrent use.

Complements the ASan+UBSan golden run (test_native_asan.py): the TSan
configuration (``cpp/build.sh --sanitize=thread``) compiles the engine
without OpenMP — libgomp's barriers false-positive under TSan — and
``yf_check`` drives it from plain std::threads: concurrent construction of
private nets from one .yfb plus concurrent forwards through ONE shared
instance, all verified bitwise against a serial reference.  Any data race
in the engine (shared scratch, lazy init, weight mutation) aborts with a
TSan report; any nondeterminism fails the bitwise check.  The reference has
no race-detection story at all (SURVEY.md §5).
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TSAN_CHECK = os.path.join(REPO, "cpp", "build-tsan", "yf_check")
RELEASE_CHECK = os.path.join(REPO, "cpp", "build", "yf_check")


def _make_yfb(tmp_path):
    from yolofastest_tpu.export import save_native_weights
    from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path

    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    yfb = str(tmp_path / "model.yfb")
    save_native_weights(fold_batchnorm(load_variables(zoo_path("256x320"))), yfb)
    return yfb


@pytest.mark.slow
def test_native_engine_race_free_under_tsan(tmp_path):
    if not os.path.exists(TSAN_CHECK):
        pytest.skip("tsan build not present (cpp/build.sh --sanitize=thread)")
    r = subprocess.run([TSAN_CHECK, _make_yfb(tmp_path), "128", "160", "4", "2"],
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "THREAD_CHECK_OK" in r.stdout


def test_native_engine_concurrent_forwards_deterministic(tmp_path):
    """Release-build concurrency check (with OpenMP): shared-instance and
    private-instance forwards from 4 threads match a serial run bitwise."""
    if not os.path.exists(RELEASE_CHECK):
        pytest.skip("release build not present (cpp/build.sh)")
    r = subprocess.run([RELEASE_CHECK, _make_yfb(tmp_path), "128", "160", "4", "2"],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "THREAD_CHECK_OK" in r.stdout


FUSED_CHECK = os.path.join(REPO, "cpp", "build", "yf_fused_check")


@pytest.mark.parametrize("threads", ["1", "3"])
def test_fused_res_block_bitwise_equals_unfused(threads):
    """The fused residual/chain path must be bitwise-equal to the composed
    unfused ops across the network's channel triples, generic shapes and
    degenerate rows/cols, at any thread count (ring-buffer halo chunking
    must not change results)."""
    if not os.path.exists(FUSED_CHECK):
        pytest.skip("release build not present (cpp/build.sh)")
    env = dict(os.environ, OMP_NUM_THREADS=threads)
    r = subprocess.run([FUSED_CHECK], capture_output=True, text=True,
                       timeout=600, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "FUSED_CHECK_OK" in r.stdout

"""ARM NEON kernel twins: bitwise parity via the x86 NEON-shim build.

``cpp/src/ops_neon.cpp`` provides NEON twins of the hot native kernels for
the reference's actual embedded target (ARM Cortex-A72 — SURVEY §6; no
cross-compiler or QEMU in this image, so verification runs the SAME kernel
source through the scalar NEON shim ``cpp/src/neon_compat.h``).
``yf_neon_check`` compares them bitwise against independent scalar
references; skips when the ``--neon-sim`` build is missing and cannot be
built (mirrors the sanitizer-gated tests).
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHECK = os.path.join(REPO, "cpp", "build-neonsim", "yf_neon_check")


def test_neon_kernels_bitwise():
    if not os.path.exists(CHECK):
        built = subprocess.run(
            [os.path.join(REPO, "cpp", "build.sh"), "--neon-sim"],
            capture_output=True)
        if built.returncode != 0 or not os.path.exists(CHECK):
            pytest.skip("neon-sim build missing and build failed")
    r = subprocess.run([CHECK], capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "all bitwise-equal" in r.stdout

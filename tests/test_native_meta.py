"""Embedded run-config (``__meta__``) in the ``.yfb`` native format.

The reference's C++ driver re-declares anchors/thresholds/shapes as
literals (``ncnn_deploy/main.cpp:16-24``) — the config-duplication hazard
SURVEY §5 orders fixed with "one config consumed everywhere".  Here the
exporter embeds the IOConfig into the ``.yfb`` and ``yf_runner`` consumes
it (no literal tables, strides derived from head shapes), so a CUSTOM
auto-anchor config decodes natively with its own anchors.
"""

import dataclasses
import os
import shutil
import subprocess

import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.export import (read_native_meta, save_native_weights)
from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "cpp", "build", "yf_runner")
TEST_DATA = "/root/reference/test_data"


def _custom_cfg():
    """Stock 256x320 config with anchors scaled 1.25x — decode geometry
    changes (exp(tw)*anchor_w), so stock-anchor decoding is detectably
    wrong while objectness (and thus detection count) is unaffected."""
    cfg = get_config("256x320")
    anchors = tuple(
        tuple((w * 1.25, h * 1.25) for (w, h) in grp) for grp in cfg.io.anchors
    )
    return dataclasses.replace(cfg, io=dataclasses.replace(cfg.io, anchors=anchors))


@pytest.mark.gate
def test_meta_roundtrip(tmp_path):
    cfg = get_config("512x640")
    if not os.path.exists(zoo_path("512x640")):
        pytest.skip("zoo weights not present")
    folded = fold_batchnorm(load_variables(zoo_path("512x640")))
    yfb = str(tmp_path / "m.yfb")
    save_native_weights(folded, yfb, io_config=cfg.io)
    meta = read_native_meta(yfb)
    assert meta["anchors"] == cfg.io.anchors
    assert meta["class_names"] == cfg.io.class_names
    assert meta["input_hw"] == cfg.io.input_hw
    assert meta["conf_thre"] == np.float32(cfg.io.conf_thre)
    assert meta["nms_thre"] == np.float32(cfg.io.nms_thre)
    # weights-only files read back as "no meta"
    yfb2 = str(tmp_path / "plain.yfb")
    save_native_weights(folded, yfb2)
    assert read_native_meta(yfb2) == {}


def test_runner_requires_meta(tmp_path):
    """yf_runner has NO literal config fallback: a weights-only .yfb is a
    clean, explained error."""
    if not os.path.exists(RUNNER):
        pytest.skip("native runner not built")
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    yfb = str(tmp_path / "plain.yfb")
    save_native_weights(folded, yfb)
    out = tmp_path / "out"
    out.mkdir()
    r = subprocess.run([RUNNER, yfb, str(tmp_path), str(out)],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode != 0
    assert "__meta__" in r.stderr and "re-export" in r.stderr


@pytest.mark.slow
def test_runner_consumes_custom_anchor_config(tmp_path):
    """Export a CUSTOM-anchor config into the .yfb; yf_runner (given no
    resolution/anchor arguments at all) must reproduce the JAX backend's
    boxes under that config — and differ from the stock-anchor decode."""
    if not os.path.exists(RUNNER):
        pytest.skip("native runner not built")
    if not os.path.isdir(TEST_DATA):
        pytest.skip("reference test data not mounted")
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    from yolofastest_tpu.inference import Detector
    from yolofastest_tpu.inference.detector import load_net_input

    cfg = _custom_cfg()
    variables = load_variables(zoo_path("256x320"))
    folded = fold_batchnorm(variables)
    yfb = str(tmp_path / "custom.yfb")
    save_native_weights(folded, yfb, io_config=cfg.io)

    data = tmp_path / "data"
    data.mkdir()
    names = sorted(os.listdir(TEST_DATA))[:4]
    for n in names:
        shutil.copy(os.path.join(TEST_DATA, n), data / n)

    out = tmp_path / "out"
    out.mkdir()
    r = subprocess.run([RUNNER, yfb, str(data), str(out)],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    native = {}
    with open(out / "boxes.txt") as f:
        for line in f:
            parts = line.split()
            native.setdefault(parts[0], []).append(
                [float(v) for v in parts[1:]])

    det = Detector(cfg, variables=variables)
    det_stock = Detector(get_config("256x320"), variables=variables)
    import jax.numpy as jnp

    differs_from_stock = 0
    for n in names:
        img, _ = load_net_input(os.path.join(data, n), cfg.io)
        got = det.run(jnp.asarray(img))
        k = int(np.asarray(got["count"])[0])
        rows = native.get(n, [])
        assert len(rows) == k, (n, rows, got)
        jb = np.asarray(got["boxes"])[0, :k]
        jcls = np.asarray(got["cls_idx"])[0, :k]
        for r in rows:
            assert any(
                int(r[6]) == int(jcls[i])
                and np.max(np.abs(np.asarray(r[:4]) - jb[i])) <= 1.0
                for i in range(k)
            ), (n, r, jb)
        stock = det_stock.run(jnp.asarray(img))
        ks = int(np.asarray(stock["count"])[0])
        sb = np.asarray(stock["boxes"])[0, :ks]
        for r in rows:
            if not any(np.max(np.abs(np.asarray(r[:4]) - sb[i])) <= 1.0
                       for i in range(ks)):
                differs_from_stock += 1
    # the 1.25x anchors must actually change decoded geometry somewhere
    assert differs_from_stock > 0

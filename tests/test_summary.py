"""Model summary (`models/summary.py`, CLI `info`).

The table is derived from the same deployment topology walk as every
backend, so its totals are checkable three independent ways: against the
folded weight arrays themselves, against locked architecture constants,
and against XLA's compiled cost analysis of the jitted forward.
"""

import json

import numpy as np
import pytest

from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path
from yolofastest_tpu.models.summary import (device_cost_analysis,
                                            format_summary, summarize)


def _folded(res="256x320"):
    return fold_batchnorm(load_variables(zoo_path(res)))


def test_totals_match_folded_arrays():
    folded = _folded()
    s = summarize(folded, (256, 320))
    want = sum(int(np.prod(v["kernel"].shape)) + int(v["bias"].shape[0])
               for v in folded.values())
    assert s["total_params"] == want
    assert {r["name"] for r in s["rows"]} == set(folded)


def test_locked_architecture_constants():
    s = summarize(_folded(), (256, 320))
    # folded graph: 325,800 params (the unfolded tree's locked 332,624 in
    # test_model.py minus one absorbed per-channel BN term per layer)
    assert s["total_params"] == 325800
    assert s["total_macs"] == 118221440  # 0.236 GFLOPs at 256x320
    assert s["heads"] == [(16, 20, 24), (8, 10, 24)]

    from yolofastest_tpu.models import YoloFastestLite
    import jax
    import jax.numpy as jnp

    lite_vars = YoloFastestLite(num_cls=3, num_anchors=3).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 1), jnp.float32),
        train=False)
    sl = summarize(fold_batchnorm(jax.device_get(lite_vars)), (256, 320),
                   arch="yolofastest-lite")
    assert sl["heads"] == [(8, 10, 24)]
    assert sl["total_params"] < s["total_params"]
    assert sl["total_macs"] < s["total_macs"]


def test_macs_scale_with_resolution_params_do_not():
    folded = _folded()
    a = summarize(folded, (256, 320))
    b = summarize(folded, (512, 640))
    assert b["total_params"] == a["total_params"]
    assert b["total_macs"] == 4 * a["total_macs"]  # fully convolutional


def test_xla_cost_agrees_with_analytic_macs():
    """XLA's compiled FLOP count for the folded forward lands within 10% of
    2x the analytic MACs (XLA also counts the adds/relus/bias)."""
    folded = _folded()
    hw = (64, 96)
    s = summarize(folded, hw)
    cost = device_cost_analysis(folded, hw, batch=1)
    assert cost["flops_per_img"] == pytest.approx(2 * s["total_macs"],
                                                  rel=0.10)


def test_format_and_cli(tmp_path, capsys):
    from yolofastest_tpu.cli import main

    out = format_summary(summarize(_folded(), (256, 320)))
    assert "total params: 325,800" in out
    assert "conv5_3" in out and "dwconv" in out and "5x5/1" in out

    j = str(tmp_path / "info.json")
    rc = main(["info", "--config", "256x320", "--json-out", j])
    assert rc == 0
    assert "total params: 325,800" in capsys.readouterr().out
    d = json.load(open(j))
    assert d["total_macs"] == 118221440
    assert len(d["rows"]) == 86  # every weighted layer in walk order

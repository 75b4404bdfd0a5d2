"""Structured channel pruning (models/prune.py).

Locks: the width-inference/keep-count rules, the exact block-local slicing
contract (fold(pruned) is a bitwise slice of fold(original); the pruned
graph equals the original graph with the dropped conv3 input slices
zeroed), build_model/Trainer/Detector integration with pruned widths, CLI
wiring, and the cross-backend promise — a pruned checkpoint exports to
``.yfb`` and the C++ engine (its generic fused-rows path: the pruned
channel triples are not templated) matches the JAX folded graph.

The reference has no model compression; pruning extends its embedded
deployment story (SURVEY.md §2.1 RKNN row, §2.2 ncnn rows).
"""

import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_train import make_dataset, tiny_config
from yolofastest_tpu.cli import main as cli_main
from yolofastest_tpu.configs import get_config
from yolofastest_tpu.models import (build_model, fold_batchnorm, folded_apply,
                                    load_variables, zoo_path)
from yolofastest_tpu.models.prune import (_keep_count, channel_scores,
                                          infer_inner_widths, prune_variables)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "cpp", "build", "libyf.so")

STOCK_WIDTHS = {
    "res1_1": 8,
    "res2_1": 32, "res2_2": 32,
    "res3_1": 48, "res3_2": 48,
    "res3_3": 96, "res3_4": 96, "res3_5": 96, "res3_6": 96,
    "res4_1": 136, "res4_2": 136, "res4_3": 136, "res4_4": 136,
    "res5_1": 224, "res5_2": 224, "res5_3": 224, "res5_4": 224, "res5_5": 224,
}


@pytest.fixture(scope="module")
def zoo_vars():
    path = zoo_path("256x320")
    if not os.path.exists(path):
        pytest.skip("zoo weights not present")
    return load_variables(path)


def _kept_indices(variables, ratio, min_keep=4, round_to=4):
    """The selection rule prune_variables applies (pinned here on purpose:
    top-keep by score, original order preserved)."""
    scores = channel_scores(variables)
    out = {}
    for name, cmid in infer_inner_widths(variables):
        keep = _keep_count(cmid, ratio, min_keep, round_to)
        out[name] = np.sort(np.argsort(scores[name])[::-1][:keep])
    return out


def test_keep_count_rules():
    assert _keep_count(224, 0.5, 4, 4) == 112
    assert _keep_count(8, 0.5, 4, 4) == 4
    # rounds UP to the multiple: 136 * 0.7 = 95.2 -> 96
    assert _keep_count(136, 0.3, 4, 4) == 96
    # ratio 0 is identity
    assert _keep_count(96, 0.0, 4, 4) == 96
    # min_keep floors, capped at cmid
    assert _keep_count(8, 0.99, 4, 4) == 4
    assert _keep_count(2, 0.5, 4, 1) == 2
    with pytest.raises(ValueError):
        prune_variables({"params": {}, "batch_stats": {}}, 1.0)


def test_infer_inner_widths_stock():
    model = build_model(num_cls=3, num_anchors=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 96, 1)), train=False)
    assert dict(infer_inner_widths(variables)) == STOCK_WIDTHS
    # lite shares the backbone — same expansion table
    lite = build_model(num_cls=3, num_anchors=3, arch="lite")
    lvars = lite.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 96, 1)), train=False)
    assert dict(infer_inner_widths(lvars)) == STOCK_WIDTHS


def test_ratio_zero_is_identity(zoo_vars):
    pruned, report = prune_variables(zoo_vars, 0.0)
    assert all(old == new for old, new in report.values())
    flat_a = jax.tree_util.tree_leaves_with_path(zoo_vars)
    flat_b = jax.tree_util.tree_leaves_with_path(pruned)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fold_of_pruned_is_bitwise_slice(zoo_vars):
    """fold(prune(vars)) must equal slicing fold(vars) — BN folding is
    per-output-channel, so pruning and folding commute exactly."""
    ratio = 0.5
    pruned, report = prune_variables(zoo_vars, ratio)
    kept = _kept_indices(zoo_vars, ratio)
    f_orig = fold_batchnorm(zoo_vars)
    f_pruned = fold_batchnorm(pruned)
    for name, idx in kept.items():
        old, new = report[name]
        assert new == len(idx) and new < old
        np.testing.assert_array_equal(
            f_pruned[f"{name}/conv1"]["kernel"],
            f_orig[f"{name}/conv1"]["kernel"][..., idx])
        np.testing.assert_array_equal(
            f_pruned[f"{name}/conv1"]["bias"],
            f_orig[f"{name}/conv1"]["bias"][idx])
        np.testing.assert_array_equal(
            f_pruned[f"{name}/conv2"]["kernel"],
            f_orig[f"{name}/conv2"]["kernel"][..., idx])
        np.testing.assert_array_equal(
            f_pruned[f"{name}/conv3"]["kernel"],
            f_orig[f"{name}/conv3"]["kernel"][:, :, idx, :])
        # conv3's output side (bias, residual io) is untouched
        np.testing.assert_array_equal(
            f_pruned[f"{name}/conv3"]["bias"],
            f_orig[f"{name}/conv3"]["bias"])


def test_pruned_graph_equals_zeroed_consumers(zoo_vars):
    """Removing inner channel c == zeroing k3[:, :, c, :] in the unpruned
    graph: the channel reaches the block output only through conv3, and
    zero contributions are exact — only float reassociation of the kept
    terms can differ, hence the tight (not bitwise) tolerance."""
    ratio = 0.5
    pruned, _ = prune_variables(zoo_vars, ratio)
    kept = _kept_indices(zoo_vars, ratio)

    f_zeroed = fold_batchnorm(zoo_vars)
    for name, idx in kept.items():
        k3 = np.array(f_zeroed[f"{name}/conv3"]["kernel"])
        mask = np.zeros(k3.shape[2], bool)
        mask[idx] = True
        k3[:, :, ~mask, :] = 0.0
        f_zeroed[f"{name}/conv3"]["kernel"] = k3

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 256, 320, 1), np.float32) * 0.3
    out_p = jax.jit(folded_apply)(
        jax.tree.map(jnp.asarray, fold_batchnorm(pruned)), jnp.asarray(x))
    out_z = jax.jit(folded_apply)(
        jax.tree.map(jnp.asarray, f_zeroed), jnp.asarray(x))
    for a, b in zip(out_p, out_z):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_build_model_applies_pruned(zoo_vars):
    pruned, report = prune_variables(zoo_vars, 0.5)
    model = build_model(num_cls=3, num_anchors=3, variables=pruned)
    large, small = model.apply(jax.tree.map(jnp.asarray, pruned),
                               jnp.zeros((1, 64, 96, 1)), train=False)
    assert large.shape == (1, 4, 6, 24)
    assert small.shape == (1, 2, 3, 24)
    n_stock = sum(np.size(x) for x in jax.tree_util.tree_leaves(
        zoo_vars["params"]))
    n_pruned = sum(np.size(x) for x in jax.tree_util.tree_leaves(
        pruned["params"]))
    assert n_pruned < 0.8 * n_stock


def test_detector_runs_pruned(zoo_vars):
    from yolofastest_tpu.inference import Detector

    pruned, _ = prune_variables(zoo_vars, 0.5)
    cfg = get_config("256x320")
    det = Detector(cfg, variables=pruned, fold_bn=True)
    rng = np.random.default_rng(1)
    out = det.run(jnp.asarray(
        rng.standard_normal((1, 256, 320, 1), np.float32) * 0.2))
    assert set(out) >= {"boxes", "conf", "valid"}


def test_trainer_finetunes_pruned(tmp_path):
    """A pruned tree fine-tunes: Trainer builds the narrow model from the
    variables, steps run, and params keep the pruned shapes.  (Warmup LR at
    step 0 is exactly 0 — step a few times before asserting movement.)"""
    from yolofastest_tpu.data import DetectionLoader, VOCIndex
    from yolofastest_tpu.train import Trainer

    cfg = tiny_config()
    model = build_model(num_cls=cfg.io.num_cls, num_anchors=cfg.io.num_anchors)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *cfg.io.input_hw, 1)), train=False)
    pruned, _ = prune_variables(variables, 0.5)
    widths = dict(infer_inner_widths(pruned))
    assert widths["res5_1"] == 112

    root = str(tmp_path / "voc")
    make_dataset(root, 8, cfg, seed=3)
    loader = DetectionLoader(VOCIndex(root, cfg.io.class_names), cfg,
                             batch_size=8, augment=False, shuffle=False)
    imgs, tgts = next(iter(loader))

    trainer = Trainer(cfg, batch_per_epoch=1, variables=pruned)
    before = jax.device_get(trainer.state.params)
    for _ in range(3):
        metrics = trainer.step(imgs, tgts)
    assert np.isfinite(metrics["total"])
    after = jax.device_get(trainer.state.params)
    assert dict(infer_inner_widths({"params": after})) == widths
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after)))
    assert moved


def test_cli_prune(tmp_path, zoo_vars, capsys):
    out = str(tmp_path / "pruned.npz")
    rc = cli_main(["prune", "--weights", zoo_path("256x320"),
                   "--ratio", "0.5", "--out", out])
    assert rc == 0
    text = capsys.readouterr().out
    assert "res5_1" in text and "params" in text and "MACs" in text
    pruned = load_variables(out)
    assert dict(infer_inner_widths(pruned))["res5_1"] == 112
    # sliced shapes flow through the arch guard + summary CLI unchanged
    rc = cli_main(["info", "--weights", out])
    assert rc == 0
    assert "res5_1/conv1" in capsys.readouterr().out


def test_prune_composes_with_int8(zoo_vars):
    """The full compression pipeline: prune -> calibrate -> int8 executor.
    The quantised pruned graph must stay close to the pruned fp graph
    (per-layer int8 on a 40%-pruned model; tolerance matches the PTQ
    contract scale in tests/test_graph_quant.py)."""
    from yolofastest_tpu.quant import calibrate, quantize_weights
    from yolofastest_tpu.quant.ptq import quantized_apply

    pruned, _ = prune_variables(zoo_vars, 0.4)
    folded = fold_batchnorm(pruned)
    rng = np.random.default_rng(3)
    cal = rng.standard_normal((4, 256, 320, 1), np.float32) * 0.2
    scales = calibrate(folded, [cal])
    qparams = jax.tree.map(jnp.asarray, quantize_weights(folded))
    x = jnp.asarray(cal[:2])
    q_large, q_small = quantized_apply(qparams, scales, x)
    f_large, f_small = jax.jit(folded_apply)(
        jax.tree.map(jnp.asarray, folded), x)
    # int8 error, not a bug bar: heads must correlate strongly
    for q, f in zip((q_large, q_small), (f_large, f_small)):
        q, f = np.asarray(q, np.float64).ravel(), np.asarray(f, np.float64).ravel()
        corr = np.corrcoef(q, f)[0, 1]
        assert corr > 0.99, corr


@pytest.mark.skipif(not os.path.exists(LIB),
                    reason="native library not built (cpp/build.sh)")
def test_native_engine_runs_pruned(zoo_vars, tmp_path):
    """The cross-backend contract: a pruned .yfb drives the C++ engine
    (generic fused-rows path — pruned channel triples are not templated)
    to the same logits as the JAX folded graph."""
    from yolofastest_tpu.export import save_native_weights
    from yolofastest_tpu.native import NativeEngine

    pruned, _ = prune_variables(zoo_vars, 0.5)
    folded = fold_batchnorm(pruned)
    yfb = str(tmp_path / "pruned.yfb")
    save_native_weights(folded, yfb)
    cfg = get_config("256x320")
    eng = NativeEngine(yfb, cfg)

    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((2, 256, 320, 1), np.float32) * 0.2
    ref_large, ref_small = jax.jit(folded_apply)(
        jax.tree.map(jnp.asarray, folded), jnp.asarray(imgs))
    for i in range(2):
        got_large, got_small = eng.forward(imgs[i])
        np.testing.assert_allclose(got_large, np.asarray(ref_large)[i],
                                   rtol=1e-4, atol=2e-3)
        np.testing.assert_allclose(got_small, np.asarray(ref_small)[i],
                                   rtol=1e-4, atol=2e-3)

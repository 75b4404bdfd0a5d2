"""Module freezing (``train --freeze``, ``train/trainer.py::freeze_masks``).

Locked contracts: (a) mask resolution — the ``backbone`` alias pins every
non-head module, prefixes must match, something must stay trainable;
(b) a frozen module's params AND BN running stats are BITWISE unchanged
after real train steps while unfrozen modules move; (c) the opt-state
layout is identical to an unfrozen run (checkpoints stay resume-compatible
across --freeze settings); (d) the CLI flag reaches the Trainer and a typo
fails fast.
"""

import dataclasses

import jax
import numpy as np
import pytest

from tests.test_train import tiny_config
from yolofastest_tpu.train import Trainer, freeze_masks


def _batch(seed=0, n=8):
    rng = np.random.default_rng(seed)
    imgs = rng.standard_normal((n, 64, 96, 1)).astype(np.float32) * 0.2
    targets = np.full((n, 64, 6), 255.0, np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.4, 0.4, 1.0]  # one valid box per image
    return imgs, targets


def _flat(tree):
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


# ----------------------------------------------------------------- masks
def test_backbone_alias_pins_everything_but_heads():
    trainer = Trainer(tiny_config(), batch_per_epoch=10, seed=0)
    params = jax.device_get(trainer.state.params)
    bs = jax.device_get(trainer.state.batch_stats)
    pm, bm, names = freeze_masks(params, bs, "backbone")
    assert "head_4" not in names and "head_5" not in names
    assert set(names) == {n for n in params if not n.startswith("head")}
    for mod, sub in pm.items():
        want = mod in names
        assert all(leaf is want for leaf in jax.tree_util.tree_leaves(sub))
    # batch_stats masks follow the same module set
    for mod, sub in bm.items():
        assert all(leaf is (mod in names)
                   for leaf in jax.tree_util.tree_leaves(sub))


def test_mask_spec_errors():
    trainer = Trainer(tiny_config(), batch_per_epoch=10, seed=0)
    params = jax.device_get(trainer.state.params)
    bs = jax.device_get(trainer.state.batch_stats)
    with pytest.raises(ValueError, match="matches no module"):
        freeze_masks(params, bs, "nosuchmodule")
    with pytest.raises(ValueError, match="every module"):
        freeze_masks(params, bs, ",".join(sorted(params.keys())))
    with pytest.raises(ValueError, match="empty"):
        freeze_masks(params, bs, " , ")
    # prefix form: one module only
    _, _, names = freeze_masks(params, bs, "conv0")
    assert names == ["conv0"]


# ------------------------------------------------------------ train steps
def test_frozen_backbone_bitwise_pinned_heads_move():
    cfg = tiny_config()
    imgs, targets = _batch()

    frozen = Trainer(cfg, batch_per_epoch=10, seed=0, freeze="backbone")
    before_p = _flat(jax.device_get(frozen.state.params))
    before_bs = _flat(jax.device_get(frozen.state.batch_stats))
    for i in range(3):
        frozen.step(imgs, targets)
    after_p = _flat(jax.device_get(frozen.state.params))
    after_bs = _flat(jax.device_get(frozen.state.batch_stats))

    head_moved = 0
    for k in before_p:
        if k.startswith("['head"):
            head_moved += int(not np.array_equal(before_p[k], after_p[k]))
        else:
            assert np.array_equal(before_p[k], after_p[k]), f"{k} moved"
    assert head_moved > 0, "no head param moved"
    # BN stats: heads have none in this model, so ALL stats are pinned
    for k in before_bs:
        assert np.array_equal(before_bs[k], after_bs[k]), f"{k} stats moved"

    # control: same seed unfrozen, same step count (step 0 runs at the
    # warmup schedule's exact-zero LR) — backbone params DO move
    control = Trainer(cfg, batch_per_epoch=10, seed=0)
    cb = _flat(jax.device_get(control.state.params))
    for _ in range(3):
        control.step(imgs, targets)
    ca = _flat(jax.device_get(control.state.params))
    assert any(not np.array_equal(cb[k], ca[k])
               for k in cb if not k.startswith("['head"))


def test_opt_state_layout_unchanged_by_freeze():
    cfg = tiny_config()
    a = Trainer(cfg, batch_per_epoch=10, seed=0)
    b = Trainer(cfg, batch_per_epoch=10, seed=0, freeze="backbone")
    assert (jax.tree_util.tree_structure(a.state.opt_state)
            == jax.tree_util.tree_structure(b.state.opt_state))
    assert b.frozen_modules and a.frozen_modules == []


# ------------------------------------------------------------------- CLI
def test_cli_freeze_wiring(monkeypatch, tmp_path):
    """--freeze reaches Trainer; a typo exits with the module list."""
    from tests.test_train import make_dataset
    from yolofastest_tpu.cli import main

    cfg = tiny_config()
    root = tmp_path / "data"
    make_dataset(str(root), 8, cfg)
    cfg_json = tmp_path / "cfg.json"
    cfg_json.write_text(
        dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, batch_size=8,
                                           total_epochs=1)).to_json())

    seen = {}
    import yolofastest_tpu.train as train_pkg

    real = train_pkg.Trainer

    class SpyTrainer(real):
        def __init__(self, *a, **kw):
            seen["freeze"] = kw.get("freeze")
            super().__init__(*a, **kw)

    monkeypatch.setattr(train_pkg, "Trainer", SpyTrainer)
    rc = main(["train", "--config-json", str(cfg_json),
               "--train-dir", str(root), "--epochs", "1",
               "--log-dir", str(tmp_path / "log"),
               "--checkpoint-dir", str(tmp_path / "ckpt"),
               "--freeze", "backbone"])
    assert rc == 0 and seen["freeze"] == "backbone"

    with pytest.raises(SystemExit, match="matches no module"):
        main(["train", "--config-json", str(cfg_json),
              "--train-dir", str(root), "--epochs", "1",
              "--log-dir", str(tmp_path / "log2"),
              "--checkpoint-dir", str(tmp_path / "ckpt2"),
              "--freeze", "headd"])

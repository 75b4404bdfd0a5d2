"""Knowledge distillation: teacher wiring, head matching, and descent.

The reference ships no distillation (and no trained lite weights,
SURVEY.md §2); this locks our beyond-reference full→lite teacher path:
the frozen folded teacher is traced into the sharded train step and the
student's heads chase its logits.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_train import ANCHORS_SMALL, make_dataset, tiny_config
from yolofastest_tpu.configs import Config, IOConfig
from yolofastest_tpu.models import YoloFastest
from yolofastest_tpu.train import Trainer, distill_loss, make_teacher_fn


def tiny_lite_config() -> Config:
    """Single-head (stride-32) sibling of tiny_config — same classes,
    resolution and small-scale anchor group, so the full teacher's small
    head aligns with the lite student's only head."""
    io = IOConfig(
        input_shape=(64, 96, 1),
        origin_img_shape=(128, 192, 3),
        anchors=(ANCHORS_SMALL[1],),
        conf_thre=0.3,
    )
    return Config(io=io)


@pytest.fixture(scope="module")
def teacher():
    cfg = tiny_config()
    model = YoloFastest(num_cls=cfg.io.num_cls, num_anchors=cfg.io.num_anchors)
    variables = model.init(
        jax.random.PRNGKey(42),
        jnp.zeros((1, *cfg.io.input_hw, 1), jnp.float32), train=False)
    return jax.tree.map(np.asarray, variables)


def test_teacher_fn_head_shapes(teacher):
    fn = make_teacher_fn(teacher, arch="fastest")
    heads = fn(jnp.zeros((2, 64, 96, 1), jnp.float32))
    assert len(heads) == 2
    assert heads[0].shape == (2, 4, 6, 24)   # stride 16
    assert heads[1].shape == (2, 2, 3, 24)   # stride 32


def test_distill_loss_matches_trailing_heads(teacher):
    fn = make_teacher_fn(teacher, arch="fastest")
    x = jnp.zeros((2, 64, 96, 1), jnp.float32)
    t_heads = fn(x)
    # a "student" that IS the teacher's small head: loss must be zero and
    # must pair with the LAST teacher head
    assert float(distill_loss((t_heads[1],), t_heads)) == 0.0
    assert float(distill_loss(t_heads, t_heads)) == 0.0
    with pytest.raises(ValueError, match="teacher produces"):
        distill_loss(t_heads, (t_heads[1],))
    with pytest.raises(ValueError, match="student head"):
        distill_loss((t_heads[0],), t_heads)  # stride-16 vs stride-32 shape


def test_teacher_fn_rejects_unknown_arch(teacher):
    with pytest.raises(ValueError, match="arch"):
        make_teacher_fn(teacher, arch="resnet")


def test_distill_metric_descends_full_to_lite(teacher):
    """Full→lite: the distill term appears in metrics and a short run on a
    fixed batch drives it down (the student head chases the teacher)."""
    cfg = tiny_lite_config()
    # warmup = max(3*batch_per_epoch, warmup_min_iters): keep it to 5 steps
    # and the cosine horizon far away so the run trains at full lr
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, lr0=2e-2,
                                       total_epochs=1000,
                                       warmup_min_iters=5,
                                       grad_clip_norm=0.0))
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((8, 64, 96, 1)).astype(np.float32) * 0.2
    tgts = np.zeros((8, cfg.train.max_boxes, 6), np.float32)
    tgts[:, 0] = [0.5, 0.5, 0.25, 0.25, 1, 255.0]

    trainer = Trainer(cfg, batch_per_epoch=1, seed=0, arch="lite",
                      distill_fn=make_teacher_fn(teacher, arch="fastest"),
                      distill_weight=1.0)
    hist = []
    for _ in range(100):
        m = trainer.step(imgs, tgts)
        hist.append(float(m["distill"]))
    assert np.all(np.isfinite(hist))
    assert float(m["total"]) > 0
    # measured 0.06x at this config; 0.3x leaves a wide stability margin
    assert min(hist[-5:]) < 0.3 * hist[0], (hist[0], hist[-5:])


@pytest.mark.slow
def test_cli_train_distill(tmp_path, monkeypatch):
    """`train --distill-teacher` end to end: logs the distill setup and the
    metrics JSONL carries the distill component."""
    import json

    from yolofastest_tpu import configs
    from yolofastest_tpu.cli import main
    from yolofastest_tpu.models import save_variables

    cfg = tiny_config()
    monkeypatch.setattr(configs, "get_config", lambda name="256x320", **kw: cfg)

    model = YoloFastest(num_cls=cfg.io.num_cls, num_anchors=cfg.io.num_anchors)
    variables = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, *cfg.io.input_hw, 1), jnp.float32), train=False)
    tpath = str(tmp_path / "teacher.npz")
    save_variables(jax.device_get(variables), tpath)

    # 80 images / batch 8 -> 10 steps, so the log_every=10 JSONL line fires
    root = str(tmp_path / "voc")
    make_dataset(root, 80, cfg, seed=3)
    logdir = str(tmp_path / "logs")
    rc = main(["train", "--config", "256x320", "--train-dir", root,
               "--epochs", "1", "--batch-size", "8",
               "--checkpoint-dir", str(tmp_path / "ckpt"),
               "--log-dir", logdir,
               "--distill-teacher", tpath, "--distill-weight", "0.5"])
    assert rc == 0
    log = open(os.path.join(logdir, "train_info.log")).read()
    assert "Distilling from" in log
    metrics = [json.loads(l) for l in open(os.path.join(logdir, "metrics.jsonl"))]
    assert metrics and all("distill" in m and np.isfinite(m["distill"])
                           for m in metrics)

"""Training actually learns: mAP on synthetic rectangles climbs well above
chance within a few hundred steps, and runs are seed-reproducible.

The reference's only evidence of training quality is its committed
train_info.log history (SURVEY.md §4); this makes it an automated check.
"""

import numpy as np
import pytest

from tests.test_train import make_dataset, tiny_config
from yolofastest_tpu.data import DetectionLoader, VOCIndex
from yolofastest_tpu.eval import MAPEvaluator
from yolofastest_tpu.train import Trainer


@pytest.mark.slow
def test_training_converges_on_synthetic_data(tmp_path):
    import dataclasses

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, io=dataclasses.replace(cfg.io, conf_thre=0.25),
        train=dataclasses.replace(cfg.train, total_epochs=30, lr0=2e-3,
                                  warmup_min_iters=10),
    )
    root = str(tmp_path / "voc")
    make_dataset(root, 64, cfg, seed=7)
    idx = VOCIndex(root, cfg.io.class_names)
    loader = DetectionLoader(idx, cfg, batch_size=16, seed=1)

    trainer = Trainer(cfg, batch_per_epoch=len(loader), seed=0)
    first_losses, last_losses = [], []
    n_epochs = 30
    for epoch in range(n_epochs):
        for imgs, tgts in loader:
            m = trainer.step(imgs, tgts)
            if epoch == 0:
                first_losses.append(float(m["total"]))
            elif epoch == n_epochs - 1:
                last_losses.append(float(m["total"]))

    assert np.mean(last_losses) < 0.5 * np.mean(first_losses), (
        f"loss did not drop: {np.mean(first_losses):.3f} -> {np.mean(last_losses):.3f}"
    )

    # train-set mAP must be far above chance (random init scores ~0)
    eval_loader = DetectionLoader(idx, cfg, batch_size=16, augment=False,
                                  shuffle=False)
    mAP = MAPEvaluator(cfg, eval_loader)(trainer.variables, epoch=n_epochs)
    assert mAP > 0.2, f"train-set mAP only {mAP:.3f} after {n_epochs} epochs"


def test_training_is_seed_reproducible():
    cfg = tiny_config()
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((8, 64, 96, 1)).astype(np.float32) * 0.2
    tgts = np.zeros((8, cfg.train.max_boxes, 6), np.float32)
    tgts[:, 0] = [0.5, 0.5, 0.25, 0.25, 1, 255.0]

    losses = []
    for _ in range(2):
        trainer = Trainer(cfg, batch_per_epoch=10, seed=123)
        run = [float(trainer.step(imgs, tgts)["total"]) for _ in range(3)]
        losses.append(run)
    np.testing.assert_array_equal(losses[0], losses[1])

"""End-to-end CLI training run on a synthetic VOC dataset.

Exercises the full user workflow (``python -m yolofastest_tpu train``):
config overrides, dataset loading, sharded train steps, validation hook,
orbax checkpoints, reference-format logs, JSONL metrics.
"""

import json
import os

import numpy as np
import pytest

from tests.test_train import make_dataset, tiny_config


@pytest.mark.slow
def test_cli_train_end_to_end(tmp_path, monkeypatch):
    import yolofastest_tpu.cli as cli
    from yolofastest_tpu import configs

    cfg = tiny_config()
    root = tmp_path / "voc"
    # 80 images / batch 8 -> 10 steps per epoch, so the log_every=10 step
    # lines and JSONL metrics actually fire
    make_dataset(str(root), 80, cfg, seed=3)

    # route the CLI's named preset to the tiny test config (2 epochs)
    import dataclasses

    tiny = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, total_epochs=2, batch_size=8,
                                       val_after_epoch=0)
    )
    monkeypatch.setattr(configs, "get_config", lambda name="256x320", **kw: tiny)

    log_dir = str(tmp_path / "logs")
    ckpt_dir = str(tmp_path / "ckpts")
    rc = cli.main([
        "train", "--config", "256x320",
        "--train-dir", str(root), "--val-dir", str(root),
        "--log-dir", log_dir, "--checkpoint-dir", ckpt_dir,
        "--epochs", "2", "--batch-size", "8", "--coco-map",
    ])
    assert rc == 0

    # reference-format training log exists and shows steps
    log = open(os.path.join(log_dir, "train_info.log")).read()
    assert "total_iter" in log and "loss =" in log
    assert "mean AP:" in log  # validation ran (val_after_epoch=0 -> epoch 1)
    assert "mean AP@[0.50:0.95]:" in log  # --coco-map grid line

    # full-state checkpoints per epoch
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_0"))
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_1"))

    # JSONL metrics stream
    lines = open(os.path.join(log_dir, "metrics.jsonl")).read().splitlines()
    rec = json.loads(lines[-1])
    assert "total" in rec and np.isfinite(rec["total"])


@pytest.mark.slow
def test_cli_train_elastic_resume(tmp_path, monkeypatch):
    """Crash-restart story: rerunning with --resume latest picks up at the
    next epoch with the full optimizer state."""
    import dataclasses

    import yolofastest_tpu.cli as cli
    from yolofastest_tpu import configs

    cfg = tiny_config()
    root = tmp_path / "voc"
    make_dataset(str(root), 16, cfg, seed=5)
    tiny = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, total_epochs=2, batch_size=8)
    )
    monkeypatch.setattr(configs, "get_config", lambda name="256x320", **kw: tiny)

    log_dir = str(tmp_path / "logs")
    ckpt_dir = str(tmp_path / "ckpts")
    base = ["train", "--config", "256x320", "--train-dir", str(root),
            "--log-dir", log_dir, "--checkpoint-dir", ckpt_dir,
            "--batch-size", "8"]
    assert cli.main(base + ["--epochs", "2"]) == 0
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_1"))

    # "crash" after epoch 2; resume for two more epochs
    assert cli.main(base + ["--epochs", "4", "--resume", "latest"]) == 0
    log = open(os.path.join(log_dir, "train_info.log")).read()
    assert "Resumed full state from" in log and "(epoch 2)" in log
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_3"))

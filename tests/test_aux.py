"""Aux subsystems: profiling timer, metrics writer, non-finite step skipping."""

import json
import os

import numpy as np
import pytest


def test_section_timer_reports():
    import time

    from yolofastest_tpu.utils.profiling import SectionTimer

    t = SectionTimer()
    for _ in range(3):
        with t.section("work"):
            time.sleep(0.002)
    rep = t.report()
    assert rep["work"]["count"] == 3
    assert rep["work"]["avg_ms"] >= 1.0


def test_metrics_writer_jsonl(tmp_path):
    from yolofastest_tpu.utils.metrics import MetricsWriter

    w = MetricsWriter(str(tmp_path), tensorboard=False)
    w(1, {"loss": 2.5, "lr": 1e-3})
    w(2, {"loss": 2.0, "lr": 1e-3})
    w.close()
    lines = open(tmp_path / "metrics.jsonl").read().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["step"] == 2 and rec["loss"] == 2.0


def test_checkpoint_rotation(tmp_path):
    from tests.test_train import tiny_config
    from yolofastest_tpu.train import Trainer

    cfg = tiny_config()
    trainer = Trainer(cfg, batch_per_epoch=10, seed=0)
    for e in range(4):
        trainer.save_checkpoint(str(tmp_path), e, max_to_keep=2)
    kept = sorted(d for d in os.listdir(tmp_path) if d.startswith("epoch_"))
    assert kept == ["epoch_2", "epoch_3"]


def test_trainer_skips_nonfinite_gradients():
    """A poisoned batch (inf pixels -> non-finite loss/grads) must not corrupt
    the parameters; apply_if_finite skips the update on device."""
    import jax

    from tests.test_train import tiny_config
    from yolofastest_tpu.train import Trainer

    cfg = tiny_config()
    trainer = Trainer(cfg, batch_per_epoch=10, seed=0)
    rng = np.random.default_rng(0)
    good = rng.standard_normal((8, 64, 96, 1)).astype(np.float32) * 0.2
    tgts = np.zeros((8, cfg.train.max_boxes, 6), np.float32)
    tgts[:, 0] = [0.5, 0.5, 0.25, 0.25, 1, 255.0]

    trainer.step(good, tgts)
    params_before = jax.device_get(trainer.state.params)

    bad = good.copy()
    bad[0, 0, 0, 0] = np.inf
    m = trainer.step(bad, tgts)
    assert int(m["skipped_nonfinite"]) >= 1

    params_after = jax.device_get(trainer.state.params)
    for a, b in zip(jax.tree.leaves(params_before), jax.tree.leaves(params_after)):
        np.testing.assert_array_equal(a, b)  # update skipped, params intact
        assert np.isfinite(b).all()

    m = trainer.step(good, tgts)  # training continues normally
    assert np.isfinite(float(m["total"]))


@pytest.mark.parametrize("log_every", [1, 1000])
def test_fit_aborts_on_persistent_nonfinite_streak(tmp_path, log_every):
    """Failure detection: a PERSISTENT non-finite streak aborts fit() with a
    clean RuntimeError and params untouched — instead of apply_if_finite
    silently 'giving up and accepting' the NaN update (optax behaviour that
    destroyed a fine-tune before the guard).  log_every=1000 (more steps than
    the run) locks that the abort check is independent of the logging cadence
    — a fully-poisoned run must never 'succeed' quietly."""
    import dataclasses

    import jax

    from tests.test_train import tiny_config
    from yolofastest_tpu.train import Trainer

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, abort_nonfinite_streak=3,
                                       log_every=log_every)
    )
    trainer = Trainer(cfg, batch_per_epoch=4, seed=0)
    params_before = jax.device_get(trainer.state.params)

    rng = np.random.default_rng(0)
    bad = rng.standard_normal((8, 64, 96, 1)).astype(np.float32)
    bad[:, 0, 0, 0] = np.inf  # every batch poisoned -> persistent streak
    tgts = np.zeros((8, cfg.train.max_boxes, 6), np.float32)
    tgts[:, 0] = [0.5, 0.5, 0.25, 0.25, 1, 255.0]

    loader = [(bad, tgts)] * 8
    with pytest.raises(RuntimeError, match="consecutive steps with non-finite"):
        trainer.fit(loader, total_epochs=1, log_every=log_every)

    params_after = jax.device_get(trainer.state.params)
    for a, b in zip(jax.tree.leaves(params_before),
                    jax.tree.leaves(params_after)):
        np.testing.assert_array_equal(a, b)
        assert np.isfinite(b).all()


def test_jax_bare_initialize_error_message_locked():
    """``parallel.distributed.init_distributed`` degrades a BARE
    ``jax.distributed.initialize()`` failure to a single-process no-op by
    matching 'coordinator_address' in jax's ValueError text
    (distributed.py).  Lock that message here: if a jax upgrade rewords
    it, this test fails loudly instead of every bare single-process call
    suddenly hard-failing in production."""
    # Guard: under a real cluster environment auto-detection would succeed
    # and initialize() would try to join it — skip there.
    cluster_vars = ("SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
                    "KUBERNETES_SERVICE_HOST", "JAX_COORDINATOR_ADDRESS",
                    "CLOUD_TPU_TASK_ID")
    if any(v in os.environ for v in cluster_vars):
        pytest.skip("cluster environment detected")
    # fresh process: initialize() must run before any backend init (the
    # suite's earlier tests have already initialized this process's backend)
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-c",
         "import jax\n"
         "try:\n"
         "    jax.distributed.initialize()\n"
         "except ValueError as e:\n"
         "    assert 'coordinator_address' in str(e), str(e)\n"
         "    print('MESSAGE_LOCKED')\n"],
        capture_output=True, text=True, timeout=300,
        env={k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
    )
    assert r.returncode == 0, r.stderr
    assert "MESSAGE_LOCKED" in r.stdout, r.stdout + r.stderr

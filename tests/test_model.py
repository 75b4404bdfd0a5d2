"""Shape/structure tests for the YOLO-Fastest models.

Mirrors the reference's module smoke test (``yolo_fastest.py:396-414``) but as
real assertions.
"""

import jax
import jax.numpy as jnp
import pytest

from yolofastest_tpu.models import YoloFastest, YoloFastestLite
from yolofastest_tpu.models.yolo_fastest import count_params


@pytest.mark.parametrize("hw", [(256, 320), (512, 640)])
@pytest.mark.gate
def test_yolofastest_shapes(hw):
    h, w = hw
    model = YoloFastest(num_cls=3, num_anchors=3)
    x = jnp.zeros((2, h, w, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    head_large, head_small = model.apply(variables, x, train=False)
    assert head_large.shape == (2, h // 16, w // 16, 24)
    assert head_small.shape == (2, h // 32, w // 32, 24)


@pytest.mark.gate
def test_param_count_matches_reference_checkpoint():
    # The converted reference checkpoint has exactly this many parameters;
    # any architecture drift changes the count.
    model = YoloFastest(num_cls=3, num_anchors=3)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 320, 1)))
    assert count_params(variables["params"]) == 332624


def test_lite_single_head():
    model = YoloFastestLite(num_cls=3, num_anchors=3)
    x = jnp.zeros((1, 512, 640, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, train=False)
    # Reference lite head width carries a num_cls multiplication bug
    # (yolo_fastest.py:240); ours is the intended A*(5+C).
    assert out.shape == (1, 512 // 32, 640 // 32, 24)


def test_train_mode_updates_batch_stats():
    model = YoloFastest(num_cls=3, num_anchors=3)
    x = jnp.ones((2, 64, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["conv0"]["bn"]["mean"]
    after = mutated["batch_stats"]["conv0"]["bn"]["mean"]
    assert not jnp.allclose(before, after)


def test_lite_end_to_end_train_and_detect(tmp_path):
    """The lite single-head variant drives the SAME trainer/evaluator/
    detector stack (one anchor group, stride 32) — reference YoloFastest_lite
    was dead code; here it is a first-class arch."""
    import dataclasses

    import numpy as np

    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.inference import Detector
    from yolofastest_tpu.train import Trainer

    cfg = get_config("lite-256x320")
    assert cfg.io.strides == (32,) and len(cfg.io.anchors) == 1
    io = dataclasses.replace(cfg.io, input_shape=(64, 96, 1),
                             anchors=(((60.0, 40.0), (50.0, 50.0), (40.0, 60.0)),),
                             conf_thre=0.05)
    cfg = dataclasses.replace(cfg, io=io)

    trainer = Trainer(cfg, batch_per_epoch=4, seed=0, arch="lite")
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((8, 64, 96, 1)).astype(np.float32) * 0.2
    tgts = np.zeros((8, cfg.train.max_boxes, 6), np.float32)
    tgts[:, 0] = [0.5, 0.5, 0.5, 0.5, 1, 255.0]
    losses = [float(trainer.step(imgs, tgts)["total"]) for _ in range(6)]
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    det = Detector(cfg, variables=trainer.variables, arch="lite")
    out = det.run(imgs)
    n_cand = 3 * (64 // 32) * (96 // 32)  # single stride-32 head
    assert np.asarray(out["boxes"]).shape == (8, min(n_cand, cfg.io.max_det), 4)
    assert np.isfinite(np.asarray(out["conf"])).all()

    # lite x int8 is first-class (round 3): same stack, quantised executor
    det8 = Detector(cfg, variables=trainer.variables, arch="lite",
                    backend="int8", calibration=imgs)
    out8 = det8.run(imgs)
    assert np.asarray(out8["boxes"]).shape == np.asarray(out["boxes"]).shape
    assert np.isfinite(np.asarray(out8["conf"])).all()

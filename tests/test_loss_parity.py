"""Loss parity vs the reference ``YOLOLossV3`` on a recorded synthetic batch.

Golden fixture (``tests/fixtures/golden_loss.npz``, made by
``tools/make_fixtures.py``) stores the reference's 7 loss numbers per scale
(total, x, y, w, h, conf, cls) and its inference-mode decode output on the
same heads, both computed with the 256x320 anchor groups.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.losses import decode_for_eval, total_loss, yolo_loss

pytestmark = pytest.mark.gate

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def golden():
    return np.load(os.path.join(FIXTURES, "golden_loss.npz"))


def _nhwc(head_nchw):
    # reference heads are NCHW with channel = a*(5+C)+attr; NHWC keeps that
    # channel order in the last axis.
    return np.transpose(head_nchw, (0, 2, 3, 1))


@pytest.mark.parametrize("scale", [0, 1])
def test_loss_matches_reference(golden, scale):
    cfg = get_config("256x320")
    head = _nhwc(golden[f"head{scale}"])
    targets = golden["targets"]
    ref = golden[f"scale{scale}"]  # [total, x, y, w, h, conf, cls]

    tot, comps = yolo_loss(
        jnp.asarray(head),
        jnp.asarray(targets),
        cfg.io.anchors[scale],
        cfg.io.input_hw,
        ignore_thre=cfg.train.iou_loss_thre,
        num_cls=cfg.io.num_cls,
    )
    got = np.array(
        [tot, comps["x"], comps["y"], comps["w"], comps["h"], comps["conf"], comps["cls"]]
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_total_loss_sums_scales(golden):
    cfg = get_config("256x320")
    heads = [jnp.asarray(_nhwc(golden["head0"])), jnp.asarray(_nhwc(golden["head1"]))]
    tot, comps = total_loss(
        heads, jnp.asarray(golden["targets"]), cfg.io.anchors, cfg.io.input_hw,
        ignore_thre=cfg.train.iou_loss_thre, num_cls=cfg.io.num_cls,
    )
    ref = golden["scale0"][0] + golden["scale1"][0]
    np.testing.assert_allclose(float(tot), ref, rtol=2e-5)
    assert set(comps) == {"x", "y", "w", "h", "conf", "cls", "total"}


@pytest.mark.parametrize("scale", [0, 1])
def test_decode_for_eval_matches_reference(golden, scale):
    cfg = get_config("256x320")
    head = _nhwc(golden[f"head{scale}"])
    got = np.asarray(
        decode_for_eval(jnp.asarray(head), cfg.io.anchors[scale], cfg.io.input_hw)
    )
    ref = golden[f"decode{scale}"]  # (B, A*H*W, 5+C)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_tcls_sticky_on_cell_collision():
    """Reference semantics: ``tcls[b,best_n,gj,gi,cls] = 1`` is never reset
    (yolo_loss.py:189), so two colliding GTs of different classes BOTH set
    their class bit, while tx/ty/tw/th keep the LAST box's values."""
    from yolofastest_tpu.losses.yolo_loss import build_targets

    anchors = jnp.asarray([[1.0, 1.0], [3.0, 3.0], [9.0, 9.0]], jnp.float32)
    h = w = 8
    # Two boxes centred in the same cell (3, 2), same size -> same best
    # anchor, different classes (0 then 2).
    targets = np.zeros((1, 4, 6), np.float32)
    targets[0, 0] = [2.5 / w, 3.5 / h, 3.0 / w, 3.0 / h, 0, 255.0]
    targets[0, 1] = [2.6 / w, 3.6 / h, 3.0 / w, 3.0 / h, 2, 255.0]
    tgt = build_targets(jnp.asarray(targets), anchors, (h, w),
                        ignore_thre=0.5, num_cls=3)

    a = 1  # best anchor for a 3x3 box
    assert float(tgt["mask"][0, a, 3, 2]) == 1.0
    np.testing.assert_array_equal(
        np.asarray(tgt["tcls"][0, a, 3, 2]), [1.0, 0.0, 1.0]
    )  # sticky OR: both class bits
    # spatial targets are last-wins (box 1)
    np.testing.assert_allclose(float(tgt["tx"][0, a, 3, 2]), 2.6 / w * w - 2,
                               rtol=1e-5)
    np.testing.assert_allclose(float(tgt["ty"][0, a, 3, 2]), 3.6 / h * h - 3,
                               rtol=1e-5)


def test_loss_grads_finite_at_sigmoid_saturation(golden):
    """A converged checkpoint drives conf logits past float32 sigmoid
    saturation (sigmoid(z) == exactly 0.0 or 1.0).  The probability-space
    BCE has a 0*inf=NaN gradient there; the logit-space formulation must
    stay finite (this NaN'd fine-tuning from the reference checkpoint)."""
    import jax

    cfg = get_config("256x320")
    head = np.array(_nhwc(golden["head0"]), np.float32)
    head[..., :] = 40.0  # sigmoid(40) == 1.0 exactly in float32
    head[..., 4::8] = -40.0  # conf channels: sigmoid == 0.0 exactly
    targets = jnp.asarray(golden["targets"])

    def f(h):
        return yolo_loss(
            h, targets, cfg.io.anchors[0], cfg.io.input_hw,
            cfg.train.iou_loss_thre, cfg.io.num_cls,
        )[0]

    loss, g = jax.value_and_grad(f)(jnp.asarray(head))
    assert bool(jnp.isfinite(loss))
    assert bool(jnp.all(jnp.isfinite(g))), "NaN grads at sigmoid saturation"


def test_loss_is_differentiable(golden):
    import jax

    cfg = get_config("256x320")
    head = jnp.asarray(_nhwc(golden["head0"]))
    targets = jnp.asarray(golden["targets"])

    def f(h):
        return yolo_loss(
            h, targets, cfg.io.anchors[0], cfg.io.input_hw,
            cfg.train.iou_loss_thre, cfg.io.num_cls,
        )[0]

    g = jax.grad(f)(head)
    assert g.shape == head.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0

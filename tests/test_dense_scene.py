"""Dense-scene behavior of the fixed decode/NMS caps.

The jittable pipeline is fixed-shape: decode keeps ``max_decode`` (128)
candidates per image and NMS emits ``max_det`` (64) rows
(``configs/config.py``).  A scene with more confident candidates than
either cap must degrade deterministically by dropping the LOWEST-conf
candidates — never arbitrary ones.  These tests construct synthetic heads
with hundreds of above-threshold candidates and pin that truncation order
(documented in docs/API.md "Detection caps").
"""

import numpy as np

import jax.numpy as jnp

from yolofastest_tpu.ops import batched_nms, decode_heads

# one-scale toy geometry: (B, H, W, A*(5+C)) with A=3, C=3 -> 3*H*W candidates
H, W, A, C = 16, 20, 3, 3
INPUT_HW = (H * 32, W * 32)
ANCHORS = (((33.0, 23.0), (150.0, 75.0), (100.0, 100.0)),)


def _mk_head(conf_logits, rng):
    """Head tensor whose per-candidate objectness logits are given; box
    geometry spread so every candidate decodes to a distinct location."""
    head = rng.normal(0, 0.1, (1, H, W, A * (5 + C))).astype(np.float32)
    head = head.reshape(1, H, W, A, 5 + C)
    head[..., 4] = conf_logits.reshape(1, H, W, A)
    head[..., 2:4] = -2.0  # small boxes (exp(-2) * anchor) -> no overlap
    return jnp.asarray(head.reshape(1, H, W, A * (5 + C)))


def _decode(head, max_decode):
    return decode_heads((head,), ANCHORS, INPUT_HW, conf_thre=0.5,
                        max_decode=max_decode)


def test_decode_cap_keeps_highest_conf():
    """>max_decode above-threshold candidates: exactly the top-K by conf
    survive, in descending order."""
    rng = np.random.default_rng(0)
    n = H * W * A  # 960 candidates
    logits = rng.uniform(1.0, 6.0, n).astype(np.float32)  # all conf > 0.73
    head = _mk_head(logits, rng)

    boxes, conf, cls_score, cls_idx, valid = _decode(head, max_decode=128)
    conf = np.asarray(conf)
    assert np.asarray(valid).all(), "all 128 slots must be valid"
    assert (np.diff(conf[0]) <= 0).all(), "conf not descending"

    want = np.sort(1.0 / (1.0 + np.exp(-logits)))[::-1][:128]
    np.testing.assert_allclose(np.sort(conf[0])[::-1], want, rtol=1e-5)


def test_decode_cap_not_hit_when_sparse():
    """Below the cap nothing is dropped: valid count == above-threshold count."""
    rng = np.random.default_rng(1)
    n = H * W * A
    logits = np.full(n, -4.0, np.float32)
    hot = rng.choice(n, 37, replace=False)
    logits[hot] = rng.uniform(2.0, 5.0, 37)
    head = _mk_head(logits, rng)

    _, conf, _, _, valid = _decode(head, max_decode=128)
    assert int(np.asarray(valid).sum()) == 37


def test_max_det_cap_keeps_highest_conf_survivors():
    """>max_det NMS survivors: the emitted rows are the highest-conf ones
    (boxes are disjoint, so NMS suppresses nothing and the cap is the only
    truncation)."""
    rng = np.random.default_rng(2)
    n = H * W * A
    logits = rng.uniform(1.0, 6.0, n).astype(np.float32)
    head = _mk_head(logits, rng)

    boxes, conf, cls_score, cls_idx, valid = _decode(head, max_decode=128)
    det = batched_nms(boxes, conf, cls_score, cls_idx, valid,
                      iou_thre=0.2, max_det=64)
    out_conf = np.asarray(det["conf"])[0]
    out_valid = np.asarray(det["valid"])[0]
    assert out_valid.all(), "all 64 rows should be valid survivors"
    assert int(np.asarray(det["count"])[0]) == 64, "count clips to max_det"
    # the 64 emitted are exactly the top-64 of the 128 decoded (disjoint
    # boxes -> nothing suppressed), still conf-descending
    np.testing.assert_allclose(out_conf, np.asarray(conf)[0][:64], rtol=1e-6)


def test_caps_configurable_per_pipeline():
    """The caps are config values, not constants: a larger max_decode
    recovers candidates the default would drop."""
    rng = np.random.default_rng(3)
    n = H * W * A
    logits = rng.uniform(1.0, 6.0, n).astype(np.float32)
    head = _mk_head(logits, rng)

    _, conf_small, _, _, _ = _decode(head, max_decode=128)
    _, conf_big, _, _, valid_big = _decode(head, max_decode=512)
    assert int(np.asarray(valid_big).sum()) == 512
    # the default-cap result is a prefix of the larger-cap result
    np.testing.assert_allclose(np.asarray(conf_big)[0][:128],
                               np.asarray(conf_small)[0], rtol=1e-6)

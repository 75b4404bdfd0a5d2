"""Eval-grade pruned zoo checkpoint (docs/train_demo_prune040/README.md).

`weights/yolofastest_pruned040_256x320.npz` is the prune-0.4 checkpoint
fine-tuned back to full golden recall; these tests lock its accuracy and
its structural claims so the 49k img/s bench point
(`throughput_pruned040_img_s`) corresponds to a shippable model.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.models import fold_batchnorm, load_variables
from yolofastest_tpu.models.graph import folded_apply
from yolofastest_tpu.ops import batched_nms, decode_heads

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRUNED = os.path.join(REPO, "weights", "yolofastest_pruned040_256x320.npz")


def _iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def test_pruned_zoo_is_smaller():
    """The artifact really is the pruned topology (<80% of stock params)."""
    if not os.path.exists(PRUNED):
        pytest.skip("pruned zoo weights not present")
    from yolofastest_tpu.models import zoo_path

    n = sum(int(np.asarray(x).size) for x in
            jax.tree_util.tree_leaves(load_variables(PRUNED)))
    n0 = sum(int(np.asarray(x).size) for x in
             jax.tree_util.tree_leaves(load_variables(zoo_path("256x320"))))
    assert n < 0.85 * n0, (n, n0)


@pytest.mark.slow
def test_pruned_zoo_golden_recall():
    """Full golden recall (34/34) through the deployment pipeline — the
    pruned artifact is eval-grade, not a demo."""
    if not os.path.exists(PRUNED):
        pytest.skip("pruned zoo weights not present")
    cfg = get_config("256x320")
    io = cfg.io
    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
    golden = fx["boxes"]
    folded = jax.tree.map(jnp.asarray, fold_batchnorm(load_variables(PRUNED)))

    @jax.jit
    def fn(x):
        heads = folded_apply(folded, x, jnp.float32)
        b, c, s, ci, v = decode_heads(heads, io.anchors, io.input_hw,
                                      io.conf_thre, io.max_decode)
        return batched_nms(b, c, s, ci, v, iou_thre=io.nms_thre,
                           max_det=io.max_det)

    det = jax.tree.map(np.asarray, fn(jnp.asarray(imgs)))
    matched = 0
    for row in golden:
        b = int(row[0])
        matched += any(
            int(det["cls_idx"][b, i]) == int(row[7])
            and _iou(det["boxes"][b, i], row[1:5]) > 0.5
            for i in range(int(det["count"][b]))
        )
    assert matched == len(golden), f"{matched}/{len(golden)}"

"""Logit-level parity vs the reference PyTorch checkpoints.

Golden logits were produced by the reference model itself
(``tools/make_fixtures.py`` running ``/root/reference`` code); here we only
compare against the committed fixtures — no torch, no reference checkout
needed at test time *except* for the checkpoint files used for weight
conversion.  If the reference mount is missing, these tests skip.
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.gate

REF_PTH = {
    "256x320": "/root/reference/models/pytorch/256x320/YOLO-Fastest_epoch_28.pth",
    "512x640": "/root/reference/models/pytorch/512x640/YOLO-Fastest_epoch_27.pth",
}
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _load_variables(res):
    from yolofastest_tpu.models.torch_io import load_torch_checkpoint

    return load_torch_checkpoint(REF_PTH[res])


@pytest.mark.parametrize("res", ["256x320", "512x640"])
def test_logit_parity(res):
    if not os.path.exists(REF_PTH[res]):
        pytest.skip("reference checkpoint not mounted")
    from yolofastest_tpu.models import YoloFastest

    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
    variables = _load_variables(res)
    model = YoloFastest(num_cls=3, num_anchors=3)
    imgs = fx["pre_imgs"][:4].astype(np.float32)[..., None]
    x = (imgs - 128.0) / 255.0
    head_large, head_small = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    )(variables, x)
    ref_large = fx["logits_large"].transpose(0, 2, 3, 1)
    ref_small = fx["logits_small"].transpose(0, 2, 3, 1)
    assert np.abs(np.asarray(head_large) - ref_large).max() < 1e-3
    assert np.abs(np.asarray(head_small) - ref_small).max() < 1e-3

"""mAP-number parity vs the reference ``Validation.get_mAP``.

``tests/fixtures/golden_map.npz`` (made by ``tools/make_fixtures.py
make_map_fixture``) stores the mAP/per-class-AP/target counts the reference
evaluator (``/root/reference/src/model_training/validate.py:27-122``)
produced on the 20 bundled test images with fabricated, perturbed GT and the
shipped 256x320 checkpoint.  Our MAPEvaluator must reproduce those numbers
on identical inputs.

Known divergence (documented in ``eval/map_eval.py``): the reference matches
a prediction to the FIRST GT above the IOU threshold in array order
(``validate.py:67-72``), ours to the BEST-IOU unmatched GT.  On this fixture
the two policies coincide (ships rarely overlap), so the assertion is tight;
the tolerance below is the observed-worst-case bound for the policy split.
"""

import os

import numpy as np
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REF_PTH = "/root/reference/models/pytorch/256x320/YOLO-Fastest_epoch_28.pth"


@pytest.fixture(scope="module")
def fixture_data():
    g = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    m = np.load(os.path.join(FIXTURES, "golden_map.npz"))
    return g, m


def test_map_matches_reference_validation(fixture_data):
    if not os.path.exists(REF_PTH):
        pytest.skip("reference checkpoint not mounted")
    import jax

    import jax.numpy as jnp

    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.eval import MAPEvaluator
    from yolofastest_tpu.models.torch_io import load_torch_checkpoint

    g, m = fixture_data
    cfg = get_config("256x320")
    imgs = ((g["pre_imgs"].astype(np.float32)[..., None]) - 128.0) / 255.0
    loader = [(imgs, m["targets"])]

    evaluator = MAPEvaluator(cfg, loader)
    variables = jax.tree.map(jnp.asarray, load_torch_checkpoint(REF_PTH))
    mAP = evaluator(variables, epoch=0)

    # Identical target accounting, class by class.
    np.testing.assert_array_equal(
        np.asarray(evaluator.last_metrics["target_num"], np.int64),
        m["ref_target_num"],
    )
    # mAP within 0.005 absolute of the reference number (BASELINE asks for
    # 0.5 mAP points; we hold two orders tighter on identical inputs).
    assert abs(mAP - float(m["ref_map"])) < 0.005, (
        f"ours {mAP:.6f} vs reference {float(m['ref_map']):.6f}"
    )
    np.testing.assert_allclose(
        evaluator.last_metrics["per_class_ap"], m["ref_aps"], atol=0.005
    )


def test_detection_rate_reported(fixture_data):
    if not os.path.exists(REF_PTH):
        pytest.skip("reference checkpoint not mounted")
    import jax

    import jax.numpy as jnp

    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.eval import MAPEvaluator
    from yolofastest_tpu.models.torch_io import load_torch_checkpoint

    g, m = fixture_data
    cfg = get_config("256x320")
    imgs = ((g["pre_imgs"].astype(np.float32)[..., None]) - 128.0) / 255.0
    evaluator = MAPEvaluator(cfg, [(imgs, m["targets"])])
    variables = jax.tree.map(jnp.asarray, load_torch_checkpoint(REF_PTH))
    evaluator(variables, epoch=0)

    dr = evaluator.last_metrics["detection_rate"]
    # The fabricated GT keeps ~4/5 of the model's own detections (jittered)
    # and adds phantoms: most kept GT must be re-detected, phantoms not.
    assert 0.5 < dr < 1.0

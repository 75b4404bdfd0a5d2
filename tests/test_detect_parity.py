"""End-to-end detection parity vs the reference postprocessor.

The golden fixtures contain the *final* detections the reference pipeline
(``detect.py``: torch forward -> numpy decode -> per-class NMS) produced on
the bundled 20-image infrared ship test set.  Our fully on-device pipeline
must reproduce them: same boxes (±1px from float32 vs float64 rounding),
same classes, same scores.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REF_PTH = {
    "256x320": "/root/reference/models/pytorch/256x320/YOLO-Fastest_epoch_28.pth",
    "512x640": "/root/reference/models/pytorch/512x640/YOLO-Fastest_epoch_27.pth",
}


def _detector(res, fold_bn=False):
    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.inference import Detector

    return Detector(get_config(res), torch_checkpoint=REF_PTH[res],
                    fold_bn=fold_bn)


def test_run_raw_matches_host_preprocess():
    """run_raw (BGR->gray->2x resize->normalize fused on device) must produce
    the same detections as host cv2 preprocessing + run."""
    if not os.path.exists(REF_PTH["256x320"]):
        pytest.skip("reference checkpoint not mounted")
    import cv2
    import numpy as _np

    det = _detector("256x320")
    fx = _np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    rng = _np.random.default_rng(0)
    # synthesize 512x640 BGR frames whose gray content is the fixture images
    frames = _np.empty((4, 512, 640, 3), _np.uint8)
    for i in range(4):
        up = cv2.resize(fx["pre_imgs"][i], (640, 512), interpolation=cv2.INTER_NEAREST)
        frames[i] = cv2.cvtColor(up, cv2.COLOR_GRAY2BGR)
        frames[i, :, :, 0] = _np.clip(frames[i, :, :, 0].astype(int) +
                                      rng.integers(-3, 4, (512, 640)), 0, 255)

    out_dev = det.run_raw(jnp.asarray(frames))

    gray = _np.stack([
        cv2.resize(cv2.cvtColor(f, cv2.COLOR_BGR2GRAY), (320, 256))
        for f in frames
    ])
    imgs = (gray.astype(_np.float32)[..., None] - 128.0) / 255.0
    out_host = det.run(jnp.asarray(imgs))

    _np.testing.assert_array_equal(_np.asarray(out_dev["count"]),
                                   _np.asarray(out_host["count"]))
    for b in range(4):
        n = int(_np.asarray(out_host["count"])[b])
        _np.testing.assert_allclose(_np.asarray(out_dev["boxes"])[b, :n],
                                    _np.asarray(out_host["boxes"])[b, :n],
                                    atol=1.0)


def test_detect_parity_folded_graph():
    """The fold_bn deployment mode must reproduce the same golden boxes."""
    if not os.path.exists(REF_PTH["256x320"]):
        pytest.skip("reference checkpoint not mounted")
    import numpy as _np

    from yolofastest_tpu.inference import detections_to_lists

    fx = _np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    det = _detector("256x320", fold_bn=True)
    imgs = fx["pre_imgs"].astype(_np.float32)[..., None]
    out = det.run(jnp.asarray((imgs - 128.0) / 255.0))
    rows = detections_to_lists(out)
    golden = fx["boxes"]
    found = 0
    for g in golden:
        b = int(g[0])
        found += any(
            int(r[6]) == int(g[7]) and max(abs(_np.array(r[:4]) - g[1:5])) <= 1.0
            for r in rows[b]
        )
    assert found == len(golden)


@pytest.mark.parametrize("res", ["256x320", "512x640"])
def test_detect_parity(res):
    if not os.path.exists(REF_PTH[res]):
        pytest.skip("reference checkpoint not mounted")
    from yolofastest_tpu.inference import detections_to_lists

    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
    det = _detector(res)

    imgs = fx["pre_imgs"].astype(np.float32)[..., None]
    x = (imgs - 128.0) / 255.0
    out = det.run(jnp.asarray(x))
    ours = detections_to_lists(out)

    ref_boxes = fx["boxes"]  # rows: [img_idx, x1, y1, x2, y2, conf, cls_score, cls_idx]
    n_imgs = imgs.shape[0]
    total_matched = 0
    for b in range(n_imgs):
        ref = ref_boxes[ref_boxes[:, 0] == b][:, 1:]
        mine = ours[b]
        assert len(mine) == len(ref), (
            f"{res} img {b}: ours {len(mine)} boxes vs reference {len(ref)}"
        )
        used = set()
        for r in ref:
            found = False
            for i, m in enumerate(mine):
                if i in used:
                    continue
                if (
                    int(m[6]) == int(r[6])
                    and max(abs(m[j] - r[j]) for j in range(4)) <= 1.0
                    and abs(m[4] - r[4]) < 1e-3
                    and abs(m[5] - r[5]) < 1e-3
                ):
                    used.add(i)
                    found = True
                    total_matched += 1
                    break
            assert found, f"{res} img {b}: reference box {r} unmatched in {mine}"
    assert total_matched == len(ref_boxes)


@pytest.mark.parametrize("res", ["256x320"])
def test_detect_counts_stable_bf16(res):
    """bfloat16 compute must find the same number of detections (the speed
    path used for benchmarking)."""
    if not os.path.exists(REF_PTH[res]):
        pytest.skip("reference checkpoint not mounted")
    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.inference import Detector, detections_to_lists

    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
    det = Detector(get_config(res), torch_checkpoint=REF_PTH[res],
                   compute_dtype=jnp.bfloat16)
    imgs = fx["pre_imgs"].astype(np.float32)[..., None]
    out = det.run(jnp.asarray((imgs - 128.0) / 255.0))
    ours = detections_to_lists(out)
    ref_counts = [int((fx["boxes"][:, 0] == b).sum()) for b in range(imgs.shape[0])]
    # bf16 logits can flip borderline conf-gate decisions on a small number of
    # boxes; require >= 90% of images to agree exactly and total within 10%.
    agree = sum(1 for b in range(imgs.shape[0]) if len(ours[b]) == ref_counts[b])
    assert agree >= int(0.9 * imgs.shape[0])

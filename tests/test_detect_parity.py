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

import jax
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


@pytest.mark.parametrize("src_hw", [(384, 480), (300, 400)])
def test_run_raw_non2x_matches_host_preprocess(src_hw):
    """run_raw with NON-2x source frames (general cv2-exact resize on device)
    must produce the same detections as host cv2 preprocessing + run."""
    if not os.path.exists(REF_PTH["256x320"]):
        pytest.skip("reference checkpoint not mounted")
    import cv2
    import numpy as _np

    det = _detector("256x320")
    fx = _np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    frames = _np.empty((4, *src_hw, 3), _np.uint8)
    for i in range(4):
        up = cv2.resize(fx["pre_imgs"][i], (src_hw[1], src_hw[0]),
                        interpolation=cv2.INTER_NEAREST)
        frames[i] = cv2.cvtColor(up, cv2.COLOR_GRAY2BGR)

    out_dev = jax.tree.map(_np.asarray, det.run_raw(jnp.asarray(frames)))

    gray = _np.stack([
        cv2.resize(cv2.cvtColor(f, cv2.COLOR_BGR2GRAY), (320, 256),
                   interpolation=cv2.INTER_LINEAR)
        for f in frames
    ])
    imgs = (gray.astype(_np.float32)[..., None] - 128.0) / 255.0
    out_host = jax.tree.map(_np.asarray, det.run(jnp.asarray(imgs)))

    _np.testing.assert_array_equal(out_dev["count"], out_host["count"])
    for b in range(4):
        n = int(out_host["count"][b])
        _np.testing.assert_allclose(out_dev["boxes"][b, :n],
                                    out_host["boxes"][b, :n], atol=1.0)
        _np.testing.assert_array_equal(out_dev["cls_idx"][b, :n],
                                       out_host["cls_idx"][b, :n])


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
@pytest.mark.gate
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


def test_int8_backend_first_class(tmp_path):
    """Detector(backend='int8') is the NPU-mirror deployment mode: must hit
    >=90% golden recall and cache its calibration scales to JSON."""
    if not os.path.exists(REF_PTH["256x320"]):
        pytest.skip("reference checkpoint not mounted")
    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.inference import Detector, detections_to_lists
    from yolofastest_tpu.models.torch_io import load_torch_checkpoint

    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs = fx["pre_imgs"].astype(np.float32)[..., None]
    x = (imgs - 128.0) / 255.0
    cache = str(tmp_path / "scales.json")
    variables = load_torch_checkpoint(REF_PTH["256x320"])

    det = Detector(get_config("256x320"), variables=variables,
                   backend="int8", calibration=x[:8],
                   calibration_cache=cache)
    assert os.path.exists(cache)
    out = det.run(jnp.asarray(x))
    rows = detections_to_lists(out)
    golden = fx["boxes"]
    found = sum(
        any(int(r[6]) == int(g[7]) and
            max(abs(np.array(r[:4]) - g[1:5])) <= 3.0
            for r in rows[int(g[0])])
        for g in golden
    )
    assert found >= 0.9 * len(golden)

    # second construction loads scales from the cache, no calibration needed
    det2 = Detector(get_config("256x320"), variables=variables,
                    backend="int8", calibration_cache=cache)
    out2 = det2.run(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(out["count"]),
                                  np.asarray(out2["count"]))

    with pytest.raises(ValueError, match="calibration"):
        Detector(get_config("256x320"), variables=variables, backend="int8")


def test_batch_detect_batched_mode_matches_single(tmp_path):
    """batch_size>1 amortised mode must write identical detections to the
    per-image mode (same compiled pipeline, chunked input)."""
    if not os.path.exists(REF_PTH["256x320"]):
        pytest.skip("reference checkpoint not mounted")
    import cv2
    import logging

    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    data = tmp_path / "data"
    data.mkdir()
    for i in range(5):  # 5 images, batch 2 -> padded tail chunk
        up = cv2.resize(fx["pre_imgs"][i], (640, 512),
                        interpolation=cv2.INTER_NEAREST)
        cv2.imwrite(str(data / f"im{i}.jpg"),
                    cv2.cvtColor(up, cv2.COLOR_GRAY2BGR))

    det = _detector("256x320")
    logs = {}
    for name, bs in (("one", 1), ("chunk", 2)):
        lg = logging.getLogger(f"bd_{name}")
        lg.addHandler(logging.NullHandler())
        lg.propagate = False
        det.logger = lg
        out = tmp_path / name
        det.batch_detect(str(data), str(out), batch_size=bs)
        logs[name] = sorted(os.listdir(out))
    assert logs["one"] == logs["chunk"]
    for f in logs["one"]:
        a = cv2.imread(str(tmp_path / "one" / f))
        b = cv2.imread(str(tmp_path / "chunk" / f))
        np.testing.assert_array_equal(a, b)


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

"""Video detection: file -> annotated video through the deployment engines.

The reference targets a camera board but only ever detects still images;
``detect_video`` (inference/video.py) streams a video file through the same
engines everything else uses, keeping ``depth`` batches in flight on the
jax path.
"""

import os
import subprocess

import numpy as np
import pytest

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.inference import detect_video
from yolofastest_tpu.inference.video import iter_frame_batches
from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "cpp", "build", "libyf.so")
REF_DATA = "/root/reference/test_data"

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def ship_video(tmp_path_factory):
    """10-frame MJPG video from 5 bundled reference images (looped)."""
    if not os.path.isdir(REF_DATA):
        pytest.skip("reference test images not present")
    names = sorted(f for f in os.listdir(REF_DATA)
                   if f.lower().endswith(".jpg"))[:5]
    frames = [cv2.imread(os.path.join(REF_DATA, n)) for n in names]
    path = str(tmp_path_factory.mktemp("video") / "ships.avi")
    h, w = frames[0].shape[:2]
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 5.0, (w, h))
    assert wr.isOpened()
    for i in range(10):
        wr.write(frames[i % len(frames)])
    wr.release()
    return path


def _frame_count(path):
    cap = cv2.VideoCapture(path)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    return n


def test_iter_frame_batches_pads_tail(ship_video):
    cfg = get_config("256x320")
    cap = cv2.VideoCapture(ship_video)
    batches = list(iter_frame_batches(cap, cfg.io, batch_size=4))
    cap.release()
    assert [n for _, _, n in batches] == [4, 4, 2]
    nets, originals, n_valid = batches[-1]
    assert nets.shape == (4, *cfg.io.input_hw, 1)  # padded to fixed shape
    assert len(originals) == 2 and not nets[n_valid:].any()
    assert nets.dtype == np.float32


def test_video_jax_backend(ship_video, tmp_path):
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    from yolofastest_tpu.inference import Detector

    cfg = get_config("256x320")
    det = Detector(cfg, variables=load_variables(zoo_path("256x320")),
                   fold_bn=True)
    out = str(tmp_path / "result.avi")
    stats = detect_video(det, cfg, ship_video, out, batch_size=4, depth=2)
    assert stats["frames"] == 10
    # every frame shows ships from the golden set; MJPG recompression may
    # cost the odd box but not whole frames of them
    assert stats["detections"] >= 10, stats
    assert _frame_count(out) == 10
    assert stats["realtime_x"] > 0 and stats["src_fps"] == 5.0


def test_video_native_backend(ship_video, tmp_path):
    if not os.path.exists(LIB):
        built = subprocess.run([os.path.join(REPO, "cpp", "build.sh")],
                               capture_output=True)
        if built.returncode != 0 or not os.path.exists(LIB):
            pytest.skip("native library not built and build failed")
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    from yolofastest_tpu.export import save_native_weights
    from yolofastest_tpu.native import NativeEngine

    cfg = get_config("256x320")
    yfb = str(tmp_path / "model.yfb")
    save_native_weights(fold_batchnorm(load_variables(zoo_path("256x320"))),
                        yfb)
    engine = NativeEngine(yfb, cfg)
    out = str(tmp_path / "result_native.avi")
    stats = detect_video(engine, cfg, ship_video, out, batch_size=4)
    assert stats["frames"] == 10
    assert stats["detections"] >= 10, stats
    assert _frame_count(out) == 10


def test_video_rejects_unknown_engine(ship_video, tmp_path):
    cfg = get_config("256x320")
    with pytest.raises(TypeError):
        detect_video(object(), cfg, ship_video, str(tmp_path / "x.avi"))


def test_video_missing_file(tmp_path):
    cfg = get_config("256x320")
    with pytest.raises(FileNotFoundError):
        detect_video(object(), cfg, str(tmp_path / "nope.avi"),
                     str(tmp_path / "x.avi"))


def test_video_camera_index_unavailable(tmp_path):
    """A digit-string source is treated as a camera index; no camera in this
    container, so the clean FileNotFoundError path must fire (not a codec
    crash)."""
    cfg = get_config("256x320")
    with pytest.raises(FileNotFoundError, match="99"):
        detect_video(object(), cfg, "99", str(tmp_path / "x.avi"))

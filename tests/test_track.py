"""SORT-style IoU tracker: unit behavior + end-to-end over a moving video.

The reference never carries identity between frames (its camera-board
front-ends detect stills only); `inference/track.py` adds stable track IDs
on the host side of the video pipeline.
"""

import os

import numpy as np
import pytest

from yolofastest_tpu.inference.track import IoUTracker

REF_DATA = "/root/reference/test_data"


def box(x, y, w=20.0, h=10.0):
    return np.array([x, y, x + w, y + h], np.float32)


# ---------------------------------------------------------------- unit tests


def test_stable_ids_under_linear_motion():
    tr = IoUTracker(min_hits=1)
    ids_a, ids_b = set(), set()
    for f in range(10):
        out = tr.update(np.stack([box(10 + 3 * f, 20), box(100, 50 + 2 * f)]),
                        np.array([0, 1]))
        assert len(out) == 2
        by_cls = {tb.cls: tb for tb in out}
        ids_a.add(by_cls[0].tid)
        ids_b.add(by_cls[1].tid)
    assert len(ids_a) == 1 and len(ids_b) == 1  # one stable ID each
    assert tr.total_tracks == 2


def test_same_position_different_class_never_associates():
    tr = IoUTracker(min_hits=1)
    tr.update(box(10, 10).reshape(1, 4), np.array([0]))
    out = tr.update(box(10, 10).reshape(1, 4), np.array([2]))
    assert tr.total_tracks == 2  # identical box, new class -> new track
    assert out[0].cls == 2


def test_track_survives_occlusion_gap():
    tr = IoUTracker(min_hits=1, max_age=5)
    tid = None
    for f in range(3):  # establish motion: +5 px/frame
        out = tr.update(box(10 + 5 * f, 10).reshape(1, 4), np.array([0]))
        tid = out[0].tid
    for _ in range(3):  # occluded: no detections, track coasts on velocity
        assert tr.update(np.zeros((0, 4)), np.zeros(0, np.int32)) == []
    assert tr.active_tracks == 1
    # reappears where constant-velocity prediction says it should be
    out = tr.update(box(10 + 5 * 6, 10).reshape(1, 4), np.array([0]))
    assert [tb.tid for tb in out] == [tid]
    assert tr.total_tracks == 1


def test_track_drops_after_max_age():
    tr = IoUTracker(min_hits=1, max_age=2)
    tr.update(box(10, 10).reshape(1, 4), np.array([0]))
    for _ in range(2):
        tr.update(np.zeros((0, 4)), np.zeros(0, np.int32))
    assert tr.active_tracks == 0
    out = tr.update(box(10, 10).reshape(1, 4), np.array([0]))
    assert out[0].tid == 2  # same place, but the old identity is gone


def test_jump_beyond_gate_opens_new_track():
    tr = IoUTracker(min_hits=1, iou_thre=0.3)
    tr.update(box(10, 10).reshape(1, 4), np.array([0]))
    out = tr.update(box(500, 300).reshape(1, 4), np.array([0]))
    assert out[0].tid == 2
    assert tr.total_tracks == 2


def test_min_hits_suppresses_flicker_mid_stream():
    tr = IoUTracker(min_hits=2)
    # frames 1-2: inside the stream-start grace window, A is emitted
    for f in range(2):
        out = tr.update(box(10, 10).reshape(1, 4), np.array([0]))
        assert len(out) == 1
    # frame 3+: a brand-new object must be seen twice before emission
    out = tr.update(np.stack([box(10, 10), box(200, 200)]),
                    np.array([0, 0]))
    assert [tb.cls for tb in out] == [0] and len(out) == 1
    out = tr.update(np.stack([box(10, 10), box(200, 200)]),
                    np.array([0, 0]))
    assert len(out) == 2  # second sighting -> emitted

    # a one-frame false positive never surfaced
    tr2 = IoUTracker(min_hits=2)
    for f in range(3):
        tr2.update(box(10, 10).reshape(1, 4), np.array([0]))
    out = tr2.update(np.stack([box(10, 10), box(300, 300)]),
                     np.array([0, 0]))
    assert len(out) == 1
    out = tr2.update(box(10, 10).reshape(1, 4), np.array([0]))
    assert len(out) == 1


def test_greedy_prefers_higher_iou():
    tr = IoUTracker(min_hits=1)
    tr.update(np.stack([box(0, 0), box(30, 0)]), np.array([0, 0]))
    # both detections overlap both tracks; greedy must pick the diagonal
    out = tr.update(np.stack([box(2, 0), box(28, 0)]), np.array([0, 0]))
    assert len(out) == 2
    assert tr.total_tracks == 2


def test_input_validation():
    with pytest.raises(ValueError):
        IoUTracker(iou_thre=0.0)
    with pytest.raises(ValueError):
        IoUTracker(max_age=0)
    tr = IoUTracker()
    with pytest.raises(ValueError):
        tr.update(np.zeros((2, 4)), np.zeros(1, np.int32))


# ------------------------------------------------------- end-to-end on video


@pytest.mark.slow
def test_video_tracking_end_to_end(tmp_path):
    """A golden image translated 4 px/frame: every ship keeps ONE ID."""
    cv2 = pytest.importorskip("cv2")
    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.inference import Detector, IoUTracker, detect_video
    from yolofastest_tpu.models import load_variables, zoo_path

    if not os.path.isdir(REF_DATA):
        pytest.skip("reference test images not present")
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")

    name = sorted(f for f in os.listdir(REF_DATA)
                  if f.lower().endswith(".jpg"))[0]
    img = cv2.imread(os.path.join(REF_DATA, name))
    h, w = img.shape[:2]
    src = str(tmp_path / "pan.avi")
    wr = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"MJPG"), 5.0, (w, h))
    n_frames = 10
    for f in range(n_frames):
        wr.write(np.roll(img, 4 * f, axis=1))
    wr.release()

    cfg = get_config("256x320")
    det = Detector(cfg, variables=load_variables(zoo_path("256x320")),
                   fold_bn=True)
    # per-frame detection count on the static first frame, for the bound
    d0 = det.run_raw(img[None])
    n_per_frame = int(np.asarray(d0["count"])[0])
    assert n_per_frame >= 1

    tracker = IoUTracker()
    stats = detect_video(det, cfg, src, str(tmp_path / "out.avi"),
                         batch_size=4, depth=2, tracker=tracker)
    assert stats["frames"] == n_frames
    # identity persistence: far fewer distinct IDs than total detections,
    # and no more than the per-frame object count plus flicker slack
    assert 1 <= stats["tracks"] <= n_per_frame + 2, stats
    assert stats["detections"] >= (n_frames - 1) * max(1, n_per_frame - 1)

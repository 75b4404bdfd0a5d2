from yolofastest_tpu.inference.detector import Detector, detections_to_lists
from yolofastest_tpu.inference.server import (DetectionServer, DynamicBatcher,
                                              make_batch_fn)
from yolofastest_tpu.inference.sliced import sliced_detect, tile_grid
from yolofastest_tpu.inference.streaming import StreamingDetector
from yolofastest_tpu.inference.track import IoUTracker, TrackedBox
from yolofastest_tpu.inference.video import detect_video

__all__ = [
    "Detector",
    "StreamingDetector",
    "sliced_detect",
    "tile_grid",
    "detections_to_lists",
    "DynamicBatcher",
    "DetectionServer",
    "make_batch_fn",
    "detect_video",
    "IoUTracker",
    "TrackedBox",
]

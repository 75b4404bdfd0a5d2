from yolofastest_tpu.ops.boxes import (
    box_iou_matrix,
    iou_pairwise,
    xywh2xyxy,
    xyxy2xywh,
)
from yolofastest_tpu.ops.decode import decode_heads
from yolofastest_tpu.ops.nms import batched_nms, unpack_detections
from yolofastest_tpu.ops.preprocess import (
    bgr_to_gray,
    downsample2x,
    normalize,
    preprocess_device,
)

__all__ = [
    "batched_nms",
    "unpack_detections",
    "bgr_to_gray",
    "box_iou_matrix",
    "decode_heads",
    "downsample2x",
    "iou_pairwise",
    "normalize",
    "preprocess_device",
    "xywh2xyxy",
    "xyxy2xywh",
]

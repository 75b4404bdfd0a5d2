from yolofastest_tpu.losses.yolo_loss import (
    build_targets,
    decode_for_eval,
    yolo_loss,
    total_loss,
)

__all__ = ["build_targets", "decode_for_eval", "yolo_loss", "total_loss"]

from yolofastest_tpu.models.yolo_fastest import (
    BasicResBlock,
    ConvNormAct,
    Deconv2x,
    YoloFastest,
    YoloFastestLite,
)
from yolofastest_tpu.models.torch_io import load_torch_checkpoint

__all__ = [
    "BasicResBlock",
    "ConvNormAct",
    "Deconv2x",
    "YoloFastest",
    "YoloFastestLite",
    "load_torch_checkpoint",
]

from yolofastest_tpu.models.yolo_fastest import (
    BasicResBlock,
    ConvNormAct,
    Deconv2x,
    YoloFastest,
    YoloFastestLite,
    build_model,
)
from yolofastest_tpu.models.torch_io import load_torch_checkpoint
from yolofastest_tpu.models.graph import (
    fold_batchnorm,
    unfold_to_variables,
    folded_apply,
    folded_apply_lite,
    walk_topology,
    walk_topology_lite,
)
from yolofastest_tpu.models.zoo import load_variables, save_variables, zoo_path

__all__ = [
    "fold_batchnorm",
    "unfold_to_variables",
    "folded_apply",
    "load_variables",
    "save_variables",
    "walk_topology",
    "zoo_path",
    "BasicResBlock",
    "ConvNormAct",
    "Deconv2x",
    "YoloFastest",
    "YoloFastestLite",
    "build_model",
    "load_torch_checkpoint",
]

"""yolofastest_tpu — a TPU-native (JAX/XLA/Pallas/pjit) object-detection framework.

Re-implements, TPU-first, the full capability surface of the reference
``JunFenngZhi/YOLO-Fastest-and-Embedded-deployment`` stack:

* YOLO-Fastest / YOLO-Fastest-lite depthwise-separable detectors (``models/``)
* VOC-XML dataset + augmentation pipeline (``data/``)
* vectorised YOLOv3 loss + target assignment (``losses/``)
* pjit data-parallel training loop with warmup+cosine LR, orbax
  checkpointing and mAP validation (``train/``, ``eval/``)
* fully on-device inference: fused preprocess -> backbone -> decode -> NMS
  (``inference/``, ``ops/``, ``kernels/``)
* int8 post-training quantisation mirroring the reference NPU path (``quant/``)
* StableHLO export + native C++ postprocess runtime (``export/``, ``cpp/``)

The compute path is pure JAX (jit/pjit/Pallas); nothing here is a port of the
reference's CUDA/C++/torch code.
"""

__version__ = "0.1.0"

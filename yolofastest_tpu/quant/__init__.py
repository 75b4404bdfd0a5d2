from yolofastest_tpu.quant.ptq import (
    Int8Executor,
    calibrate,
    quantize_weights,
    quantized_apply,
    quantized_apply_fused,
)

__all__ = [
    "Int8Executor",
    "calibrate",
    "quantize_weights",
    "quantized_apply",
    "quantized_apply_fused",
]

from yolofastest_tpu.quant.ptq import (
    Int8Executor,
    calibrate,
    quantize_weights,
    quantized_apply,
)

__all__ = ["Int8Executor", "calibrate", "quantize_weights", "quantized_apply"]

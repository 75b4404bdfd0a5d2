from yolofastest_tpu.quant.ptq import (
    Int8Executor,
    calibrate,
    quantize_weights,
    quantized_apply,
    quantized_apply_fused,
)
from yolofastest_tpu.quant.sensitivity import (
    layer_sensitivity,
    quantized_apply_mixed,
)
from yolofastest_tpu.quant.zoo import (int8_zoo_path, load_int8_zoo,
                                       mixed_native_tree, save_int8_zoo)
from yolofastest_tpu.quant.qat import (
    FakeQuantExecutor,
    fake_quant_act,
    fake_quant_weight,
    qat_apply,
    qat_finetune,
)

__all__ = [
    "Int8Executor",
    "calibrate",
    "quantize_weights",
    "quantized_apply",
    "quantized_apply_fused",
    "layer_sensitivity",
    "quantized_apply_mixed",
    "FakeQuantExecutor",
    "fake_quant_act",
    "fake_quant_weight",
    "qat_apply",
    "qat_finetune",
    "int8_zoo_path",
    "load_int8_zoo",
    "mixed_native_tree",
    "save_int8_zoo",
]

from yolofastest_tpu.export.stablehlo import (
    export_detect_pipeline,
    export_folded_forward,
    export_int8_forward,
    load_exported,
    save_exported,
)
from yolofastest_tpu.export.native import load_native_weights, save_native_weights

__all__ = [
    "export_detect_pipeline",
    "export_folded_forward",
    "export_int8_forward",
    "load_exported",
    "save_exported",
    "load_native_weights",
    "save_native_weights",
]

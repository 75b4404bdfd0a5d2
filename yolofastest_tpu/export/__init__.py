from yolofastest_tpu.export.stablehlo import (
    export_detect_pipeline,
    export_folded_forward,
    export_int8_forward,
    load_exported,
    save_exported,
    save_exported_mlir,
)
from yolofastest_tpu.export.caffe import export_caffe
from yolofastest_tpu.export.generic_onnx import export_jax_onnx
from yolofastest_tpu.export.native import (load_native_weights,
                                            read_native_meta,
                                            save_native_weights)
from yolofastest_tpu.export.ncnn import (export_ncnn, export_ncnn_table,
                                          import_ncnn)
from yolofastest_tpu.export.onnx import (export_onnx, export_onnx_detect,
                                          export_onnx_qdq, import_onnx)
from yolofastest_tpu.export.torchscript import build_torch_module, export_torchscript

__all__ = [
    "build_torch_module",
    "export_caffe",
    "export_jax_onnx",
    "export_ncnn",
    "export_ncnn_table",
    "import_ncnn",
    "export_onnx",
    "export_onnx_detect",
    "export_onnx_qdq",
    "import_onnx",
    "export_torchscript",
    "export_detect_pipeline",
    "export_folded_forward",
    "export_int8_forward",
    "load_exported",
    "save_exported",
    "save_exported_mlir",
    "load_native_weights",
    "read_native_meta",
    "save_native_weights",
]

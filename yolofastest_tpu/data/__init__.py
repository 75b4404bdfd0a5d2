from yolofastest_tpu.data.voc import VOCIndex, parse_voc_xml, write_voc_xml
from yolofastest_tpu.data.pipeline import DetectionLoader, load_example

__all__ = [
    "VOCIndex",
    "parse_voc_xml",
    "write_voc_xml",
    "DetectionLoader",
    "load_example",
]

from yolofastest_tpu.data.voc import VOCIndex, parse_voc_xml, write_voc_xml
from yolofastest_tpu.data.coco import (COCOIndex, parse_coco_json,
                                       voc_to_coco, write_coco_json)
from yolofastest_tpu.data.pipeline import DetectionLoader, load_example

__all__ = [
    "VOCIndex",
    "parse_voc_xml",
    "write_voc_xml",
    "COCOIndex",
    "parse_coco_json",
    "voc_to_coco",
    "write_coco_json",
    "DetectionLoader",
    "load_example",
]

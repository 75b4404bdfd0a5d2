from yolofastest_tpu.data.voc import VOCIndex, parse_voc_xml, write_voc_xml
from yolofastest_tpu.data.coco import (COCOIndex, parse_coco_json,
                                       voc_to_coco, write_coco_json)
from yolofastest_tpu.data.pipeline import (DetectionLoader, load_example,
                                           multiscale_buckets)
from yolofastest_tpu.data.lmdb_reader import (CaffeLMDBReader, decode_datum,
                                              encode_datum, write_caffe_lmdb)
from yolofastest_tpu.data.anchors import (anchor_groups, collect_wh,
                                          kmeans_anchors, mean_best_iou)

__all__ = [
    "CaffeLMDBReader",
    "decode_datum",
    "encode_datum",
    "write_caffe_lmdb",
    "anchor_groups",
    "collect_wh",
    "kmeans_anchors",
    "mean_best_iou",
    "VOCIndex",
    "parse_voc_xml",
    "write_voc_xml",
    "COCOIndex",
    "parse_coco_json",
    "voc_to_coco",
    "write_coco_json",
    "DetectionLoader",
    "load_example",
    "multiscale_buckets",
]

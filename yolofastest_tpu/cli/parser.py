"""Argument parser assembly + `main` dispatch.

Split from the original monolithic cli.py (round-4); behavior-preserving —
the test suite is the guard.  Public entry: ``yolofastest_tpu.cli.main``.
"""

from __future__ import annotations

import argparse
import sys

from yolofastest_tpu.cli._common import (
    _add_calib_method_flags,
)

from yolofastest_tpu.cli.detect import cmd_detect
from yolofastest_tpu.cli.serve import cmd_serve, cmd_video
from yolofastest_tpu.cli.train import cmd_train
from yolofastest_tpu.cli.evaluate import cmd_eval
from yolofastest_tpu.cli.export import cmd_export, cmd_convert
from yolofastest_tpu.cli.quantize import cmd_prune, cmd_sensitivity
from yolofastest_tpu.cli.datatools import cmd_voc2coco, cmd_txt2xml, cmd_anchors
from yolofastest_tpu.cli.info import cmd_info


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="yolofastest_tpu")
    p.add_argument("--compile-cache", default=None, metavar="DIR|off",
                   help="persistent XLA compilation-cache directory shared "
                        "across processes (default: $YF_COMPILE_CACHE, then "
                        "~/.cache/yolofastest_tpu/xla; 'off' disables) — "
                        "turns a repeat invocation's 20-60 s jit compiles "
                        "into deserializes")
    sub = p.add_subparsers(dest="command", required=True)

    d = sub.add_parser("detect", help="batch-detect a directory of images")
    d.add_argument("--config", default="256x320", choices=["256x320", "512x640", "lite-256x320", "lite-512x640"])
    d.add_argument("--config-json", default=None,
                   help="Config JSON file (e.g. from anchors --out); "
                        "overrides --config")
    d.add_argument("--weights", required=True, help=".npz zoo file or reference .pth")
    d.add_argument("--data", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--arch", default="fastest", choices=["fastest", "lite"],
                   help="model architecture (lite = single-head variant; "
                        "use with --config lite-256x320)")
    d.add_argument("--backend", default="fp",
                   choices=["fp", "jax", "native", "native-int8", "int8",
                            "int8-fused"],
                   help="native = fp32 C++ engine; native-int8 = C++ engine "
                        "with int8 VNNI arithmetic on the 1x1 convs "
                        "(calibrates on the first 8 target images)")
    d.add_argument("--fold-bn", action="store_true",
                   help="run the BN-folded deployment graph (fp backend)")
    d.add_argument("--batch", type=int, default=1,
                   help="device batch size for the detect pipeline (>1 = "
                        "throughput mode, amortised per-image timing)")
    d.add_argument("--tta", action="store_true", help="horizontal-flip test-time augmentation (jax backends): the mirrored batch rides the same device program and both candidate sets merge into one NMS — a recall boost for ~2x device FLOPs")
    d.add_argument("--sliced", default=None, metavar="RxC",
                   help="tiled (SAHI-style) detection for large frames: "
                        "split each image into an RxC grid of overlapping "
                        "crops, run ALL tiles as one batch through the "
                        "jitted program, merge in one global NMS (jax "
                        "backends; small objects keep their pixels)")
    d.add_argument("--slice-overlap", type=float, default=0.2,
                   help="fraction of tile extent shared by neighbouring "
                        "tiles (default 0.2)")
    d.add_argument("--int8-zoo", nargs="?", const="auto", default=None,
                   metavar="PATH",
                   help="deploy the SHIPPED int8 artifact (refined weights + "
                        "frozen scales, full golden recall on every int8 "
                        "backend) instead of calibrating; bare flag resolves "
                        "weights/yolofastest_int8_<config>.npz")
    d.add_argument("--keep-fp", default=None, metavar="L1,L2,...",
                   help="mixed precision for --backend int8: these folded-"
                        "graph layers run the fp kernel (pick them with the "
                        "'sensitivity' subcommand)")
    d.add_argument("--calibration-cache", default=None,
                   help="JSON file for int8 activation scales (default: "
                        "<weights>.calib.json)")
    _add_calib_method_flags(d)
    d.set_defaults(fn=cmd_detect)

    s = sub.add_parser("serve",
                       help="HTTP detection server with dynamic batching")
    s.add_argument("--config", default="256x320", choices=["256x320", "512x640", "lite-256x320", "lite-512x640"])
    s.add_argument("--config-json", default=None,
                   help="Config JSON file (e.g. from anchors --out); "
                        "overrides --config")
    s.add_argument("--weights", required=True, help=".npz zoo file or reference .pth")
    s.add_argument("--arch", default="fastest", choices=["fastest", "lite"])
    s.add_argument("--backend", default="fp",
                   choices=["fp", "jax", "native", "native-int8", "int8",
                            "int8-fused"],
                   help="fp (BN-folded jax) is the TPU serving path; "
                        "native/native-int8 serve through the C++ engine")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8000,
                   help="TCP port (0 = pick a free one, printed at start)")
    s.add_argument("--max-batch", type=int, default=8,
                   help="device batch capacity; concurrent requests coalesce "
                        "up to this many per dispatch")
    s.add_argument("--window-ms", type=float, default=5.0,
                   help="how long to wait for co-arriving requests after the "
                        "first (idle-latency floor)")
    s.add_argument("--calib-data", default=None,
                   help="calibration image dir for the int8 backends")
    s.add_argument("--calibration-cache", default=None,
                   help="JSON file for int8 activation scales (default: "
                        "<weights>.calib.json)")
    _add_calib_method_flags(s)
    s.set_defaults(fn=cmd_serve)

    v = sub.add_parser("video",
                       help="detect over a video file -> annotated video")
    v.add_argument("--config", default="256x320", choices=["256x320", "512x640", "lite-256x320", "lite-512x640"])
    v.add_argument("--config-json", default=None,
                   help="Config JSON file (e.g. from anchors --out); "
                        "overrides --config")
    v.add_argument("--weights", required=True, help=".npz zoo file or reference .pth")
    v.add_argument("--video", required=True,
                   help="input video path, stream URL, or camera index "
                        "(e.g. 0)")
    v.add_argument("--out", required=True, help="output directory")
    v.add_argument("--arch", default="fastest", choices=["fastest", "lite"])
    v.add_argument("--backend", default="fp",
                   choices=["fp", "jax", "native", "native-int8", "int8",
                            "int8-fused"],
                   help="fp (BN-folded jax) batches frames on device; "
                        "native/native-int8 run the C++ engine per frame")
    v.add_argument("--batch", type=int, default=8,
                   help="frames per device dispatch (jax backends)")
    v.add_argument("--depth", type=int, default=2,
                   help="batches in flight before the first fetch (jax "
                        "backends; overlaps H2D/compute/D2H)")
    v.add_argument("--tta", action="store_true", help="horizontal-flip test-time augmentation (jax backends): the mirrored batch rides the same device program and both candidate sets merge into one NMS — a recall boost for ~2x device FLOPs")
    v.add_argument("--calib-data", default=None,
                   help="calibration image dir for the int8 backends")
    v.add_argument("--calibration-cache", default=None,
                   help="JSON file for int8 activation scales (default: "
                        "<weights>.calib.json)")
    v.add_argument("--track", action="store_true",
                   help="annotate stable track IDs (SORT-style IoU "
                        "tracker) instead of independent detections")
    v.add_argument("--track-iou", type=float, default=0.3,
                   help="association IoU gate for --track")
    v.add_argument("--track-max-age", type=int, default=10,
                   help="frames a track coasts unmatched before dropping")
    _add_calib_method_flags(v)
    v.set_defaults(fn=cmd_video)

    t = sub.add_parser("train", help="train on a VOC-XML or COCO dataset")
    t.add_argument("--format", default="auto",
                   choices=["auto", "voc", "coco"],
                   help="dataset layout: voc = <dir>/img + <dir>/xml, "
                        "coco = <dir>/img + <dir>/annotations.json; "
                        "auto picks by the annotations.json presence")
    t.add_argument("--config", default="256x320", choices=["256x320", "512x640", "lite-256x320", "lite-512x640"])
    t.add_argument("--config-json", default=None,
                   help="Config JSON file (e.g. from anchors --out); "
                        "overrides --config")
    t.add_argument("--train-dir", required=True)
    t.add_argument("--val-dir", default=None)
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--pretrained", default=None)
    t.add_argument("--resume", default=None,
                   help="orbax checkpoint dir to resume, or 'latest' to pick "
                        "the newest epoch in --checkpoint-dir")
    t.add_argument("--checkpoint-dir", default="checkpoints")
    t.add_argument("--arch", default="fastest", choices=["fastest", "lite"])
    t.add_argument("--max-to-keep", type=int, default=None,
                   help="rotate old epoch checkpoints, keeping the newest N "
                        "(0 keeps all; default from config)")
    t.add_argument("--lr", type=float, default=None,
                   help="initial learning rate (default from config)")
    t.add_argument("--cache-images", action="store_true",
                   help="keep decoded net-input images in RAM after first "
                        "use (N*H*W bytes; epochs >= 2 skip jpeg decode — "
                        "the host input pipeline is the usual TPU training "
                        "bottleneck)")
    t.add_argument("--coco-map", action="store_true",
                   help="validation additionally reports COCO-style "
                        "mAP@[.50:.95] (headline mAP stays @0.5)")
    t.add_argument("--mosaic", type=float, default=None,
                   help="probability of 4-image mosaic augmentation per "
                        "example (beyond-reference; default 0 = reference "
                        "pipeline unchanged)")
    t.add_argument("--multiscale", type=int, nargs="?", const=2, default=None,
                   metavar="STEPS",
                   help="multi-scale training: every train.multiscale_every "
                        "batches draw the input (H, W) from input_hw +/- "
                        "k*32, k <= STEPS (beyond-reference; each bucket is "
                        "one extra cached compile of the train step). Bare "
                        "--multiscale means 2 steps each side")
    t.add_argument("--freeze", default=None, metavar="SPEC",
                   help="pin modules during training: 'backbone' (everything "
                        "but the heads — the fine-tune workflow) or comma-"
                        "separated module-name prefixes from `info` (e.g. "
                        "'conv0' or 'res1,res2'). Frozen leaves stay bitwise "
                        "unchanged (XLA drops their backward pass; BN stats "
                        "pinned too); checkpoints stay resume-compatible "
                        "across --freeze settings")
    t.add_argument("--ema", type=float, nargs="?", const=0.9995, default=None,
                   metavar="DECAY",
                   help="keep an exponential moving average of the model "
                        "(beyond-reference); validation and checkpointed "
                        "deployment weights then use the EMA. Bare --ema "
                        "means decay 0.9995")
    t.add_argument("--ema-ramp", type=int, default=None,
                   help="EMA decay ramp-in length in steps (default 2000)")
    t.add_argument("--warmup-min-iters", type=int, default=None,
                   help="linear LR warmup lower bound in iterations; the "
                        "reference hard-codes max(3*steps_per_epoch, 1000) "
                        "(train.py:81) which never completes on small "
                        "datasets — lower it for short runs")
    t.add_argument("--bf16", action="store_true",
                   help="bfloat16 conv compute in the train step (params, "
                        "loss and BN stats stay fp32) - the MXU-native "
                        "dtype; the deployed graphs already run bf16")
    t.add_argument("--distill-teacher", default=None,
                   help="zoo .npz checkpoint whose head logits supervise the "
                        "student alongside the label loss (e.g. the full "
                        "model teaching --arch lite)")
    t.add_argument("--distill-arch", default="fastest",
                   choices=["fastest", "lite"],
                   help="architecture of --distill-teacher")
    t.add_argument("--distill-weight", type=float, default=1.0,
                   help="weight of the teacher-MSE term in the total loss")
    t.add_argument("--log-dir", default="logs")
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("eval", help="mAP on a VOC-XML or COCO val set")
    e.add_argument("--format", default="auto",
                   choices=["auto", "voc", "coco"],
                   help="dataset layout (see train --format)")
    e.add_argument("--config", default="256x320", choices=["256x320", "512x640", "lite-256x320", "lite-512x640"])
    e.add_argument("--config-json", default=None,
                   help="Config JSON file (e.g. from anchors --out); "
                        "overrides --config")
    e.add_argument("--weights", required=True)
    e.add_argument("--val-dir", required=True)
    e.add_argument("--arch", default="fastest", choices=["fastest", "lite"])
    e.add_argument("--backend", default="train",
                   choices=["train", "fp", "jax", "int8", "int8-fused",
                            "native", "native-int8"],
                   help="train (default) = the training-loop evaluator "
                        "(reference validate.py parity); any other choice "
                        "scores the DEPLOYED pipeline (BN-folded, detect-"
                        "path NMS) through that backend")
    e.add_argument("--max-det", type=int, default=None,
                   help="override the per-image detection budget (config "
                        "default 64) — e.g. 100 for the standard COCO AR "
                        "cap; the decode pool grows to at least 2x this")
    e.add_argument("--coco-map", action="store_true",
                   help="additionally report COCO-style mAP@[.50:.95] "
                        "(10 IOU thresholds; headline mAP stays @0.5)")
    e.add_argument("--coco-strict", action="store_true",
                   help="with --coco-map: pycocotools' exact conventions — "
                        "standard IOU (no +1px) matching and 101-point AP "
                        "interpolation")
    e.add_argument("--tta", action="store_true",
                   help="horizontal-flip test-time augmentation (deployed "
                        "jax backends fp/int8/int8-fused): mirrored batch in "
                        "the same device program, merged into one NMS")
    e.add_argument("--json-out", default=None,
                   help="also write the full metrics dict (per-class AP, "
                        "target counts, detection rate, per-IOU grid) as "
                        "JSON to this path")
    e.add_argument("--calib-data", default=None,
                   help="calibration image dir for the int8 backends")
    e.add_argument("--calibration-cache", default=None,
                   help="JSON file for int8 activation scales (default: "
                        "<weights>.calib.json)")
    e.add_argument("--int8-zoo", nargs="?", const="auto", default=None,
                   metavar="PATH",
                   help="deploy the SHIPPED int8 artifact (refined weights + "
                        "frozen scales, full golden recall on every int8 "
                        "backend) instead of calibrating; bare flag resolves "
                        "weights/yolofastest_int8_<config>.npz")
    e.add_argument("--keep-fp", default=None, metavar="L1,L2,...",
                   help="mixed precision for --backend int8: these folded-"
                        "graph layers run the fp kernel (pick them with the "
                        "'sensitivity' subcommand)")
    e.add_argument("--log-dir", default="logs")
    _add_calib_method_flags(e)
    e.set_defaults(fn=cmd_eval)

    x = sub.add_parser("export",
                       help="export StableHLO + ONNX + TorchScript + native .yfb")
    x.add_argument("--config", default="256x320", choices=["256x320", "512x640", "lite-256x320", "lite-512x640"])
    x.add_argument("--config-json", default=None,
                   help="Config JSON file (e.g. from anchors --out); "
                        "overrides --config")
    x.add_argument("--weights", required=True)
    x.add_argument("--out", required=True)
    x.add_argument("--batch", type=int, default=1)
    x.add_argument("--arch", default="fastest", choices=["fastest", "lite"],
                   help="model architecture; every artifact is emitted for "
                        "both (lite = single-head topology)")
    x.add_argument("--calib-data", default=None,
                   help="directory of calibration .jpg images; when given, "
                        "also exports the int8 graph (forward_int8.stablehlo)")
    x.add_argument("--qat-steps", type=int, default=0,
                   help="quantisation-aware distillation steps on the "
                        "calibration images before emitting the int8 "
                        "artifacts (needs --calib-data; fp artifacts keep "
                        "the original weights)")
    x.add_argument("--qat-lr", type=float, default=1e-4,
                   help="Adam learning rate for --qat-steps")
    _add_calib_method_flags(x)
    x.set_defaults(fn=cmd_export)

    i = sub.add_parser("info", help="model summary: per-layer shapes, "
                       "params, MACs (optionally XLA compiled cost)")
    i.add_argument("--config", default="256x320")
    i.add_argument("--config-json")
    i.add_argument("--arch", choices=["fastest", "lite"], default="fastest")
    i.add_argument("--weights", help="optional .npz/.pth/.onnx/checkpoint "
                   "dir; fresh init when omitted (shapes need only channel "
                   "counts)")
    i.add_argument("--device-cost", action="store_true",
                   help="also compile the folded forward and report XLA's "
                        "FLOPs / HBM-bytes per image")
    i.add_argument("--batch", type=int, default=8,
                   help="batch for --device-cost")
    i.add_argument("--json-out", help="also dump the summary dict as JSON")
    i.set_defaults(fn=cmd_info)

    c = sub.add_parser("convert",
                       help="reference .pth, orbax checkpoint dir, ncnn "
                            ".param/.bin, or .onnx -> zoo .npz")
    c.add_argument("--pth",
                   help="reference .pth, a .npz, or a train-run epoch_N "
                        "checkpoint dir (extracts the EMA model when the "
                        "run kept one)")
    c.add_argument("--ncnn",
                   help="ncnn .param path (matching .bin alongside) — "
                        "imports a compiled deployment artifact, incl. the "
                        "reference's shipped models/ncnn/*-opt files; arch "
                        "is auto-detected")
    c.add_argument("--onnx",
                   help=".onnx path — imports torch-exported graphs (BN "
                        "preserved -> exact unfolded variables, incl. the "
                        "reference's shipped models/onnx files) and our own "
                        "BN-folded exports; arch is auto-detected")
    c.add_argument("--out", required=True)
    c.set_defaults(fn=cmd_convert)

    pr = sub.add_parser(
        "prune",
        help="structured channel pruning: drop the lowest-importance "
             "fraction of every res block's expansion channels; the "
             "pruned .npz runs/fine-tunes on every backend unchanged")
    pr.add_argument("--weights", required=True,
                    help=".npz / .pth / .onnx / epoch_N checkpoint dir")
    pr.add_argument("--ratio", type=float, required=True,
                    help="fraction of inner channels to remove per block, "
                         "in [0, 1)")
    pr.add_argument("--min-keep", type=int, default=4,
                    help="floor on kept channels per block (default 4)")
    pr.add_argument("--round-to", type=int, default=4,
                    help="kept widths round UP to this multiple (default 4)")
    pr.add_argument("--arch", choices=["fastest", "lite"], default="fastest")
    pr.add_argument("--config", default="256x320")
    pr.add_argument("--config-json")
    pr.add_argument("--out", required=True, help="output .npz path")
    pr.set_defaults(fn=cmd_prune)

    sn = sub.add_parser(
        "sensitivity",
        help="per-layer int8 sensitivity: quantise one layer at a time, "
             "rank the head-logit damage, suggest a --keep-fp set for "
             "mixed-precision deployment")
    sn.add_argument("--config", default="256x320",
                    choices=["256x320", "512x640", "lite-256x320",
                             "lite-512x640"])
    sn.add_argument("--config-json", default=None,
                    help="Config JSON file; overrides --config")
    sn.add_argument("--weights", required=True,
                    help=".npz / .pth / .onnx / epoch_N checkpoint dir")
    sn.add_argument("--data", required=True,
                    help="probe/calibration image directory")
    sn.add_argument("--arch", default="fastest", choices=["fastest", "lite"])
    sn.add_argument("--images", type=int, default=8,
                    help="probe batch size (first N images of --data)")
    sn.add_argument("--top", type=int, default=5,
                    help="size of the suggested --keep-fp set")
    sn.add_argument("--json-out", default=None,
                    help="also write the ranked table as JSON")
    sn.add_argument("--calibration-cache", default=None,
                    help="JSON file for int8 activation scales (default: "
                         "<weights>.calib.json; reused when it exists)")
    _add_calib_method_flags(sn)
    sn.set_defaults(fn=cmd_sensitivity)

    vc = sub.add_parser("voc2coco",
                        help="VOC-layout dataset -> COCO layout "
                             "(img/ + annotations.json)")
    vc.add_argument("--config", default="256x320",
                    choices=["256x320", "512x640", "lite-256x320",
                             "lite-512x640"],
                    help="supplies the class-name list for category ids")
    vc.add_argument("--src", required=True, help="VOC root (img/ + xml/)")
    vc.add_argument("--dst", required=True, help="output COCO root")
    vc.set_defaults(fn=cmd_voc2coco)

    tx = sub.add_parser("txt2xml", help="custom txt labels -> VOC XML dataset")
    tx.add_argument("--src", required=True)
    tx.add_argument("--dst", required=True)
    tx.add_argument("--class-id-base", type=int, default=0)
    tx.add_argument("--dialect", default="auto",
                    choices=["auto", "yolo", "ref-dump"],
                    help="input txt flavor: standard YOLO rows or the "
                         "reference's punctuated pixel dump "
                         "(utils/txt2xml.py:53-60); auto detects per file")
    tx.set_defaults(fn=cmd_txt2xml)

    an = sub.add_parser("anchors",
                        help="k-means auto-anchors from a dataset's GT boxes")
    an.add_argument("--config", default="256x320",
                    choices=["256x320", "512x640", "lite-256x320",
                             "lite-512x640"],
                    help="supplies net-input size, strides and the preset "
                         "anchors to compare against")
    an.add_argument("--data", required=True, help="VOC or COCO dataset root")
    an.add_argument("--format", default="auto", choices=["auto", "voc", "coco"])
    an.add_argument("--num", type=int, default=None,
                    help="total anchor count (default: scales * "
                         "anchors-per-scale from the config)")
    an.add_argument("--seed", type=int, default=0)
    an.add_argument("--out", default=None,
                    help="write a full config JSON carrying the new anchors "
                         "(consumable via train/eval --config-json)")
    an.set_defaults(fn=cmd_anchors)
    return p


# Pure host-side converters never touch jax; keep them import-light.
_NO_JAX_COMMANDS = {"txt2xml", "voc2coco"}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.command not in _NO_JAX_COMMANDS:
        from yolofastest_tpu.utils.compile_cache import enable_compile_cache

        enable_compile_cache(args.compile_cache)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

"""`voc2coco`, `txt2xml` and `anchors` commands.

Split from the original monolithic cli.py (round-4); behavior-preserving —
the test suite is the guard.  Public entry: ``yolofastest_tpu.cli.main``.
"""

from __future__ import annotations

from yolofastest_tpu.cli._common import (
    _get_config,
    _make_index,
)


def cmd_voc2coco(args) -> int:
    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.data import voc_to_coco

    names = get_config(args.config).io.class_names
    n = voc_to_coco(args.src, args.dst, names)
    print(f"converted {n} images -> {args.dst} (COCO layout)")
    return 0


def cmd_txt2xml(args) -> int:
    from yolofastest_tpu.data.txt2xml import convert_txt_dataset

    n = convert_txt_dataset(args.src, args.dst,
                            class_id_base=args.class_id_base,
                            dialect=args.dialect)
    print(f"converted {n} label files -> {args.dst}")
    return 0


def cmd_anchors(args) -> int:
    """K-means auto-anchors from a dataset (the reference hand-picks its
    anchor groups, ``_config.py:5-9``; this derives them for any dataset)."""
    import dataclasses

    import numpy as np

    from yolofastest_tpu.data import (anchor_groups, collect_wh,
                                      kmeans_anchors, mean_best_iou)

    cfg = _get_config(args)
    idx = _make_index(args.data, cfg.io.class_names, fmt=args.format)
    wh = collect_wh(idx, cfg)
    num_scales = len(cfg.io.strides)
    k = args.num or num_scales * cfg.io.num_anchors
    anchors = kmeans_anchors(wh, k, seed=args.seed)
    groups = anchor_groups(anchors, num_scales)

    old_fit = mean_best_iou(wh, np.array(cfg.io.anchors).reshape(-1, 2))
    new_fit = mean_best_iou(wh, anchors)
    print(f"{len(wh)} GT boxes from {len(idx)} images "
          f"({args.data}, net input {cfg.io.input_hw})")
    for s, (g, stride) in enumerate(zip(groups, cfg.io.strides)):
        print(f"scale {s} (stride {stride}): "
              + ", ".join(f"({w:g}, {h:g})" for w, h in g))
    print(f"mean best-IoU: {new_fit:.4f} (preset anchors: {old_fit:.4f})")

    if args.out:
        new_cfg = dataclasses.replace(
            cfg, io=dataclasses.replace(cfg.io, anchors=groups))
        with open(args.out, "w") as f:
            f.write(new_cfg.to_json())
        print(f"wrote config with the new anchors -> {args.out}")
    return 0



"""`prune` and `sensitivity` commands.

Split from the original monolithic cli.py (round-4); behavior-preserving —
the test suite is the guard.  Public entry: ``yolofastest_tpu.cli.main``.
"""

from __future__ import annotations

import os

from yolofastest_tpu.cli._common import (
    _check_arch_config,
    _get_config,
    _load_weights,
    _load_calibration,
    _calib_kwargs,
    _int8_cache_path,
)


def cmd_prune(args) -> int:
    """Structured channel pruning (models/prune.py): drop the lowest-
    importance fraction of every res block's expansion channels and write a
    plain (smaller) weights tree.  The pruned checkpoint runs on every
    backend unchanged (shapes drive all of them) and fine-tunes via
    ``train --pretrained <out>`` (pass it again with ``--resume`` — the
    restore needs matching widths)."""
    from yolofastest_tpu.models import fold_batchnorm, save_variables
    from yolofastest_tpu.models.prune import prune_variables
    from yolofastest_tpu.models.summary import summarize

    cfg = _get_config(args)
    _check_arch_config(cfg, args.arch)
    variables = _load_weights(args.weights, args.arch)
    pruned, report = prune_variables(variables, args.ratio,
                                     min_keep=args.min_keep,
                                     round_to=args.round_to)

    walk_arch = "yolofastest" if args.arch == "fastest" else "yolofastest-lite"
    before = summarize(fold_batchnorm(variables), cfg.io.input_hw, walk_arch)
    after = summarize(fold_batchnorm(pruned), cfg.io.input_hw, walk_arch)

    print(f"{'block':<10} {'before':>7} {'after':>6}")
    for name, (old, new) in report.items():
        mark = "" if new == old else f"  (-{old - new})"
        print(f"{name:<10} {old:>7} {new:>6}{mark}")
    dp = 1.0 - after["total_params"] / before["total_params"]
    dm = 1.0 - after["total_macs"] / before["total_macs"]
    print(f"params {before['total_params']:,} -> {after['total_params']:,} "
          f"(-{dp:.1%})")
    print(f"MACs   {before['total_macs']:,} -> {after['total_macs']:,} "
          f"(-{dm:.1%})")

    save_variables(pruned, args.out)
    print(f"wrote {args.out}")
    return 0


def cmd_sensitivity(args) -> int:
    """Per-layer int8 sensitivity table (quant/sensitivity.py): quantise ONE
    layer at a time, measure head-logit damage vs the fp folded graph, rank
    worst-first, and print the ``--keep-fp`` line that deploys the worst K
    in float (RKNN "hybrid quantization" analogue)."""
    import json

    from yolofastest_tpu.models import fold_batchnorm
    from yolofastest_tpu.quant import layer_sensitivity

    cfg = _get_config(args)
    _check_arch_config(cfg, args.arch)
    folded = fold_batchnorm(_load_weights(args.weights, args.arch))
    cal = _load_calibration(args.data, cfg.io, k=args.images)
    if cal is None:
        return 2
    act_scales = None
    cache = _int8_cache_path(args)
    if os.path.exists(cache):
        # One calibration serves every int8 entry point (same cache file as
        # detect/eval/export); a miss calibrates fresh from --data below.
        with open(cache) as f:
            act_scales = {k: float(v) for k, v in json.load(f).items()}
        print(f"calibration scales: {cache}")
    rows = layer_sensitivity(folded, [cal], arch=args.arch,
                             act_scales=act_scales, **_calib_kwargs(args))
    print(f"{'layer':<14} {'mean|d|':>12} {'max|d|':>12}")
    for r in rows:
        print(f"{r['layer']:<14} {r['mean_abs']:>12.6f} {r['max_abs']:>12.6f}")
    worst = ",".join(r["layer"] for r in rows[:args.top])
    print(f"\nsuggested mixed-precision deployment (worst {args.top}):")
    print(f"  --backend int8 --keep-fp {worst}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {args.json_out}")
    return 0



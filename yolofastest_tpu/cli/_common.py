"""Shared CLI helpers: config/weights/calibration resolution, backend construction.

Split from the original monolithic cli.py (round-4); behavior-preserving —
the test suite is the guard.  Public entry: ``yolofastest_tpu.cli.main``.
"""

from __future__ import annotations

import os
import sys


def _check_arch_config(cfg, arch: str) -> None:
    """Fail fast on arch/config mismatch: the lite arch emits ONE head, so
    it needs a one-anchor-group (lite-*) preset and vice versa — otherwise
    decode/loss would pair heads with the wrong anchor groups."""
    n_heads = 1 if arch == "lite" else 2
    n_groups = len(cfg.io.anchors)
    if n_heads != n_groups:
        raise SystemExit(
            f"--arch {arch} produces {n_heads} head(s) but the config has "
            f"{n_groups} anchor group(s); use "
            f"{'a lite-* config preset' if arch == 'lite' else 'a non-lite config preset'}"
        )


def _get_config(args):
    """Resolve the command's Config: ``--config-json FILE`` (a serialized
    ``Config.to_json``, e.g. written by ``anchors --out``) wins over the
    ``--config`` preset name."""
    from yolofastest_tpu.configs import Config, get_config

    if getattr(args, "config_json", None):
        with open(args.config_json) as f:
            return Config.from_json(f.read())
    return get_config(args.config)


def _check_arch_weights(variables, arch: str, path: str) -> None:
    """Fail fast when the loaded weights' head set contradicts --arch (a
    lite tree walked as the two-head graph dies with a raw KeyError
    otherwise)."""
    two_head = "head_4" in variables.get("params", {})
    if two_head != (arch != "lite"):
        kind = "two-head" if two_head else "single-head (lite)"
        want = "fastest" if two_head else "lite"
        raise SystemExit(f"{path} holds a {kind} model but --arch is "
                         f"{arch!r}; pass --arch {want}")


def _load_weights(path: str, arch: str = None):
    from yolofastest_tpu.models import load_variables
    from yolofastest_tpu.models.torch_io import load_torch_checkpoint

    if os.path.isdir(path):
        # an orbax epoch_* checkpoint dir straight from `train` — deploys the
        # EMA model when the run kept one (what validation scored)
        from yolofastest_tpu.train import checkpoint_variables

        variables = checkpoint_variables(path)
    elif path.endswith(".pth"):
        variables = load_torch_checkpoint(path)
    elif path.endswith(".onnx"):
        from yolofastest_tpu.export import import_onnx

        variables = import_onnx(path)[0]
    else:
        variables = load_variables(path)
    if arch is not None:
        _check_arch_weights(variables, arch, path)
    return variables


def _load_calibration(data_dir: str, io, k: int = 8):
    """First ``k`` images of a directory as one net-input batch (the int8
    calibration recipe shared by detect/export), or ``None`` after a
    printed message when the directory holds no readable images."""
    import numpy as np

    from yolofastest_tpu.inference.detector import load_net_input

    names = sorted(f for f in os.listdir(data_dir)
                   if f.lower().endswith((".jpg", ".png", ".bmp")))[:k]
    if not names:
        print(f"no calibration images (.jpg/.png/.bmp) in {data_dir}")
        return None
    return np.concatenate([load_net_input(os.path.join(data_dir, n), io)[0]
                           for n in names])


def _make_index(root: str, class_names, logger=None, fmt: str = "auto"):
    """Dataset index for ``root``: VOC (``<root>/xml``) or COCO
    (``<root>/annotations.json``).  ``fmt='auto'`` picks by layout."""
    from yolofastest_tpu.data import COCOIndex, VOCIndex

    if fmt == "auto":
        fmt = ("coco" if os.path.exists(os.path.join(root, "annotations.json"))
               else "voc")
    if fmt == "coco":
        return COCOIndex(root, class_names, logger)
    return VOCIndex(root, class_names, logger)


def _calib_kwargs(args) -> dict:
    """Calibration-algorithm kwargs shared by every int8 entry point."""
    return {"method": getattr(args, "calib_method", "amax"),
            "percentile": getattr(args, "calib_percentile", 99.99)}


def _int8_cache_path(args) -> str:
    """Default scale-cache path encodes the calibration method (amax keeps
    the historical bare ``.calib.json`` so committed caches stay valid)."""
    if args.calibration_cache:
        return args.calibration_cache
    method = getattr(args, "calib_method", "amax")
    if method == "percentile":
        suffix = ".calib-percentile%g.json" % getattr(args, "calib_percentile", 99.99)
    elif method != "amax":
        suffix = f".calib-{method}.json"
    else:
        suffix = ".calib.json"
    return os.path.splitext(args.weights)[0] + suffix


def _resolve_jax_int8_calibration(args, cfg, data_dir):
    """Cache-or-calibrate resolution for the jax int8 backends, shared by
    detect/serve.  Returns ``(calibration_batch_or_None, cache_path)`` for
    ``Detector(...)`` — calibration is None on a cache hit (the Detector
    loads the file) — or ``None`` after a printed message on error."""
    cache = _int8_cache_path(args)
    if os.path.exists(cache):
        return None, cache
    if not data_dir:
        print("int8 calibration needs images: pass --calib-data (or reuse "
              f"an existing cache at {cache})", file=sys.stderr)
        return None
    cal = _load_calibration(data_dir, cfg.io)
    if cal is None:
        return None
    return cal, cache


def _native_int8_scales(args, cfg, folded, data_dir):
    """Activation scales for the native int8 engine, honoring the SAME
    cache file as the jax int8 backends (so one calibration serves every
    backend).  Calibrates from ``data_dir`` images on a cache miss and
    writes the cache; returns ``None`` after a printed message on error."""
    import json

    from yolofastest_tpu.quant import calibrate

    cache = _int8_cache_path(args)
    if os.path.exists(cache):
        with open(cache) as f:
            return {k: float(v) for k, v in json.load(f).items()}
    if not data_dir:
        print("native-int8 calibration needs images: pass a data/--calib-data "
              f"directory (or reuse an existing cache at {cache})",
              file=sys.stderr)
        return None
    cal = _load_calibration(data_dir, cfg.io)
    if cal is None:
        return None
    scales = calibrate(folded, [cal], arch=args.arch, **_calib_kwargs(args))
    with open(cache, "w") as f:
        json.dump(scales, f, indent=1)
    return scales


def _parse_keep_fp(args, backend) -> tuple:
    """``--keep-fp a,b,c`` -> layer-name tuple.  Returns ``None`` after a
    printed message when the flag is set on a backend that can't mix."""
    keep = tuple(s for s in (getattr(args, "keep_fp", None) or "").split(",")
                 if s)
    if keep and backend not in ("int8", "int8-fused"):
        print("--keep-fp (mixed precision) applies to the int8 backends "
              "(int8 / int8-fused) only", file=sys.stderr)
        return None
    if keep and getattr(args, "int8_zoo", None):
        # the shipped artifact IS the deployment config (refined weights +
        # frozen scales); splicing fp layers into it is undefined
        print("--keep-fp and --int8-zoo are exclusive (the zoo artifact "
              "already fixes the per-layer deployment)", file=sys.stderr)
        return None
    return keep


def _resolve_int8_zoo(args, backend):
    """``--int8-zoo [PATH]`` -> artifact path (or None when unused).
    'auto' (the bare flag) resolves the shipped artifact for --config.
    Returns the sentinel string "error" after a printed message."""
    want = getattr(args, "int8_zoo", None)
    if not want:
        return None
    if backend not in ("int8", "int8-fused", "native-int8"):
        print("--int8-zoo applies to the int8 backends only",
              file=sys.stderr)
        return "error"
    from yolofastest_tpu.quant import int8_zoo_path

    path = int8_zoo_path(args.config) if want == "auto" else want
    if not os.path.exists(path):
        print(f"--int8-zoo: artifact not found: {path}", file=sys.stderr)
        return "error"
    return path  # consumers load it (and fail loud on a malformed file)


def _build_engine(args, cfg, backend, calib_data):
    """Deployment engine for serve/eval: a ``Detector`` (jax fp/int8
    pipelines) or a ``NativeEngine`` (C++ fp32/int8-VNNI).  Returns ``None``
    after a printed message on error."""
    zoo8 = _resolve_int8_zoo(args, backend)
    if zoo8 == "error":
        return None
    if backend in ("native", "native-int8"):
        if getattr(args, "tta", False):
            print("--tta runs the flip pass on device; it applies to the "
                  "jax backends (fp/int8/int8-fused), not the C++ engine")
            return None
        import tempfile

        from yolofastest_tpu.export import save_native_weights
        from yolofastest_tpu.models import fold_batchnorm
        from yolofastest_tpu.native import NativeEngine

        folded = fold_batchnorm(
            _load_weights(args.weights, getattr(args, "arch", None)))
        # The engine loads everything into memory at construction, so the
        # .yfb staging file can be deleted immediately (no /tmp litter
        # across restarts).
        with tempfile.TemporaryDirectory(prefix="yf_engine_") as td:
            yfb = os.path.join(td, "model.yfb")
            if backend == "native-int8":
                from yolofastest_tpu.quant import (load_int8_zoo,
                                                   mixed_native_tree)

                keep_fp8 = ()
                if zoo8:
                    # shipped artifact: refined weights + frozen scales
                    # (+ its hybrid keep-fp set, if any)
                    folded, scales, keep_fp8 = load_int8_zoo(zoo8)
                else:
                    scales = _native_int8_scales(args, cfg, folded, calib_data)
                    if scales is None:
                        return None
                tree, nscales = mixed_native_tree(folded, scales, keep_fp8)
                save_native_weights(tree, yfb, act_scales=nscales,
                                    io_config=cfg.io)
            else:
                save_native_weights(folded, yfb, io_config=cfg.io)
            return NativeEngine(yfb, cfg)

    from yolofastest_tpu.inference import Detector

    keep_fp = _parse_keep_fp(args, backend)
    if keep_fp is None:
        return None
    calibration = None
    cache = None
    if backend in ("int8", "int8-fused") and not zoo8:
        resolved = _resolve_jax_int8_calibration(args, cfg, calib_data)
        if resolved is None:
            return None
        calibration, cache = resolved
    ck = _calib_kwargs(args)
    return Detector(cfg, variables=_load_weights(args.weights,
                                                  getattr(args, "arch", None)),
                    fold_bn=True, backend=backend,
                    calibration=calibration, calibration_cache=cache,
                    arch=args.arch, tta=getattr(args, "tta", False),
                    calib_method=ck["method"],
                    calib_percentile=ck["percentile"],
                    keep_fp=keep_fp, int8_artifact=zoo8)


def _add_calib_method_flags(p) -> None:
    """Calibration-algorithm knobs shared by every int8-capable command
    (mirrors RKNN-Toolkit's quantized_algorithm normal/mmse/kl_divergence)."""
    p.add_argument("--calib-method", default="amax",
                   choices=["amax", "mse", "percentile", "entropy"],
                   help="int8 activation-scale algorithm: amax (exact range"
                        ", default), mse (min-quant-error clip — measured "
                        "best on the zoo checkpoint), percentile, entropy "
                        "(KL). Non-amax methods get their own cache file "
                        "suffix")
    p.add_argument("--calib-percentile", type=float, default=99.99,
                   help="clip percentile for --calib-method percentile")



"""Regenerate the SHIPPED int8 deployment artifacts (round-4, VERDICT item 1).

Per resolution, produces ``weights/yolofastest_int8_<res>.npz`` holding

  * ``folded/<layer>/{kernel,bias}`` — BN-folded fp weights (QAT-refined
    for 256x320), and
  * ``act_scales/<layer>`` — the frozen activation scales.

Every int8 backend derives its parameters from this one artifact
(``quantize_weights(folded)`` + the stored scales): the jax per-layer and
fused executors, the native VNNI engine (``save_native_weights``), and the
QDQ ONNX export — so golden-recall numbers agree on WHAT is deployed.

The default (no flags) reproduces the SHIPPED per-resolution recipes —
the ones ``tests/test_int8_zoo.py``'s full-recall gate was selected on:

  * 512x640: plain PTQ weights, amax scales over the first 16 golden
    images (full-set amax breaks the jax rows, 8-image amax breaks the
    native row — measured, docs/DESIGN.md).
  * 256x320: recall-selected QAT via ``tools/search_int8_recipe2.py``
    (amax-8 scales, conf_weight 4, snapshots every 20 steps, shipped at
    the first snapshot with full recall on ALL THREE int8 backends —
    step 460 on the committed artifact).  Loss-selected QAT never aligns
    all three backends; see DESIGN.md "artifact selection".

``--custom`` switches to the generic loss-selected flow with the
``--steps/--lr/--method/--calib-k`` knobs (exploration, NOT the shipped
recipe; its output will generally FAIL test_int8_zoo's gate).

Usage: python tools/make_int8_zoo.py [--res 256x320 512x640] [--custom ...]
"""

import argparse
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

FIXTURES = os.path.join(REPO, "tests", "fixtures")


def build_custom(res: str, steps: int, lr: float, method: str,
                 calib_k: int = 0) -> str:
    """Generic loss-selected QAT/PTQ flow (exploration only)."""
    from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path
    from yolofastest_tpu.quant import calibrate, qat_finetune, save_int8_zoo

    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
    folded = fold_batchnorm(load_variables(zoo_path(res)))
    cal = imgs[:calib_k] if calib_k else imgs
    scales = calibrate(folded, [cal], method=method)
    tuned = folded
    if steps > 0:
        batches = [imgs[i:i + 4] for i in range(0, len(imgs), 4)]
        tuned, hist = qat_finetune(folded, scales, batches, arch="fastest",
                                   steps=steps, lr=lr)
        print(f"[{res}] QAT: loss {hist[0]:.4e} -> best {min(hist):.4e} "
              f"({len(hist)} steps)")
    out = os.path.join(REPO, "weights", f"yolofastest_int8_{res}.npz")
    save_int8_zoo(jax.device_get(tuned), scales, out)
    print("wrote", out)
    return out


def build_shipped(res: str) -> str:
    """The recipe behind the committed artifact for ``res``."""
    out = os.path.join(REPO, "weights", f"yolofastest_int8_{res}.npz")
    if res == "512x640":
        from yolofastest_tpu.models import (fold_batchnorm, load_variables,
                                            zoo_path)
        from yolofastest_tpu.quant import calibrate, save_int8_zoo

        fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
        imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
        folded = fold_batchnorm(load_variables(zoo_path(res)))
        scales = calibrate(folded, [imgs[:16]], method="amax")
        save_int8_zoo(jax.device_get(folded), scales, out)
        print("wrote", out, "(plain PTQ, amax-16)")
        return out
    if res == "256x320":
        # recall-selected QAT; search_int8_recipe2 ships on the first
        # snapshot with full recall on all three int8 backends
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools",
                                          "search_int8_recipe2.py"),
             "--res", res, "--scales", "amax8", "--conf-weight", "4",
             "--snap", "20", "--steps", "800", "--ship", "--out", out],
            cwd=REPO)
        if r.returncode != 0:
            raise SystemExit(f"recipe2 search failed for {res}")
        return out
    raise SystemExit(f"no shipped recipe for {res}; use --custom")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", nargs="+", default=["256x320", "512x640"])
    ap.add_argument("--custom", action="store_true",
                    help="generic loss-selected flow with the knobs below "
                         "instead of the shipped per-resolution recipes")
    ap.add_argument("--steps", type=int, default=200,
                    help="[--custom] QAT steps (0 = plain PTQ weights)")
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--method", default="amax",
                    choices=["amax", "mse", "percentile", "entropy"])
    ap.add_argument("--calib-k", type=int, default=0,
                    help="[--custom] calibrate on first K golden images "
                         "(0 = all)")
    args = ap.parse_args()
    for res in args.res:
        if args.custom:
            build_custom(res, args.steps, args.lr, args.method, args.calib_k)
        else:
            build_shipped(res)


if __name__ == "__main__":
    main()

"""Build the shipped int8 deployment artifacts (round-4, VERDICT item 1).

Per resolution, produces ``weights/yolofastest_int8_<res>.npz`` holding

  * ``folded/<layer>/{kernel,bias}`` — QAT-refined BN-folded fp weights
    (distilled against the fp folded teacher on the golden set, at the
    frozen deployment scales), and
  * ``act_scales/<layer>`` — the frozen activation scales (amax over the
    full golden set by default).

Every int8 backend derives its parameters from this one artifact
(``quantize_weights(folded)`` + the stored scales): the jax per-layer and
fused executors, the native VNNI engine (``save_native_weights``), and the
QDQ ONNX export — so golden-recall numbers agree on WHAT is deployed.

Usage: python tools/make_int8_zoo.py [--steps N] [--lr LR] [--method M]
       [--res 256x320 512x640]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

FIXTURES = os.path.join(REPO, "tests", "fixtures")


def build_one(res: str, steps: int, lr: float, method: str,
              calib_k: int = 0) -> str:
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200,
                    help="QAT refinement steps (0 = plain PTQ weights)")
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--method", default="amax",
                    choices=["amax", "mse", "percentile", "entropy"])
    ap.add_argument("--calib-k", type=int, default=0,
                    help="calibrate on the first K golden images (0 = all)")
    ap.add_argument("--res", nargs="+", default=["256x320", "512x640"])
    args = ap.parse_args()
    for res in args.res:
        build_one(res, args.steps, args.lr, args.method, args.calib_k)


if __name__ == "__main__":
    main()

"""One-off probe (round 4): which calibrator / refinement closes the lost
256x320 int8 golden detection?  Runs entirely on CPU.

Tries, against the committed golden fixtures at both resolutions:
  * amax calibration on 8 imgs (the suite's current jax-int8 setting)
  * amax / mse / percentile / entropy on the FULL golden set
  * QAT refinement on top of the best calibrator

Prints recall per variant plus, for the failing image, the near-miss
detail (what the int8 pipeline produced where the golden box was lost).
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path
from yolofastest_tpu.ops import batched_nms, decode_heads
from yolofastest_tpu.quant import calibrate, quantize_weights, quantized_apply

FIXTURES = os.path.join(REPO, "tests", "fixtures")


def iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def recall(det, golden, verbose=False):
    matched = 0
    missed = []
    for row in golden:
        b = int(row[0])
        ok = any(
            int(det["cls_idx"][b, i]) == int(row[7])
            and iou(det["boxes"][b, i], row[1:5]) > 0.5
            for i in range(int(det["count"][b]))
        )
        matched += ok
        if not ok:
            missed.append(row)
    if verbose:
        for row in missed:
            b = int(row[0])
            print(f"  MISSED img {b} cls {int(row[7])} box {row[1:5]}"
                  f" conf_golden {row[5]:.3f}")
            for i in range(int(det["count"][b])):
                print(f"    det: cls {int(det['cls_idx'][b, i])} "
                      f"conf {det['conf'][b, i]:.3f} "
                      f"iou {iou(det['boxes'][b, i], row[1:5]):.3f} "
                      f"box {np.asarray(det['boxes'][b, i])}")
    return matched, len(golden)


def main():
    for res in ("256x320", "512x640"):
        cfg = get_config(res)
        io = cfg.io
        fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
        imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
        golden = fx["boxes"]
        folded = fold_batchnorm(load_variables(zoo_path(res)))
        qparams = jax.tree.map(jnp.asarray, quantize_weights(folded))

        def post(heads):
            b, c, s, ci, v = decode_heads(heads, io.anchors, io.input_hw,
                                          io.conf_thre, io.max_decode)
            return batched_nms(b, c, s, ci, v, iou_thre=io.nms_thre,
                               max_det=io.max_det)

        x = jnp.asarray(imgs)
        variants = [("amax-8", dict(method="amax"), imgs[:8]),
                    ("amax-full", dict(method="amax"), imgs),
                    ("mse-full", dict(method="mse"), imgs),
                    ("pct-full", dict(method="percentile"), imgs),
                    ("entropy-full", dict(method="entropy"), imgs)]
        for name, kw, cal in variants:
            scales = calibrate(folded, [cal], **kw)
            fn = jax.jit(lambda x, s=scales: post(quantized_apply(qparams, s, x)))
            det = jax.tree.map(np.asarray, fn(x))
            m, n = recall(det, golden, verbose=True)
            print(f"[{res}] {name}: {m}/{n}")


if __name__ == "__main__":
    main()

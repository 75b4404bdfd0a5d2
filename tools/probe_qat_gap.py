"""Round-4 probe: does QAT distillation on the golden set recover the lost
int8 detections across ALL int8 backends (jax per-layer, jax fused, native
C++ VNNI)?  CPU-only.

Candidate shipping recipe per resolution:
  act_scales = amax calibration on the full golden set
  qparams    = quantize_weights(qat_finetune(folded, scales, golden))

Prints recall per backend before/after QAT.
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

if not os.environ.get("YF_PROBE_TPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from yolofastest_tpu.configs import get_config
from yolofastest_tpu.export import save_native_weights
from yolofastest_tpu.models import fold_batchnorm, load_variables, zoo_path
from yolofastest_tpu.native import NativeEngine
from yolofastest_tpu.ops import batched_nms, decode_heads
from yolofastest_tpu.quant import calibrate, qat_finetune, quantize_weights
from yolofastest_tpu.quant.ptq import quantized_apply, quantized_apply_fused

FIXTURES = os.path.join(REPO, "tests", "fixtures")


def iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def recall_jax(det, golden):
    matched = 0
    for row in golden:
        b = int(row[0])
        matched += any(
            int(det["cls_idx"][b, i]) == int(row[7])
            and iou(det["boxes"][b, i], row[1:5]) > 0.5
            for i in range(int(det["count"][b]))
        )
    return matched


def recall_native(eng, imgs, golden):
    matched = 0
    for b in range(len(imgs)):
        rows = eng.detect(imgs[b])
        for w in golden[golden[:, 0] == b]:
            matched += any(int(r[6]) == int(w[7]) and iou(r[:4], w[1:5]) > 0.5
                           for r in rows)
    return matched


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
    for res in ("256x320", "512x640"):
        cfg = get_config(res)
        io = cfg.io
        fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
        imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
        golden = fx["boxes"]
        n = len(golden)
        folded = fold_batchnorm(load_variables(zoo_path(res)))
        scales = calibrate(folded, [imgs])

        def post(heads):
            b, c, s, ci, v = decode_heads(heads, io.anchors, io.input_hw,
                                          io.conf_thre, io.max_decode)
            return batched_nms(b, c, s, ci, v, iou_thre=io.nms_thre,
                               max_det=io.max_det)

        x = jnp.asarray(imgs)

        def eval_all(qp, tag):
            fn = jax.jit(lambda x: post(quantized_apply(qp, scales, x)))
            det = jax.tree.map(np.asarray, fn(x))
            r1 = recall_jax(det, golden)
            fnf = jax.jit(lambda x: post(quantized_apply_fused(qp, scales, x)))
            detf = jax.tree.map(np.asarray, fnf(x))
            r2 = recall_jax(detf, golden)
            yfb = f"/tmp/probe_{res}_{tag}.yfb"
            save_native_weights(qp, yfb, act_scales=scales)
            eng = NativeEngine(yfb, cfg)
            r3 = recall_native(eng, imgs, golden)
            print(f"[{res}] {tag}: jax-int8 {r1}/{n}, fused {r2}/{n}, "
                  f"native {r3}/{n}", flush=True)
            return min(r1, r2, r3)

        eval_all(quantize_weights(folded), "ptq-amax-full")

        # QAT distillation: batches of 4 golden images, frozen amax scales
        batches = [imgs[i:i + 4] for i in range(0, len(imgs), 4)]
        t0 = time.time()
        tuned, hist = qat_finetune(folded, scales, batches, arch="fastest",
                                   steps=steps, lr=lr)
        print(f"[{res}] QAT {steps} steps ({time.time()-t0:.0f}s): "
              f"loss {hist[0]:.4e} -> best {min(hist):.4e}", flush=True)
        eval_all(quantize_weights(tuned), f"qat{steps}")


if __name__ == "__main__":
    main()

"""Round-4: search the int8 deployment recipe per resolution (VERDICT item 1).

Goal: ONE (weights, act_scales) pair per resolution whose golden recall
matches fp on ALL three int8 backends — jax per-layer, jax fused
(end-to-end int8 activations), native C++ VNNI.

Phase 1 greedily evaluates calibration variants with plain PTQ weights;
phase 2 adds QAT refinement at several step counts on the best scale sets.
Prints one grid line per combo: ``[res] <tag>: jax a/n fused b/n native c/n``.

Run on TPU (detached):  nohup python -u tools/search_int8_recipe.py > LOG &
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
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
    ua = (a[2]-a[0])*(a[3]-a[1]) + (b[2]-b[0])*(b[3]-b[1]) - inter
    return inter / max(ua, 1e-9)


def main():
    for res in ("256x320", "512x640"):
        cfg = get_config(res)
        io = cfg.io
        fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
        imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
        golden = fx["boxes"]
        n = len(golden)
        folded = fold_batchnorm(load_variables(zoo_path(res)))
        x = jnp.asarray(imgs)

        def post(heads):
            b, c, s, ci, v = decode_heads(heads, io.anchors, io.input_hw,
                                          io.conf_thre, io.max_decode)
            return batched_nms(b, c, s, ci, v, iou_thre=io.nms_thre,
                               max_det=io.max_det)

        def recall_jax(det):
            m = 0
            for row in golden:
                b = int(row[0])
                m += any(int(det["cls_idx"][b, i]) == int(row[7])
                         and iou(det["boxes"][b, i], row[1:5]) > 0.5
                         for i in range(int(det["count"][b])))
            return m

        def recall_native(weights_tree, scales):
            yfb = f"/tmp/search_{res}.yfb"
            save_native_weights(quantize_weights(weights_tree), yfb,
                                act_scales=scales)
            eng = NativeEngine(yfb, cfg)
            m = 0
            for b in range(len(imgs)):
                rows = eng.detect(imgs[b])
                for w in golden[golden[:, 0] == b]:
                    m += any(int(r[6]) == int(w[7]) and iou(r[:4], w[1:5]) > 0.5
                             for r in rows)
            return m

        def eval_combo(tag, weights_tree, scales):
            qp = jax.tree.map(jnp.asarray, quantize_weights(weights_tree))
            d1 = jax.tree.map(np.asarray, jax.jit(
                lambda x: post(quantized_apply(qp, scales, x)))(x))
            d2 = jax.tree.map(np.asarray, jax.jit(
                lambda x: post(quantized_apply_fused(qp, scales, x)))(x))
            r1, r2 = recall_jax(d1), recall_jax(d2)
            r3 = recall_native(weights_tree, scales)
            print(f"[{res}] {tag}: jax {r1}/{n} fused {r2}/{n} native {r3}/{n}",
                  flush=True)
            return min(r1, r2, r3)

        scale_sets = {
            "amax8": calibrate(folded, [imgs[:8]]),
            "amax16": calibrate(folded, [imgs[:16]]),
            "amaxF": calibrate(folded, [imgs]),
            "mseF": calibrate(folded, [imgs], method="mse"),
        }
        best = []
        for sname, scales in scale_sets.items():
            score = eval_combo(f"ptq-{sname}", folded, scales)
            best.append((score, sname))
            if score == n:
                print(f"[{res}] FULL RECALL with ptq-{sname}", flush=True)
        best.sort(reverse=True)
        if best[0][0] < n:
            # phase 2: QAT on the two best scale sets
            batches = [imgs[i:i + 4] for i in range(0, len(imgs), 4)]
            for _, sname in best[:2]:
                scales = scale_sets[sname]
                for steps in (100, 300, 600):
                    tuned, hist = qat_finetune(folded, scales, batches,
                                               arch="fastest", steps=steps,
                                               lr=5e-5)
                    score = eval_combo(f"qat{steps}-{sname}", tuned, scales)
                    if score == n:
                        print(f"[{res}] FULL RECALL with qat{steps}-{sname}",
                              flush=True)
                        break
                if score == n:
                    break


if __name__ == "__main__":
    main()

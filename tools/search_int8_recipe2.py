"""Round-4, generation 2: recall-selected QAT for the int8 zoo artifact.

Generation 1 (``search_int8_recipe.py``) showed no PTQ calibrator reaches
full golden recall on all three int8 backends simultaneously, and
loss-selected QAT is noisy.  This searcher selects directly on the
deployment metric: QAT runs with periodic parameter snapshots
(``qat_finetune(..., snapshot_every=K)``, optionally conf-weighted
distillation) and EVERY snapshot is scored on all three backends — jax
per-layer, jax fused, native VNNI; the first snapshot whose minimum recall
equals fp recall is shipped via ``save_int8_zoo``.

The jax evaluators take qparams as jit ARGUMENTS, so the whole snapshot
sweep costs two compiles total.

Usage (TPU, detached):
  python -u tools/search_int8_recipe2.py --res 256x320 --scales mseF \
      --steps 800 --snap 40 --conf-weight 4
"""

import argparse
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
from yolofastest_tpu.quant import (calibrate, qat_finetune, quantize_weights,
                                   save_int8_zoo)
from yolofastest_tpu.quant.ptq import quantized_apply, quantized_apply_fused

FIXTURES = os.path.join(REPO, "tests", "fixtures")


def iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2]-a[0])*(a[3]-a[1]) + (b[2]-b[0])*(b[3]-b[1]) - inter
    return inter / max(ua, 1e-9)


def make_scales(folded, imgs, name):
    """'amax<K>' / 'mse<K>' / 'pct<K>' with K = image count ('F' = all)."""
    import re

    m = re.fullmatch(r"(amax|mse|pct)(\d+|F)", name)
    if not m:
        raise SystemExit(f"unknown scale set {name}")
    method = {"amax": "amax", "mse": "mse", "pct": "percentile"}[m.group(1)]
    cal = imgs if m.group(2) == "F" else imgs[:int(m.group(2))]
    return calibrate(folded, [cal], method=method)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", required=True)
    ap.add_argument("--scales", default="mseF")
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--snap", type=int, default=40)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--conf-weight", type=float, default=4.0)
    ap.add_argument("--weights", default=None,
                    help="checkpoint .npz (default: the stock zoo for --res;"
                         " pass the pruned checkpoint to build its artifact)")
    ap.add_argument("--out", default=None,
                    help="artifact path for --ship (default "
                         "weights/yolofastest_int8_<res>.npz)")
    ap.add_argument("--target", type=int, default=0,
                    help="recall target (default: all golden detections)")
    ap.add_argument("--ship", action="store_true",
                    help="write the int8 zoo artifact on a full-recall "
                         "snapshot")
    args = ap.parse_args()

    res = args.res
    cfg = get_config(res)
    io = cfg.io
    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
    golden = fx["boxes"]
    n = len(golden)
    target = args.target or n
    folded = fold_batchnorm(load_variables(args.weights or zoo_path(res)))
    scales = make_scales(folded, imgs, args.scales)
    x = jnp.asarray(imgs)

    def post(heads):
        b, c, s, ci, v = decode_heads(heads, io.anchors, io.input_hw,
                                      io.conf_thre, io.max_decode)
        return batched_nms(b, c, s, ci, v, iou_thre=io.nms_thre,
                           max_det=io.max_det)

    jax_fn = jax.jit(lambda qp, x: post(quantized_apply(qp, scales, x)))
    fused_fn = jax.jit(lambda qp, x: post(quantized_apply_fused(qp, scales, x)))

    def recall_jax(det):
        m = 0
        for row in golden:
            b = int(row[0])
            m += any(int(det["cls_idx"][b, i]) == int(row[7])
                     and iou(det["boxes"][b, i], row[1:5]) > 0.5
                     for i in range(int(det["count"][b])))
        return m

    def score(tree, tag):
        qp = quantize_weights(tree)
        qpj = jax.tree.map(jnp.asarray, qp)
        r1 = recall_jax(jax.tree.map(np.asarray, jax_fn(qpj, x)))
        r2 = recall_jax(jax.tree.map(np.asarray, fused_fn(qpj, x)))
        yfb = f"/tmp/search2_{res}.yfb"
        save_native_weights(qp, yfb, act_scales=scales)
        eng = NativeEngine(yfb, cfg)
        r3 = 0
        for b in range(len(imgs)):
            rows = eng.detect(imgs[b])
            for w in golden[golden[:, 0] == b]:
                r3 += any(int(r[6]) == int(w[7]) and iou(r[:4], w[1:5]) > 0.5
                          for r in rows)
        print(f"[{res}] {tag}: jax {r1}/{n} fused {r2}/{n} native {r3}/{n}",
              flush=True)
        return min(r1, r2, r3)

    score(folded, f"ptq-{args.scales}")
    batches = [imgs[i:i + 4] for i in range(0, len(imgs), 4)]
    best_pt, hist, snaps = qat_finetune(
        folded, scales, batches, arch="fastest", steps=args.steps,
        lr=args.lr, conf_weight=args.conf_weight, snapshot_every=args.snap)
    print(f"[{res}] QAT loss {hist[0]:.3e} -> min {min(hist):.3e}", flush=True)
    candidates = [("best-loss", best_pt)] + [
        (f"step{(i + 1) * args.snap}", s) for i, s in enumerate(snaps)]
    for tag, tree in candidates:
        s = score(tree, f"qat-{args.scales}-cw{args.conf_weight}-{tag}")
        if s >= target:
            print(f"[{res}] TARGET RECALL ({target}/{n}) at {tag}", flush=True)
            if args.ship:
                out = args.out or os.path.join(
                    REPO, "weights", f"yolofastest_int8_{res}.npz")
                save_int8_zoo(jax.device_get(tree), scales, out)
                print("shipped", out, flush=True)
            return
    print(f"[{res}] no snapshot reached {target}/{n}", flush=True)


if __name__ == "__main__":
    main()

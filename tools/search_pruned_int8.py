"""Hybrid-int8 recipe search for the PRUNED checkpoint (round-5 VERDICT 3).

Round-4 finding: no pure-int8 calibration or recall-selected QAT reaches
full golden recall on all three int8 backends for the pruned-0.4 model
(best joint 33/33/34) — a 20%-pruned net has less redundancy to absorb
grid snapping.  This tool searches the HYBRID (keep-fp) space instead:

  for each calibration scale set:
    rank layers by int8 damage (layer_sensitivity at those scales)
    greedily keep the worst layers in fp, scoring JOINT recall on
      * jax per-layer mixed      (quantized_apply_flagged — one compile)
      * jax fused mixed          (quantized_apply_fused_flagged — one compile)
      * native VNNI hybrid       (mixed_native_tree -> NativeEngine)
    stop at the first set with full recall on all three

Scoring mirrors tools/run_golden_suite.py's rows exactly (same decode/NMS
params, same golden matching), so a shipped config's suite row is
guaranteed.  ``--ship`` writes the artifact
(``weights/yolofastest_int8_pruned040_256x320.npz``) with the winning
``keep_fp`` set embedded — every deployment surface reads it from there.

Usage:
  python tools/search_pruned_int8.py [--res 256x320] [--weights PATH]
      [--scale-sets amax8,mse12,...] [--max-keep 8] [--ship] [--out PATH]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

FIXTURES = os.path.join(REPO, "tests", "fixtures")


def iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2]-a[0])*(a[3]-a[1]) + (b[2]-b[0])*(b[3]-b[1]) - inter
    return inter / max(ua, 1e-9)


def recall(det, golden):
    matched = 0
    for row in golden:
        b = int(row[0])
        matched += any(
            int(det["cls_idx"][b, i]) == int(row[7])
            and iou(det["boxes"][b, i], row[1:5]) > 0.5
            for i in range(int(det["count"][b])))
    return matched


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="256x320")
    ap.add_argument("--weights", default=None,
                    help="checkpoint .npz (default: the pruned040 zoo)")
    ap.add_argument("--scale-sets", default="mse12,amax8,amax12,amax16,"
                    "amaxF,mse8,mse16,mseF,pct12,pctF")
    ap.add_argument("--max-keep", type=int, default=8)
    ap.add_argument("--scan-width", type=int, default=20,
                    help="sensitivity-ranked candidates scored per greedy "
                         "step")
    ap.add_argument("--ship", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.models import fold_batchnorm, load_variables
    from yolofastest_tpu.native import NativeEngine
    from yolofastest_tpu.export import save_native_weights
    from yolofastest_tpu.ops import batched_nms, decode_heads
    from yolofastest_tpu.quant import (calibrate, mixed_native_tree,
                                       quantize_weights, save_int8_zoo)
    from yolofastest_tpu.quant.sensitivity import (
        layer_sensitivity, quantized_apply_flagged,
        quantized_apply_fused_flagged)

    res = args.res
    cfg = get_config(res)
    io = cfg.io
    weights = args.weights or os.path.join(
        REPO, "weights", f"yolofastest_pruned040_{res}.npz")
    folded = fold_batchnorm(load_variables(weights))
    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
    golden = fx["boxes"]
    n_gold = len(golden)
    x = jnp.asarray(imgs)
    qparams = jax.tree.map(jnp.asarray, quantize_weights(folded))
    names = sorted(qparams)
    folded_dev = jax.tree.map(jnp.asarray, folded)

    def post(heads):
        b, c, s, ci, v = decode_heads(heads, io.anchors, io.input_hw,
                                      io.conf_thre, io.max_decode)
        return batched_nms(b, c, s, ci, v, iou_thre=io.nms_thre,
                           max_det=io.max_det)

    def make_scales(spec):
        import re

        m = re.fullmatch(r"(amax|mse|pct)(\d+|F)", spec)
        if not m:
            raise SystemExit(f"bad scale set {spec}")
        method = {"amax": "amax", "mse": "mse", "pct": "percentile"}[m.group(1)]
        cal = imgs if m.group(2) == "F" else imgs[:int(m.group(2))]
        return calibrate(folded, [cal], method=method)

    best = None  # (n_keep, spec, keep_set, recalls)
    for spec in args.scale_sets.split(","):
        scales = make_scales(spec)

        @jax.jit
        def run_pl(flagvec, x):
            flags = {n: flagvec[i] for i, n in enumerate(names)}
            return post(quantized_apply_flagged(qparams, folded_dev, scales,
                                                x, flags))

        @jax.jit
        def run_fused(flagvec, x):
            flags = {n: flagvec[i] for i, n in enumerate(names)}
            return post(quantized_apply_fused_flagged(qparams, folded_dev,
                                                      scales, x, flags))

        def flags_for(keep):
            return jnp.asarray([n not in keep for n in names])

        def score_jax(keep):
            fv = flags_for(keep)
            r_pl = recall(jax.tree.map(np.asarray, run_pl(fv, x)), golden)
            r_fu = recall(jax.tree.map(np.asarray, run_fused(fv, x)),
                          golden)
            return r_pl, r_fu

        def misses(keep):
            """Golden rows missed by EITHER jax backend with this keep set
            (a keep-fp addition can fix one backend while breaking the
            other — both must drive the scan)."""
            fv = flags_for(keep)
            out = []
            for run in (run_pl, run_fused):
                det = jax.tree.map(np.asarray, run(fv, x))
                for row in golden:
                    b = int(row[0])
                    ok = any(
                        int(det["cls_idx"][b, i]) == int(row[7])
                        and iou(det["boxes"][b, i], row[1:5]) > 0.5
                        for i in range(int(det["count"][b])))
                    if not ok:
                        out.append(row)
            return out

        def score_native(keep):
            tree, nscales = mixed_native_tree(folded, scales, tuple(keep))
            with tempfile.TemporaryDirectory() as td:
                yfb = os.path.join(td, "m.yfb")
                save_native_weights(tree, yfb, act_scales=nscales,
                                    io_config=io)
                eng = NativeEngine(yfb, cfg)
                m = 0
                for b in range(len(imgs)):
                    rows = eng.detect(imgs[b])
                    for w in golden[golden[:, 0] == b]:
                        m += any(int(r[6]) == int(w[7])
                                 and iou(r[:4], w[1:5]) > 0.5 for r in rows)
                return m

        # RECALL-driven greedy: sensitivity rank proposes candidates, the
        # joint jax recall picks which one actually joins the keep set
        # (sensitivity-order greedy measured non-monotone — a
        # high-logit-damage layer is not necessarily the one losing the
        # missed detection).
        rank = [r["layer"] for r in layer_sensitivity(
            folded, [imgs], act_scales=scales)]
        keep = []
        for step in range(args.max_keep + 1):
            r_pl, r_fu = score_jax(keep)
            r_na = score_native(keep) if (r_pl == n_gold and r_fu == n_gold) \
                else -1
            print(f"[{spec}] keep={len(keep)} {keep}: "
                  f"pl {r_pl}/{n_gold} fused {r_fu}/{n_gold} "
                  f"native {r_na if r_na >= 0 else 'skipped'}/{n_gold}",
                  flush=True)
            if r_pl == n_gold and r_fu == n_gold and r_na == n_gold:
                if best is None or len(keep) < best[0]:
                    best = (len(keep), spec, tuple(keep), (r_pl, r_fu, r_na))
                break
            if step == args.max_keep:
                break
            # Cheap candidate scan: score each candidate ONLY on the images
            # holding currently-missed golden rows (subset batch — one
            # extra compile per subset size, forwards len(sub)/len(imgs)
            # the cost), then verify the best on the full set.
            missed = misses(keep)
            sub_imgs = sorted({int(r[0]) for r in missed})
            if not sub_imgs:  # pl full but fused short: fall back to full
                sub_imgs = list(range(len(imgs)))
            x_sub = jnp.asarray(imgs[sub_imgs])
            remap = {b: i for i, b in enumerate(sub_imgs)}
            gold_sub = np.array([[remap[int(r[0])], *r[1:]] for r in golden
                                 if int(r[0]) in remap])
            cands = [c for c in rank if c not in keep][:args.scan_width]
            scored = []
            for c in cands:
                fv = flags_for(keep + [c])
                r1 = recall(jax.tree.map(np.asarray, run_pl(fv, x_sub)),
                            gold_sub)
                r2 = recall(jax.tree.map(np.asarray, run_fused(fv, x_sub)),
                            gold_sub)
                scored.append((r1 + r2, c))
            scored.sort(key=lambda t: -t[0])
            print(f"[{spec}]   scan (imgs {sub_imgs}): "
                  + ", ".join(f"{c}={r}/{2*len(gold_sub)}"
                              for r, c in scored[:6]), flush=True)
            # verify the most-recovering candidates on the full set
            prev = r_pl + r_fu
            chosen = None
            for _, c in scored[:5]:
                s_pl, s_fu = score_jax(keep + [c])
                if s_pl + s_fu > prev:
                    chosen, prev = c, s_pl + s_fu
                    if s_pl == n_gold and s_fu == n_gold:
                        break
            if chosen is None:
                print(f"[{spec}] no scanned addition improves joint recall; "
                      f"stopping", flush=True)
                break
            keep.append(chosen)
        if best is not None and best[0] <= 1:
            break  # cannot do better than keeping <= 1 layer

    if best is None:
        print("NO full-recall hybrid found within the search budget")
        return 1
    n_keep, spec, keep, recalls = best
    print(f"WINNER: scales={spec} keep_fp={list(keep)} "
          f"({n_keep} fp layers) recalls={recalls}")
    if args.ship:
        out = args.out or os.path.join(
            REPO, "weights", f"yolofastest_int8_pruned040_{res}.npz")
        save_int8_zoo(jax.device_get(folded), make_scales(spec), out,
                      keep_fp=keep)
        print("shipped", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Golden benchmark suite: every backend x both resolutions over the bundled
test set, reference-format timing logs + a parity/accuracy table.

The capability analogue of the reference's committed ``test_result/`` matrix
(2 resolutions x {PC-python, ncnn-C++, rknn-NPU}; SURVEY.md §4), as one
automated runner with numeric parity checks instead of eyeballed JPEGs.

Backends: jax-fp32, jax-bf16, int8 (per-layer), int8-fused (end-to-end int8
activations), native-C++.  Parity metric: fraction of the fp32 golden
detections (committed fixtures) recovered at IOU>0.5 with matching class.

Usage: python tools/run_golden_suite.py [--data DIR] [--out DIR]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURES = os.path.join(REPO, "tests", "fixtures")


def iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def recall_vs_golden(det, golden):
    matched = 0
    for row in golden:
        b = int(row[0])
        ok = any(
            int(det["cls_idx"][b, i]) == int(row[7])
            and iou(det["boxes"][b, i], row[1:5]) > 0.5
            for i in range(int(det["count"][b]))
        )
        matched += ok
    return matched, len(golden)


def run_resolution(res, out_dir):
    import jax
    import jax.numpy as jnp

    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.models import (
        YoloFastest, fold_batchnorm, load_variables, zoo_path,
    )
    from yolofastest_tpu.ops import batched_nms, decode_heads
    from yolofastest_tpu.quant import calibrate, quantize_weights, quantized_apply
    from yolofastest_tpu.quant.ptq import quantized_apply_fused

    cfg = get_config(res)
    io = cfg.io
    fx = np.load(os.path.join(FIXTURES, f"golden_{res}.npz"))
    imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
    golden = fx["boxes"]

    variables = jax.tree.map(jnp.asarray, load_variables(zoo_path(res)))
    folded = fold_batchnorm(jax.device_get(variables))

    # int8 rows deploy the SHIPPED int8 zoo artifact when present (refined
    # folded weights + frozen activation scales — ONE deployment config for
    # jax per-layer, jax fused AND native VNNI; tools/make_int8_zoo.py /
    # search_int8_recipe*.py), falling back to on-the-fly amax PTQ.
    from yolofastest_tpu.quant import load_int8_zoo

    zoo8 = load_int8_zoo(res)
    keep_fp8 = ()
    if zoo8 is not None:
        int8_folded, scales, keep_fp8 = zoo8
        int8_src = f"weights/yolofastest_int8_{res}.npz"
    else:
        int8_folded = folded
        scales = calibrate(folded, [imgs[:8]])
        int8_src = "on-the-fly amax-8 PTQ"
    qparams = jax.tree.map(jnp.asarray, quantize_weights(int8_folded))

    fp8_sub = jax.tree.map(jnp.asarray,
                           {k: int8_folded[k] for k in keep_fp8})

    def _apply_int8(x, fused):
        if keep_fp8:
            from yolofastest_tpu.quant.sensitivity import (
                quantized_apply_fused_mixed, quantized_apply_mixed)

            fn = quantized_apply_fused_mixed if fused else quantized_apply_mixed
            return fn(qparams, fp8_sub, scales, x, fp_layers=keep_fp8)
        fn = quantized_apply_fused if fused else quantized_apply
        return fn(qparams, scales, x)

    def post(heads):
        b, c, s, ci, v = decode_heads(heads, io.anchors, io.input_hw,
                                      io.conf_thre, io.max_decode)
        return batched_nms(b, c, s, ci, v, iou_thre=io.nms_thre,
                           max_det=io.max_det)

    def make_jax(dtype):
        model = YoloFastest(num_cls=io.num_cls, num_anchors=io.num_anchors,
                            compute_dtype=dtype)

        @jax.jit
        def fn(x):
            return post(model.apply(variables, x, train=False))
        return fn

    backends = {
        "jax-fp32": make_jax(jnp.float32),
        "jax-bf16": make_jax(jnp.bfloat16),
        # artifacts may carry a hybrid keep-fp set (pruned checkpoints);
        # all rows deploy it so recall numbers describe ONE config
        "int8": jax.jit(lambda x: post(_apply_int8(x, fused=False))),
        "int8-fused": jax.jit(lambda x: post(_apply_int8(x, fused=True))),
    }

    # eval-grade pruned checkpoint (docs/train_demo_prune040): same pipeline,
    # 20.6% fewer params — the compression row of the table
    pruned_path = os.path.join(REPO, "weights",
                               f"yolofastest_pruned040_{res}.npz")
    if os.path.exists(pruned_path):
        from yolofastest_tpu.models.graph import folded_apply

        folded_p = jax.tree.map(
            jnp.asarray, fold_batchnorm(load_variables(pruned_path)))
        # weights as jit ARGUMENTS, matching bench.py's measurement path:
        # closed-over weights get constant-folded with different bf16
        # rounding than the runtime f32->bf16 convert and flip one
        # borderline detection (measured round 4)
        fn_p = jax.jit(lambda f, x: post(folded_apply(f, x, jnp.bfloat16)))
        backends["pruned040-bf16"] = lambda x: fn_p(folded_p, x)

        # pruned int8: the shipped hybrid artifact (mse-12 scales +
        # keep-fp, round-5 search — pure int8 measured 33/33/34 at best)
        zoo8p = load_int8_zoo(os.path.join(
            REPO, "weights", f"yolofastest_int8_pruned040_{res}.npz"))
        if zoo8p is not None:
            from yolofastest_tpu.quant.sensitivity import (
                quantized_apply_fused_mixed, quantized_apply_mixed)

            folded_8p, scales_8p, keep_8p = zoo8p
            qp_p = jax.tree.map(jnp.asarray, quantize_weights(folded_8p))
            fp_p = jax.tree.map(jnp.asarray,
                                {k: folded_8p[k] for k in keep_8p})
            backends["pruned040-int8"] = jax.jit(
                lambda x: post(quantized_apply_mixed(
                    qp_p, fp_p, scales_8p, x, fp_layers=keep_8p)))
            backends["pruned040-int8-fused"] = jax.jit(
                lambda x: post(quantized_apply_fused_mixed(
                    qp_p, fp_p, scales_8p, x, fp_layers=keep_8p)))

    results = {}
    x = jnp.asarray(imgs)
    for name, fn in backends.items():
        det = jax.tree.map(np.asarray, fn(x))  # warm
        best = float("inf")
        for _ in range(3):  # best-of-3: immune to transient host load
            t0 = time.perf_counter()
            det = jax.tree.map(np.asarray, fn(x))
            best = min(best, time.perf_counter() - t0)
        dt = best * 1e3 / len(imgs)
        m, n = recall_vs_golden(det, golden)
        results[name] = {
            "recall": f"{m}/{n}",
            "detection_rate": round(m / n, 4),
            "ms_per_img_batched": round(dt, 3),
        }
        print(f"[{res}] {name}: recall {m}/{n}, {dt:.2f} ms/img (batch-20)")

    # native C++ engine
    lib = os.path.join(REPO, "cpp", "build", "libyf.so")
    if os.path.exists(lib):
        from yolofastest_tpu.export import save_native_weights
        from yolofastest_tpu.native import NativeEngine

        yfb = os.path.join(out_dir, f"model_{res}.yfb")
        save_native_weights(folded, yfb, io_config=cfg.io)
        eng = NativeEngine(yfb, cfg)
        matched = 0
        best_total = float("inf")
        for rep in range(3):  # best-of-3 passes over the set
            total_ms = 0.0
            for b in range(len(imgs)):
                t0 = time.perf_counter()
                rows = eng.detect(imgs[b])
                total_ms += (time.perf_counter() - t0) * 1e3
                if rep == 0:
                    want = golden[golden[:, 0] == b]
                    for w in want:
                        matched += any(
                            int(r[6]) == int(w[7]) and iou(r[:4], w[1:5]) > 0.5
                            for r in rows
                        )
            best_total = min(best_total, total_ms)
        results["native-cpp"] = {
            "recall": f"{matched}/{len(golden)}",
            "detection_rate": round(matched / len(golden), 4),
            "ms_per_img": round(best_total / len(imgs), 2),
        }
        print(f"[{res}] native-cpp: recall {matched}/{len(golden)}, "
              f"{best_total/len(imgs):.2f} ms/img (single-image)")

        # native C++ engine, int8 arithmetic (VNNI dpbusd on the 1x1 convs):
        # the same shipped artifact/scales as the jax int8 rows above
        yfb8 = os.path.join(out_dir, f"model_{res}_int8.yfb")
        from yolofastest_tpu.quant import mixed_native_tree

        native_scales = (scales if zoo8 is not None
                         else calibrate(folded, [imgs]))
        ntree, nscales = mixed_native_tree(int8_folded, native_scales,
                                           keep_fp8)
        save_native_weights(ntree, yfb8, act_scales=nscales,
                            io_config=cfg.io)
        eng8 = NativeEngine(yfb8, cfg)
        matched8 = 0
        best_total8 = float("inf")
        for rep in range(3):
            total_ms = 0.0
            for b in range(len(imgs)):
                t0 = time.perf_counter()
                rows = eng8.detect(imgs[b])
                total_ms += (time.perf_counter() - t0) * 1e3
                if rep == 0:
                    for w in golden[golden[:, 0] == b]:
                        matched8 += any(
                            int(r[6]) == int(w[7]) and iou(r[:4], w[1:5]) > 0.5
                            for r in rows
                        )
            best_total8 = min(best_total8, total_ms)
        results["native-cpp-int8"] = {
            "recall": f"{matched8}/{len(golden)}",
            "detection_rate": round(matched8 / len(golden), 4),
            "ms_per_img": round(best_total8 / len(imgs), 2),
            "int8_layers": eng8.int8_layers,
            "int8_source": int8_src,
        }
        print(f"[{res}] native-cpp-int8: recall {matched8}/{len(golden)}, "
              f"{best_total8/len(imgs):.2f} ms/img (single-image)")

        # pruned hybrid int8 through the native engine (same artifact as
        # the jax pruned040-int8 rows) — the last deployment-matrix cell
        zoo8p = load_int8_zoo(os.path.join(
            REPO, "weights", f"yolofastest_int8_pruned040_{res}.npz"))
        if zoo8p is not None:
            folded_8p, scales_8p, keep_8p = zoo8p
            yfb8p = os.path.join(out_dir, f"model_{res}_pruned_int8.yfb")
            ptree, pscales = mixed_native_tree(folded_8p, scales_8p, keep_8p)
            save_native_weights(ptree, yfb8p, act_scales=pscales,
                                io_config=cfg.io)
            eng8p = NativeEngine(yfb8p, cfg)
            matched8p = 0
            best_total8p = float("inf")
            for rep in range(3):
                total_ms = 0.0
                for b in range(len(imgs)):
                    t0 = time.perf_counter()
                    rows = eng8p.detect(imgs[b])
                    total_ms += (time.perf_counter() - t0) * 1e3
                    if rep == 0:
                        for w in golden[golden[:, 0] == b]:
                            matched8p += any(
                                int(r[6]) == int(w[7])
                                and iou(r[:4], w[1:5]) > 0.5 for r in rows)
                best_total8p = min(best_total8p, total_ms)
            results["pruned040-native-int8"] = {
                "recall": f"{matched8p}/{len(golden)}",
                "detection_rate": round(matched8p / len(golden), 4),
                "ms_per_img": round(best_total8p / len(imgs), 2),
                "int8_layers": eng8p.int8_layers,
                "keep_fp": list(keep_8p),
            }
            print(f"[{res}] pruned040-native-int8: recall "
                  f"{matched8p}/{len(golden)}, "
                  f"{best_total8p/len(imgs):.2f} ms/img (single-image)")
    return results


def _methodology():
    """Record HOW the numbers were taken, so future readers can reconcile
    (round-1 committed numbers were taken under CPU contention and
    understated the native engine ~2.5x)."""
    import datetime
    import multiprocessing
    import platform

    import jax

    dev = jax.devices()[0]
    try:
        load = os.getloadavg()
    except OSError:
        load = None
    return {
        "timestamp_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "host": platform.platform(),
        "host_cpus": multiprocessing.cpu_count(),
        "loadavg_at_start": load,
        "jax_device": f"{dev.platform} {getattr(dev, 'device_kind', '?')}",
        "timing": "best-of-3 passes, warm compile, perf_counter around "
                  "dispatch + full D2H fetch; native engine timed "
                  "single-image sequential (OpenMP threads = host cpus)",
        "detection_rate": "fraction of the committed reference-PC golden "
                          "detections reproduced at IOU>0.5 with same class "
                          "(the reference README's 检出率 analogue, vs the "
                          "reference detector as pseudo-GT)",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="golden_suite_results")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    table = {"methodology": _methodology()}
    for res in ("256x320", "512x640"):
        table[res] = run_resolution(res, args.out)
    path = os.path.join(args.out, "summary.json")
    with open(path, "w") as f:
        json.dump(table, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()

"""Headline benchmark: batched streaming detect throughput at 320x256.

Runs the full on-device pipeline — normalize -> backbone (bf16) -> decode ->
class-aware NMS — on device-resident uint8 gray frames, the streaming
scenario from BASELINE.json ("batched streaming inference ... all stay
on-chip with zero host round-trips").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

vs_baseline is measured against the reference's best end-to-end 320x256
number: RKNN NPU total 43.56 ms/img => 22.96 img/s
(`/root/reference/test_result/256x320/npu_test_result/npu-test.log:75`,
BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC = 1000.0 / 43.56  # reference best 320x256 (NPU total)


def main():
    import jax
    import jax.numpy as jnp

    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.models import YoloFastest, load_torch_checkpoint
    from yolofastest_tpu.ops import batched_nms, decode_heads, normalize

    cfg = get_config("256x320")
    io = cfg.io
    model = YoloFastest(num_cls=io.num_cls, num_anchors=io.num_anchors,
                        compute_dtype=jnp.bfloat16)

    ckpt = "/root/reference/models/pytorch/256x320/YOLO-Fastest_epoch_28.pth"
    if os.path.exists(ckpt):
        variables = jax.tree.map(jnp.asarray, load_torch_checkpoint(ckpt))
    else:  # perf identical with random weights
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, *io.input_hw, 1), jnp.float32),
                               train=False)

    # Deployment graph: BN folded into the convs (models/graph.py) — the
    # analogue of the reference's converted ncnn/rknn networks.
    from yolofastest_tpu.models import fold_batchnorm, folded_apply

    folded = jax.tree.map(jnp.asarray, fold_batchnorm(jax.device_get(variables)))

    @jax.jit
    def pipeline(folded, frames):
        imgs = normalize(frames, jnp.bfloat16)[..., None]
        heads = folded_apply(folded, imgs, jnp.bfloat16)
        boxes, conf, cls_score, cls_idx, valid = decode_heads(
            heads, io.anchors, io.input_hw, io.conf_thre, io.max_decode
        )
        return batched_nms(boxes, conf, cls_score, cls_idx, valid,
                           iou_thre=io.nms_thre, max_det=io.max_det)
    variables = folded

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    rng = np.random.default_rng(0)

    def fetch(out):
        # TRUE device sync: block_until_ready over the axon tunnel returns
        # early; only a real device->host fetch observes completion.
        return np.asarray(out["count"])[0]

    best = 0.0
    for batch in (256, 512, 1024):
        frames = jax.device_put(
            jnp.asarray(rng.integers(0, 256, (batch, *io.input_hw), np.uint8))
        )
        fetch(pipeline(variables, frames))  # compile + warmup
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = pipeline(variables, frames)
        fetch(out)
        dt = (time.perf_counter() - t0) / reps
        ips = batch / dt
        print(f"batch {batch}: {dt*1e3:.2f} ms/iter -> {ips:,.0f} img/s",
              file=sys.stderr)
        best = max(best, ips)

    # Secondary: the 640x512 resolution (reference's other headline config).
    cfg512 = get_config("512x640")
    model512 = YoloFastest(num_cls=3, num_anchors=3, compute_dtype=jnp.bfloat16)
    ckpt512 = "/root/reference/models/pytorch/512x640/YOLO-Fastest_epoch_27.pth"
    if os.path.exists(ckpt512):
        variables512 = load_torch_checkpoint(ckpt512)
    else:
        variables512 = jax.device_get(model512.init(
            jax.random.PRNGKey(0), jnp.zeros((1, *cfg512.io.input_hw, 1), jnp.float32),
            train=False))
    folded512 = jax.tree.map(jnp.asarray, fold_batchnorm(variables512))

    @jax.jit
    def pipeline512(folded, frames):
        io5 = cfg512.io
        imgs = normalize(frames, jnp.bfloat16)[..., None]
        heads = folded_apply(folded, imgs, jnp.bfloat16)
        boxes, conf, cls_score, cls_idx, valid = decode_heads(
            heads, io5.anchors, io5.input_hw, io5.conf_thre, io5.max_decode
        )
        return batched_nms(boxes, conf, cls_score, cls_idx, valid,
                           iou_thre=io5.nms_thre, max_det=io5.max_det)
    variables512 = folded512

    frames512 = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (256, *cfg512.io.input_hw), np.uint8))
    )
    fetch(pipeline512(variables512, frames512))
    t0 = time.perf_counter()
    for _ in range(20):
        out = pipeline512(variables512, frames512)
    fetch(out)
    dt = (time.perf_counter() - t0) / 20
    print(f"512x640 batch 256: {dt*1e3:.2f} ms/iter -> {256/dt:,.0f} img/s "
          f"(reference best: 7.4 img/s)", file=sys.stderr)

    print(json.dumps({
        "metric": "detect_throughput_256x320_bf16_streaming",
        "value": round(best, 1),
        "unit": "img/s",
        "vs_baseline": round(best / BASELINE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()

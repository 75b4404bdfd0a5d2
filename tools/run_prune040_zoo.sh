#!/bin/bash
# Round-4: build the eval-grade pruned zoo artifact (VERDICT item 6).
#
# prune 0.4 of the 256x320 zoo checkpoint -> 60-epoch TPU fine-tune on the
# pseudo-GT set (tools/make_finetune_set.py) with EMA -> extract deployable
# variables -> weights/yolofastest_pruned040_256x320.npz.
#
# Run DETACHED with no timeout wrapper (CLAUDE.md TPU discipline):
#   nohup bash tools/run_prune040_zoo.sh > /tmp/prune040_run.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

echo "=== TPU probe ==="
python - <<'EOF'
import jax, jax.numpy as jnp
d = jax.devices()
print("devices:", d)
print("probe sum:", float(jnp.ones((8,)).sum()))
EOF

echo "=== pseudo-GT fine-tune set ==="
python tools/make_finetune_set.py --out /tmp/ft040 --copies 16

echo "=== prune 0.4 ==="
python -m yolofastest_tpu prune --config 256x320 \
  --weights weights/yolofastest_256x320.npz --ratio 0.4 --out /tmp/pruned040.npz

echo "=== fine-tune (60 epochs, EMA) ==="
rm -rf /tmp/ck040 /tmp/prune040_logs
python -m yolofastest_tpu train --config 256x320 \
  --train-dir /tmp/ft040/train --val-dir /tmp/ft040/val \
  --pretrained /tmp/pruned040.npz --epochs 60 --batch-size 16 \
  --warmup-min-iters 60 --ema --checkpoint-dir /tmp/ck040 \
  --log-dir /tmp/prune040_logs --max-to-keep 3

echo "=== extract deployable variables (EMA) ==="
python - <<'EOF'
import os, re, jax
import numpy as np
from yolofastest_tpu.train.trainer import checkpoint_variables
from yolofastest_tpu.models import save_variables

root = "/tmp/ck040"
epochs = sorted(int(m.group(1)) for d in os.listdir(root)
                if (m := re.fullmatch(r"epoch_(\d+)", d)))
path = os.path.join(root, f"epoch_{epochs[-1]}")
vars_ = checkpoint_variables(path)  # EMA preferred
save_variables(jax.device_get(vars_), "weights/yolofastest_pruned040_256x320.npz")
print("wrote weights/yolofastest_pruned040_256x320.npz from", path)
EOF

echo "=== golden recall check (fp + int8) ==="
python - <<'EOF'
import os, sys
import numpy as np
import jax, jax.numpy as jnp
from yolofastest_tpu.configs import get_config
from yolofastest_tpu.models import fold_batchnorm, load_variables
from yolofastest_tpu.ops import batched_nms, decode_heads
from yolofastest_tpu.quant import calibrate, quantize_weights
from yolofastest_tpu.quant.ptq import quantized_apply
from yolofastest_tpu.models.graph import folded_apply

cfg = get_config("256x320"); io = cfg.io
fx = np.load("tests/fixtures/golden_256x320.npz")
imgs = (fx["pre_imgs"].astype(np.float32)[..., None] - 128.0) / 255.0
golden = fx["boxes"]
folded = fold_batchnorm(load_variables("weights/yolofastest_pruned040_256x320.npz"))

def iou(a, b):
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
    ua = (a[2]-a[0])*(a[3]-a[1]) + (b[2]-b[0])*(b[3]-b[1]) - inter
    return inter / max(ua, 1e-9)

def post(heads):
    b, c, s, ci, v = decode_heads(heads, io.anchors, io.input_hw,
                                  io.conf_thre, io.max_decode)
    return batched_nms(b, c, s, ci, v, iou_thre=io.nms_thre, max_det=io.max_det)

def recall(det):
    m = 0
    for row in golden:
        b = int(row[0])
        m += any(int(det["cls_idx"][b, i]) == int(row[7])
                 and iou(det["boxes"][b, i], row[1:5]) > 0.5
                 for i in range(int(det["count"][b])))
    return m

x = jnp.asarray(imgs)
fv = jax.tree.map(jnp.asarray, folded)
det = jax.tree.map(np.asarray, jax.jit(lambda x: post(folded_apply(fv, x, jnp.float32)))(x))
print("pruned040 fp recall: %d/%d" % (recall(det), len(golden)))
qp = jax.tree.map(jnp.asarray, quantize_weights(folded))
sc = calibrate(folded, [imgs])
det8 = jax.tree.map(np.asarray, jax.jit(lambda x: post(quantized_apply(qp, sc, x)))(x))
print("pruned040 int8 recall: %d/%d" % (recall(det8), len(golden)))
EOF

echo "=== DONE ==="

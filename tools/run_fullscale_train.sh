#!/bin/bash
# Round-4: reference-scale committed training run (VERDICT "missing" item 3).
#
# The reference commits a 30-epoch training history over 8,000 images
# (models/pytorch/256x320/train_info.log, ~500 steps/epoch at batch 16).
# Its dataset is not shipped, so this reproduces the SCALE with the
# pseudo-GT set: 20 golden images x 400 augmented copies = 8,000 training
# items, 30 epochs, batch 16 -> 500 steps/epoch — the same training shape,
# with per-epoch mAP validation, on the TPU.
#
# Run DETACHED with no timeout wrapper:
#   nohup bash tools/run_fullscale_train.sh > /tmp/fullscale_run.log 2>&1 &
set -e
cd "$(dirname "$0")/.."

python - <<'EOF'
import jax, jax.numpy as jnp
print("devices:", jax.devices())
print("probe:", float(jnp.ones((8,)).sum()))
EOF

python tools/make_finetune_set.py --out /tmp/ft8000 --copies 400

rm -rf /tmp/ck8000 /tmp/fullscale_logs
python -m yolofastest_tpu train --config 256x320 \
  --train-dir /tmp/ft8000/train --val-dir /tmp/ft8000/val \
  --epochs 30 --batch-size 16 --cache-images \
  --checkpoint-dir /tmp/ck8000 --log-dir /tmp/fullscale_logs --max-to-keep 2

echo "=== DONE ==="

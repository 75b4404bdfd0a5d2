"""Seed YoloFastest-lite from a converted full-model checkpoint.

The lite parameter tree (backbone + the stride-32 ``head_5`` path) is a
strict subset of the full YoloFastest tree, so every lite weight can be
grafted from the converted reference checkpoint — the transfer setup used
to produce ``weights/yolofastest_lite_256x320.npz`` (fine-tuned afterwards;
see ``docs/train_demo_lite/``).  The reference defines YoloFastest_lite but
never shipped weights for it (``model/yolo_fastest.py:234``).

Usage: python tools/make_lite_seed.py --out /tmp/lite_seed.npz [--res 256x320]
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def graft(dst, src, path=""):
    """Copy every leaf of ``dst``'s tree shape from ``src`` where present."""
    out, hits, misses = {}, 0, 0
    for k, v in dst.items():
        if isinstance(v, dict):
            out[k], h, m = graft(v, src.get(k, {}), path + k + "/")
            hits, misses = hits + h, misses + m
        else:
            s = src.get(k) if isinstance(src, dict) else None
            if s is not None and np.shape(s) == np.shape(v):
                out[k], hits = np.asarray(s), hits + 1
            else:
                out[k], misses = np.asarray(v), misses + 1
                print("  kept random init:", path + k, np.shape(v))
    return out, hits, misses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--res", default="256x320", choices=["256x320", "512x640"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from yolofastest_tpu.configs import get_config
    from yolofastest_tpu.models import (YoloFastestLite, load_variables,
                                        save_variables, zoo_path)

    cfg = get_config(f"lite-{args.res}")
    full = load_variables(zoo_path(args.res))
    model = YoloFastestLite(num_cls=cfg.io.num_cls, num_anchors=cfg.io.num_anchors)
    init = jax.device_get(model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.io.input_hw, 1), jnp.float32), train=False))

    seeded = {}
    for col in init:
        seeded[col], h, m = graft(init[col], full.get(col, {}))
        print(f"{col}: grafted {h}, kept-init {m}")
    save_variables(seeded, args.out)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

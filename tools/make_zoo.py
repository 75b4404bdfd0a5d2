"""Convert the reference PyTorch checkpoints into committed zoo weights.

One-shot tool (like tools/make_fixtures.py): reads the trained ``.pth``
files from the read-only reference mount, converts them with
``yolofastest_tpu.models.torch_io`` and writes flat-npz zoo files under
``weights/`` so nothing downstream needs torch or the mount.

Usage: python tools/make_zoo.py
"""

import os

from yolofastest_tpu.models import save_variables
from yolofastest_tpu.models.torch_io import load_torch_checkpoint
from yolofastest_tpu.models.zoo import zoo_path

REF_PTH = {
    "256x320": "/root/reference/models/pytorch/256x320/YOLO-Fastest_epoch_28.pth",
    "512x640": "/root/reference/models/pytorch/512x640/YOLO-Fastest_epoch_27.pth",
}


def main():
    for res, pth in REF_PTH.items():
        variables = load_torch_checkpoint(pth)
        out = zoo_path(res)
        save_variables(variables, out)
        print(f"{res}: {pth} -> {out} ({os.path.getsize(out)/1e6:.2f} MB)")


if __name__ == "__main__":
    main()

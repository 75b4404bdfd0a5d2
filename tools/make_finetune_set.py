"""Build a full-resolution fine-tune dataset from the bundled test set.

The reference's 8000-image training dataset is not shipped; the achievable
full-res training demonstration (VERDICT round 1, item 4) is a fine-tune of
the converted checkpoint on the 20 bundled images with the reference
detector's own golden detections as pseudo-GT (a standard self-training
setup).  Each image is replicated ``--copies`` times so one epoch has a
meaningful number of steps; augmentation (blur/fliplr) decorrelates the
copies.

Usage: python tools/make_finetune_set.py --out /tmp/ft [--copies 16]
        -> <out>/train (20 * copies entries) and <out>/val (the 20 originals)
"""

import argparse
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_DATA = "/root/reference/test_data"
FIXTURES = os.path.join(REPO, "tests", "fixtures")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--copies", type=int, default=16)
    ap.add_argument("--res", default="256x320", choices=["256x320", "512x640"])
    args = ap.parse_args()

    from yolofastest_tpu.data import write_voc_xml

    fx = np.load(os.path.join(FIXTURES, f"golden_{args.res}.npz"))
    names = [str(n) for n in fx["image_names"]]
    boxes = fx["boxes"]  # [img_idx, x1, y1, x2, y2, conf, cls_score, cls] @net-input
    class_names = ("carrier", "defender", "destroyer")

    # golden boxes are in net-input coords; originals are 512x640
    net_h = int(args.res.split("x")[0])
    sh = sw = 512 / net_h

    for split, copies in (("train", args.copies), ("val", 1)):
        img_dir = os.path.join(args.out, split, "img")
        xml_dir = os.path.join(args.out, split, "xml")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(xml_dir, exist_ok=True)
        n = 0
        for idx, name in enumerate(names):
            rows = boxes[boxes[:, 0] == idx]
            objs = [
                (class_names[int(r[7])],
                 r[1] * sw, r[2] * sh, r[3] * sw, r[4] * sh)
                for r in rows
            ]
            if not objs:
                continue
            for c in range(copies):
                stem = f"{os.path.splitext(name)[0]}_c{c:02d}"
                shutil.copy(os.path.join(REF_DATA, name),
                            os.path.join(img_dir, stem + ".jpg"))
                write_voc_xml(os.path.join(xml_dir, stem + ".xml"),
                              stem + ".jpg", (512, 640), objs)
                n += 1
        print(f"{split}: {n} entries")


if __name__ == "__main__":
    main()

"""txt -> VOC-XML label conversion (dataset prep tool).

Capability-equivalent of the reference's one-shot ``utils/txt2xml.py:8-120``,
which parsed a bespoke punctuated txt dump (3 header lines, ``{x:..,y:..}``
rows).  Our converter takes the *standard* YOLO txt format instead —
one object per line, ``cls_id xc yc w h`` normalised to [0, 1] — and emits
the ``img/`` + ``xml/`` VOC layout :class:`yolofastest_tpu.data.VOCIndex`
reads (documented divergence: the reference's ad-hoc input format is
specific to its original annotation tool and not reproducible).
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from yolofastest_tpu.data.voc import write_voc_xml

DEFAULT_CLASSES = ("carrier", "defender", "destroyer")


def convert_txt_dataset(
    src: str,
    dst: str,
    class_names: Sequence[str] = DEFAULT_CLASSES,
    class_id_base: int = 0,
) -> int:
    """``src`` holds paired ``<stem>.jpg`` + ``<stem>.txt``; writes
    ``dst/img/*.jpg`` and ``dst/xml/*.xml``.  Returns files converted."""
    import cv2

    os.makedirs(os.path.join(dst, "img"), exist_ok=True)
    os.makedirs(os.path.join(dst, "xml"), exist_ok=True)
    count = 0
    for fn in sorted(os.listdir(src)):
        if not fn.endswith(".txt"):
            continue
        stem = fn[:-4]
        img_path = os.path.join(src, stem + ".jpg")
        if not os.path.exists(img_path):
            continue
        img = cv2.imread(img_path)
        if img is None:  # corrupt/unreadable image: fail with a clear message
            raise FileNotFoundError(
                f"cannot decode image {img_path!r} (cv2.imread returned None)"
            )
        h, w = img.shape[:2]
        boxes = []
        with open(os.path.join(src, fn)) as f:
            for line in f:
                parts = line.split()
                if len(parts) != 5:
                    continue
                cls = int(float(parts[0])) - class_id_base
                xc, yc, bw, bh = (float(v) for v in parts[1:])
                boxes.append(
                    (
                        class_names[cls],
                        (xc - bw / 2) * w,
                        (yc - bh / 2) * h,
                        (xc + bw / 2) * w,
                        (yc + bh / 2) * h,
                    )
                )
        shutil.copy(img_path, os.path.join(dst, "img", stem + ".jpg"))
        write_voc_xml(os.path.join(dst, "xml", stem + ".xml"), stem + ".jpg", (h, w), boxes)
        count += 1
    return count

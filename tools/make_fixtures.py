"""Generate golden parity fixtures from the reference implementation.

Runs the *reference* PyTorch model + postprocessor (mounted read-only at
/root/reference) on the bundled 20-image infrared ship test set and records:

* the preprocessed network inputs (gray, resized, uint8 — before normalize),
* raw head logits for a subset of images (logit-level parity),
* final detections after the reference decode + per-class NMS
  (``src/detect.py:141-169`` flow) for every image,
* a loss golden: reference ``YOLOLossV3`` values on a fixed synthetic batch.

The fixtures are committed under ``tests/fixtures`` so the test suite never
needs the reference checkout or torch at test time.  This script is a one-shot
oracle tool, not part of the framework.

Usage:  python tools/make_fixtures.py
"""

import os
import sys

import numpy as np

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")

sys.path.insert(0, os.path.join(REF, "src"))
sys.path.insert(0, os.path.join(REF, "src", "model_training"))

import cv2  # noqa: E402
import torch  # noqa: E402

import detect as ref_detect  # noqa: E402  (reference src/detect.py)
from model_training.model.yolo_fastest import YoloFastest  # noqa: E402
from loss.yolo_loss import YOLOLossV3  # noqa: E402

ref_detect.device = "cpu"  # detect.py reads a module-global set in __main__

ANCHOR_GROUPS = [
    [[10, 13], [16, 30], [33, 23]],
    [[150, 75], [100, 100], [75, 150]],
    [[300, 150], [200, 200], [150, 300]],
]

SPECS = {
    "256x320": dict(
        pth=f"{REF}/models/pytorch/256x320/YOLO-Fastest_epoch_28.pth",
        input_shape=[256, 320, 1],
        anchors=ANCHOR_GROUPS[0:2],
    ),
    "512x640": dict(
        pth=f"{REF}/models/pytorch/512x640/YOLO-Fastest_epoch_27.pth",
        input_shape=[512, 640, 1],
        anchors=ANCHOR_GROUPS[1:3],
    ),
}

N_LOGIT_IMAGES = 4  # images for which raw head logits are stored


def preprocess(img_path, input_shape):
    """Reference preprocessing (detect.py:107-129): BGR->gray, resize, uint8."""
    ori = cv2.imread(img_path)
    img = cv2.cvtColor(ori, cv2.COLOR_BGR2GRAY)
    if list(ori.shape[:2]) != input_shape[:2]:
        img = cv2.resize(img, (input_shape[1], input_shape[0]))
    return img  # (H, W) uint8


def run_resolution(name, spec, img_paths):
    io_params = {
        "num_cls": 3,
        "num_anchors": 3,
        "input_channel": 1,
        "anchors": spec["anchors"],
    }
    model = YoloFastest(io_params).eval()
    model.load_state_dict(torch.load(spec["pth"], map_location="cpu", weights_only=True))

    post = ref_detect.YOLO_post_process(
        conf_thres=0.5, nms_thres=0.2, num_anchors=3, num_class=3,
        anchors=spec["anchors"], input_shape=spec["input_shape"],
    )

    H, W, _ = spec["input_shape"]
    pre_imgs = np.zeros((len(img_paths), H, W), np.uint8)
    logits_large, logits_small = [], []
    all_boxes = []  # rows: [img_idx, x1, y1, x2, y2, conf, cls_score, cls_idx]

    with torch.no_grad():
        for idx, p in enumerate(img_paths):
            gray = preprocess(p, spec["input_shape"])
            pre_imgs[idx] = gray
            x = torch.from_numpy(gray[None, None].astype(np.float32))
            x = (x - 128.0) / 255.0
            pred = model(x)  # (head_large, head_small), NCHW

            if idx < N_LOGIT_IMAGES:
                logits_large.append(pred[0].numpy())
                logits_small.append(pred[1].numpy())

            # Reference postprocess flow (detect.py:157-169)
            rects = post.decode_box(pred)
            per_class = [[] for _ in range(3)]
            for r in rects:
                per_class[r[-1]].append(r)
            for cls in range(3):
                if not per_class[cls]:
                    continue
                per_class[cls].sort(key=lambda it: it[4], reverse=True)
                for r in post.non_maxium_supression(per_class[cls]):
                    all_boxes.append([idx] + list(r))

    np.savez_compressed(
        os.path.join(FIXTURES, f"golden_{name}.npz"),
        image_names=np.array([os.path.basename(p) for p in img_paths]),
        pre_imgs=pre_imgs,
        logits_large=np.concatenate(logits_large, 0),
        logits_small=np.concatenate(logits_small, 0),
        boxes=np.array(all_boxes, np.float64).reshape(-1, 8),
    )
    print(f"{name}: {len(all_boxes)} boxes over {len(img_paths)} images")


def make_loss_fixture():
    """Reference YOLOLossV3 values on a fixed synthetic batch (both scales)."""
    rng = np.random.RandomState(42)
    bs, H, W = 4, 256, 320
    spec = SPECS["256x320"]
    heads = [
        rng.randn(bs, 24, H // 16, W // 16).astype(np.float32) * 2.0,
        rng.randn(bs, 24, H // 32, W // 32).astype(np.float32) * 2.0,
    ]
    # targets: (bs, 64, 6) = (x_cen, y_cen, w, h, cls, valid255), normalised
    targets = np.zeros((bs, 64, 6), np.float32)
    for b in range(bs):
        n = rng.randint(1, 6)
        for t in range(n):
            cx, cy = rng.uniform(0.1, 0.9, 2)
            w = rng.uniform(0.02, 0.5)
            h = rng.uniform(0.02, 0.5)
            targets[b, t] = [cx, cy, w, h, rng.randint(0, 3), 255.0]

    results = {}
    for i, anchors in enumerate(spec["anchors"]):
        loss_mod = YOLOLossV3(anchors=anchors, num_classes=3,
                              input_shape=spec["input_shape"], device="cpu")
        out = loss_mod(torch.from_numpy(heads[i]), torch.from_numpy(targets))
        vals = [out[0].item()] + list(out[1:])
        results[f"scale{i}"] = np.array(vals, np.float64)
        # also record decode-mode output (targets=None), used by validation
        dec = loss_mod(torch.from_numpy(heads[i]))
        results[f"decode{i}"] = dec.numpy()

    np.savez_compressed(
        os.path.join(FIXTURES, "golden_loss.npz"),
        head0=heads[0], head1=heads[1], targets=targets, **results,
    )
    print("loss fixture:", {k: v for k, v in results.items() if k.startswith("scale")})


def make_map_fixture():
    """Golden mAP: run the reference ``Validation.get_mAP``
    (``validate.py:27-122``) on the 20 bundled test images with fabricated GT
    labels, using the shipped 256x320 checkpoint.

    The GT is derived from the reference detector's own golden detections,
    then deterministically perturbed (boxes jittered, some dropped -> FPs,
    phantoms added -> FNs, classes flipped) so the resulting mAP sits well
    inside (0, 1) and every code path (TP/FP/FN, per-class AP interpolation)
    is exercised.  Our MAPEvaluator must reproduce the number on identical
    inputs (tests/test_map_parity.py).
    """
    import logging

    from validate import Validation  # noqa: E402  (reference validate.py)

    spec = SPECS["256x320"]
    g = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    pre_imgs = g["pre_imgs"]  # (20, 256, 320) uint8
    boxes = g["boxes"]  # [img_idx, x1, y1, x2, y2, conf, cls_score, cls_idx]
    n_img, H, W = pre_imgs.shape

    rng = np.random.RandomState(7)
    targets = np.zeros((n_img, 64, 6), np.float32)
    counts = np.zeros(n_img, np.int32)
    k = 0
    for row in boxes:
        b = int(row[0])
        x1, y1, x2, y2 = row[1:5]
        cls = int(row[7])
        k += 1
        if k % 5 == 0:
            continue  # dropped GT -> this detection becomes an FP
        jit = rng.uniform(-2.0, 2.0, 4)
        x1, y1, x2, y2 = x1 + jit[0], y1 + jit[1], x2 + jit[2], y2 + jit[3]
        if k % 7 == 0:
            cls = (cls + 1) % 3  # class flip -> FP for model + FN for GT
        t = counts[b]
        targets[b, t] = [
            (x1 + x2) / 2 / W, (y1 + y2) / 2 / H,
            (x2 - x1) / W, (y2 - y1) / H, cls, 255.0,
        ]
        counts[b] += 1
    for b in range(0, n_img, 4):  # phantom GT nobody detects -> FN
        t = counts[b]
        targets[b, t] = [rng.uniform(0.1, 0.4), rng.uniform(0.5, 0.9),
                         0.08, 0.1, rng.randint(0, 3), 255.0]
        counts[b] += 1

    io_params = {
        "num_cls": 3, "num_anchors": 3, "input_channel": 1,
        "anchors": spec["anchors"], "input_shape": spec["input_shape"],
        "conf_thre": 0.5, "nms_thre": 0.2,
        "class_names": ["carrier", "defender", "destroyer"],
    }
    params = {
        "io_params": io_params,
        "train_params": {"batch_size": n_img, "IOU_val_thre": 0.5},
    }
    model = YoloFastest(io_params).eval()
    model.load_state_dict(
        torch.load(spec["pth"], map_location="cpu", weights_only=True)
    )
    losses = [
        YOLOLossV3(anchors=a, num_classes=3, input_shape=spec["input_shape"],
                   device="cpu")
        for a in spec["anchors"]
    ]

    logger = logging.getLogger("map_fixture")
    logger.addHandler(logging.StreamHandler())
    logger.setLevel(logging.INFO)

    val = Validation(params, logger, [None], "cpu", losses)
    imgs_t = torch.from_numpy(
        ((pre_imgs[:, None].astype(np.float32)) - 128.0) / 255.0
    )
    # one full batch, bypassing the dataset plumbing
    val.dataloader = [(imgs_t, torch.from_numpy(targets.copy()))]
    ref_map = float(val.get_mAP(model, epoch=0))
    ref_aps = []
    for c in range(3):
        ref_aps.append(float(val._Validation__calculate_AP(cls=c)))

    np.savez_compressed(
        os.path.join(FIXTURES, "golden_map.npz"),
        targets=targets,
        ref_map=np.float64(ref_map),
        ref_aps=np.array(ref_aps, np.float64),
        ref_target_num=val.target_num.numpy().astype(np.int64),
    )
    print(f"map fixture: reference mAP {ref_map:.6f}, APs {ref_aps}, "
          f"target_num {val.target_num.numpy()}")


def main():
    os.makedirs(FIXTURES, exist_ok=True)
    img_dir = f"{REF}/test_data"
    img_paths = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir) if f.endswith(".jpg")
    )
    for name, spec in SPECS.items():
        run_resolution(name, spec, img_paths)
    make_loss_fixture()
    make_map_fixture()


if __name__ == "__main__":
    main()

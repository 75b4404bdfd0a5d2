"""End-to-end training: synthetic VOC dataset -> sharded train steps ->
loss decreases -> mAP eval runs -> checkpoint round-trips.

The reference has no training tests at all (SURVEY.md §4); its quality bar is
"the committed train_info.log shows mAP rising".  These tests make that an
automated check on a fabricated dataset of bright rectangles on dark noise.
"""

import math
import os

import numpy as np
import pytest

from yolofastest_tpu.configs import Config, IOConfig, get_config
from yolofastest_tpu.data import DetectionLoader, VOCIndex, write_voc_xml
from yolofastest_tpu.eval import MAPEvaluator, average_precision
from yolofastest_tpu.train import Trainer, make_lr_schedule

ANCHORS_SMALL = (
    ((10.0, 13.0), (16.0, 30.0), (33.0, 23.0)),
    ((60.0, 40.0), (50.0, 50.0), (40.0, 60.0)),
)


def tiny_config(tmp_path=None) -> Config:
    io = IOConfig(
        input_shape=(64, 96, 1),
        origin_img_shape=(128, 192, 3),
        anchors=ANCHORS_SMALL,
        conf_thre=0.3,
    )
    return Config(io=io)


def make_dataset(root, n_images, config, seed=0):
    """Bright rectangles (one per class) on dark noise, VOC layout."""
    import cv2

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    os.makedirs(os.path.join(root, "xml"), exist_ok=True)
    h0, w0, _ = config.io.origin_img_shape
    names = config.io.class_names
    for i in range(n_images):
        img = rng.integers(0, 40, (h0, w0, 3), np.uint8)
        boxes = []
        for _ in range(rng.integers(1, 3)):
            cls = int(rng.integers(0, len(names)))
            bw, bh = int(rng.integers(20, 60)), int(rng.integers(20, 50))
            x1 = int(rng.integers(0, w0 - bw))
            y1 = int(rng.integers(0, h0 - bh))
            shade = 120 + 60 * cls
            img[y1 : y1 + bh, x1 : x1 + bw] = shade
            boxes.append((names[cls], x1, y1, x1 + bw, y1 + bh))
        stem = f"im_{i:04d}"
        cv2.imwrite(os.path.join(root, "img", stem + ".jpg"), img)
        write_voc_xml(os.path.join(root, "xml", stem + ".xml"), stem + ".jpg",
                      (h0, w0), boxes)


def test_lr_schedule_matches_reference_formula():
    lr0, E, bpe = 1e-3, 30, 500
    sched = make_lr_schedule(lr0, E, bpe, warmup_min_iters=1000)
    num_warm = max(3 * bpe, 1000)

    def ref(it):
        e = it // bpe
        lf = ((1 + math.cos(e * math.pi / E)) / 2) * 0.8 + 0.2
        return lr0 * lf * min(it / num_warm, 1.0)

    for it in [0, 1, 100, 1499, 1500, 1501, 5000, 14999]:
        np.testing.assert_allclose(float(sched(it)), ref(it), rtol=1e-6)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    cfg = tiny_config()
    root = tmp_path_factory.mktemp("voc")
    make_dataset(str(root), 16, cfg)
    return str(root), cfg


def test_loader_parallel_decode_matches_serial(dataset):
    root, cfg = dataset
    idx = VOCIndex(root, cfg.io.class_names)
    a = next(iter(DetectionLoader(idx, cfg, batch_size=8, augment=False,
                                  shuffle=False, num_workers=0)))
    b = next(iter(DetectionLoader(idx, cfg, batch_size=8, augment=False,
                                  shuffle=False, num_workers=4)))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_loader_shapes_and_format(dataset):
    root, cfg = dataset
    idx = VOCIndex(root, cfg.io.class_names)
    assert len(idx) == 16
    loader = DetectionLoader(idx, cfg, batch_size=8, seed=1)
    imgs, tgts = next(iter(loader))
    assert imgs.shape == (8, 64, 96, 1)
    assert tgts.shape == (8, cfg.train.max_boxes, 6)
    valid = tgts[tgts[:, :, 5] == 255.0]
    assert len(valid) > 0
    # normalised coords in [0, 1], normalised pixels in [-0.502, 0.499]
    assert np.all((valid[:, :4] >= 0) & (valid[:, :4] <= 1))
    assert imgs.min() >= -128.0 / 255.0 - 1e-6 and imgs.max() <= 127.0 / 255.0 + 1e-6


def test_train_loss_decreases_and_eval_runs(dataset, tmp_path):
    root, cfg = dataset
    idx = VOCIndex(root, cfg.io.class_names)
    loader = DetectionLoader(idx, cfg, batch_size=8, seed=2)

    trainer = Trainer(cfg, batch_per_epoch=len(loader), seed=0)
    losses = []
    for _ in range(3):  # 3 mini-epochs of 2 steps
        for imgs, tgts in loader:
            m = trainer.step(imgs, tgts)
            losses.append(float(m["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # warmup LR ramps but loss must still drop

    val_loader = DetectionLoader(idx, cfg, batch_size=8, augment=False, shuffle=False)
    evaluator = MAPEvaluator(cfg, val_loader)
    mAP = evaluator(trainer.variables, epoch=0)
    assert 0.0 <= mAP <= 1.0


def test_loader_drop_last_false_covers_every_image(dataset):
    root, cfg = dataset
    idx = VOCIndex(root, cfg.io.class_names)  # 16 images
    loader = DetectionLoader(idx, cfg, batch_size=6, augment=False,
                             shuffle=False, drop_last=False)
    assert len(loader) == 3
    batches = list(loader)
    assert [b[0].shape[0] for b in batches] == [6, 6, 4]
    # drop_last=True (training default) still drops the tail
    assert len(DetectionLoader(idx, cfg, batch_size=6)) == 2


def test_evaluator_counts_tail_batch_targets(dataset):
    """Every validation image must count toward mAP — a partial final batch
    is padded, not dropped (the reference validates every image)."""
    root, cfg = dataset
    idx = VOCIndex(root, cfg.io.class_names)
    n_gt_total = sum(len(labels) for _, labels in idx)

    class Capture:
        lines = []

        def info(self, msg):
            self.lines.append(msg)

    loader = DetectionLoader(idx, cfg, batch_size=6, augment=False,
                             shuffle=False, drop_last=False)
    evaluator = MAPEvaluator(cfg, loader, logger=Capture())
    trainer = Trainer(cfg, batch_per_epoch=3, seed=0)
    evaluator(trainer.variables, epoch=0)
    import re

    counted = sum(int(m.group(1)) for line in Capture.lines
                  if (m := re.search(r"target_num = (\d+)", line)))
    assert counted == n_gt_total


def test_map_matcher_scales_to_2000_images():
    """The vectorised per-image IOU-matrix matcher must stay negligible at a
    real val-epoch scale (~2000 images): the reference's Python evaluator is
    the CPU hot spot of its train loop (SURVEY.md §3.1); ours must not be."""
    import time

    cfg = tiny_config()
    n_img, bs = 2000, 50
    rng = np.random.default_rng(0)
    h, w = cfg.io.input_hw
    max_det = cfg.io.max_det

    batches = []
    dets = []
    for _ in range(n_img // bs):
        tgts = np.zeros((bs, cfg.train.max_boxes, 6), np.float32)
        n_gt = rng.integers(1, 6, bs)
        for b in range(bs):
            for t in range(n_gt[b]):
                tgts[b, t] = [*rng.uniform(0.2, 0.8, 2), 0.2, 0.2,
                              rng.integers(0, 3), 255.0]
        batches.append((np.zeros((bs, h, w, 1), np.float32), tgts))
        boxes = np.sort(rng.uniform(0, w, (bs, max_det, 2, 2)), 2).reshape(bs, max_det, 4)
        d = {
            "boxes": boxes[..., [0, 2, 1, 3]].astype(np.float32),
            "conf": rng.uniform(0.5, 1, (bs, max_det)).astype(np.float32),
            "cls_score": np.ones((bs, max_det), np.float32),
            "cls_idx": rng.integers(0, 3, (bs, max_det)).astype(np.int32),
            "valid": np.ones((bs, max_det), bool),
            "count": np.full(bs, 12, np.int32),
        }
        dets.append(d)

    evaluator = MAPEvaluator(cfg, batches)
    it = iter(dets)
    evaluator.eval_fn = lambda variables, imgs: next(it)  # isolate host side

    t0 = time.perf_counter()
    mAP = evaluator(variables=None, epoch=0)
    dt = time.perf_counter() - t0
    assert 0.0 <= mAP <= 1.0
    # 2000 images x 12 detections: matching + PR sweep must be seconds, not
    # minutes, on the 1-core CPU (measured ~1.5 s; reference loop was ~100x)
    assert dt < 20.0, f"host matching took {dt:.1f}s for {n_img} images"
    print(f"2000-image val-epoch host matching: {dt:.2f}s")


def test_fit_rotates_checkpoints(dataset, tmp_path):
    import dataclasses

    root, cfg = dataset
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, max_to_keep=2,
                                       val_after_epoch=99)
    )
    idx = VOCIndex(root, cfg.io.class_names)
    loader = DetectionLoader(idx, cfg, batch_size=8, seed=4)
    trainer = Trainer(cfg, batch_per_epoch=len(loader), seed=0)
    trainer.fit(loader, total_epochs=3, checkpoint_dir=str(tmp_path),
                log_every=1000)
    kept = sorted(d for d in os.listdir(tmp_path) if d.startswith("epoch_"))
    assert kept == ["epoch_1", "epoch_2"]


def test_checkpoint_roundtrip(dataset, tmp_path):
    import jax

    root, cfg = dataset
    idx = VOCIndex(root, cfg.io.class_names)
    loader = DetectionLoader(idx, cfg, batch_size=8, seed=3)
    trainer = Trainer(cfg, batch_per_epoch=len(loader), seed=0)
    imgs, tgts = next(iter(loader))
    trainer.step(imgs, tgts)
    path = trainer.save_checkpoint(str(tmp_path), epoch=0)

    trainer2 = Trainer(cfg, batch_per_epoch=len(loader), seed=42)
    trainer2.restore_checkpoint(path)
    assert int(trainer2.state.step) == 1
    for a, b in zip(
        jax.tree.leaves(trainer.state.params), jax.tree.leaves(trainer2.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (the reference loses it, SURVEY.md §5)
    for a, b in zip(
        jax.tree.leaves(trainer.state.opt_state),
        jax.tree.leaves(trainer2.state.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_average_precision_known_values():
    # 3 GT, detections: TP conf .9, FP conf .8, TP conf .7
    confs = np.array([0.9, 0.8, 0.7])
    is_tp = np.array([True, False, True])
    # PR points: (1, 1/3), (.5, 1/3), (2/3, 2/3)
    # AP = 1/3 * 1 + (2/3 - 1/3) * 2/3 = 0.5555...
    ap = average_precision(confs, is_tp, n_gt=3)
    np.testing.assert_allclose(ap, 1 / 3 + (1 / 3) * (2 / 3), rtol=1e-9)
    assert average_precision(confs, is_tp, n_gt=0) == 0.0
    assert average_precision(np.array([]), np.array([], bool), 3) == 0.0


def test_data_parallel_sharding_runs():
    """The train step must compile and run sharded over an 8-device mesh."""
    import jax
    from jax.sharding import Mesh

    cfg = tiny_config()
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    trainer = Trainer(cfg, mesh=mesh, batch_per_epoch=10, seed=0)
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((8, 64, 96, 1), np.float32) * 0.2
    tgts = np.zeros((8, cfg.train.max_boxes, 6), np.float32)
    tgts[:, 0] = [0.5, 0.5, 0.25, 0.25, 1, 255.0]
    m1 = trainer.step(imgs, tgts)
    m2 = trainer.step(imgs, tgts)
    assert np.isfinite(float(m1["total"])) and np.isfinite(float(m2["total"]))
    assert int(trainer.state.step) == 2


def test_bf16_train_step_tracks_fp32():
    """compute_dtype=bfloat16 (CLI --bf16): params/loss stay fp32, the step
    runs, and the loss tracks the fp32 trainer's to bf16 precision."""
    import jax
    import jax.numpy as jnp

    cfg = tiny_config()
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((8, 64, 96, 1)).astype(np.float32) * 0.2
    tgts = np.zeros((8, cfg.train.max_boxes, 6), np.float32)
    tgts[:, 0] = [0.5, 0.5, 0.25, 0.25, 1, 255.0]

    losses = {}
    for dt in (jnp.float32, jnp.bfloat16):
        trainer = Trainer(cfg, batch_per_epoch=10, seed=123, compute_dtype=dt)
        m = trainer.step(imgs, tgts)
        losses[dt] = float(m["total"])
        assert np.isfinite(losses[dt])
        leaves = jax.tree_util.tree_leaves(trainer.state.params)
        assert all(l.dtype == jnp.float32 for l in leaves)  # master weights
    assert abs(losses[jnp.bfloat16] - losses[jnp.float32]) < 0.05 * abs(
        losses[jnp.float32]), losses


def test_loader_cache_identical_and_decodes_once(tmp_path, monkeypatch):
    """cache=True serves bit-identical batches while decoding each image
    exactly once across epochs (the host decode otherwise bottlenecks a TPU
    input pipeline)."""
    from yolofastest_tpu.data import DetectionLoader, VOCIndex
    from yolofastest_tpu.data import pipeline as pl

    cfg = tiny_config()
    make_dataset(str(tmp_path / "voc"), 12, cfg, seed=5)
    idx = VOCIndex(str(tmp_path / "voc"), cfg.io.class_names)

    calls = {"n": 0}
    real = pl._imread_gray_resized

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(pl, "_imread_gray_resized", counting)

    plain = DetectionLoader(idx, cfg, batch_size=4, seed=7, prefetch=1)
    cached = DetectionLoader(idx, cfg, batch_size=4, seed=7, prefetch=1,
                             cache=True)
    for epoch in range(2):
        for (pi, pt), (ci, ct) in zip(plain, cached):
            np.testing.assert_array_equal(pi, ci)
            np.testing.assert_array_equal(pt, ct)
    # plain: 12 imgs x 2 epochs x 2 loaders? no - plain decodes 24, cached 12
    assert calls["n"] == 24 + 12


def test_mosaic_geometry_translates_and_clips_boxes():
    """Each quadrant shows the right corner crop and a full-image box becomes
    exactly that quadrant's rectangle (translation + clip, no scaling
    surprises)."""
    from yolofastest_tpu.data.pipeline import mosaic_example

    cfg = tiny_config()
    h, w = cfg.io.input_hw          # 64, 96
    h0, w0 = cfg.io.origin_img_shape[:2]  # 128, 192
    grays = [np.full((h, w), 40 * (i + 1), np.uint8) for i in range(4)]
    full_box = np.array([[float(i), 0.0, 0.0, w0, h0] for i in range(4)],
                        np.float32)
    rng = np.random.default_rng(3)
    canvas, labels = mosaic_example(grays, [full_box[i : i + 1]
                                            for i in range(4)], cfg, rng)
    assert canvas.shape == (h, w) and labels.shape == (4, 5)
    # recover the split point from the canvas itself
    cy = int(np.argmax(canvas[:, 0] != canvas[0, 0]))
    cx = int(np.argmax(canvas[0] != canvas[0, 0]))
    assert 0 < cx < w and 0 < cy < h
    assert (canvas[:cy, :cx] == 40).all() and (canvas[:cy, cx:] == 80).all()
    assert (canvas[cy:, :cx] == 120).all() and (canvas[cy:, cx:] == 160).all()
    # labels come back in ORIGIN pixels; scale to net-input and compare
    kx, ky = w / float(w0), h / float(h0)
    got = labels[np.argsort(labels[:, 0])]
    want = np.array([
        [0, 0, 0, cx, cy], [1, cx, 0, w, cy],
        [2, 0, cy, cx, h], [3, cx, cy, w, h]], np.float32)
    np.testing.assert_allclose(got[:, 1:] * [kx, ky, kx, ky], want[:, 1:],
                               atol=1e-4)
    np.testing.assert_array_equal(got[:, 0], want[:, 0])


def test_mosaic_drops_slivers_and_handles_empty():
    from yolofastest_tpu.data.pipeline import mosaic_example

    cfg = tiny_config()
    h, w = cfg.io.input_hw
    grays = [np.zeros((h, w), np.uint8)] * 4
    # a 1-origin-px box clips to < 2 net px everywhere -> dropped
    tiny = np.array([[0.0, 0.0, 0.0, 1.0, 1.0]], np.float32)
    empty = np.zeros((0, 5), np.float32)
    canvas, labels = mosaic_example(grays, [tiny, empty, empty, empty],
                                    cfg, np.random.default_rng(0))
    assert labels.shape[1] == 5 and len(labels) <= 1
    canvas, labels = mosaic_example(grays, [empty] * 4, cfg,
                                    np.random.default_rng(0))
    assert labels.shape == (0, 5)


def test_loader_mosaic_yields_valid_batches(dataset):
    """mosaic=1.0 through the loader (with image cache) still yields the
    padded-target contract: normalised coords in [0,1], valid rows marked."""
    import dataclasses

    root, cfg = dataset
    cfg = dataclasses.replace(
        cfg, augment=dataclasses.replace(cfg.augment, mosaic=1.0))
    idx = VOCIndex(root, cfg.io.class_names)
    loader = DetectionLoader(idx, cfg, batch_size=8, seed=11, cache=True)
    imgs, tgts = next(iter(loader))
    assert imgs.shape == (8, 64, 96, 1)
    valid = tgts[tgts[:, :, 5] == 255.0]
    assert len(valid) > 0
    assert np.all((valid[:, :4] >= 0) & (valid[:, :4] <= 1))
    assert np.isfinite(imgs).all()


def _ema_cfg(cfg, decay=0.5, ramp=1):
    import dataclasses

    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=decay,
                                       ema_ramp=ramp))


def test_ema_first_step_matches_hand_lerp(dataset):
    """After one step: ema = d*p0 + (1-d)*p1 with the ramped decay
    d = decay * (1 - exp(-1/ramp)) — pinned on a real leaf."""
    import jax

    root, cfg = dataset
    cfg = _ema_cfg(cfg, decay=0.5, ramp=1)
    idx = VOCIndex(root, cfg.io.class_names)
    loader = DetectionLoader(idx, cfg, batch_size=8, seed=5)
    trainer = Trainer(cfg, batch_per_epoch=len(loader), seed=0)
    p0 = jax.tree.map(np.asarray, jax.device_get(trainer.state.params))
    imgs, tgts = next(iter(loader))
    trainer.step(imgs, tgts)
    p1 = jax.tree.map(np.asarray, jax.device_get(trainer.state.params))
    ema = jax.tree.map(np.asarray, jax.device_get(trainer.state.ema["params"]))
    d = 0.5 * (1.0 - np.exp(-1.0))
    for a, b, e in zip(jax.tree.leaves(p0), jax.tree.leaves(p1),
                       jax.tree.leaves(ema)):
        np.testing.assert_allclose(e, d * a + (1 - d) * b,
                                   rtol=1e-5, atol=1e-7)
    # eval_variables serves the EMA model when enabled
    ev = trainer.eval_variables
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(ev["params"])[0]),
        np.asarray(jax.tree.leaves(trainer.state.ema["params"])[0]))


def test_ema_checkpoint_roundtrip_and_elasticity(dataset, tmp_path):
    """EMA state checkpoints and restores exactly; resuming across an
    ema-flag flip is elastic in both directions (re-seed / drop)."""
    import jax

    from yolofastest_tpu.train import checkpoint_variables

    root, cfg = dataset
    ema_cfg = _ema_cfg(cfg, decay=0.9, ramp=2)
    idx = VOCIndex(root, cfg.io.class_names)
    loader = DetectionLoader(idx, cfg, batch_size=8, seed=6)
    trainer = Trainer(ema_cfg, batch_per_epoch=len(loader), seed=0)
    for imgs, tgts in loader:
        trainer.step(imgs, tgts)
    path = trainer.save_checkpoint(str(tmp_path / "ema"), epoch=0)

    # exact roundtrip into another EMA run
    t2 = Trainer(ema_cfg, batch_per_epoch=len(loader), seed=42)
    t2.restore_checkpoint(path)
    for a, b in zip(jax.tree.leaves(trainer.state.ema),
                    jax.tree.leaves(t2.state.ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # checkpoint_variables prefers the EMA model (what validation scored)
    v = checkpoint_variables(path)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(v["params"])[0]),
        np.asarray(jax.tree.leaves(trainer.state.ema["params"])[0]))
    v_raw = checkpoint_variables(path, prefer_ema=False)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(v_raw["params"])[0]),
        np.asarray(jax.tree.leaves(trainer.state.params)[0]))

    # EMA checkpoint -> non-EMA run: average dropped, params restored
    t3 = Trainer(cfg, batch_per_epoch=len(loader), seed=42)
    t3.restore_checkpoint(path)
    assert t3.state.ema is None
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(t3.state.params)[0]),
        np.asarray(jax.tree.leaves(trainer.state.params)[0]))

    # non-EMA checkpoint -> EMA run: average re-seeded from the params
    path2 = t3.save_checkpoint(str(tmp_path / "plain"), epoch=0)
    t4 = Trainer(ema_cfg, batch_per_epoch=len(loader), seed=7)
    t4.restore_checkpoint(path2)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(t4.state.ema["params"])[0]),
        np.asarray(jax.tree.leaves(t4.state.params)[0]))
    # checkpoint_variables on a non-EMA checkpoint serves the raw weights
    v2 = checkpoint_variables(path2)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(v2["params"])[0]),
        np.asarray(jax.tree.leaves(t3.state.params)[0]))


# ---------------------------------------------------------------- multi-scale
def _ms_cfg(cfg, steps=1, every=1):
    import dataclasses

    return dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, multiscale_steps=steps, multiscale_every=every))


def test_multiscale_buckets_layout_and_floor():
    from yolofastest_tpu.data.pipeline import multiscale_buckets

    cfg = tiny_config()  # base (64, 96): the -32 bucket hits the 64 floor
    assert multiscale_buckets(_ms_cfg(cfg, steps=1)) == ((64, 96), (96, 128))
    assert multiscale_buckets(_ms_cfg(cfg, steps=2)) == (
        (64, 96), (96, 128), (128, 160))
    full = get_config("256x320")
    assert multiscale_buckets(_ms_cfg(full, steps=2)) == (
        (192, 256), (224, 288), (256, 320), (288, 352), (320, 384))
    # every bucket keeps the stride-32 grid exact
    for h, w in multiscale_buckets(_ms_cfg(full, steps=2)):
        assert h % 32 == 0 and w % 32 == 0


def test_multiscale_loader_schedule_and_determinism(dataset):
    from yolofastest_tpu.data.pipeline import multiscale_buckets

    root, cfg = dataset
    cfg = _ms_cfg(cfg, steps=1, every=2)
    idx = VOCIndex(root, cfg.io.class_names)
    buckets = multiscale_buckets(cfg)

    def shapes(seed):
        loader = DetectionLoader(idx, cfg, batch_size=4, seed=seed)
        return [imgs.shape[1:3] for imgs, _ in loader]

    s = shapes(3)
    assert len(s) == 4 and all(tuple(x) in buckets for x in s)
    # one bucket per group of `every` batches
    assert s[0] == s[1] and s[2] == s[3]
    # reproducible given the seed
    assert shapes(3) == s
    # validation loaders (augment=False) never rescale
    val = DetectionLoader(idx, cfg, batch_size=4, augment=False, shuffle=False)
    assert all(imgs.shape[1:3] == tuple(cfg.io.input_hw) for imgs, _ in val)


def test_multiscale_targets_are_resolution_independent(dataset):
    from yolofastest_tpu.data import load_example

    root, cfg = dataset
    idx = VOCIndex(root, cfg.io.class_names)
    path, labels = idx[0]
    img_base, tgt_base = load_example(path, labels, cfg, augment=False)
    img_up, tgt_up = load_example(path, labels, cfg, augment=False,
                                  out_hw=(96, 128))
    assert img_base.shape == (64, 96, 1) and img_up.shape == (96, 128, 1)
    np.testing.assert_array_equal(tgt_base, tgt_up)  # normalised coords


def test_multiscale_train_step_runs_per_bucket(dataset):
    root, cfg = dataset
    cfg = _ms_cfg(cfg, steps=1, every=1)
    idx = VOCIndex(root, cfg.io.class_names)
    trainer = Trainer(cfg, batch_per_epoch=4, seed=0)
    import jax

    shapes_before = jax.tree.map(lambda x: x.shape, trainer.state.params)
    for hw in ((64, 96), (96, 128)):  # one cached trace per bucket
        loader = DetectionLoader(idx, cfg, batch_size=8, seed=5)
        imgs, tgts = next(iter(loader))
        import cv2

        if imgs.shape[1:3] != hw:
            imgs = np.stack([
                cv2.resize(im[:, :, 0], (hw[1], hw[0]))[:, :, None]
                for im in imgs])
        m = trainer.step(imgs, tgts)
        assert np.isfinite(float(m["total"]))
    # multi-scale never touches parameter shapes (fully convolutional)
    assert jax.tree.map(lambda x: x.shape, trainer.state.params) == shapes_before


def test_multiscale_composes_with_mosaic(dataset):
    import dataclasses

    from yolofastest_tpu.data.pipeline import multiscale_buckets

    root, cfg = dataset
    cfg = _ms_cfg(cfg, steps=1, every=1)
    cfg = dataclasses.replace(
        cfg, augment=dataclasses.replace(cfg.augment, mosaic=1.0))
    idx = VOCIndex(root, cfg.io.class_names)
    buckets = multiscale_buckets(cfg)
    for imgs, tgts in DetectionLoader(idx, cfg, batch_size=4, seed=11):
        assert tuple(imgs.shape[1:3]) in buckets
        valid = tgts[tgts[:, :, 5] == 255.0]
        # mosaic composes at base res, then the bucket resize follows;
        # labels stay normalised and in range either way
        assert np.all((valid[:, :4] >= 0) & (valid[:, :4] <= 1))

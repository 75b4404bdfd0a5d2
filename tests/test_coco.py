"""COCO-JSON dataset support: parser, writer round-trip, VOC equivalence.

The reference only reads its VOC layout (``detect_dataset.py``); COCOIndex
presents the same contract, so one loader/trainer/evaluator serves both.
A dataset written as VOC and as COCO must produce IDENTICAL batches.
"""

import json
import os

import numpy as np
import pytest

from tests.test_train import make_dataset, tiny_config
from yolofastest_tpu.data import (COCOIndex, DetectionLoader, VOCIndex,
                                  parse_coco_json, voc_to_coco,
                                  write_coco_json)

NAMES = ("carrier", "defender", "destroyer")


def test_write_parse_roundtrip(tmp_path):
    path = str(tmp_path / "ann.json")
    entries = [
        ("a.jpg", (128, 192), [("carrier", 1, 2, 30, 40),
                               ("destroyer", 50, 60, 70, 90)]),
        ("b.jpg", (128, 192), []),  # negative image: kept, zero rows
    ]
    write_coco_json(path, entries, NAMES)
    parsed = parse_coco_json(path, NAMES)
    assert [fn for fn, _ in parsed] == ["a.jpg", "b.jpg"]
    np.testing.assert_allclose(
        parsed[0][1],
        [[0, 1, 2, 30, 40], [2, 50, 60, 70, 90]])
    assert parsed[1][1].shape == (0, 5)


def test_parse_rejects_bad_documents(tmp_path):
    p = str(tmp_path / "bad.json")
    with open(p, "w") as f:
        json.dump({"images": [], "annotations": []}, f)  # no categories
    with pytest.raises(ValueError, match="categories"):
        parse_coco_json(p, NAMES)

    with open(p, "w") as f:
        json.dump({"images": [], "annotations": [],
                   "categories": [{"id": 1, "name": "submarine"}]}, f)
    with pytest.raises(ValueError, match="submarine"):
        parse_coco_json(p, NAMES)

    with open(p, "w") as f:
        json.dump({"images": [{"id": 1, "file_name": "a.jpg"}],
                   "annotations": [{"id": 1, "image_id": 99,
                                    "category_id": 1, "bbox": [0, 0, 1, 1]}],
                   "categories": [{"id": 1, "name": "carrier"}]}, f)
    with pytest.raises(ValueError, match="unknown image_id"):
        parse_coco_json(p, NAMES)


def test_coco_index_matches_voc_through_loader(tmp_path):
    """The SAME dataset in both layouts: identical index items and identical
    loader batches (images + padded targets)."""
    cfg = tiny_config()
    voc = str(tmp_path / "voc")
    coco = str(tmp_path / "coco")
    make_dataset(voc, 6, cfg, seed=11)
    assert voc_to_coco(voc, coco, cfg.io.class_names) == 6

    vi = VOCIndex(voc, cfg.io.class_names)
    ci = COCOIndex(coco, cfg.io.class_names)
    assert len(vi) == len(ci) == 6
    for (vp, vl), (cp, cl) in zip(vi.items, ci.items):
        assert os.path.basename(vp) == os.path.basename(cp)
        np.testing.assert_allclose(cl, vl)

    lv = DetectionLoader(vi, cfg, batch_size=2, augment=False, shuffle=False)
    lc = DetectionLoader(ci, cfg, batch_size=2, augment=False, shuffle=False)
    for (iv, tv), (ic, tc) in zip(lv, lc):
        np.testing.assert_array_equal(iv, ic)
        np.testing.assert_array_equal(tv, tc)


def test_cli_voc2coco(tmp_path, monkeypatch, capsys):
    """`voc2coco` CLI: converted layout indexes identically to the source."""
    from yolofastest_tpu import configs
    from yolofastest_tpu.cli import main

    cfg = tiny_config()
    monkeypatch.setattr(configs, "get_config", lambda name="256x320", **kw: cfg)

    voc = str(tmp_path / "voc")
    coco = str(tmp_path / "coco")
    make_dataset(voc, 4, cfg, seed=5)
    rc = main(["voc2coco", "--src", voc, "--dst", coco])
    assert rc == 0
    assert "converted 4 images" in capsys.readouterr().out

    vi = VOCIndex(voc, cfg.io.class_names)
    ci = COCOIndex(coco, cfg.io.class_names)
    for (vp, vl), (cp, cl) in zip(vi.items, ci.items):
        assert os.path.basename(vp) == os.path.basename(cp)
        np.testing.assert_allclose(cl, vl)


@pytest.mark.slow
def test_cli_eval_coco_format(tmp_path, monkeypatch):
    """`eval` on a COCO-layout directory (auto-detected) scores identically
    to the same data in VOC layout."""

    import jax
    import jax.numpy as jnp

    from yolofastest_tpu import configs
    from yolofastest_tpu.cli import main
    from yolofastest_tpu.models import YoloFastest, save_variables

    cfg = tiny_config()
    monkeypatch.setattr(configs, "get_config", lambda name="256x320", **kw: cfg)

    model = YoloFastest(num_cls=cfg.io.num_cls, num_anchors=cfg.io.num_anchors)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *cfg.io.input_hw, 1), jnp.float32),
                           train=False)
    wpath = str(tmp_path / "w.npz")
    save_variables(jax.device_get(variables), wpath)

    voc = str(tmp_path / "voc")
    coco = str(tmp_path / "coco")
    make_dataset(voc, 8, cfg, seed=2)
    voc_to_coco(voc, coco, cfg.io.class_names)

    outs = {}
    for name, d in (("voc", voc), ("coco", coco)):
        logdir = str(tmp_path / f"logs_{name}")
        jpath = str(tmp_path / f"metrics_{name}.json")
        rc = main(["eval", "--config", "256x320", "--weights", wpath,
                   "--val-dir", d, "--log-dir", logdir,
                   "--coco-map", "--json-out", jpath])
        assert rc == 0
        log = open(os.path.join(logdir, "eval_info.log")).read()
        outs[name] = [l.split("——")[-1] for l in log.splitlines()
                      if "mean AP" in l or "detection rate" in l]
        m = json.load(open(jpath))
        assert {"mAP", "mAP_grid", "mAP_per_iou", "per_class_ap",
                "target_num", "detection_rate"} <= set(m)
        assert len(m["mAP_per_iou"]) == 10
    assert outs["voc"] == outs["coco"] and outs["voc"]

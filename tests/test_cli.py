"""CLI smoke tests: txt2xml conversion, native-backend batch detect."""

import os

import numpy as np
import pytest

from yolofastest_tpu.cli import main
from yolofastest_tpu.models import zoo_path

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_txt2xml_roundtrip(tmp_path):
    import cv2

    src = tmp_path / "src"
    src.mkdir()
    img = np.zeros((100, 200, 3), np.uint8)
    cv2.imwrite(str(src / "a.jpg"), img)
    (src / "a.txt").write_text("0 0.5 0.5 0.2 0.4\n1 0.25 0.25 0.1 0.1\n")

    rc = main(["txt2xml", "--src", str(src), "--dst", str(tmp_path / "voc")])
    assert rc == 0

    from yolofastest_tpu.data import VOCIndex

    idx = VOCIndex(str(tmp_path / "voc"), ("carrier", "defender", "destroyer"))
    assert len(idx) == 1
    _, labels = idx[0]
    assert labels.shape == (2, 5)
    np.testing.assert_allclose(labels[0], [0, 80, 30, 120, 70], atol=0.5)


def test_txt2xml_rejects_unreadable_image(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "bad.jpg").write_bytes(b"not a jpeg")
    (src / "bad.txt").write_text("0 0.5 0.5 0.2 0.4\n")

    from yolofastest_tpu.data.txt2xml import convert_txt_dataset

    with pytest.raises(FileNotFoundError, match="cannot decode"):
        convert_txt_dataset(str(src), str(tmp_path / "voc"))


def test_cli_detect_native(tmp_path):
    if not os.path.exists(zoo_path("256x320")):
        pytest.skip("zoo weights not present")
    if not os.path.exists(os.path.join(REPO, "cpp", "build", "libyf.so")):
        pytest.skip("native library not built")
    import cv2

    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    data = tmp_path / "data"
    data.mkdir()
    for i in range(2):
        # synthesise a 3-channel 512x640 source so the CLI exercises the
        # full gray+resize preprocessing
        gray = fx["pre_imgs"][i]
        big = cv2.resize(gray, (640, 512))
        cv2.imwrite(str(data / f"im{i}.jpg"), cv2.cvtColor(big, cv2.COLOR_GRAY2BGR))

    out = tmp_path / "out"
    rc = main([
        "detect", "--config", "256x320", "--weights", zoo_path("256x320"),
        "--data", str(data), "--out", str(out), "--backend", "native",
    ])
    assert rc == 0
    results = [f for f in os.listdir(out) if f.startswith("result_")]
    assert len(results) == 2
    assert os.path.exists(out / "detect_info.log")


@pytest.mark.slow
def test_cli_export_writes_all_artifacts(tmp_path, monkeypatch):
    """`export` emits every interchange artifact: native .yfb (fp32 + int8),
    StableHLO (forward + detect pipeline), ONNX, and the TorchScript .pt —
    the reference's converter-zoo capability behind one command."""

    import jax
    import jax.numpy as jnp

    from tests.test_train import tiny_config
    from yolofastest_tpu import configs
    from yolofastest_tpu.models import YoloFastest, save_variables

    cfg = tiny_config()
    monkeypatch.setattr(configs, "get_config", lambda name="256x320", **kw: cfg)

    model = YoloFastest(num_cls=cfg.io.num_cls, num_anchors=cfg.io.num_anchors)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, *cfg.io.input_hw, 1), jnp.float32),
                           train=False)
    wpath = str(tmp_path / "w.npz")
    save_variables(jax.device_get(variables), wpath)

    out = tmp_path / "export"
    rc = main(["export", "--config", "256x320", "--weights", wpath,
               "--out", str(out), "--batch", "2"])
    assert rc == 0
    for artifact in ("model.yfb", "model_int8.yfb", "model.pt", "model.onnx",
                     "detect.onnx", "model.param", "model.bin",
                     "model.prototxt", "model.caffemodel",
                     "forward.stablehlo", "detect.stablehlo"):
        assert os.path.exists(out / artifact), artifact

    torch = pytest.importorskip("torch")
    m = torch.jit.load(str(out / "model.pt"))
    with torch.no_grad():
        large, small = m(torch.zeros((2, 1, *cfg.io.input_hw)))
    h, w = cfg.io.input_hw
    assert tuple(large.shape) == (2, cfg.io.num_out, h // 16, w // 16)
    assert tuple(small.shape) == (2, cfg.io.num_out, h // 32, w // 32)


def test_load_weights_rejects_arch_mismatch(tmp_path, monkeypatch):
    """A single-head (lite) tree served under the default --arch fastest must
    die with the clean `pass --arch lite` diagnostic — on EVERY loader path,
    including orbax checkpoint dirs (which bypass the .npz branch)."""
    import jax
    import jax.numpy as jnp

    from yolofastest_tpu.cli import _load_weights
    from yolofastest_tpu.models import YoloFastestLite, save_variables

    lite_vars = jax.device_get(YoloFastestLite(num_cls=3, num_anchors=3).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 1), jnp.float32),
        train=False))
    wpath = str(tmp_path / "lite.npz")
    save_variables(lite_vars, wpath)
    with pytest.raises(SystemExit, match="pass --arch lite"):
        _load_weights(wpath, arch="fastest")
    # the matching arch passes
    assert _load_weights(wpath, arch="lite")["params"]

    # checkpoint-dir path: same guard (stub the orbax restore — the dir
    # branch is what's under test, not orbax itself)
    import yolofastest_tpu.train as train_mod

    ckdir = tmp_path / "epoch_1"
    ckdir.mkdir()
    monkeypatch.setattr(train_mod, "checkpoint_variables",
                        lambda path, prefer_ema=True: lite_vars)
    with pytest.raises(SystemExit, match="pass --arch lite"):
        _load_weights(str(ckdir), arch="fastest")


def test_cli_rejects_arch_config_mismatch(tmp_path):
    """--arch lite with a two-head preset must fail fast (decode would
    otherwise silently pair the single head with the wrong anchor group)."""
    with pytest.raises(SystemExit, match="anchor group"):
        main(["export", "--config", "256x320", "--arch", "lite",
              "--weights", "nonexistent.npz", "--out", str(tmp_path)])
    with pytest.raises(SystemExit, match="anchor group"):
        main(["detect", "--config", "lite-256x320",
              "--weights", "nonexistent.npz",
              "--data", str(tmp_path), "--out", str(tmp_path)])


def test_txt2xml_ref_dump_dialect(tmp_path):
    """The reference's bespoke punctuated annotation dump
    (utils/txt2xml.py:53-60): 3 header lines, then rows whose tokens after
    the punctuation->space mapping are [_, name, ymin, xmin, ymax, xmax]
    in absolute pixels.  Auto-detected per file; mixed directories work."""
    import cv2

    src = tmp_path / "src"
    src.mkdir()
    img = np.zeros((100, 200, 3), np.uint8)
    cv2.imwrite(str(src / "ref.jpg"), img)
    (src / "ref.txt").write_text(
        "header line 1\nheader 2\nheader 3\n"
        "0 carrier{30,80,70,120}\n"        # ymin,xmin,ymax,xmax
        "1 destroyer{10,20,20,40}\n"
    )
    # a standard-YOLO file in the same directory (auto per-file detection)
    cv2.imwrite(str(src / "std.jpg"), img)
    (src / "std.txt").write_text("1 0.25 0.25 0.1 0.1\n")

    rc = main(["txt2xml", "--src", str(src), "--dst", str(tmp_path / "voc")])
    assert rc == 0

    from yolofastest_tpu.data import VOCIndex

    idx = VOCIndex(str(tmp_path / "voc"), ("carrier", "defender", "destroyer"))
    assert len(idx) == 2
    by_name = {os.path.basename(idx.items[i][0]): idx[i][1]
               for i in range(len(idx))}
    ref = by_name["ref.jpg"]
    assert ref.shape == (2, 5)
    np.testing.assert_allclose(ref[0], [0, 80, 30, 120, 70], atol=0.5)
    np.testing.assert_allclose(ref[1], [2, 20, 10, 40, 20], atol=0.5)
    assert by_name["std.jpg"].shape == (1, 5)

    # malformed ref-dump rows fail loud with file:line
    (src / "bad.txt").write_text("h\nh\nh\n0 carrier{30,80}\n")
    cv2.imwrite(str(src / "bad.jpg"), img)
    from yolofastest_tpu.data.txt2xml import convert_txt_dataset

    with pytest.raises(ValueError, match="bad.txt:4"):
        convert_txt_dataset(str(src), str(tmp_path / "voc2"))

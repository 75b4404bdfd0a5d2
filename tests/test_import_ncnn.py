"""ncnn import: compiled .param/.bin artifacts -> folded graph -> every
backend.

Migration story the reference cannot offer: a user whose only model is the
compiled embedded artifact (the reference ships
``models/ncnn/*/YOLO-Fastest_epoch_*-opt.{param,bin}``) can lift it into
the framework — ``import_ncnn`` aligns blobs to graph names by verified
weighted-layer order, ``unfold_to_variables`` lifts the folded dict into a
standard flax variables tree with identity batch norms, and from there the
normal `--weights` path serves it on any backend.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolofastest_tpu.export import export_ncnn, import_ncnn
from yolofastest_tpu.models import (
    YoloFastest,
    fold_batchnorm,
    folded_apply,
    load_variables,
    save_variables,
    unfold_to_variables,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
REF_NCNN = "/root/reference/models/ncnn/256x320/YOLO-Fastest_epoch_28-opt"


def _random_folded(arch, seed):
    if arch == "yolofastest":
        from yolofastest_tpu.models import YoloFastest as M
    else:
        from yolofastest_tpu.models import YoloFastestLite as M
    model = M(num_cls=3, num_anchors=3)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 64, 96, 1), jnp.float32), train=False)
    return fold_batchnorm(jax.device_get(variables))


@pytest.mark.parametrize("arch", ["yolofastest", "yolofastest-lite"])
def test_export_import_roundtrip_exact(tmp_path, arch):
    """export_ncnn -> import_ncnn reproduces the folded dict bitwise
    (float32 passthrough both ways), and auto-detects the arch."""
    folded = _random_folded(arch, 0)
    pp = str(tmp_path / "m.param")
    export_ncnn(folded, (64, 96), pp, arch=arch)
    back, detected = import_ncnn(pp)
    assert detected == arch
    assert set(back) == set(folded)
    for name in folded:
        np.testing.assert_array_equal(back[name]["kernel"],
                                      np.asarray(folded[name]["kernel"],
                                                 np.float32), err_msg=name)
        np.testing.assert_array_equal(back[name]["bias"],
                                      np.asarray(folded[name]["bias"],
                                                 np.float32), err_msg=name)


def test_unfold_refolds_bitwise():
    """unfold_to_variables produces a real variables tree (identity BN)
    whose re-fold is bitwise equal to the input folded dict."""
    folded = _random_folded("yolofastest", 1)
    f32 = {k: {f: np.asarray(v[f], np.float32) for f in ("kernel", "bias")}
           for k, v in folded.items()}
    variables = unfold_to_variables(f32)
    assert set(variables) == {"params", "batch_stats"}
    refolded = fold_batchnorm(variables)
    for name in f32:
        np.testing.assert_array_equal(refolded[name]["kernel"],
                                      f32[name]["kernel"], err_msg=name)
        np.testing.assert_array_equal(refolded[name]["bias"],
                                      f32[name]["bias"], err_msg=name)


def test_unfolded_variables_drive_model_apply():
    """The lifted tree is a drop-in for the flax model itself: model.apply
    with identity BNs equals the folded forward."""
    folded = _random_folded("yolofastest", 2)
    variables = jax.tree.map(jnp.asarray, unfold_to_variables(folded))
    model = YoloFastest(num_cls=3, num_anchors=3)
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((2, 64, 96, 1)).astype(np.float32))
    a_large, a_small = model.apply(variables, x, train=False)
    f_large, f_small = folded_apply(jax.tree.map(jnp.asarray, folded), x)
    np.testing.assert_allclose(np.asarray(a_large), np.asarray(f_large),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_small), np.asarray(f_small),
                               rtol=1e-5, atol=1e-5)


def test_import_rejects_non_yolo_graph(tmp_path):
    """A param whose weighted-layer sequence doesn't match either arch
    fails fast with a diagnostic, not a garbage import."""
    pp = str(tmp_path / "bad.param")
    with open(pp, "w") as f:
        f.write("7767517\n2 2\n")
        f.write("Input            data  0 1 data 0=96 1=64 2=1\n")
        f.write("Convolution      c0    1 1 data c0 0=8 1=3 5=1 6=72\n")
    with open(pp[:-6] + ".bin", "wb") as f:
        f.write(np.zeros(1 + 72 + 8, np.float32).tobytes())
    with pytest.raises(ValueError, match="match neither arch"):
        import_ncnn(pp)


@pytest.mark.slow
def test_import_reference_artifact_matches_golden(tmp_path):
    """The reference's OWN shipped compiled artifact imports and reproduces
    the committed golden logits through the JAX folded forward — the
    'bring your embedded model to TPU' path, end to end through the
    variables bridge and a save/load cycle."""
    if not os.path.exists(REF_NCNN + ".param"):
        pytest.skip("reference ncnn artifacts not present")
    folded, arch = import_ncnn(REF_NCNN + ".param")
    assert arch == "yolofastest"

    wpath = str(tmp_path / "imported.npz")
    save_variables(unfold_to_variables(folded), wpath)
    refolded = fold_batchnorm(load_variables(wpath))

    fx = np.load(os.path.join(FIXTURES, "golden_256x320.npz"))
    imgs = (fx["pre_imgs"][:2].astype(np.float32)[..., None] - 128.0) / 255.0
    large, small = folded_apply(jax.tree.map(jnp.asarray, refolded),
                                jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(large).transpose(0, 3, 1, 2),
                               fx["logits_large"][:2], atol=2e-3)
    np.testing.assert_allclose(np.asarray(small).transpose(0, 3, 1, 2),
                               fx["logits_small"][:2], atol=2e-3)


@pytest.mark.slow
def test_cli_convert_ncnn_then_detect(tmp_path):
    """CLI end to end: `convert --ncnn` writes a zoo-format .npz that
    `detect` consumes unchanged, reproducing the golden detections of the
    native .pth-derived weights on the same images."""
    if not os.path.exists(REF_NCNN + ".param"):
        pytest.skip("reference ncnn artifacts not present")
    from yolofastest_tpu.cli import main

    wpath = str(tmp_path / "imported.npz")
    rc = main(["convert", "--ncnn", REF_NCNN + ".param", "--out", wpath])
    assert rc == 0

    ref_imgs = "/root/reference/test_data"
    if not os.path.isdir(ref_imgs):
        pytest.skip("reference test images not present")
    import shutil

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    name = sorted(os.listdir(ref_imgs))[0]
    shutil.copy(os.path.join(ref_imgs, name), img_dir / name)

    out = tmp_path / "det"
    rc = main(["detect", "--config", "256x320", "--weights", wpath,
               "--data", str(img_dir), "--out", str(out)])
    assert rc == 0
    assert (out / ("result_" + name)).exists()
    log = (out / "detect_info.log").read_text()
    assert name.rsplit(".", 1)[0] in log


@pytest.mark.parametrize("blob", ["", "junk\n", "7767517\n",
                                  "7767517\n2 2\nConvolution c0 x\n",
                                  "7767517\n3 3\nInput data 0 1 data\n"])
def test_import_corrupt_param_fails_clean(tmp_path, blob):
    """Malformed .param text raises ValueError with the path — never a raw
    IndexError/int() error out of the token walker."""
    pp = str(tmp_path / "junk.param")
    with open(pp, "w") as f:
        f.write(blob)
    with open(pp[:-6] + ".bin", "wb") as f:
        f.write(b"")
    with pytest.raises(ValueError, match="junk.param"):
        import_ncnn(pp)


def test_import_truncation_fuzz_never_raw_exception(tmp_path):
    """Parser contract under systematic truncation: cutting a REAL export at
    any byte offset either imports cleanly or raises ValueError — never an
    IndexError / struct.error / UnicodeDecodeError out of the token walker
    or the .bin reader.  Covers both the .param text and the .bin payload
    (the single-offset tests above only probe one cut point each)."""
    folded = _random_folded("yolofastest", 3)
    base = str(tmp_path / "m")
    export_ncnn(folded, (64, 96), base + ".param", base + ".bin")
    param = open(base + ".param", "rb").read()
    binary = open(base + ".bin", "rb").read()

    def try_import(pp):
        try:
            import_ncnn(pp)
        except ValueError:
            pass  # the documented failure mode

    for frac in range(1, 16):
        cut = len(param) * frac // 16
        p = str(tmp_path / f"p{frac}.param")
        with open(p, "wb") as f:
            f.write(param[:cut])
        with open(p[:-6] + ".bin", "wb") as f:
            f.write(binary)
        try_import(p)
    for frac in range(0, 16):
        cut = len(binary) * frac // 16
        p = str(tmp_path / f"b{frac}.param")
        with open(p, "wb") as f:
            f.write(param)
        with open(p[:-6] + ".bin", "wb") as f:
            f.write(binary[:cut])
        try_import(p)

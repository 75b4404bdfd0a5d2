"""ONNX import: .onnx artifacts -> flax variables -> every backend.

Closes the import matrix: the reference ships ``.pth`` (torch state dict),
``.onnx`` (``convert_model/pytorch_to_onnx.py``) and compiled ncnn
artifacts; all three now lift back into the framework.  The ONNX path is
the strongest of the three — torch's exporter preserves
BatchNormalization nodes, so ``import_onnx`` reconstructs the *unfolded*
variables tree bitwise equal to converting the matching ``.pth``: the
result is trainable, not just deployable.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolofastest_tpu.export import export_onnx, export_onnx_qdq, import_onnx
from yolofastest_tpu.models import (
    fold_batchnorm,
    load_variables,
    unfold_to_variables,
    zoo_path,
)

REF_ONNX = {
    "256x320": "/root/reference/models/onnx/256x320/YOLO-Fastest_epoch_28.onnx",
    "512x640": "/root/reference/models/onnx/512x640/YOLO-Fastest_epoch_27.onnx",
}
REF_PTH = {
    "256x320": "/root/reference/models/pytorch/256x320/YOLO-Fastest_epoch_28.pth",
    "512x640": "/root/reference/models/pytorch/512x640/YOLO-Fastest_epoch_27.pth",
}


def _assert_trees_equal(got, want):
    fa = jax.tree_util.tree_flatten_with_path(got)[0]
    ta = jax.tree_util.tree_flatten_with_path(want)[0]
    assert [k for k, _ in fa] == [k for k, _ in ta]
    for (k, a), (_, b) in zip(fa, ta):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            err_msg=jax.tree_util.keystr(k))


@pytest.mark.parametrize("res", ["256x320", "512x640"])
def test_reference_onnx_bitwise_equals_pth(res):
    """The reference's shipped .onnx imports to the exact unfolded tree the
    matching .pth converts to — same epochs, same fp32 bytes."""
    if not os.path.exists(REF_ONNX[res]):
        pytest.skip("reference onnx artifacts not present")
    from yolofastest_tpu.models.torch_io import load_torch_checkpoint

    variables, arch, bn_preserved = import_onnx(REF_ONNX[res])
    assert arch == "yolofastest" and bn_preserved is True
    _assert_trees_equal(variables, load_torch_checkpoint(REF_PTH[res]))


@pytest.mark.parametrize(
    "zoo,arch", [("256x320", "yolofastest"),
                 ("lite_256x320", "yolofastest-lite")])
def test_own_export_roundtrip_bitwise(tmp_path, zoo, arch):
    """Our BN-folded export re-imports to the identity-lifted variables
    tree, bitwise, with the arch auto-detected."""
    folded = fold_batchnorm(load_variables(zoo_path(zoo)))
    p = str(tmp_path / "m.onnx")
    export_onnx(folded, (256, 320), p, arch=arch)
    variables, detected, bn_preserved = import_onnx(p)
    assert detected == arch and bn_preserved is False
    _assert_trees_equal(variables, unfold_to_variables(
        jax.tree.map(lambda a: np.asarray(a, np.float32), folded)))


def test_import_rejects_qdq(tmp_path):
    """The int8 QDQ artifact fails fast with a pointer to the fp32 one —
    quantisation is re-derived by calibrate(), not parsed back."""
    from yolofastest_tpu.quant import calibrate, quantize_weights

    variables = load_variables(zoo_path("256x320"))
    folded = fold_batchnorm(variables)
    qp = quantize_weights(folded)
    cal = jnp.zeros((1, 64, 96, 1), jnp.float32)
    scales = calibrate(folded, [cal])
    p = str(tmp_path / "q.onnx")
    export_onnx_qdq(qp, scales, (64, 96), p)
    with pytest.raises(ValueError, match="QDQ"):
        import_onnx(p)


def test_import_rejects_wrong_graph(tmp_path):
    """A weighted-node sequence matching neither arch fails fast."""
    from yolofastest_tpu.export.onnx import _OnnxExecutor

    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    # simplest wrong graph: a single-conv model
    ex = _OnnxExecutor(folded)
    y = ex.conv("input", "conv0", 3, stride=2)
    from yolofastest_tpu.export.onnx import _node
    ex.nodes.append(_node("Identity", [y], ["head_small"], "out"))
    import yolofastest_tpu.export.onnx as onnx_mod

    graph = b"".join(onnx_mod._ld(1, n) for n in ex.nodes)
    graph += b"".join(onnx_mod._ld(5, t) for t in ex.initializers)
    graph += onnx_mod._ld(11, onnx_mod._value_info("input", ("N", 1, 64, 96)))
    graph += onnx_mod._ld(12, onnx_mod._value_info("head_small", ("N", 24, 2, 3)))
    model = (onnx_mod._i(1, 7) + onnx_mod._ld(7, graph)
             + onnx_mod._ld(8, onnx_mod._i(2, 13)))
    p = str(tmp_path / "bad.onnx")
    with open(p, "wb") as f:
        f.write(model)
    with pytest.raises(ValueError, match="match neither arch"):
        import_onnx(p)


@pytest.mark.slow
def test_cli_convert_onnx_matches_zoo(tmp_path):
    """CLI end to end: `convert --onnx <reference artifact>` writes a zoo
    .npz bitwise equal to the shipped one (which came from the .pth)."""
    if not os.path.exists(REF_ONNX["256x320"]):
        pytest.skip("reference onnx artifacts not present")
    from yolofastest_tpu.cli import main

    wpath = str(tmp_path / "from_onnx.npz")
    rc = main(["convert", "--onnx", REF_ONNX["256x320"], "--out", wpath])
    assert rc == 0
    a = np.load(wpath)
    b = np.load(zoo_path("256x320"))
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


@pytest.mark.slow
def test_onnx_weights_drive_detect_golden(tmp_path):
    """`detect --weights <reference .onnx>` directly (no convert step)
    reproduces a golden detection — the one-command migration path."""
    if not os.path.exists(REF_ONNX["256x320"]):
        pytest.skip("reference onnx artifacts not present")
    ref_imgs = "/root/reference/test_data"
    if not os.path.isdir(ref_imgs):
        pytest.skip("reference test images not present")
    import shutil

    from yolofastest_tpu.cli import main

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    name = sorted(os.listdir(ref_imgs))[0]
    shutil.copy(os.path.join(ref_imgs, name), img_dir / name)
    out = tmp_path / "det"
    rc = main(["detect", "--config", "256x320", "--weights",
               REF_ONNX["256x320"], "--data", str(img_dir), "--out", str(out)])
    assert rc == 0
    assert (out / ("result_" + name)).exists()


@pytest.mark.parametrize("blob", [
    b"", b"\x00", os.urandom(256),
    b"\x3a\x04\x08\x01\x12\x00",  # valid-ish proto, wrong message shape
])
def test_import_corrupt_bytes_fail_clean(tmp_path, blob):
    """Garbage byte streams raise ValueError with the path — never a raw
    IndexError/StopIteration out of the wire-format walker."""
    p = str(tmp_path / "junk.onnx")
    with open(p, "wb") as f:
        f.write(blob)
    with pytest.raises(ValueError):
        import_onnx(p)


def test_import_truncated_real_artifact_fails_clean(tmp_path):
    """A real export cut mid-initializer fails with a diagnostic."""
    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    full = str(tmp_path / "full.onnx")
    export_onnx(folded, (64, 96), full)
    data = open(full, "rb").read()
    p = str(tmp_path / "trunc.onnx")
    with open(p, "wb") as f:
        f.write(data[: len(data) // 2])
    with pytest.raises(ValueError):
        import_onnx(p)


def test_import_wire0_optype_fails_clean(tmp_path):
    """A NodeProto whose op_type field arrives as a varint (wire 0) —
    reachable from random bytes — must fail as ValueError, not
    AttributeError out of .decode() (code-review finding)."""
    p = str(tmp_path / "w0.onnx")
    with open(p, "wb") as f:
        f.write(bytes.fromhex("3a040a022001"))
    with pytest.raises(ValueError):
        import_onnx(p)


def test_weights_arch_mismatch_fails_clean(tmp_path):
    """CLI: a lite .onnx under the default --arch fastest exits with a
    clean diagnostic instead of a KeyError in the topology walk."""
    from yolofastest_tpu.cli import main

    folded = fold_batchnorm(load_variables(zoo_path("lite_256x320")))
    p = str(tmp_path / "lite.onnx")
    export_onnx(folded, (256, 320), p, arch="yolofastest-lite")
    with pytest.raises(SystemExit, match="single-head"):
        main(["info", "--config", "256x320", "--weights", p])


def test_import_truncation_fuzz_never_raw_exception(tmp_path):
    """Parser contract under systematic truncation: a real .onnx cut at any
    of 32 byte offsets either imports cleanly or raises ValueError — never a
    raw IndexError / OverflowError out of the wire-format walker (the
    single-offset test above probes only len/2)."""
    folded = fold_batchnorm(load_variables(zoo_path("256x320")))
    full = str(tmp_path / "full.onnx")
    export_onnx(folded, (64, 96), full)
    data = open(full, "rb").read()
    for frac in range(1, 32):
        cut = len(data) * frac // 32
        p = str(tmp_path / f"t{frac}.onnx")
        with open(p, "wb") as f:
            f.write(data[:cut])
        try:
            import_onnx(p)
        except ValueError:
            pass  # the documented failure mode

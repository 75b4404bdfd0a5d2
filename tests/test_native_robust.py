"""Native ``.yfb`` loader robustness: corrupt or adversarial weight files
must fail with a clean Python ``RuntimeError`` — never a crash, hang, or
multi-GB allocation.  (The reference's ncnn loader aborts the process on a
bad param file; ours is a library, so load failure must be recoverable —
``cpp/src/weights.cpp`` bounds every header field before allocating and
validates the payload size against the declared shape, and ``yf_create``
translates any exception into a null handle.)
"""

import os
import struct

import pytest

from yolofastest_tpu.configs import get_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(REPO, "cpp", "build", "libyf.so")

pytestmark = pytest.mark.skipif(
    not os.path.exists(LIB), reason="native library not built"
)


def _entry(name: bytes, dtype: int, shape, payload: bytes) -> bytes:
    buf = struct.pack("<I", len(name)) + name
    buf += struct.pack("<II", dtype, len(shape))
    buf += struct.pack(f"<{len(shape)}I", *shape)
    buf += struct.pack("<Q", len(payload)) + payload
    return buf


def _file(entries, magic=b"YFWB", version=1) -> bytes:
    return magic + struct.pack("<II", version, len(entries)) + b"".join(entries)


def _expect_load_failure(tmp_path, blob: bytes):
    from yolofastest_tpu.native import NativeEngine

    path = tmp_path / "bad.yfb"
    path.write_bytes(blob)
    with pytest.raises(RuntimeError, match="failed to load weights"):
        NativeEngine(str(path), get_config("256x320"))


def test_bad_magic(tmp_path):
    _expect_load_failure(tmp_path, _file([], magic=b"XXXX"))


def test_bad_version(tmp_path):
    _expect_load_failure(tmp_path, _file([], version=99))


def test_truncated_mid_entry(tmp_path):
    good = _entry(b"conv0/kernel", 0, (3, 3, 1, 16), b"\0" * (4 * 9 * 16))
    _expect_load_failure(tmp_path, _file([good])[:-7])


def test_empty_file(tmp_path):
    _expect_load_failure(tmp_path, b"")


def test_missing_file(tmp_path):
    from yolofastest_tpu.native import NativeEngine

    with pytest.raises(RuntimeError, match="failed to load weights"):
        NativeEngine(str(tmp_path / "nonexistent.yfb"), get_config("256x320"))


def test_huge_name_length(tmp_path):
    # name_len = 0xFFFFFFFF: must be rejected by the bound check, not
    # attempted as a 4 GB string allocation.
    blob = b"YFWB" + struct.pack("<II", 1, 1) + struct.pack("<I", 0xFFFFFFFF)
    _expect_load_failure(tmp_path, blob)


def test_huge_rank(tmp_path):
    blob = (b"YFWB" + struct.pack("<II", 1, 1)
            + struct.pack("<I", 1) + b"x" + struct.pack("<II", 0, 0x10000))
    _expect_load_failure(tmp_path, blob)


def test_huge_entry_count(tmp_path):
    _expect_load_failure(
        tmp_path, b"YFWB" + struct.pack("<II", 1, 0xFFFFFFFF))


def test_payload_shape_mismatch_f32(tmp_path):
    # declares (3,3,1,16) f32 but ships 8 bytes: the size/shape consistency
    # check must fire (previously this read garbage into a short tensor).
    bad = _entry(b"conv0/kernel", 0, (3, 3, 1, 16), b"\0" * 8)
    _expect_load_failure(tmp_path, _file([bad]))


def test_payload_shape_mismatch_i8(tmp_path):
    bad = _entry(b"conv0/kernel_q", 1, (1, 1, 8, 16), b"\0" * 4)
    _expect_load_failure(tmp_path, _file([bad]))


def test_huge_declared_payload(tmp_path):
    # nbytes = 16 GB with a tiny shape: rejected by the consistency check
    # before any allocation.
    bad = (struct.pack("<I", 1) + b"k" + struct.pack("<II", 0, 1)
           + struct.pack("<I", 4) + struct.pack("<Q", 1 << 34))
    _expect_load_failure(tmp_path, b"YFWB" + struct.pack("<II", 1, 1) + bad)


def test_consistent_but_huge_shape(tmp_path):
    # A ~60-byte file declaring a (65536, 65536) f32 tensor with a CONSISTENT
    # nbytes (16 GiB): the elems bound must reject it before the zero-filling
    # resize can OOM the process (the payload itself is absent).
    bad = (struct.pack("<I", 1) + b"k" + struct.pack("<II", 0, 2)
           + struct.pack("<II", 65536, 65536)
           + struct.pack("<Q", 4 * (1 << 32)))
    _expect_load_failure(tmp_path, b"YFWB" + struct.pack("<II", 1, 1) + bad)


def test_implausible_shape_product(tmp_path):
    # dims whose product overflows the 2^32 element bound
    bad = (struct.pack("<I", 1) + b"k" + struct.pack("<II", 0, 4)
           + struct.pack("<IIII", 0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF)
           + struct.pack("<Q", 16))
    _expect_load_failure(tmp_path, b"YFWB" + struct.pack("<II", 1, 1) + bad)


def test_unknown_dtype(tmp_path):
    bad = _entry(b"k", 7, (1,), b"\0\0\0\0")
    _expect_load_failure(tmp_path, _file([bad]))


def test_valid_header_missing_layers(tmp_path):
    # A structurally valid file that simply lacks the model's layers must
    # also fail cleanly (model construction errors cross the C ABI too).
    ok = _entry(b"not_a_layer/kernel", 0, (1, 1, 1, 1), b"\0\0\0\0")
    _expect_load_failure(tmp_path, _file([ok]))

"""Caffe-LMDB dataset reader (reference ``Caffe/caffe_lmdb.py:5-34``).

The reference reads Caffe training LMDBs through the ``lmdb`` C binding +
generated protobuf; neither exists here, so ``data/lmdb_reader.py``
implements the public on-disk formats directly (LMDB B+tree pages, Datum
wire coding).  These tests round-trip through the module's own minimal
writer — exercising single-leaf, multi-leaf + branch-root, overflow-chain
and empty environments — and lock the malformed-file error contract.
"""

import os
import struct

import numpy as np
import pytest

from yolofastest_tpu.data import (CaffeLMDBReader, decode_datum,
                                  encode_datum, write_caffe_lmdb)


def _items(n, shape=(1, 8, 8), seed=0):
    rng = np.random.default_rng(seed)
    return [(rng.integers(0, 256, shape, dtype=np.uint8), i % 3)
            for i in range(n)]


def test_datum_wire_roundtrip():
    arr = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    data, label = decode_datum(encode_datum(arr, 2))
    assert label == 2
    np.testing.assert_array_equal(data, arr)
    with pytest.raises(ValueError, match="no pixel data"):
        decode_datum(b"\x08\x01")  # channels only
    with pytest.raises(ValueError, match="data size"):
        decode_datum(b"\x08\x02\x10\x02\x18\x02\x22\x01\x00")


def test_single_leaf_roundtrip(tmp_path):
    items = _items(5)
    env = str(tmp_path / "env")
    assert write_caffe_lmdb(env, items) == 5
    r = CaffeLMDBReader(env)
    assert len(r) == 5
    got = list(r)
    for (a, l), (b, m) in zip(items, got):
        assert l == m
        np.testing.assert_array_equal(a, b)
    # keys come back in Caffe's %08d order
    keys = [k for k, _ in r.items()]
    assert keys == sorted(keys) == [b"%08d" % i for i in range(5)]


def test_multi_leaf_branch_root_roundtrip(tmp_path):
    # 40 x ~100-byte nodes exceed one 4096-byte page -> branch root
    items = _items(40)
    env = str(tmp_path / "env")
    write_caffe_lmdb(env, items)
    got = list(CaffeLMDBReader(env))
    assert len(got) == 40
    for (a, l), (b, m) in zip(items, got):
        assert l == m
        np.testing.assert_array_equal(a, b)


def test_overflow_values_roundtrip(tmp_path):
    # a realistic net-input-sized Datum (1x64x80 = 5 KB) and a multi-page
    # one (3x40x50 = 6 KB) both exceed half a page -> overflow chains
    items = _items(3) + [
        (np.random.default_rng(1).integers(0, 256, (1, 64, 80), np.uint8), 2),
        (np.random.default_rng(2).integers(0, 256, (3, 40, 50), np.uint8), 0),
    ]
    env = str(tmp_path / "env")
    write_caffe_lmdb(env, items)
    got = list(CaffeLMDBReader(env))
    assert len(got) == len(items)
    for (a, l), (b, m) in zip(items, got):
        assert l == m
        np.testing.assert_array_equal(a, b)


def test_empty_environment(tmp_path):
    env = str(tmp_path / "env")
    assert write_caffe_lmdb(env, []) == 0
    r = CaffeLMDBReader(env)
    assert len(r) == 0
    assert list(r) == []


def test_malformed_files_fail_loud(tmp_path):
    with pytest.raises(ValueError, match="no such environment"):
        CaffeLMDBReader(str(tmp_path / "missing"))
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "data.mdb").write_bytes(b"x" * 9000)
    with pytest.raises(ValueError, match="bad meta pages"):
        CaffeLMDBReader(str(bad))
    # valid metas but root pointing beyond the file
    env = str(tmp_path / "env")
    write_caffe_lmdb(env, _items(2))
    blob = bytearray(open(os.path.join(env, "data.mdb"), "rb").read())
    for off in (16, 4096 + 16):  # both metas: corrupt main-db root
        struct.pack_into("<Q", blob, off + 24 + 48 + 40, 10_000)
    (bad / "data.mdb").write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="root page"):
        CaffeLMDBReader(str(bad))


def test_truncation_fuzz(tmp_path):
    """Every truncation of a valid environment must either raise ValueError
    or return a consistent prefix — never crash or hang (the same
    succeed-or-ValueError contract as the other binary importers)."""
    env = str(tmp_path / "env")
    write_caffe_lmdb(env, _items(12) + [
        (np.zeros((1, 64, 80), np.uint8), 1)])
    blob = open(os.path.join(env, "data.mdb"), "rb").read()
    bad = tmp_path / "t"
    bad.mkdir()
    for cut in range(0, len(blob), 997):
        (bad / "data.mdb").write_bytes(blob[:cut])
        try:
            list(CaffeLMDBReader(str(bad)))
        except ValueError:
            pass

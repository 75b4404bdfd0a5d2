"""ONNX export of the folded deployment graph — zero-dependency writer.

ONNX is the reference's primary interchange format: ``torch.onnx._export``
produces the graph the ncnn toolchain consumes
(``convert_model/pytorch_to_onnx.py:17-23``).  This module completes our
format matrix (StableHLO, TorchScript, native ``.yfb``, ONNX) with the
literal ``.onnx`` format.

There is no ``onnx`` package in the image and none is needed: an ONNX file
is a protobuf ``ModelProto``, and the protobuf wire format is a small,
stable binary encoding (varint tags + length-delimited submessages).  The
exporter below serialises the folded graph directly — the same declarative
topology walk (:func:`yolofastest_tpu.models.graph.walk_topology`) that
drives every other backend, via an executor whose "tensors" are ONNX value
names and whose ops append ``NodeProto``s.  Standard opset 13, NCHW, the
exact op set the reference's exported ONNX uses: Conv / Relu / Add /
Concat / ConvTranspose.

I/O convention matches the reference's exported models: conv-only graph
(no sigmoid/decode inside — SURVEY.md §3.5), input ``input`` is normalized
grayscale ``(N, 1, H, W)`` float32 (``(pixel - 128) / 255``), outputs are
raw ``head_large`` / ``head_small`` logit maps in NCHW (lite: ``head_small``
only).  The batch dimension is exported symbolically (``dim_param "N"``).

Verified by an independent consumer: ``tools/onnx_check.py`` re-parses the
wire format from scratch (no shared code with this writer beyond the
protobuf spec) and executes the graph in pure numpy;
``tests/test_export_onnx.py`` runs it in a fresh process against the
committed reference golden logits.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Tuple

import numpy as np

from yolofastest_tpu.models.graph import Executor, walk_topology, walk_topology_lite

# --------------------------------------------------------------- wire format
# Wire types: 0 = varint, 2 = length-delimited (the only two ONNX needs
# here; floats ride in length-delimited raw_data).


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (submessage / string / bytes / packed)."""
    return _tag(field, 2) + _varint(len(payload)) + payload


def _s(field: int, text: str) -> bytes:
    return _ld(field, text.encode("utf-8"))


def _i(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(value)


def _packed_ints(field: int, values) -> bytes:
    return _ld(field, b"".join(_varint(v) for v in values))


# ------------------------------------------------------------ ONNX messages
_FLOAT = 1  # TensorProto.DataType.FLOAT
_ATTR_INT, _ATTR_INTS = 2, 7  # AttributeProto.AttributeType


def _tensor(name: str, array: np.ndarray) -> bytes:
    """TensorProto: dims(1) data_type(2) name(8) raw_data(9)."""
    a = np.ascontiguousarray(array, dtype=np.float32)
    return (_packed_ints(1, a.shape) + _i(2, _FLOAT) + _s(8, name)
            + _ld(9, a.tobytes()))  # raw_data is little-endian on all hosts we target


def _attr_int(name: str, value: int) -> bytes:
    return _s(1, name) + _i(3, value) + _i(20, _ATTR_INT)


def _attr_ints(name: str, values) -> bytes:
    return _s(1, name) + _packed_ints(8, values) + _i(20, _ATTR_INTS)


def _node(op_type: str, inputs: List[str], outputs: List[str], name: str,
          attrs: List[bytes] = ()) -> bytes:
    """NodeProto: input(1) output(2) name(3) op_type(4) attribute(5)."""
    buf = b"".join(_s(1, i) for i in inputs)
    buf += b"".join(_s(2, o) for o in outputs)
    buf += _s(3, name) + _s(4, op_type)
    buf += b"".join(_ld(5, a) for a in attrs)
    return buf


def _value_info(name: str, shape: Tuple) -> bytes:
    """ValueInfoProto with a float tensor type; str dims become dim_param."""
    dims = b""
    for d in shape:
        dims += _ld(1, _s(2, d) if isinstance(d, str) else _i(1, int(d)))
    tensor_type = _i(1, _FLOAT) + _ld(2, dims)  # elem_type, shape
    return _s(1, name) + _ld(2, _ld(1, tensor_type))  # name, type.tensor_type


# ----------------------------------------------------------------- executor
class _OnnxExecutor(Executor):
    """Topology-walk executor whose tensors are ONNX value names: every op
    appends a ``NodeProto`` + weight initializers (NCHW / OIHW layouts,
    converted from the folded graph's HWIO exactly as the torch exporter
    does — ``export/torchscript.py:80-85``)."""

    def __init__(self, folded: Dict[str, Dict[str, Any]]):
        self.p = folded
        self.nodes: List[bytes] = []
        self.initializers: List[bytes] = []
        self._n = 0

    def _uniq(self, stem: str) -> str:
        self._n += 1
        return f"{stem}_{self._n}"

    def _weights(self, name: str, depthwise: bool, deconv: bool = False):
        k = np.asarray(self.p[name]["kernel"], np.float32)
        # HWIO (kh,kw,I,O) -> OIHW; depthwise (kh,kw,1,C) -> (C,1,kh,kw);
        # deconv (2,2,Cin,Cout) -> ONNX ConvTranspose's (Cin,Cout,kh,kw)
        k = k.transpose((2, 3, 0, 1) if deconv else (3, 2, 0, 1))
        wn, bn = f"{name}.weight", f"{name}.bias"
        self.initializers.append(_tensor(wn, k))
        self.initializers.append(_tensor(bn, np.asarray(self.p[name]["bias"], np.float32)))
        return wn, bn

    def _conv(self, x, name, kernel, stride, groups, pad, wn, bn,
              op="Conv") -> str:
        out = self._uniq(name)
        attrs = [
            _attr_ints("dilations", (1, 1)),
            _attr_int("group", groups),
            _attr_ints("kernel_shape", (kernel, kernel)),
            _attr_ints("pads", (pad, pad, pad, pad)),
            _attr_ints("strides", (stride, stride)),
        ]
        self.nodes.append(_node(op, [x, wn, bn], [out], name, attrs))
        return out

    def _relu(self, x: str) -> str:
        out = self._uniq("relu")
        self.nodes.append(_node("Relu", [x], [out], out))
        return out

    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        groups = int(self.p[name]["kernel"].shape[-1]) if depthwise else 1
        wn, bn = self._weights(name, depthwise)
        y = self._conv(x, name, kernel, stride, groups, (kernel - 1) // 2, wn, bn)
        return self._relu(y) if act else y

    def deconv2x(self, x, name):
        wn, bn = self._weights(name, depthwise=False, deconv=True)
        y = self._conv(x, name, 2, 2, 1, 0, wn, bn, op="ConvTranspose")
        return self._relu(y)

    def head(self, x, name):
        wn, bn = self._weights(name, depthwise=False)
        return self._conv(x, name, 1, 1, 1, 0, wn, bn)

    def add(self, x, y):
        out = self._uniq("add")
        self.nodes.append(_node("Add", [x, y], [out], out))
        return out

    def concat(self, x, y):
        out = self._uniq("concat")
        self.nodes.append(_node("Concat", [x, y], [out], out,
                                [_attr_int("axis", 1)]))
        return out


# ------------------------------------------------------------------- export
OPSET = 13
_IR_VERSION = 7  # minimum IR for opset 13


def export_onnx(folded: Dict[str, Dict[str, Any]], input_hw, path: str,
                arch: str = "yolofastest") -> str:
    """Serialise the folded graph (``fold_batchnorm`` output) as ``.onnx``.

    ``input_hw`` is the net input ``(H, W)``.  The batch dimension is
    symbolic, so one artifact serves any batch size (unlike the traced
    TorchScript/StableHLO artifacts, which are shape-specialised).
    Returns ``path``.
    """
    walk = {"yolofastest": walk_topology, "yolofastest-lite": walk_topology_lite}[arch]
    ex = _OnnxExecutor(folded)
    result = walk("input", ex)

    if arch == "yolofastest":
        head_large, head_small = result
        outs = [("head_large", head_large, 16), ("head_small", head_small, 32)]
    else:
        outs = [("head_small", result, 32)]
    # Rename raw head outputs to their public names (the reference's ncnn
    # deploy notes require exactly these names — SURVEY.md §2.2)
    for public, internal, _ in outs:
        ex.nodes.append(_node("Identity", [internal], [public], f"out_{public}"))

    h, w = input_hw
    num_out = int(folded["head_5"]["kernel"].shape[-1])
    graph = b"".join(_ld(1, n) for n in ex.nodes)
    graph += _s(2, f"{arch}_{h}x{w}")
    graph += b"".join(_ld(5, t) for t in ex.initializers)
    graph += _ld(11, _value_info("input", ("N", 1, h, w)))
    for public, _, stride in outs:
        graph += _ld(12, _value_info(public, ("N", num_out, h // stride, w // stride)))

    model = (_i(1, _IR_VERSION) + _s(2, "yolofastest_tpu") + _s(3, "0.3")
             + _ld(7, graph) + _ld(8, _i(2, OPSET)))  # opset_import{version}

    with open(path, "wb") as f:
        f.write(model)
    return path

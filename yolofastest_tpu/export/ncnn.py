"""ncnn ``.param`` / ``.bin`` export of the folded deployment graph.

ncnn is the reference's embedded runtime: its deployment chain is
``.pth -> ONNX -> onnx2ncnn -> ncnnoptimize -> .param/.bin`` consumed by
``Detect_YOLO`` (``ncnn_deploy/src/YOLO_ncnn.cpp:12-14``), and the repo
ships the final artifacts (``models/ncnn/256x320/YOLO-Fastest_epoch_28-opt
.{param,bin}``).  This module emits that *final* optimised form directly
from the folded graph — no ONNX round-trip, no external converter — so a
reference user's existing ncnn deployment code can consume our models
unchanged (same ``data`` input blob, same ``head_large`` / ``head_small``
outputs, same ``(pixel - 128) / 255`` normalisation).

Format notes (locked empirically against the shipped reference artifacts in
``tests/test_export_ncnn.py``):

* ``.param`` is the magic-``7767517`` text format: one layer per line,
  ``type name n_in n_out in-blobs... out-blobs... k=v...``.  BN is already
  folded (the ``-opt`` form), ReLU rides the conv's activation param
  (``9=1``).  Blobs consumed by more than one layer go through an explicit
  ``Split`` layer, ncnn's single-consumer SSA convention.
* ``.bin`` is the concatenation, in param-file layer order, of each
  weighted layer's ``uint32 quantisation tag`` (0 = fp32) + kernel floats +
  raw bias floats.  Kernel layout is OIHW for Convolution /
  ConvolutionDepthWise *and* Deconvolution (verified against the reference
  bin: our folded HWIO kernels transpose as ``(3, 2, 0, 1)``; no spatial
  flip).

The graph itself is the same declarative topology walk that drives every
other backend (`yolofastest_tpu.models.graph.walk_topology`), via an
executor whose "tensors" are blob names.  The independent numpy consumer
``tools/ncnn_check.py`` parses and executes both our exports and the
reference's own shipped models.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from yolofastest_tpu.models.graph import Executor, walk_topology, walk_topology_lite

_HEAD_BLOBS = {"head_4": "head_large", "head_5": "head_small"}


class _Layer:
    def __init__(self, typ: str, name: str, ins: List[str], outs: List[str],
                 params: Dict[int, str]):
        self.typ, self.name, self.ins, self.outs, self.params = (
            typ, name, ins, outs, params)


class _NcnnEmit(Executor):
    """Topology-walk executor whose tensors are ncnn blob names; emits the
    layer table and the weight chunks (in layer order) as a side effect."""

    def __init__(self, folded: Dict[str, Dict[str, np.ndarray]]):
        self.p = folded
        self.layers: List[_Layer] = []
        self.chunks: List[np.ndarray] = []  # per weighted layer: tag,k,b
        self._n = 0

    # -- helpers ----------------------------------------------------------
    def _blob(self, stem: str) -> str:
        self._n += 1
        return stem

    def _weights(self, kernel_oihw: np.ndarray, bias: np.ndarray) -> None:
        self.chunks.append(np.asarray([0], np.uint32).view(np.float32))
        self.chunks.append(np.ascontiguousarray(kernel_oihw, np.float32).ravel())
        self.chunks.append(np.asarray(bias, np.float32).ravel())

    # -- ops --------------------------------------------------------------
    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        p = self.p[name]
        k = np.asarray(p["kernel"], np.float32)  # HWIO
        nout = k.shape[3]
        pad = (kernel - 1) // 2
        wsize = int(k.size)
        params: Dict[int, str] = {0: str(nout), 1: str(kernel)}
        if stride != 1:
            params[3] = str(stride)
        if pad:
            params[4] = str(pad)
        params[5] = "1"
        params[6] = str(wsize)
        typ = "Convolution"
        if depthwise:
            typ = "ConvolutionDepthWise"
            params[7] = str(nout)
        if act:
            params[9] = "1"
        out = self._blob(name)
        self.layers.append(_Layer(typ, name, [x], [out], params))
        self._weights(k.transpose(3, 2, 0, 1), p["bias"])
        return out

    def deconv2x(self, x, name):
        p = self.p[name]
        k = np.asarray(p["kernel"], np.float32)  # (2, 2, Cin, Cout)
        nout = k.shape[3]
        params = {0: str(nout), 1: "2", 3: "2", 5: "1",
                  6: str(int(k.size)), 9: "1"}
        out = self._blob(name)
        self.layers.append(_Layer("Deconvolution", name, [x], [out], params))
        self._weights(k.transpose(3, 2, 0, 1), p["bias"])
        return out

    def head(self, x, name):
        p = self.p[name]
        k = np.asarray(p["kernel"], np.float32)
        out = self._blob(_HEAD_BLOBS[name])
        params = {0: str(k.shape[3]), 1: "1", 5: "1", 6: str(int(k.size))}
        self.layers.append(_Layer("Convolution", name, [x], [out], params))
        self._weights(k.transpose(3, 2, 0, 1), p["bias"])
        return out

    def add(self, x, y):
        out = self._blob(f"add_{len(self.layers)}")
        self.layers.append(_Layer("BinaryOp", out, [x, y], [out], {}))
        return out

    def concat(self, x, y):
        out = self._blob(f"cat_{len(self.layers)}")
        self.layers.append(_Layer("Concat", out, [x, y], [out], {}))
        return out


def _insert_splits(layers: List[_Layer]) -> List[_Layer]:
    """ncnn blobs are single-consumer: route every multiply-consumed blob
    through a Split layer placed right after its producer (matching the
    ``splitncnn`` convention of the reference's ncnnoptimize output)."""
    consumers: Dict[str, List[Any]] = {}
    for L in layers:
        for slot, blob in enumerate(L.ins):
            consumers.setdefault(blob, []).append((L, slot))

    out: List[_Layer] = []
    n_split = 0
    for L in layers:
        out.append(L)
        for blob in L.outs:
            cons = consumers.get(blob, [])
            if len(cons) > 1:
                outs = [f"{blob}_split{i}" for i in range(len(cons))]
                out.append(_Layer("Split", f"split{n_split}", [blob], outs, {}))
                n_split += 1
                for (cl, slot), new in zip(cons, outs):
                    cl.ins[slot] = new
    return out


def export_ncnn(folded: Dict[str, Dict[str, np.ndarray]], input_hw,
                param_path: str, bin_path: Optional[str] = None,
                arch: str = "yolofastest") -> None:
    """Write the folded graph as ncnn ``.param`` + ``.bin``.

    ``input_hw`` is (H, W); the input blob is grayscale ``data`` with the
    reference's ``(pixel - 128) / 255`` normalisation applied by the caller
    (``substract_mean_normalize(mean=128, norm=1/255)`` on the ncnn side,
    ``YOLO_ncnn.cpp:45-47``).  ``arch`` selects the two-head graph or the
    single-head lite graph (output blob ``head_small`` only).
    """
    if bin_path is None:
        bin_path = param_path[: -len(".param")] + ".bin" \
            if param_path.endswith(".param") else param_path + ".bin"
    h, w = int(input_hw[0]), int(input_hw[1])
    em = _NcnnEmit(folded)
    em.layers.append(_Layer("Input", "data", [], ["data"],
                            {0: str(w), 1: str(h), 2: "1"}))
    if arch == "yolofastest":
        walk_topology("data", em)
    elif arch == "yolofastest-lite":
        walk_topology_lite("data", em)
    else:
        raise ValueError(f"unknown arch {arch!r}")

    layers = _insert_splits(em.layers)
    blobs = [b for L in layers for b in L.outs]

    with open(param_path, "w") as f:
        f.write("7767517\n")
        f.write(f"{len(layers)} {len(blobs)}\n")
        for L in layers:
            kv = " ".join(f"{k}={L.params[k]}" for k in sorted(L.params))
            ins = " ".join(L.ins)
            outs = " ".join(L.outs)
            line = f"{L.typ:<24} {L.name:<24} {len(L.ins)} {len(L.outs)}"
            for part in (ins, outs, kv):
                if part:
                    line += f" {part}"
            f.write(line + "\n")

    with open(bin_path, "wb") as f:
        for chunk in em.chunks:
            f.write(chunk.tobytes())

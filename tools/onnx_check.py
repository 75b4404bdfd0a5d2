#!/usr/bin/env python
"""Independent ONNX consumer: parse + execute a .onnx with numpy only.

This is the consumer side of the ONNX interchange story (the role
onnxruntime / the ncnn converter plays for the reference's exported ONNX,
``convert_model/pytorch_to_onnx.py:19-23``).  It shares no code with the
exporter (``yolofastest_tpu/export/onnx.py``) beyond the public protobuf +
ONNX specs: a from-scratch wire-format decoder feeding a small numpy
executor for the standard ops our graphs use (Conv, ConvTranspose, Relu,
Add, Concat, Identity, and the QDQ pair QuantizeLinear/DequantizeLinear
for the int8 artifact).

Usage:
    python tools/onnx_check.py model.onnx imgs.npy out.npz
        imgs.npy: float32 NCHW input batch
        out.npz:  one array per graph output, keyed by output name
    Prints "ONNX_CONSUMED_OK <output names>" on success.

Deliberately imports NOTHING from yolofastest_tpu (it must run in a bare
numpy-only environment; tests/test_export_onnx.py enforces that in a fresh
process).
"""

import struct
import sys

import numpy as np


# ------------------------------------------------------------------ decoder
def _fields(buf):
    """Decode one protobuf message into [(field_number, wire_type, value)].

    wire 0 -> int, wire 2 -> bytes; groups/fixed are not used by ONNX here.
    """
    out, i, n = [], 0, len(buf)
    while i < n:
        key, i = _uvarint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, i = _uvarint(buf, i)
        elif wire == 2:
            ln, i = _uvarint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wire == 5:
            v, i = struct.unpack_from("<I", buf, i)[0], i + 4
        elif wire == 1:
            v, i = struct.unpack_from("<Q", buf, i)[0], i + 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        out.append((field, wire, v))
    return out


def _uvarint(buf, i):
    shift = v = 0
    while True:
        b = buf[i]
        v |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return v, i
        shift += 7


def _ints(wire, v):
    """A repeated int field arrives packed (wire 2) or one-per-tag (wire 0)."""
    if wire == 2:
        out, i = [], 0
        while i < len(v):
            x, i = _uvarint(v, i)
            out.append(x)
        return out
    return [v]


def _tensor(buf):
    """TensorProto -> (name, ndarray). Handles raw_data and float_data."""
    dims, dtype, name, raw, floats = [], 1, "", None, []
    for f, w, v in _fields(buf):
        if f == 1:
            dims += _ints(w, v)
        elif f == 2:
            dtype = v
        elif f == 8:
            name = v.decode()
        elif f == 9:
            raw = v
        elif f == 4:
            floats += ([struct.unpack("<f", struct.pack("<I", v))[0]]
                       if w == 5 else
                       list(struct.unpack(f"<{len(v) // 4}f", v)))
    if dtype == 3:  # INT8 (QDQ-form quantized weights / zero points)
        return name, np.frombuffer(raw, np.int8).reshape(dims)
    if dtype == 7:  # INT64 (shape/axes operands, NMS max_output)
        return name, np.frombuffer(raw, "<i8").reshape(dims)
    assert dtype == 1, f"only FLOAT/INT8/INT64 initializers, got {dtype}"
    data = (np.frombuffer(raw, "<f4") if raw is not None
            else np.asarray(floats, np.float32))
    return name, data.reshape(dims)


def _attrs(node_fields):
    out = {}
    for f, _, v in node_fields:
        if f != 5:
            continue
        name, ints, i64 = "", [], None
        for af, aw, av in _fields(v):
            if af == 1:
                name = av.decode()
            elif af == 3:
                i64 = av
            elif af == 8:
                ints += _ints(aw, av)
        out[name] = ints if ints else i64
    return out


def load_model(path):
    """-> (nodes, initializers, input_names, output_names). Each node is
    (op_type, inputs, outputs, attrs)."""
    with open(path, "rb") as f:
        model = _fields(f.read())
    graph = next(v for f_, _, v in model if f_ == 7)
    nodes, init, g_in, g_out = [], {}, [], []
    for f, _, v in _fields(graph):
        if f == 1:  # NodeProto
            nf = _fields(v)
            op = next(x.decode() for fn, _, x in nf if fn == 4)
            ins = [x.decode() for fn, _, x in nf if fn == 1]
            outs = [x.decode() for fn, _, x in nf if fn == 2]
            nodes.append((op, ins, outs, _attrs(nf)))
        elif f == 5:  # initializer
            name, arr = _tensor(v)
            init[name] = arr
        elif f in (11, 12):  # ValueInfoProto: only the name is needed
            name = next(x.decode() for fn, _, x in _fields(v) if fn == 1)
            (g_in if f == 11 else g_out).append(name)
    return nodes, init, g_in, g_out


# ----------------------------------------------------------------- executor
def _conv(x, w, b, strides, pads, group):
    """Grouped NCHW conv, numpy: accumulate shifted einsums per kernel tap."""
    n, ci, h, wd = x.shape
    co, cig, kh, kw = w.shape
    sh, sw = strides
    pt, pl, pb, pr = pads[0], pads[1], pads[2], pads[3]
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    oh = (h + pt + pb - kh) // sh + 1
    ow = (wd + pl + pr - kw) // sw + 1
    xg = xp.reshape(n, group, ci // group, *xp.shape[2:])
    wg = w.reshape(group, co // group, cig, kh, kw)
    y = np.zeros((n, group, co // group, oh, ow), np.float32)
    for i in range(kh):
        for j in range(kw):
            patch = xg[:, :, :, i:i + oh * sh:sh, j:j + ow * sw:sw]
            y += np.einsum("ngchw,goc->ngohw", patch, wg[:, :, :, i, j])
    return y.reshape(n, co, oh, ow) + b[None, :, None, None]


def _pool(x, kernel, strides, pads, avg):
    """NCHW 2D max/average pool (count_include_pad semantics for avg)."""
    n, c, h, w = x.shape
    kh, kw = kernel
    sh, sw = strides
    pt, pl, pb, pr = pads
    fill = 0.0 if avg else -np.inf
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)),
                constant_values=fill)
    oh = (h + pt + pb - kh) // sh + 1
    ow = (w + pl + pr - kw) // sw + 1
    y = np.full((n, c, oh, ow), 0.0 if avg else -np.inf, np.float32)
    for i in range(kh):
        for j in range(kw):
            patch = xp[:, :, i:i + oh * sh:sh, j:j + ow * sw:sw]
            y = y + patch if avg else np.maximum(y, patch)
    return (y / (kh * kw) if avg else y).astype(np.float32)


def _conv_transpose(x, w, b, strides):
    """NCHW ConvTranspose, pads=0, group=1; w is (Cin, Cout, kh, kw)."""
    n, ci, h, wd = x.shape
    _, co, kh, kw = w.shape
    sh, sw = strides
    y = np.zeros((n, co, (h - 1) * sh + kh, (wd - 1) * sw + kw), np.float32)
    for i in range(kh):
        for j in range(kw):
            y[:, :, i:i + h * sh:sh, j:j + wd * sw:sw] += np.einsum(
                "nchw,co->nohw", x, w[:, :, i, j])
    return y + b[None, :, None, None]


def _nms(boxes, scores, max_per_class, iou_t, score_t, center):
    """ONNX NonMaxSuppression: boxes (N,B,4), scores (N,C,B) ->
    (S, 3) int64 [batch, class, box] rows (standard IOU, greedy by score,
    per-class cap)."""
    if center:  # (xc, yc, w, h) -> corners
        xc, yc, w, h = (boxes[..., i] for i in range(4))
        boxes = np.stack([xc - w / 2, yc - h / 2,
                          xc + w / 2, yc + h / 2], axis=-1)
    out = []
    for b in range(scores.shape[0]):
        for c in range(scores.shape[1]):
            sc = scores[b, c]
            cand = np.argsort(-sc, kind="stable")
            cand = cand[sc[cand] > score_t]
            kept = []
            for i in cand:
                if len(kept) >= max_per_class:
                    break
                bi = boxes[b, i]
                ok = True
                for j in kept:
                    bj = boxes[b, j]
                    x1 = max(bi[0], bj[0]); y1 = max(bi[1], bj[1])
                    x2 = min(bi[2], bj[2]); y2 = min(bi[3], bj[3])
                    inter = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
                    ua = ((bi[2] - bi[0]) * (bi[3] - bi[1])
                          + (bj[2] - bj[0]) * (bj[3] - bj[1]) - inter)
                    if inter / max(ua, 1e-12) > iou_t:
                        ok = False
                        break
                if ok:
                    kept.append(i)
            out += [[b, c, int(i)] for i in kept]
    return np.array(out if out else np.zeros((0, 3)), np.int64)


def run(nodes, init, feeds):
    env = dict(init)
    env.update(feeds)
    for op, ins, outs, attrs in nodes:
        a = [env[i] for i in ins]
        if op == "Conv":
            if any(d != 1 for d in attrs.get("dilations", [1, 1])):
                raise NotImplementedError("dilated Conv")
            bias = a[2] if len(a) > 2 else np.zeros(a[1].shape[0], np.float32)
            y = _conv(a[0], a[1], bias, attrs["strides"], attrs["pads"],
                      attrs.get("group", 1) or 1)
        elif op == "ConvTranspose":
            y = _conv_transpose(a[0], a[1], a[2], attrs["strides"])
        elif op == "Relu":
            y = np.maximum(a[0], 0.0)
        elif op == "Add":
            y = a[0] + a[1]
        elif op == "Concat":
            y = np.concatenate(a, axis=attrs["axis"])
        elif op == "Identity":
            y = a[0]
        elif op == "QuantizeLinear":
            # y = saturate(round_half_even(x / scale) + zp), dtype from zp
            zp = a[2] if len(a) > 2 else np.uint8(0)
            lo, hi = (-128, 127) if zp.dtype == np.int8 else (0, 255)
            y = np.clip(np.round(a[0] / a[1]) + zp.astype(np.int32),
                        lo, hi).astype(zp.dtype)
        elif op == "DequantizeLinear":
            scale = a[1]
            zp = a[2].astype(np.int32) if len(a) > 2 else 0
            if scale.ndim:  # per-axis: broadcast along attrs["axis"]
                shape = [1] * a[0].ndim
                shape[attrs.get("axis", 1)] = scale.size
                scale = scale.reshape(shape)
                if np.ndim(zp):
                    zp = zp.reshape(shape)
            y = ((a[0].astype(np.int32) - zp) * scale).astype(np.float32)
        elif op == "Sub":
            y = a[0] - a[1]
        elif op == "Mul":
            y = a[0] * a[1]
        elif op == "Sigmoid":
            y = 1.0 / (1.0 + np.exp(-a[0]))
        elif op == "Exp":
            y = np.exp(a[0])
        elif op == "Reshape":
            shape = [int(d) if d != 0 else a[0].shape[i]
                     for i, d in enumerate(a[1])]  # 0 = copy input dim
            y = a[0].reshape(shape)
        elif op == "Transpose":
            y = a[0].transpose(attrs["perm"])
        elif op == "Slice":
            data, starts, ends = a[0], a[1], a[2]
            axes = a[3] if len(a) > 3 else range(len(starts))
            sl = [slice(None)] * data.ndim
            for ax, st, en in zip(axes, starts, ends):
                sl[int(ax)] = slice(int(st), int(en))
            y = data[tuple(sl)]
        elif op == "ReduceMax":
            y = a[0].max(axis=tuple(attrs["axes"]),
                         keepdims=bool(attrs.get("keepdims", 1)))
        elif op == "Equal":
            y = a[0] == a[1]
        elif op == "Div":
            y = a[0] / a[1]
        elif op == "Max":
            y = np.maximum(a[0], a[1])
        elif op == "Min":
            y = np.minimum(a[0], a[1])
        elif op == "Neg":
            y = -a[0]
        elif op == "Log":
            y = np.log(a[0])
        elif op == "Tanh":
            y = np.tanh(a[0])
        elif op == "Sqrt":
            y = np.sqrt(a[0])
        elif op == "Reciprocal":
            y = 1.0 / a[0]
        elif op == "Abs":
            y = np.abs(a[0])
        elif op == "Pow":
            y = np.power(a[0], a[1])
        elif op == "MatMul":
            y = np.matmul(a[0], a[1])
        elif op == "Expand":
            y = np.broadcast_to(a[0], tuple(int(d) for d in a[1])).copy()
        elif op == "Where":
            y = np.where(a[0], a[1], a[2])
        elif op == "Greater":
            y = a[0] > a[1]
        elif op == "Less":
            y = a[0] < a[1]
        elif op == "GreaterOrEqual":
            y = a[0] >= a[1]
        elif op == "LessOrEqual":
            y = a[0] <= a[1]
        elif op == "ReduceSum":
            # opset 13 form: axes as second input; attribute form accepted
            # for older producers
            axes = tuple(int(d) for d in a[1]) if len(a) > 1 \
                else tuple(attrs["axes"])
            y = a[0].sum(axis=axes, keepdims=bool(attrs.get("keepdims", 1)))
        elif op == "ReduceMin":
            y = a[0].min(axis=tuple(attrs["axes"]),
                         keepdims=bool(attrs.get("keepdims", 1)))
        elif op in ("MaxPool", "AveragePool"):
            y = _pool(a[0], attrs["kernel_shape"], attrs["strides"],
                      attrs.get("pads", [0, 0, 0, 0]), avg=op == "AveragePool")
        elif op == "Cast":
            y = a[0].astype({1: np.float32, 6: np.int32, 7: np.int64,
                             9: np.bool_}[attrs["to"]])
        elif op == "NonMaxSuppression":
            # the threshold inputs are rank-1 single-element tensors in our
            # exports — ravel()[0] extracts without the ndim>0 scalar-cast
            # deprecation (hard error in future numpy)
            y = _nms(a[0], a[1], int(np.ravel(a[2])[0]),
                     float(np.ravel(a[3])[0]),
                     float(np.ravel(a[4])[0]) if len(a) > 4 else 0.0,
                     center=bool(attrs.get("center_point_box", 0)))
        else:
            raise NotImplementedError(f"op {op}")
        env[outs[0]] = y
    return env


def main(argv):
    model_path, imgs_path, out_path = argv[1:4]
    nodes, init, g_in, g_out = load_model(model_path)
    imgs = np.load(imgs_path).astype(np.float32)
    env = run(nodes, init, {g_in[0]: imgs})
    np.savez(out_path, **{name: env[name] for name in g_out})
    # NB: this image's site init preloads jax in every python process, so
    # jax presence proves nothing either way; the meaningful guarantee is
    # that OUR framework (and flax/torch, which only it would pull in)
    # never loads — same discipline as tests/test_export_torch.py:86.
    banned = [m for m in sys.modules
              if m.split(".")[0] in ("yolofastest_tpu", "torch", "flax")]
    assert not banned, f"framework modules leaked in: {banned}"
    print("ONNX_CONSUMED_OK", " ".join(g_out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

#!/usr/bin/env python
"""Independent Caffe consumer: parse + execute .prototxt/.caffemodel with
numpy only.

This is the consumer side of the Caffe interchange story (the role the
Caffe runtime plays for the reference's traced export,
``convert_model/pytorch_to_caffe.py:9-17``).  It shares no code with the
exporter (``yolofastest_tpu/export/caffe.py``) beyond the public protobuf +
caffe.proto specs: a from-scratch prototxt text-format parser and protobuf
wire-format decoder feeding a small numpy executor for the standard Caffe
layers our graphs use (Input, Convolution incl. grouped/depthwise, in-place
ReLU, Eltwise SUM, Deconvolution, Concat).

Usage:
    python tools/caffe_check.py model.prototxt model.caffemodel imgs.npy out.npz
        imgs.npy: float32 NCHW input batch (replaces the prototxt's
                  batch-1 input shape; all other dims must match)
        out.npz:  one array per terminal blob, keyed by blob name
    Prints "CAFFE_CONSUMED_OK <output names>" on success.

Deliberately imports NOTHING from yolofastest_tpu (it must run in a bare
numpy-only environment; tests/test_export_caffe.py enforces that in a
fresh process).
"""

import re
import struct
import sys

import numpy as np


# ------------------------------------------------------- prototxt (text fmt)
def _tokenize(text):
    """Protobuf text format tokens: quoted strings, braces, 'key:' pairs."""
    text = re.sub(r"#[^\n]*", "", text)
    return re.findall(r'"(?:[^"\\]|\\.)*"|[{}]|[^\s{}:]+:?|:', text)


def _parse_msg(tokens, i):
    """-> (dict, next index). Repeated keys collect into lists."""
    msg = {}
    while i < len(tokens) and tokens[i] != "}":
        key = tokens[i].rstrip(":")
        i += 1
        if i < len(tokens) and tokens[i] == ":":
            i += 1
        if tokens[i] == "{":
            val, i = _parse_msg(tokens, i + 1)
            assert tokens[i] == "}", "unbalanced braces"
            i += 1
        else:
            raw = tokens[i]
            i += 1
            if raw.startswith('"'):
                val = raw[1:-1]
            else:
                try:
                    val = int(raw)
                except ValueError:
                    try:
                        val = float(raw)
                    except ValueError:
                        val = raw  # enum token (e.g. SUM)
        msg.setdefault(key, []).append(val)
    return msg, i


def parse_prototxt(path):
    """-> list of layer dicts, in file order."""
    with open(path) as f:
        tokens = _tokenize(f.read())
    msg, i = _parse_msg(tokens, 0)
    assert i == len(tokens), "trailing tokens in prototxt"
    return msg.get("layer", [])


# -------------------------------------------------- caffemodel (binary fmt)
def _uvarint(buf, i):
    shift = v = 0
    while True:
        b = buf[i]
        v |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return v, i
        shift += 7


def _fields(buf):
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


def _blob(buf):
    """BlobProto -> ndarray. data(5) packed/unpacked float, shape(7).dim(1)."""
    dims, data = [], []
    for f, w, v in _fields(buf):
        if f == 5:
            data += ([struct.unpack("<f", struct.pack("<I", v))[0]]
                     if w == 5 else
                     list(np.frombuffer(v, "<f4")))
        elif f == 7:
            for sf, sw, sv in _fields(v):
                if sf == 1:
                    if sw == 2:
                        i = 0
                        while i < len(sv):
                            d, i = _uvarint(sv, i)
                            dims.append(d)
                    else:
                        dims.append(sv)
    return np.asarray(data, np.float32).reshape(dims)


def load_caffemodel(path):
    """-> {layer_name: [blobs...]}."""
    with open(path, "rb") as f:
        net = _fields(f.read())
    weights = {}
    for f_, _, v in net:
        if f_ != 100:  # NetParameter.layer
            continue
        name, blobs = "", []
        for lf, _, lv in _fields(v):
            if lf == 1:
                name = lv.decode()
            elif lf == 7:
                blobs.append(_blob(lv))
        weights[name] = blobs
    return weights


# ----------------------------------------------------------------- executor
def _conv(x, w, b, stride, pad, group):
    """Grouped NCHW conv: accumulate shifted einsums per kernel tap."""
    n, ci, h, wd = x.shape
    co, cig, kh, kw = w.shape
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (wd + 2 * pad - kw) // stride + 1
    xg = xp.reshape(n, group, ci // group, *xp.shape[2:])
    wg = w.reshape(group, co // group, cig, kh, kw)
    y = np.zeros((n, group, co // group, oh, ow), np.float32)
    for i in range(kh):
        for j in range(kw):
            patch = xg[:, :, :, i:i + oh * stride:stride,
                       j:j + ow * stride:stride]
            y += np.einsum("ngchw,goc->ngohw", patch, wg[:, :, :, i, j])
    return y.reshape(n, co, oh, ow) + b[None, :, None, None]


def _deconv(x, w, b, stride):
    """NCHW Deconvolution, pad 0, group 1; w is (Cin, Cout, kh, kw)."""
    n, ci, h, wd = x.shape
    _, co, kh, kw = w.shape
    y = np.zeros((n, co, (h - 1) * stride + kh, (wd - 1) * stride + kw),
                 np.float32)
    for i in range(kh):
        for j in range(kw):
            y[:, :, i:i + h * stride:stride, j:j + wd * stride:stride] += (
                np.einsum("nchw,co->nohw", x, w[:, :, i, j]))
    return y + b[None, :, None, None]


def run(layers, weights, imgs):
    """Execute the net; -> (env, terminal blob names)."""
    env = {}
    consumed = set()
    for L in layers:
        typ = L["type"][0]
        bottoms = L.get("bottom", [])
        tops = L.get("top", [])
        name = L["name"][0]
        if typ == "Input":
            shape = [int(d) for d in L["input_param"][0]["shape"][0]["dim"]]
            assert list(imgs.shape[1:]) == shape[1:], \
                f"input shape {imgs.shape} vs prototxt {shape}"
            env[tops[0]] = imgs
            continue
        consumed.update(bottoms)
        a = [env[bt] for bt in bottoms]
        if typ in ("Convolution", "Deconvolution"):
            p = L["convolution_param"][0]
            w, b = weights[name]
            stride = int(p.get("stride", [1])[0])
            if typ == "Convolution":
                y = _conv(a[0], w, b, stride, int(p.get("pad", [0])[0]),
                          int(p.get("group", [1])[0]))
            else:
                y = _deconv(a[0], w, b, stride)
            assert y.shape[1] == int(p["num_output"][0]), name
        elif typ == "ReLU":
            y = np.maximum(a[0], 0.0)
        elif typ == "Eltwise":
            op = L.get("eltwise_param", [{}])[0].get("operation", ["SUM"])[0]
            assert op == "SUM", f"unsupported Eltwise op {op}"
            y = a[0] + a[1]
        elif typ == "Concat":
            axis = int(L.get("concat_param", [{}])[0].get("axis", [1])[0])
            y = np.concatenate(a, axis=axis)
        else:
            raise NotImplementedError(f"layer type {typ}")
        env[tops[0]] = y
    # terminal blobs = produced but never consumed (in-place ReLU keeps the
    # conv blob's name, so heads stay terminal)
    produced = []
    for L in layers:
        for t in L.get("top", []):
            if t not in produced:
                produced.append(t)
    return env, [t for t in produced if t not in consumed]


def main(argv):
    prototxt, caffemodel, imgs_path, out_path = argv[1:5]
    layers = parse_prototxt(prototxt)
    weights = load_caffemodel(caffemodel)
    imgs = np.load(imgs_path).astype(np.float32)
    env, outs = run(layers, weights, imgs)
    np.savez(out_path, **{name: env[name] for name in outs})
    print("CAFFE_CONSUMED_OK", " ".join(outs))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

"""ncnn .param/.bin consumer check — numpy-only, zero shared code with the
exporter beyond the format spec.

Parses the magic-7767517 text param format and the tagged fp32 bin format,
executes the graph in pure numpy (NCHW), and writes the ``head_*`` output
blobs to an ``.npz``.  Exercised as a fresh-process consumer by
``tests/test_export_ncnn.py`` against BOTH our exported models and the
reference's own shipped artifacts (``/root/reference/models/ncnn/...``,
produced by onnx2ncnn + ncnnoptimize — an entirely independent producer),
so parser and writer cannot share a hidden convention.

Usage: python tools/ncnn_check.py model.param model.bin imgs.npy out.npz
  imgs.npy: float32 NCHW, already normalised ((pixel - 128) / 255).
"""

import sys

import numpy as np


def parse_param(path):
    lines = [ln for ln in open(path).read().splitlines() if ln.strip()]
    if lines[0].strip() != "7767517":
        raise ValueError(f"bad magic {lines[0]!r}")
    n_layers, n_blobs = map(int, lines[1].split())
    layers = []
    for ln in lines[2:]:
        parts = ln.split()
        typ, name = parts[0], parts[1]
        ni, no = int(parts[2]), int(parts[3])
        ins = parts[4:4 + ni]
        outs = parts[4 + ni:4 + ni + no]
        params = {}
        for kv in parts[4 + ni + no:]:
            k, v = kv.split("=", 1)
            if int(k) < 0:  # -233xx = array params (unused here)
                raise ValueError(f"array param {k} unsupported")
            params[int(k)] = v
        layers.append({"type": typ, "name": name, "ins": ins, "outs": outs,
                       "p": params})
    if len(layers) != n_layers:
        raise ValueError(f"layer count {len(layers)} != header {n_layers}")
    return layers, n_blobs


def load_bin(path, layers):
    """Sequential tagged reads in param-file layer order: uint32 quant tag
    (0 = fp32) + kernel + raw fp32 bias."""
    buf = open(path, "rb").read()
    off = 0
    weights = {}
    for L in layers:
        if L["type"] not in ("Convolution", "ConvolutionDepthWise",
                             "Deconvolution"):
            continue
        tag = int(np.frombuffer(buf, np.uint32, 1, off)[0])
        off += 4
        if tag != 0:
            raise ValueError(f"{L['name']}: non-fp32 tag {tag:#x} unsupported")
        wsize = int(L["p"][6])
        w = np.frombuffer(buf, np.float32, wsize, off).copy()
        off += 4 * wsize
        b = np.zeros(int(L["p"][0]), np.float32)
        if int(L["p"].get(5, "0")):
            b = np.frombuffer(buf, np.float32, int(L["p"][0]), off).copy()
            off += 4 * int(L["p"][0])
        weights[L["name"]] = (w, b)
    if off != len(buf):
        raise ValueError(f"bin has {len(buf) - off} trailing bytes")
    return weights


def _conv(x, wg, b, kh, kw, stride, pad, group, act):
    """Grouped NCHW conv (cross-correlation), tap-shift einsum accumulation;
    ``wg`` is (group, nout/group, cin/group, kh, kw)."""
    n, cin, h, wd = x.shape
    nout = wg.shape[1] * group
    xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    oh = (h + 2 * pad - kh) // stride + 1
    ow = (wd + 2 * pad - kw) // stride + 1
    xg = xp.reshape(n, group, cin // group, *xp.shape[2:])
    y = np.zeros((n, group, wg.shape[1], oh, ow), np.float32)
    for i in range(kh):
        for j in range(kw):
            patch = xg[:, :, :, i:i + oh * stride:stride,
                       j:j + ow * stride:stride]
            y += np.einsum("ngchw,goc->ngohw", patch, wg[:, :, :, i, j])
    y = y.reshape(n, nout, oh, ow) + b[None, :, None, None]
    return np.maximum(y, 0.0) if act else y


def _deconv(x, w, b, k, stride, act):
    """NCHW transposed conv, pad 0; w is OIHW (locked vs the reference bin)."""
    n, cin, h, wd = x.shape
    nout = w.shape[0]
    y = np.zeros((n, nout, (h - 1) * stride + k, (wd - 1) * stride + k),
                 np.float32)
    for i in range(k):
        for j in range(k):
            y[:, :, i:i + h * stride:stride, j:j + wd * stride:stride] += \
                np.einsum("nchw,oc->nohw", x, w[:, :, i, j])
    y += b[None, :, None, None]
    return np.maximum(y, 0.0) if act else y


def run(layers, weights, imgs):
    blobs = {}
    heads = {}
    for L in layers:
        typ, p = L["type"], L["p"]
        if typ == "Input":
            blobs[L["outs"][0]] = imgs.astype(np.float32)
        elif typ in ("Convolution", "ConvolutionDepthWise"):
            x = blobs[L["ins"][0]]
            w, b = weights[L["name"]]
            nout = int(p[0])
            kw = int(p[1])
            kh = int(p.get(11, p[1]))
            stride = int(p.get(3, "1"))
            if int(p.get(13, stride)) != stride:
                raise ValueError("anisotropic stride unsupported")
            pad = int(p.get(4, "0"))
            group = int(p.get(7, "1")) if typ == "ConvolutionDepthWise" else 1
            act = int(p.get(9, "0"))
            if act not in (0, 1):
                raise ValueError(f"activation {act} unsupported")
            wr = w.reshape(group, nout // group,
                           x.shape[1] // group, kh, kw)
            blobs[L["outs"][0]] = _conv(x, wr, b, kh, kw, stride, pad,
                                        group, act == 1)
        elif typ == "Deconvolution":
            x = blobs[L["ins"][0]]
            w, b = weights[L["name"]]
            nout, k = int(p[0]), int(p[1])
            stride = int(p.get(3, "1"))
            act = int(p.get(9, "0"))
            wr = w.reshape(nout, x.shape[1], k, k)
            blobs[L["outs"][0]] = _deconv(x, wr, b, k, stride, act == 1)
        elif typ == "Split":
            for o in L["outs"]:
                blobs[o] = blobs[L["ins"][0]]
        elif typ == "BinaryOp":
            if int(p.get(0, "0")) != 0:
                raise ValueError("only BinaryOp add supported")
            blobs[L["outs"][0]] = blobs[L["ins"][0]] + blobs[L["ins"][1]]
        elif typ == "Concat":
            if int(p.get(0, "0")) != 0:
                raise ValueError("only channel concat supported")
            blobs[L["outs"][0]] = np.concatenate(
                [blobs[i] for i in L["ins"]], axis=1)
        else:
            raise ValueError(f"layer type {typ} unsupported")
        for o in L["outs"]:
            if o.startswith("head_"):
                heads[o] = blobs[o]
    return heads


def main(argv):
    param_path, bin_path, imgs_path, out_path = argv[1:5]
    layers, _ = parse_param(param_path)
    weights = load_bin(bin_path, layers)
    imgs = np.load(imgs_path)
    heads = run(layers, weights, imgs)
    if not heads:
        raise ValueError("no head_* output blobs found")
    np.savez(out_path, **heads)
    print("NCNN_CONSUMED_OK", " ".join(f"{k}:{v.shape}" for k, v in
                                       sorted(heads.items())))


if __name__ == "__main__":
    main(sys.argv)

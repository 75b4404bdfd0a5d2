"""Post-training int8 quantisation of the folded inference graph.

The reference's NPU deployment runs fp16 (``rknn.build(do_quantization=
False)``, ``rknn_deploy.py:43``) and lists int8 as future work
(``问题列表与理解.txt:32``); BASELINE.json asks our build to *complete* that
story with a real int8 variant.  This module is classic symmetric PTQ, laid
out for the TPU's int8 MXU path:

* **weights**: per-output-channel symmetric int8, scale ``max|w| / 127``;
* **activations**: per-tensor symmetric int8, scale from a calibration pass
  (amax recorded while running the folded fp graph over sample batches);
* **conv**: ``int8 x int8 -> int32`` via ``lax.conv_general_dilated`` with
  ``preferred_element_type=int32`` (MXU-native on TPU), then a single fused
  rescale ``y = acc * (s_x * s_w[o]) + bias`` in float;
* ReLU and the +bias stay in float — they fuse into the rescale epilogue.

All three executors (fp folded, calibration recorder, int8) drive the same
declarative topology (:func:`yolofastest_tpu.models.graph.walk_topology`),
so the quantised graph can never drift from the deployed one.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolofastest_tpu.models.graph import (Executor, FoldedExecutor,
                                          walk_topology, walk_topology_lite)

_WALKS = {"fastest": walk_topology, "lite": walk_topology_lite}


# ------------------------------------------------------------------ weights
def quantize_weights(folded: Dict[str, Dict[str, np.ndarray]]) -> Dict[str, Dict[str, np.ndarray]]:
    """Folded fp params -> int8 params.

    Per layer: ``kernel_q`` int8 (same layout as fp), ``w_scale`` (O,)
    float32, ``bias`` float32 passthrough.
    """
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for name, p in folded.items():
        k = np.asarray(p["kernel"], np.float32)
        reduce_axes = tuple(range(k.ndim - 1))  # all but out-channel (last)
        amax = np.max(np.abs(k), axis=reduce_axes)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        kq = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
        out[name] = {"kernel_q": kq, "w_scale": scale, "bias": p["bias"].astype(np.float32)}
    return out


# -------------------------------------------------------------- calibration
class _RecordingExecutor(FoldedExecutor):
    """fp folded executor that records per-op input AND output amax (traced).

    Output amaxes (keyed ``out/<name>``, with ``add``/``concat`` pseudo-ops
    numbered in walk order) drive the fused int8 path, where every
    inter-layer tensor is requantised straight to int8."""

    def __init__(self, folded, compute_dtype=jnp.float32):
        super().__init__(folded, compute_dtype)
        self.amax: Dict[str, jax.Array] = {}
        self._counters = {"add": 0, "concat": 0}

    def _rec(self, key, x):
        self.amax[key] = jnp.max(jnp.abs(x.astype(jnp.float32)))

    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        self._rec(name, x)
        y = super().conv(x, name, kernel, stride, depthwise, act)
        self._rec(f"out/{name}", y)
        return y

    def deconv2x(self, x, name):
        self._rec(name, x)
        y = super().deconv2x(x, name)
        self._rec(f"out/{name}", y)
        return y

    def head(self, x, name):
        self._rec(name, x)
        return super().head(x, name)

    def _pseudo(self, kind):
        n = self._counters[kind]
        self._counters[kind] += 1
        return f"out/{kind}_{n}"

    def add(self, x, y):
        z = x + y
        self._rec(self._pseudo("add"), z)
        return z

    def concat(self, x, y):
        z = jnp.concatenate([x, y], axis=-1)
        self._rec(self._pseudo("concat"), z)
        return z


def calibrate(
    folded: Dict[str, Dict[str, np.ndarray]],
    batches: Sequence[np.ndarray],
    arch: str = "fastest",
) -> Dict[str, float]:
    """Run sample batches through the fp folded graph, return per-layer
    activation scales ``amax / 127`` (the RKNN-calibration analogue — the
    reference feeds a dataset.txt image list to ``rknn.build`` when
    quantising)."""
    walk = _WALKS[arch]

    @jax.jit
    def one_batch(x):
        ex = _RecordingExecutor(folded)
        walk(x, ex)
        return ex.amax

    acc: Dict[str, float] = {}
    for b in batches:
        amax = jax.device_get(one_batch(jnp.asarray(b, jnp.float32)))
        for k, v in amax.items():
            acc[k] = max(acc.get(k, 0.0), float(v))
    return {k: (v / 127.0 if v > 0 else 1.0) for k, v in acc.items()}


# ------------------------------------------------------------ int8 executor
class Int8Executor(Executor):
    """int8 x int8 -> int32 conv executor over the shared topology."""

    def __init__(self, qparams, act_scales: Dict[str, float], out_dtype=jnp.float32):
        self.p = qparams
        self.s = act_scales
        self.dt = out_dtype

    def _quant_in(self, x, name):
        sx = self.s[name]
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)
        return xq, sx

    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        p = self.p[name]
        xq, sx = self._quant_in(x, name)
        groups = x.shape[-1] if depthwise else 1
        pad = (kernel - 1) // 2
        acc = jax.lax.conv_general_dilated(
            xq,
            jnp.asarray(p["kernel_q"]),
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(self.dt) * (sx * jnp.asarray(p["w_scale"], self.dt)) + jnp.asarray(p["bias"], self.dt)
        return jax.nn.relu(y) if act else y

    def deconv2x(self, x, name):
        p = self.p[name]
        xq, sx = self._quant_in(x, name)
        b, h, w, c = x.shape
        kq = jnp.asarray(p["kernel_q"])  # (2, 2, Cin, Cout)
        o = kq.shape[-1]
        k2 = kq.transpose(2, 0, 1, 3).reshape(c, 4 * o)
        acc = jax.lax.dot_general(
            xq, k2, (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        acc = acc.reshape(b, h, w, 2, 2, o).transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, o)
        y = acc.astype(self.dt) * (sx * jnp.asarray(p["w_scale"], self.dt)) + jnp.asarray(p["bias"], self.dt)
        return jax.nn.relu(y)

    def head(self, x, name):
        p = self.p[name]
        xq, sx = self._quant_in(x, name)
        acc = jax.lax.conv_general_dilated(
            xq,
            jnp.asarray(p["kernel_q"]),
            window_strides=(1, 1),
            padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=1,
            preferred_element_type=jnp.int32,
        )
        return acc.astype(self.dt) * (sx * jnp.asarray(p["w_scale"], self.dt)) + jnp.asarray(p["bias"], self.dt)


def quantized_apply(qparams, act_scales, x, out_dtype=jnp.float32,
                    arch: str = "fastest"):
    """Run the int8 deployment graph: (B,H,W,1) float -> (head_large,
    head_small) — or head_small alone for ``arch='lite'``."""
    return _WALKS[arch](x, Int8Executor(qparams, act_scales, out_dtype))


# ----------------------------------------------------- fused int8 activations
class _Q:
    """Carrier: an int8 tensor plus its dequantisation scale."""

    __slots__ = ("q", "s")

    def __init__(self, q, s):
        self.q = q
        self.s = s

    def deq(self, dt=jnp.float32):
        return self.q.astype(dt) * jnp.asarray(self.s, dt)


def _requant(y_f32, scale):
    return jnp.clip(jnp.round(y_f32 / scale), -127, 127).astype(jnp.int8)


class Int8FusedExecutor(Executor):
    """End-to-end int8 activations: every inter-layer tensor lives in HBM as
    int8 (half the bf16 traffic on a memory-bound backbone, and int8 x int8
    MXU convs).  Each op's float epilogue (rescale + bias + ReLU + requant)
    is a single fused elementwise chain; f32 never touches HBM except at the
    heads, which stay float for the decode.

    This is the "real NPU deployment" the reference left as future work
    (fp16 RKNN build, ``rknn_deploy.py:43``; int8 listed in
    ``问题列表与理解.txt:32``)."""

    def __init__(self, qparams, act_scales: Dict[str, float], out_dtype=jnp.float32):
        self.p = qparams
        self.s = act_scales
        self.dt = out_dtype
        self._counters = {"add": 0, "concat": 0}

    def quantize_input(self, x_f32) -> _Q:
        s = self.s["conv0"]
        return _Q(_requant(x_f32.astype(jnp.float32), s), s)

    def _conv_acc(self, xq: _Q, name, stride, depthwise, kernel):
        p = self.p[name]
        groups = xq.q.shape[-1] if depthwise else 1
        pad = (kernel - 1) // 2
        acc = jax.lax.conv_general_dilated(
            xq.q,
            jnp.asarray(p["kernel_q"]),
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (xq.s * jnp.asarray(p["w_scale"], jnp.float32))
        return y + jnp.asarray(p["bias"], jnp.float32)

    def conv(self, x: _Q, name, kernel, stride=1, depthwise=False, act=True):
        y = self._conv_acc(x, name, stride, depthwise, kernel)
        if act:
            y = jnp.maximum(y, 0.0)
        s_out = self.s[f"out/{name}"]
        return _Q(_requant(y, s_out), s_out)

    def deconv2x(self, x: _Q, name):
        p = self.p[name]
        b, h, w, c = x.q.shape
        kq = jnp.asarray(p["kernel_q"])  # (2, 2, Cin, Cout)
        o = kq.shape[-1]
        k2 = kq.transpose(2, 0, 1, 3).reshape(c, 4 * o)
        acc = jax.lax.dot_general(
            x.q, k2, (((3,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        acc = acc.reshape(b, h, w, 2, 2, o).transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, o)
        y = acc.astype(jnp.float32) * (x.s * jnp.asarray(p["w_scale"], jnp.float32))
        y = jnp.maximum(y + jnp.asarray(p["bias"], jnp.float32), 0.0)
        s_out = self.s[f"out/{name}"]
        return _Q(_requant(y, s_out), s_out)

    def head(self, x: _Q, name):
        y = self._conv_acc(x, name, 1, False, 1)
        return y.astype(self.dt)  # heads stay float for the decode

    def _pseudo(self, kind):
        n = self._counters[kind]
        self._counters[kind] += 1
        return f"out/{kind}_{n}"

    def add(self, x: _Q, y: _Q):
        s_out = self.s[self._pseudo("add")]
        z = x.deq() + y.deq()
        return _Q(_requant(z, s_out), s_out)

    def concat(self, x: _Q, y: _Q):
        s_out = self.s[self._pseudo("concat")]
        # requantise both halves to the shared output scale, concat in int8
        zx = _requant(x.deq(), s_out)
        zy = _requant(y.deq(), s_out)
        return _Q(jnp.concatenate([zx, zy], axis=-1), s_out)


def quantized_apply_fused(qparams, act_scales, x, out_dtype=jnp.float32,
                          arch: str = "fastest"):
    """End-to-end int8 inference: (B,H,W,1) float input -> float head logits,
    all intermediate activations int8 in HBM.  Requires ``act_scales`` from
    :func:`calibrate` (which records the needed ``out/...`` scales)."""
    ex = Int8FusedExecutor(qparams, act_scales, out_dtype)
    return _WALKS[arch](ex.quantize_input(x), ex)

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

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolofastest_tpu.models.graph import Executor, FoldedExecutor, walk_topology


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
    """fp folded executor that records per-layer input amax (traced)."""

    def __init__(self, folded, compute_dtype=jnp.float32):
        super().__init__(folded, compute_dtype)
        self.amax: Dict[str, jax.Array] = {}

    def _rec(self, name, x):
        self.amax[name] = jnp.max(jnp.abs(x.astype(jnp.float32)))

    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        self._rec(name, x)
        return super().conv(x, name, kernel, stride, depthwise, act)

    def deconv2x(self, x, name):
        self._rec(name, x)
        return super().deconv2x(x, name)

    def head(self, x, name):
        self._rec(name, x)
        return super().head(x, name)


def calibrate(
    folded: Dict[str, Dict[str, np.ndarray]],
    batches: Sequence[np.ndarray],
) -> Dict[str, float]:
    """Run sample batches through the fp folded graph, return per-layer
    activation scales ``amax / 127`` (the RKNN-calibration analogue — the
    reference feeds a dataset.txt image list to ``rknn.build`` when
    quantising)."""

    @jax.jit
    def one_batch(x):
        ex = _RecordingExecutor(folded)
        walk_topology(x, ex)
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


def quantized_apply(qparams, act_scales, x, out_dtype=jnp.float32):
    """Run the int8 deployment graph: (B,H,W,1) float -> (head_large, head_small)."""
    return walk_topology(x, Int8Executor(qparams, act_scales, out_dtype))

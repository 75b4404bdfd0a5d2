"""Per-layer int8 sensitivity analysis + mixed-precision deployment.

The int8 deployment graph quantises every conv (``quant/ptq.py``).  Some
layers tolerate that poorly — the standard NPU-toolchain remedy (RKNN's
"hybrid quantization", TensorRT's per-layer precision) is to measure each
layer's damage and keep the worst offenders in float.  This module is the
TPU-native version:

* :func:`layer_sensitivity` — ONE jitted program whose per-layer int8/fp
  choice is a *traced* boolean vector, so sweeping all ~90 layers costs one
  compile + 90 cheap forwards (each layer's damage measured in isolation
  against the fp folded heads).  A per-layer Python rebuild would pay ~90
  XLA compiles — 30+ minutes through the TPU tunnel; this is seconds.
* :func:`quantized_apply_mixed` — the deployment path: a static fp-layer
  set dispatched at trace time, so the compiled program carries no dead
  branches (each layer is EITHER the int8 kernel or the fp kernel).

The reference has no quantisation tooling at all (its RKNN build ran fp16,
``rknn_deploy.py:43``); this mirrors what its toolchain (RKNN-Toolkit
hybrid quantization) offers around the int8 story we completed.

CLI: ``python -m yolofastest_tpu sensitivity ...`` prints the ranked table;
``detect/eval --backend int8 --keep-fp <layers>`` deploys mixed precision.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yolofastest_tpu.models.graph import Executor, FoldedExecutor
from yolofastest_tpu.quant.ptq import _WALKS, Int8Executor, calibrate, quantize_weights


class _DualExecutor(Executor):
    """Runs the fp folded and the int8 executors side by side, selecting per
    layer.  ``flags[name]`` is a traced boolean scalar (True = int8), so one
    compiled program serves every subset — the sensitivity sweep's whole
    trick.  Both sub-executors exchange plain float tensors (the per-layer
    int8 path quantises its own input), so mixing is seamless."""

    def __init__(self, qparams, folded, act_scales, flags: Dict[str, jax.Array],
                 out_dtype=jnp.float32):
        self._q = Int8Executor(qparams, act_scales, out_dtype)
        self._f = FoldedExecutor(folded, out_dtype)
        self.flags = flags

    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        return jnp.where(self.flags[name],
                         self._q.conv(x, name, kernel, stride, depthwise, act),
                         self._f.conv(x, name, kernel, stride, depthwise, act))

    def deconv2x(self, x, name):
        return jnp.where(self.flags[name],
                         self._q.deconv2x(x, name), self._f.deconv2x(x, name))

    def head(self, x, name):
        return jnp.where(self.flags[name],
                         self._q.head(x, name), self._f.head(x, name))


class _MixedStaticExecutor(Executor):
    """Deployment variant: the fp-layer set is static, each layer traces to
    exactly one kernel (no doubled compute)."""

    def __init__(self, qparams, folded, act_scales, fp_layers,
                 out_dtype=jnp.float32):
        self._q = Int8Executor(qparams, act_scales, out_dtype)
        self._f = FoldedExecutor(folded, out_dtype)
        self.fp_layers = frozenset(fp_layers)

    def _pick(self, name):
        return self._f if name in self.fp_layers else self._q

    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        return self._pick(name).conv(x, name, kernel, stride, depthwise, act)

    def deconv2x(self, x, name):
        return self._pick(name).deconv2x(x, name)

    def head(self, x, name):
        return self._pick(name).head(x, name)


def quantized_apply_mixed(qparams, folded, act_scales, x,
                          fp_layers: Sequence[str] = (),
                          out_dtype=jnp.float32, arch: str = "fastest"):
    """Mixed-precision int8 inference: every layer in ``fp_layers`` runs the
    fp folded kernel, the rest the int8 kernel.  ``fp_layers=()`` is exactly
    :func:`yolofastest_tpu.quant.ptq.quantized_apply`."""
    unknown = set(fp_layers) - set(qparams)
    if unknown:
        raise ValueError(f"unknown --keep-fp layer(s): {sorted(unknown)}; "
                         f"valid names are the folded-graph layers, e.g. "
                         f"{sorted(qparams)[:4]} ...")
    ex = _MixedStaticExecutor(qparams, folded, act_scales, fp_layers, out_dtype)
    return _WALKS[arch](x, ex)


class _MixedFusedExecutor(Executor):
    """Mixed precision for the FUSED int8 pipeline: activations stay int8
    between layers, but ``fp_layers`` run their conv with the FULL-precision
    folded kernel (input dequantised, output requantised at the calibrated
    ``out/<name>`` scale).  This removes a sensitive layer's *weight-grid*
    damage while keeping the carried-int8 deployment shape — the fused
    analogue of RKNN hybrid quantization."""

    def __init__(self, qparams, folded, act_scales, fp_layers,
                 out_dtype=jnp.float32):
        from yolofastest_tpu.quant.ptq import Int8FusedExecutor, _Q, _requant

        self._q = Int8FusedExecutor(qparams, act_scales, out_dtype)
        self._folded = folded
        self._fp = FoldedExecutor(folded, jnp.float32)
        self.fp_layers = frozenset(fp_layers)
        self._Q = _Q
        self._requant = _requant
        self.s = act_scales
        self.dt = out_dtype
        # the fused walk's pseudo-op scale counters live on the int8 half
        self._counters = self._q._counters

    def quantize_input(self, x_f32):
        return self._q.quantize_input(x_f32)

    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        if name not in self.fp_layers:
            return self._q.conv(x, name, kernel, stride, depthwise, act)
        y = self._fp.conv(x.deq(), name, kernel, stride, depthwise, act)
        s_out = self.s[f"out/{name}"]
        return self._Q(self._requant(y, s_out), s_out)

    def deconv2x(self, x, name):
        if name not in self.fp_layers:
            return self._q.deconv2x(x, name)
        y = self._fp.deconv2x(x.deq(), name)
        s_out = self.s[f"out/{name}"]
        return self._Q(self._requant(y, s_out), s_out)

    def head(self, x, name):
        if name not in self.fp_layers:
            return self._q.head(x, name)
        return self._fp.head(x.deq(), name).astype(self.dt)

    def add(self, x, y):
        return self._q.add(x, y)

    def concat(self, x, y):
        return self._q.concat(x, y)


class _DualFusedExecutor(Executor):
    """Flags twin of :class:`_MixedFusedExecutor`: ``flags[name]`` is a
    traced boolean (True = int8 kernel), so ONE compiled program scores any
    keep-fp subset of the fused pipeline — the search tool's workhorse
    (a per-subset Python rebuild would pay one XLA compile per candidate)."""

    def __init__(self, qparams, folded, act_scales, flags,
                 out_dtype=jnp.float32):
        from yolofastest_tpu.quant.ptq import Int8FusedExecutor, _Q, _requant

        self._q = Int8FusedExecutor(qparams, act_scales, out_dtype)
        self._fp = FoldedExecutor(folded, jnp.float32)
        self.flags = flags
        self._Q = _Q
        self._requant = _requant
        self.s = act_scales
        self.dt = out_dtype

    def quantize_input(self, x_f32):
        return self._q.quantize_input(x_f32)

    def _both(self, name, yq, y_fp):
        s_out = self.s[f"out/{name}"]
        yf = self._requant(y_fp, s_out)
        return self._Q(jnp.where(self.flags[name], yq.q, yf), s_out)

    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        yq = self._q.conv(x, name, kernel, stride, depthwise, act)
        yf = self._fp.conv(x.deq(), name, kernel, stride, depthwise, act)
        return self._both(name, yq, yf)

    def deconv2x(self, x, name):
        yq = self._q.deconv2x(x, name)
        yf = self._fp.deconv2x(x.deq(), name)
        return self._both(name, yq, yf)

    def head(self, x, name):
        yq = self._q.head(x, name)
        yf = self._fp.head(x.deq(), name).astype(self.dt)
        return jnp.where(self.flags[name], yq, yf)

    def add(self, x, y):
        return self._q.add(x, y)

    def concat(self, x, y):
        return self._q.concat(x, y)


def quantized_apply_fused_flagged(qparams, folded, act_scales, x,
                                  flags: Dict[str, jax.Array],
                                  out_dtype=jnp.float32,
                                  arch: str = "fastest"):
    """Fused pipeline with per-layer int8/fp chosen by TRACED boolean
    ``flags`` (True = int8) — one compile serves every subset."""
    ex = _DualFusedExecutor(qparams, folded, act_scales, flags, out_dtype)
    return _WALKS[arch](ex.quantize_input(x), ex)


def quantized_apply_flagged(qparams, folded, act_scales, x,
                            flags: Dict[str, jax.Array],
                            out_dtype=jnp.float32, arch: str = "fastest"):
    """Per-layer int8 pipeline with traced int8/fp flags (True = int8)."""
    ex = _DualExecutor(qparams, folded, act_scales, flags, out_dtype)
    return _WALKS[arch](x, ex)


def quantized_apply_fused_mixed(qparams, folded, act_scales, x,
                                fp_layers: Sequence[str] = (),
                                out_dtype=jnp.float32, arch: str = "fastest"):
    """Fused (carried-int8) inference with ``fp_layers`` running their conv
    at full weight precision.  ``fp_layers=()`` is exactly
    :func:`yolofastest_tpu.quant.ptq.quantized_apply_fused`."""
    unknown = set(fp_layers) - set(qparams)
    if unknown:
        raise ValueError(f"unknown --keep-fp layer(s): {sorted(unknown)}; "
                         f"valid names are the folded-graph layers, e.g. "
                         f"{sorted(qparams)[:4]} ...")
    ex = _MixedFusedExecutor(qparams, folded, act_scales, fp_layers, out_dtype)
    return _WALKS[arch](ex.quantize_input(x), ex)


def _as_tuple(heads):
    return heads if isinstance(heads, tuple) else (heads,)


def layer_sensitivity(
    folded,
    batches: Sequence[np.ndarray],
    arch: str = "fastest",
    act_scales: Optional[Dict[str, float]] = None,
    **calib_kwargs,
) -> List[Dict[str, float]]:
    """Quantise ONE layer at a time, measure the head-logit damage vs the fp
    folded graph.  Returns ``[{layer, mean_abs, max_abs}]`` sorted worst
    first.  ``calib_kwargs`` (method/percentile/bins) feed
    :func:`calibrate` when ``act_scales`` is not supplied."""
    if act_scales is None:
        act_scales = calibrate(folded, batches, arch=arch, **calib_kwargs)
    qparams = quantize_weights(folded)
    names = sorted(qparams)
    walk = _WALKS[arch]
    x = jnp.asarray(np.concatenate([np.asarray(b, np.float32) for b in batches]))

    @jax.jit
    def run(flagvec, x):
        flags = {n: flagvec[i] for i, n in enumerate(names)}
        ex = _DualExecutor(qparams, folded, act_scales, flags)
        heads = _as_tuple(walk(x, ex))
        return [h.astype(jnp.float32) for h in heads]

    zeros = jnp.zeros(len(names), bool)
    fp_heads = run(zeros, x)
    out = []
    for i, n in enumerate(names):
        heads = run(zeros.at[i].set(True), x)
        diffs = [jnp.abs(h - f) for h, f in zip(heads, fp_heads)]
        mean = sum(float(jnp.sum(d)) for d in diffs) / sum(d.size for d in diffs)
        out.append({"layer": n,
                    "mean_abs": mean,
                    "max_abs": max(float(jnp.max(d)) for d in diffs)})
    out.sort(key=lambda r: -r["mean_abs"])
    return out

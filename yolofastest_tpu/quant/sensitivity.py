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

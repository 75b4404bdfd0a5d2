"""Deployment graph: BatchNorm folding + a pluggable topology interpreter.

The reference deploys through *converted* graphs — ONNX -> ncnn ``.param`` /
``.bin`` and TorchScript -> RKNN — in which BN is folded into the convs.
Our equivalent is this module: one declarative walk of the YOLO-Fastest
topology (mirroring :class:`yolofastest_tpu.models.yolo_fastest.YoloFastest`)
parameterised over an *executor*, so the same definition drives

* the folded fp32/bf16 inference graph (:func:`folded_apply`) used for
  export and the native C++ runtime,
* activation-range calibration for PTQ (executor that records amax),
* the int8 quantised forward (:mod:`yolofastest_tpu.quant`).

Folding: ``y = scale * (conv(x) - mean) / sqrt(var + eps) + bias`` becomes a
conv with ``kernel' = kernel * g`` and ``bias' = bias - mean * g`` where
``g = scale / sqrt(var + eps)`` per output channel.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-5


# --------------------------------------------------------------------------- fold
def fold_batchnorm(variables: Dict[str, Any]) -> Dict[str, Dict[str, np.ndarray]]:
    """flax {'params','batch_stats'} -> flat {layer: {'kernel','bias'}} folded
    inference params.  Layer names match the module names; res blocks flatten
    to ``res1_1/conv1`` etc.  Deconv kernels stay (2,2,Cin,Cout); conv kernels
    stay HWIO."""
    params = variables["params"]
    stats = variables["batch_stats"]
    out: Dict[str, Dict[str, np.ndarray]] = {}

    def fold_one(p, s):
        g = np.asarray(p["bn"]["scale"], np.float64) / np.sqrt(
            np.asarray(s["bn"]["var"], np.float64) + BN_EPS
        )
        kernel = np.asarray(p["kernel"] if "kernel" in p else p["conv"]["kernel"], np.float64)
        kernel = kernel * g  # broadcast over last axis (out channels)
        bias = np.asarray(p["bn"]["bias"], np.float64) - np.asarray(s["bn"]["mean"], np.float64) * g
        return {"kernel": kernel.astype(np.float32), "bias": bias.astype(np.float32)}

    for name, p in params.items():
        if name.startswith("head"):
            out[name] = {
                "kernel": np.asarray(p["kernel"], np.float32),
                "bias": np.asarray(p["bias"], np.float32),
            }
        elif name.startswith("res"):
            for sub in ("conv1", "conv2", "conv3"):
                out[f"{name}/{sub}"] = fold_one(p[sub], stats[name][sub])
        else:
            out[name] = fold_one(p, stats[name])
    return out


def _identity_bn_var() -> np.float32:
    """The float32 running-variance value whose fold gain is closest to
    exactly 1: ``fold_batchnorm`` computes ``g = scale/sqrt(var + BN_EPS)``
    in float64, so we want the f32 ``var`` minimising ``|sqrt(var+eps)-1|``
    (plain ``f32(1-eps)`` carries its own rounding error ~3e-8)."""
    v = np.float32(1.0 - BN_EPS)
    cands = [v]
    lo = hi = v
    for _ in range(4):
        lo = np.nextafter(lo, np.float32(0))
        hi = np.nextafter(hi, np.float32(2))
        cands += [lo, hi]
    return min(cands,
               key=lambda c: abs(np.sqrt(np.float64(c) + BN_EPS) - 1.0))


def unfold_to_variables(folded: Dict[str, Dict[str, np.ndarray]]) -> Dict[str, Any]:
    """Inverse bridge of :func:`fold_batchnorm`: lift a folded
    ``{layer: {kernel, bias}}`` dict (e.g. imported from an ncnn artifact,
    :func:`yolofastest_tpu.export.ncnn.import_ncnn`) into the full flax
    ``{'params', 'batch_stats'}`` tree with *identity* batch norms
    (scale 1, mean 0, bias = folded bias, var chosen so the fold gain is 1
    to within one float64 ulp) — so every variables consumer (``model.apply``,
    the CLI's ``--weights``, re-folding for any backend) works unchanged.

    The running statistics are synthetic: fine-tuning from such a tree will
    re-estimate them from data (expected), and re-folding reproduces the
    input to within 1 ulp of float32.
    """
    var = _identity_bn_var()
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def lift(layer):
        c = folded[layer]
        bias = np.asarray(c["bias"], np.float32)
        nout = bias.shape[0]
        kernel = np.asarray(c["kernel"], np.float32)
        # deconv modules hold their kernel directly; convs nest it under
        # a "conv" submodule (matches the flax module tree / zoo layout)
        p = ({"kernel": kernel} if layer.startswith("deconv")
             else {"conv": {"kernel": kernel}})
        p["bn"] = {"scale": np.ones(nout, np.float32), "bias": bias}
        s = {"bn": {"mean": np.zeros(nout, np.float32),
                    "var": np.full(nout, var, np.float32)}}
        return p, s

    for name in folded:
        if name.startswith("head"):
            params[name] = {"kernel": np.asarray(folded[name]["kernel"], np.float32),
                            "bias": np.asarray(folded[name]["bias"], np.float32)}
        elif name.startswith("res"):
            block, sub = name.split("/")
            params.setdefault(block, {})
            stats.setdefault(block, {})
            params[block][sub], stats[block][sub] = lift(name)
        else:
            params[name], stats[name] = lift(name)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------- executor
class Executor:
    """Interface the topology walk calls into.  ``conv`` covers 1x1/3x3/5x5,
    strided and depthwise; ``deconv2x`` is the kernel-2/stride-2 transposed
    conv; both include bias and optional ReLU."""

    def conv(self, x, name: str, kernel: int, stride: int = 1,
             depthwise: bool = False, act: bool = True):
        raise NotImplementedError

    def deconv2x(self, x, name: str):
        raise NotImplementedError

    def head(self, x, name: str):
        raise NotImplementedError

    def add(self, x, y):
        return x + y

    def concat(self, x, y):
        return jnp.concatenate([x, y], axis=-1)


def walk_topology(x, ex: Executor) -> Tuple[Any, Any]:
    """The YOLO-Fastest layer graph (reference yolo_fastest.py:150-218),
    executor-parameterised.  Returns (head_large, head_small)."""

    def res(x, name):
        y = ex.conv(x, f"{name}/conv1", 1)
        y = ex.conv(y, f"{name}/conv2", 3, depthwise=True)
        y = ex.conv(y, f"{name}/conv3", 1, act=False)
        return ex.add(y, x)

    x = ex.conv(x, "conv0", 3, 2)
    x = ex.conv(x, "conv1_2", 1)
    x = ex.conv(x, "conv1_3", 3, depthwise=True)
    x = ex.conv(x, "conv1_4", 1, act=False)
    x = res(x, "res1_1")
    x = ex.conv(x, "conv1_8", 1)
    x = ex.conv(x, "conv1_9", 3, 2)
    x = ex.conv(x, "conv2_1", 1, act=False)
    x = res(x, "res2_1")
    x = res(x, "res2_2")
    x = ex.conv(x, "conv2_2", 1)
    x = ex.conv(x, "conv2_3", 3, 2, depthwise=True)
    x = ex.conv(x, "conv3_1", 1, act=False)
    x = res(x, "res3_1")
    x = res(x, "res3_2")
    x = ex.conv(x, "conv3_2", 1)
    x = ex.conv(x, "conv3_3", 3, depthwise=True)
    x = ex.conv(x, "conv3_4", 1, act=False)
    x = res(x, "res3_3")
    x = res(x, "res3_4")
    x = res(x, "res3_5")
    x = res(x, "res3_6")
    x = ex.conv(x, "conv3_5", 1)
    x = ex.conv(x, "conv3_6", 3, 2, depthwise=True)
    x = ex.conv(x, "conv4_1", 1, act=False)
    x = res(x, "res4_1")
    x = res(x, "res4_2")
    x = res(x, "res4_3")
    x = res(x, "res4_4")
    c42 = ex.conv(x, "conv4_2", 1)
    x = ex.conv(c42, "conv4_3", 3, 2, depthwise=True)
    x = ex.conv(x, "conv5_1", 1)
    x = res(x, "res5_1")
    x = res(x, "res5_2")
    x = res(x, "res5_3")
    x = res(x, "res5_4")
    x = res(x, "res5_5")
    c52 = ex.conv(x, "conv5_2", 1)
    x = ex.conv(c52, "conv5_3", 5, depthwise=True)
    x = ex.conv(x, "conv5_4", 1, act=False)
    x = ex.conv(x, "conv5_5", 5, depthwise=True)
    x = ex.conv(x, "conv5_6", 1, act=False)
    head_small = ex.head(x, "head_5")

    up = ex.deconv2x(c52, "deconv5_1")
    x = ex.concat(c42, up)
    x = ex.conv(x, "conv4_1_1", 1)
    x = ex.conv(x, "conv4_1_2", 5, depthwise=True)
    x = ex.conv(x, "conv4_1_3", 1, act=False)
    x = ex.conv(x, "conv4_1_4", 5, depthwise=True)
    x = ex.conv(x, "conv4_1_5", 1, act=False)
    head_large = ex.head(x, "head_4")
    return head_large, head_small


def walk_topology_lite(x, ex: Executor):
    """Single-head YOLO-Fastest-lite layer graph (reference
    yolo_fastest.py:310-372, with the skipped-conv3_3 and head-width bugs
    fixed — SURVEY.md §7).  Returns head_small only."""

    def res(x, name):
        y = ex.conv(x, f"{name}/conv1", 1)
        y = ex.conv(y, f"{name}/conv2", 3, depthwise=True)
        y = ex.conv(y, f"{name}/conv3", 1, act=False)
        return ex.add(y, x)

    x = ex.conv(x, "conv0", 3, 2)
    x = ex.conv(x, "conv1_2", 1)
    x = ex.conv(x, "conv1_3", 3, depthwise=True)
    x = ex.conv(x, "conv1_4", 1, act=False)
    x = res(x, "res1_1")
    x = ex.conv(x, "conv1_8", 1)
    x = ex.conv(x, "conv1_9", 3, 2)
    x = ex.conv(x, "conv2_1", 1, act=False)
    x = res(x, "res2_1")
    x = res(x, "res2_2")
    x = ex.conv(x, "conv2_2", 1)
    x = ex.conv(x, "conv2_3", 3, 2, depthwise=True)
    x = ex.conv(x, "conv3_1", 1, act=False)
    x = res(x, "res3_1")
    x = res(x, "res3_2")
    x = ex.conv(x, "conv3_2", 1)
    x = ex.conv(x, "conv3_3", 3, depthwise=True)
    x = ex.conv(x, "conv3_4", 1, act=False)
    x = res(x, "res3_3")
    x = res(x, "res3_4")
    x = res(x, "res3_5")
    x = res(x, "res3_6")
    x = ex.conv(x, "conv3_5", 1)
    x = ex.conv(x, "conv3_6", 3, 2, depthwise=True)
    x = ex.conv(x, "conv4_1", 1, act=False)
    x = res(x, "res4_1")
    x = res(x, "res4_2")
    x = res(x, "res4_3")
    x = res(x, "res4_4")
    x = ex.conv(x, "conv4_2", 1)
    x = ex.conv(x, "conv4_3", 3, 2, depthwise=True)
    x = ex.conv(x, "conv5_1", 1)
    x = res(x, "res5_1")
    x = res(x, "res5_2")
    x = res(x, "res5_3")
    x = res(x, "res5_4")
    x = res(x, "res5_5")
    x = ex.conv(x, "conv5_2", 1)
    x = ex.conv(x, "conv5_3", 5, depthwise=True)
    x = ex.conv(x, "conv5_4", 1, act=False)
    x = ex.conv(x, "conv5_5", 5, depthwise=True)
    x = ex.conv(x, "conv5_6", 1, act=False)
    return ex.head(x, "head_5")


# ----------------------------------------------------------------- fp executor
class FoldedExecutor(Executor):
    """Float (fp32/bf16) folded inference — conv + bias + optional ReLU."""

    def __init__(self, folded: Dict[str, Dict[str, Any]], compute_dtype=jnp.float32):
        self.p = folded
        self.dt = compute_dtype

    def _conv_op(self, x, kernel, stride, groups, pad):
        return jax.lax.conv_general_dilated(
            x,
            kernel.astype(self.dt),
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=self.dt,
        )

    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        p = self.p[name]
        k = jnp.asarray(p["kernel"])
        groups = x.shape[-1] if depthwise else 1
        pad = (kernel - 1) // 2
        y = self._conv_op(x.astype(self.dt), k, stride, groups, pad)
        y = y + jnp.asarray(p["bias"], self.dt)
        return jax.nn.relu(y) if act else y

    def deconv2x(self, x, name):
        p = self.p[name]
        b, h, w, c = x.shape
        kern = jnp.asarray(p["kernel"], self.dt)  # (2, 2, Cin, Cout)
        o = kern.shape[-1]
        k = kern.transpose(2, 0, 1, 3).reshape(c, 4 * o)
        y = jnp.dot(x.astype(self.dt), k, preferred_element_type=self.dt)
        y = y.reshape(b, h, w, 2, 2, o).transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, o)
        return jax.nn.relu(y + jnp.asarray(p["bias"], self.dt))

    def head(self, x, name):
        p = self.p[name]
        y = self._conv_op(x.astype(self.dt), jnp.asarray(p["kernel"]), 1, 1, 0)
        return y + jnp.asarray(p["bias"], self.dt)


def folded_apply(folded: Dict[str, Dict[str, Any]], x, compute_dtype=jnp.float32):
    """Run the folded deployment graph: (B,H,W,1) -> (head_large, head_small)."""
    return walk_topology(x, FoldedExecutor(folded, compute_dtype))


def folded_apply_lite(folded: Dict[str, Dict[str, Any]], x, compute_dtype=jnp.float32):
    """Run the folded lite graph: (B,H,W,1) -> head_small."""
    return walk_topology_lite(x, FoldedExecutor(folded, compute_dtype))

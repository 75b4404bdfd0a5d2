"""Model summary: per-layer shapes / params / MACs from the topology walk.

The reference offers no model introspection (its layer table exists only as
code, ``model_training/model/yolo_fastest.py:150-218``); this module is the
``torchsummary`` analogue, driven by the same declarative walk as every
backend (:func:`yolofastest_tpu.models.graph.walk_topology`), so the table
*is* the deployed graph — BN already folded, exactly what export/.yfb/ncnn
ship.  Host-side only (shape arithmetic, no device); the CLI ``info``
subcommand can additionally attach XLA's compiled cost analysis
(``--device-cost``) for measured FLOPs/bytes of the jitted forward.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import numpy as np

from yolofastest_tpu.models.graph import (Executor, walk_topology,
                                          walk_topology_lite)


class _SummaryExecutor(Executor):
    """Tensors are ``(h, w, c)`` shapes; every op appends a table row."""

    def __init__(self, folded: Dict[str, Dict[str, Any]]):
        self.p = folded
        self.rows: List[Dict[str, Any]] = []

    def _row(self, name, typ, detail, out, params, macs):
        self.rows.append({"name": name, "type": typ, "detail": detail,
                          "out": out, "params": int(params),
                          "macs": int(macs)})

    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        h, w, cin = x
        k = self.p[name]["kernel"]         # HWIO
        cout = int(k.shape[-1])
        ho, wo = math.ceil(h / stride), math.ceil(w / stride)  # SAME pad
        groups = cin if depthwise else 1
        macs = ho * wo * kernel * kernel * (cin // groups) * cout
        params = int(np.prod(k.shape)) + cout  # + folded bias
        typ = "dwconv" if depthwise else "conv"
        detail = f"{kernel}x{kernel}/{stride}" + ("+relu" if act else "")
        self._row(name, typ, detail, (ho, wo, cout), params, macs)
        return (ho, wo, cout)

    def deconv2x(self, x, name):
        h, w, cin = x
        k = self.p[name]["kernel"]          # (2, 2, Cin, Cout)
        cout = int(k.shape[-1])
        macs = h * w * 4 * cin * cout       # k2/s2: every input pixel hits 4 taps
        params = int(np.prod(k.shape)) + cout
        self._row(name, "deconv", "2x2/2+relu", (2 * h, 2 * w, cout),
                  params, macs)
        return (2 * h, 2 * w, cout)

    def head(self, x, name):
        h, w, cin = x
        k = self.p[name]["kernel"]
        cout = int(k.shape[-1])
        self._row(name, "head", "1x1/1", (h, w, cout),
                  int(np.prod(k.shape)) + cout, h * w * cin * cout)
        return (h, w, cout)

    def add(self, x, y):
        if x != y:
            raise ValueError(f"residual shape mismatch {x} vs {y}")
        return x

    def concat(self, x, y):
        if x[:2] != y[:2]:
            raise ValueError(f"concat spatial mismatch {x} vs {y}")
        return (x[0], x[1], x[2] + y[2])


def summarize(folded: Dict[str, Dict[str, Any]], input_hw,
              arch: str = "yolofastest") -> Dict[str, Any]:
    """-> {rows, total_params, total_macs, input_hw, arch, heads}.

    ``rows`` is the per-layer table in walk order; ``total_macs`` counts one
    multiply-accumulate per kernel tap (FLOPs ≈ 2x MACs).
    """
    h, w = int(input_hw[0]), int(input_hw[1])
    ex = _SummaryExecutor(folded)
    walk = {"yolofastest": walk_topology,
            "yolofastest-lite": walk_topology_lite}[arch]
    result = walk((h, w, 1), ex)
    # fastest returns (head_large, head_small); lite one head — and a
    # "tensor" here is itself a (h, w, c) tuple, so discriminate by arch
    heads = list(result) if arch == "yolofastest" else [result]
    return {
        "rows": ex.rows,
        "total_params": sum(r["params"] for r in ex.rows),
        "total_macs": sum(r["macs"] for r in ex.rows),
        "input_hw": (h, w),
        "arch": arch,
        "heads": heads,
    }


def format_summary(s: Dict[str, Any],
                   device_cost: Optional[Dict[str, float]] = None) -> str:
    """Render the summary dict as the table the CLI prints."""
    lines = []
    h, w = s["input_hw"]
    lines.append(f"{s['arch']}  input (N, {h}, {w}, 1)  [BN-folded "
                 "deployment graph]")
    hdr = (f"{'layer':<16}{'type':<8}{'k/s':<12}{'output':<16}"
           f"{'params':>8}{'MACs':>12}")
    lines.append(hdr)
    lines.append("-" * len(hdr))
    for r in s["rows"]:
        ho, wo, c = r["out"]
        lines.append(f"{r['name']:<16}{r['type']:<8}{r['detail']:<12}"
                     f"{f'({ho}, {wo}, {c})':<16}"
                     f"{r['params']:>8}{r['macs']:>12,}")
    lines.append("-" * len(hdr))
    tp, tm = s["total_params"], s["total_macs"]
    lines.append(f"total params: {tp:,}   MACs/img: {tm:,} "
                 f"({2 * tm / 1e9:.3f} GFLOPs)")
    heads = ", ".join(str(tuple(x)) for x in s["heads"])
    lines.append(f"heads: {heads}")
    if device_cost:
        lines.append(
            "XLA compiled cost (batch %d): %.3f GFLOPs/img, %.1f MB "
            "HBM traffic/img" % (device_cost["batch"],
                                 device_cost["flops_per_img"] / 1e9,
                                 device_cost["bytes_per_img"] / 1e6))
    return "\n".join(lines)


def device_cost_analysis(folded, input_hw, arch: str = "yolofastest",
                         batch: int = 8) -> Dict[str, float]:
    """XLA cost analysis of the jitted folded forward (compiles for the
    default backend — the TPU when attached, else CPU)."""
    import jax
    import jax.numpy as jnp

    from yolofastest_tpu.models.graph import folded_apply, folded_apply_lite

    apply_fn = (folded_apply if arch == "yolofastest" else folded_apply_lite)
    fj = jax.tree.map(jnp.asarray, folded)
    h, w = input_hw
    fn = jax.jit(lambda x: apply_fn(fj, x))
    lowered = fn.lower(jax.ShapeDtypeStruct((batch, h, w, 1), jnp.float32))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    byt = float(cost.get("bytes accessed", 0.0))
    return {"batch": batch, "flops_per_img": flops / batch,
            "bytes_per_img": byt / batch}

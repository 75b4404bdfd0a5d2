"""TorchScript export of the folded deployment graph.

The reference ships its model to external runtimes through torch tracing:
``torch.jit.trace`` feeds the RKNN NPU converter
(``rknn_deploy.py:14-20``) and ``torch.onnx._export`` produces the ONNX
that becomes the ncnn graph (``convert_model/pytorch_to_onnx.py:17-23``).
This module is the equivalent for our framework: the BN-folded deployment
graph (:mod:`yolofastest_tpu.models.graph`) is rebuilt op-for-op on torch
tensors and traced, yielding a ``.pt`` artifact loadable by **any libtorch
runtime with no JAX / flax / framework dependency** — the second
interchange format next to StableHLO (:mod:`.stablehlo`) and the native
``.yfb`` (:mod:`.native`).

I/O convention matches the reference's exported models exactly: the graph
is conv-only (no sigmoid/decode inside — SURVEY.md §3.5), takes normalized
grayscale NCHW ``(B, 1, H, W)`` float32 (``(pixel - 128) / 255``) and
returns raw ``(head_large, head_small)`` logits in NCHW — the same tensors
the reference's ONNX/TorchScript artifacts emit, so any existing consumer
of those artifacts can swap ours in.

Torch is only imported inside the functions so the rest of the framework
never depends on it.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from yolofastest_tpu.models.graph import Executor, walk_topology, walk_topology_lite


class _TorchExecutor(Executor):
    """Folded-graph executor over torch NCHW tensors (tracing-friendly:
    every op is a plain ``torch.nn.functional`` call on baked weights)."""

    def __init__(self, weights: Dict[str, Dict[str, Any]]):
        self.p = weights

    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        import torch.nn.functional as F

        w, b = self.p[name]["kernel"], self.p[name]["bias"]
        groups = x.shape[1] if depthwise else 1
        y = F.conv2d(x, w, b, stride=stride, padding=(kernel - 1) // 2,
                     groups=groups)
        return F.relu(y) if act else y

    def deconv2x(self, x, name):
        import torch.nn.functional as F

        y = F.conv_transpose2d(x, self.p[name]["kernel"], self.p[name]["bias"],
                               stride=2)
        return F.relu(y)

    def head(self, x, name):
        import torch.nn.functional as F

        return F.conv2d(x, self.p[name]["kernel"], self.p[name]["bias"])

    def concat(self, x, y):
        import torch

        return torch.cat([x, y], dim=1)


def build_torch_module(folded: Dict[str, Dict[str, Any]], arch: str = "yolofastest"):
    """Folded params (``fold_batchnorm`` output, HWIO kernels) -> a torch
    ``nn.Module`` computing the identical forward in NCHW.

    Layout conversion: conv kernels HWIO ``(kh,kw,I,O)`` -> torch OIHW
    (depthwise ``(kh,kw,1,C)`` -> ``(C,1,kh,kw)`` with ``groups=C``);
    deconv kernels ``(2,2,Cin,Cout)`` -> torch ``(Cin,Cout,2,2)``.
    """
    import torch

    walk = {"yolofastest": walk_topology, "yolofastest-lite": walk_topology_lite}[arch]

    def to_torch(name, t):
        a = np.asarray(t, np.float32)
        if a.ndim == 4:
            perm = (2, 3, 0, 1) if name.startswith("deconv") else (3, 2, 0, 1)
            a = a.transpose(perm)
        return torch.from_numpy(np.ascontiguousarray(a))

    weights = {
        name: {k: to_torch(name, v) for k, v in p.items()}
        for name, p in folded.items()
    }

    class FoldedNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self._ex = _TorchExecutor(weights)

        def forward(self, x):
            return walk(x, self._ex)

    return FoldedNet().eval()


def export_torchscript(folded: Dict[str, Dict[str, Any]], input_hw, path: str,
                       batch: int = 1, arch: str = "yolofastest") -> str:
    """Trace the folded graph and save a self-contained ``.pt``.

    ``input_hw`` is the net input ``(H, W)``; the traced example is
    ``(batch, 1, H, W)`` float32.  Spatial dims stay shape-polymorphic in
    practice only for same-stride multiples; like the reference's traced
    artifacts, consumers should re-export per resolution.
    """
    import torch

    module = build_torch_module(folded, arch=arch)
    example = torch.zeros((batch, 1, *input_hw), dtype=torch.float32)
    with torch.no_grad():
        traced = torch.jit.trace(module, example)
    traced.save(path)
    return path

"""PyTorch ``.pth`` -> JAX variables converter for YOLO-Fastest checkpoints.

The reference ships trained ``state_dict`` checkpoints
(``models/pytorch/{256x320,512x640}/YOLO-Fastest_epoch_*.pth``); our module
names mirror the reference layer names, so conversion is a mechanical layout
transpose:

* conv weight      OIHW -> HWIO                    (torch ``<m>.0.weight``)
* depthwise weight (C,1,K,K) -> (K,K,1,C)          (same transpose)
* deconv weight    (Cin,Cout,2,2) -> (2,2,Cin,Cout) (torch ``deconv5_1.0.weight``)
* BatchNorm        weight/bias/running_mean/running_var ->
                   scale/bias and batch_stats mean/var (torch ``<m>.1.*``)
* heads            Conv2d with bias (torch ``head_4.weight``/``head_4.bias``)

torch is only imported here (CPU, host-side, once at load time); nothing in
the compute path depends on it.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _to_np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch  # local import: host-side tooling only

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: _to_np(v) for k, v in sd.items()}


def _convert_conv_bn(sd, prefix: str, deconv: bool = False):
    """torch ``<prefix>.0`` conv + ``<prefix>.1`` BN -> flax param/stat dicts."""
    w = sd[f"{prefix}.0.weight"]
    if deconv:
        kernel = w.transpose(2, 3, 0, 1)  # (Cin,Cout,kh,kw) -> (kh,kw,Cin,Cout)
        params = {"kernel": kernel}
    else:
        kernel = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        params = {"conv": {"kernel": kernel}}
    bn_params = {"scale": sd[f"{prefix}.1.weight"], "bias": sd[f"{prefix}.1.bias"]}
    bn_stats = {"mean": sd[f"{prefix}.1.running_mean"], "var": sd[f"{prefix}.1.running_var"]}
    params["bn"] = bn_params
    return params, {"bn": bn_stats}


def _convert_head(sd, prefix: str):
    return {
        "kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0),
        "bias": sd[f"{prefix}.bias"],
    }


def torch_state_dict_to_variables(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Build the full flax ``{'params': ..., 'batch_stats': ...}`` tree from a
    reference state_dict (works for both YoloFastest and YoloFastestLite —
    the module set is discovered from the keys)."""
    modules = sorted({k.split(".")[0] for k in sd})
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for m in modules:
        if m.startswith("head"):
            params[m] = _convert_head(sd, m)
        elif m.startswith("res"):
            p_block: Dict[str, Any] = {}
            s_block: Dict[str, Any] = {}
            for sub in ("conv1", "conv2", "conv3"):
                p, s = _convert_conv_bn(sd, f"{m}.{sub}")
                p_block[sub] = p
                s_block[sub] = s
            params[m] = p_block
            stats[m] = s_block
        elif m.startswith("deconv"):
            p, s = _convert_conv_bn(sd, m, deconv=True)
            params[m] = p
            stats[m] = s
        else:  # plain conv_norm(_relu) blocks
            p, s = _convert_conv_bn(sd, m)
            params[m] = p
            stats[m] = s
    return {"params": params, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` and return flax variables (numpy leaves)."""
    return torch_state_dict_to_variables(load_torch_state_dict(path))

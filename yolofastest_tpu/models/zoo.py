"""Model zoo: flat-npz serialisation of flax variable trees.

The reference ships trained weights in three formats (pytorch/onnx/ncnn,
``/root/reference/models/``); our native format is a flat ``.npz`` of
``collection/path/to/leaf`` keys — framework-neutral, loadable without JAX
(the C++ runtime reads the same file via its own loader after BN folding).

``tools/make_zoo.py`` converts the reference checkpoints into
``weights/yolofastest_{256x320,512x640}.npz`` committed in this repo, so
tests and benchmarks never need torch or the reference mount.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

_SEP = "/"


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_variables(variables: Dict[str, Any], path: str) -> None:
    flat = _flatten({k: v for k, v in variables.items()})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **flat)


def load_variables(path: str) -> Dict[str, Any]:
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


def zoo_path(res: str) -> str:
    """Committed converted checkpoint for a resolution preset."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "weights", f"yolofastest_{res}.npz")

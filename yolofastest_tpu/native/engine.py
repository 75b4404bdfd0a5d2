"""ctypes binding to the native C++ runtime (``cpp/`` -> ``libyf.so``).

The host-CPU deployment path — capability-equivalent of the reference's
NCNN C++ pipeline (``ncnn_deploy/src/YOLO_ncnn.cpp``), but self-contained:
our own NHWC conv engine executes the BN-folded graph exported with
:func:`yolofastest_tpu.export.save_native_weights`.

Build once with ``cpp/build.sh`` (cmake + ninja).  pybind11 is not in this
image; the C ABI + ctypes keeps the boundary dependency-free.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

from yolofastest_tpu.configs import Config


def default_library_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "cpp", "build", "libyf.so")


class NativeEngine:
    """Loads ``libyf.so`` and a ``.yfb`` weights file; runs forward/detect."""

    def __init__(self, weights_path: str, config: Config,
                 library_path: Optional[str] = None):
        lib_path = library_path or default_library_path()
        if not os.path.exists(lib_path):
            raise FileNotFoundError(
                f"native library not built: {lib_path} (run cpp/build.sh)"
            )
        self.lib = ctypes.CDLL(lib_path)
        self.lib.yf_create.restype = ctypes.c_void_p
        self.lib.yf_create.argtypes = [ctypes.c_char_p]
        self.lib.yf_destroy.argtypes = [ctypes.c_void_p]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        self.lib.yf_forward.restype = ctypes.c_int
        self.lib.yf_forward.argtypes = [
            ctypes.c_void_p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ]
        self.lib.yf_detect.restype = ctypes.c_int
        self.lib.yf_detect.argtypes = [
            ctypes.c_void_p, f32p, ctypes.c_int, ctypes.c_int, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_int, f32p,
        ]
        self.lib.yf_is_lite.restype = ctypes.c_int
        self.lib.yf_is_lite.argtypes = [ctypes.c_void_p]
        self.lib.yf_int8_layers.restype = ctypes.c_int
        self.lib.yf_int8_layers.argtypes = [ctypes.c_void_p]
        self.handle = self.lib.yf_create(weights_path.encode())
        if not self.handle:
            raise RuntimeError(f"failed to load weights: {weights_path}")
        self.is_lite = bool(self.lib.yf_is_lite(self.handle))
        #: layers executing with real int8 arithmetic (0 = pure fp32; > 0
        #: when the .yfb carries kernel_q weights AND act_scale entries)
        self.int8_layers = int(self.lib.yf_int8_layers(self.handle))
        self.config = config
        io = config.io
        self._anchors = np.asarray(io.anchors, np.float32).reshape(-1)
        if self.is_lite != (len(io.anchors) == 1):
            raise ValueError(
                f"weights are {'lite' if self.is_lite else 'two-head'} but "
                f"config has {len(io.anchors)} anchor group(s); use a "
                f"{'lite-*' if self.is_lite else 'non-lite'} config preset"
            )

    def __del__(self):
        if getattr(self, "handle", None):
            self.lib.yf_destroy(self.handle)
            self.handle = None

    def forward(self, img: np.ndarray):
        """(H, W) or (H, W, 1) normalised float32 -> head NHWC logits:
        ``(head_large, head_small)`` for the two-head net, ``(head_small,)``
        for lite weights."""
        io = self.config.io
        h, w = io.input_hw
        img = np.ascontiguousarray(img.reshape(h, w), np.float32)
        ch = io.num_out
        large = np.empty((h // 16, w // 16, ch), np.float32)
        small = np.empty((h // 32, w // 32, ch), np.float32)
        ret = self.lib.yf_forward(self.handle, img, h, w,
                                  large.reshape(-1), small.reshape(-1))
        if ret != 0:
            raise RuntimeError("yf_forward failed")
        return (small,) if self.is_lite else (large, small)

    def detect(self, img: np.ndarray, max_det: int = 64) -> List[List[float]]:
        """(H, W) normalised float32 -> rows
        ``[x1, y1, x2, y2, conf, cls_score, cls_idx]`` (net-input coords)."""
        io = self.config.io
        h, w = io.input_hw
        img = np.ascontiguousarray(img.reshape(h, w), np.float32)
        out = np.empty((max_det, 7), np.float32)
        n = self.lib.yf_detect(
            self.handle, img, h, w, self._anchors,
            len(io.anchors), io.num_anchors, io.num_cls,
            io.conf_thre, io.nms_thre, max_det, out.reshape(-1),
        )
        if n < 0:
            raise RuntimeError("yf_detect failed")
        return [list(map(float, row)) for row in out[:n]]

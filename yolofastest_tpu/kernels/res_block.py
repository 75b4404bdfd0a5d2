"""Fused inverted-residual CHAINS as single Pallas TPU kernels.

The YOLO-Fastest backbone is 16 ``BasicResBlock``s (1x1 expand -> 3x3
depthwise -> 1x1 project + residual, reference ``yolo_fastest.py:52-66``)
arranged in same-shape chains of 1-5 blocks per stage.  Under XLA every conv
round-trips HBM and the expanded activation is ``inner/io`` = 2-14x wider
than the block I/O, so at deployment batch sizes the backbone is HBM-bound.

These kernels run a whole chain with the activations resident in VMEM: HBM
traffic drops from ``K * (2*C + 4*I)`` elements per pixel to ``2*C`` — up
to ~50x for the res5 stage (K=5, C=48, I=224).  Two layouts are provided,
both sidestepping Mosaic's no-lane-split reshape rule by keeping the spatial
plane flat and doing the 3x3 depthwise as 9 border-masked circular rolls:

* channels-first ``(C, B*H*W)`` — lanes = batched pixels
  (:func:`fused_res_chain`), and
* row-major ``(B*H*W, C)`` — lanes = channels
  (:func:`fused_res_chain_nhwc`).

**Measured verdict (TPU v5e, batch 512, all backbone stages):** both fused
layouts land at 0.2-0.7x of XLA's layer-by-layer convolutions.  The HBM
savings are real, but a depthwise conv expressed as lane/sublane rolls is
VPU-shuffle-bound, and XLA's native windowed conv pipeline wins.  The
production inference path therefore stays on XLA (`models/yolo_fastest.py`,
`models/graph.py`); these kernels remain as correct, tested building blocks
(and as the negative result that justifies the XLA choice).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chain_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  out_ref, *, hw: Tuple[int, int]):
    h, w = hw
    k_blocks = w1_ref.shape[0]
    inner = w1_ref.shape[2]
    n = x_ref.shape[1]  # BT * H * W lanes (several images per program)

    # Per-lane row/col within its image; the 3x3 depthwise runs as 9 circular
    # lane-rolls masked at image borders (Mosaic cannot split the lane dim
    # into (H, W), so planes never leave the flat layout).  Rolls that cross
    # an image boundary only ever land on masked-out border taps, so packing
    # several images into the lane dimension is safe.
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1) % (h * w)
    row = pos // w
    col = pos % w

    def body(k, x):
        # x: (C, BT*H*W) in VMEM, input dtype
        w1 = w1_ref[k]  # (C, I)
        h1 = jax.lax.dot_general(
            w1, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (I, HW)
        h1 = jnp.maximum(h1 + b1_ref[k][:, None].astype(jnp.float32), 0.0)
        h1 = h1.astype(x.dtype)

        # 3x3 depthwise: out[p] = sum_{dy,dx} in[p + (dy-1)*W + (dx-1)]
        acc = jnp.zeros((inner, n), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                off_y, off_x = dy - 1, dx - 1
                shifted = pltpu.roll(h1, (-(off_y * w + off_x)) % n, 1)
                valid = (
                    (row + off_y >= 0) & (row + off_y < h)
                    & (col + off_x >= 0) & (col + off_x < w)
                )
                tap = jnp.where(valid, shifted.astype(jnp.float32), 0.0)
                acc = acc + tap * w2_ref[k, dy, dx][:, None].astype(jnp.float32)
        h2 = jnp.maximum(acc + b2_ref[k][:, None].astype(jnp.float32), 0.0)
        h2 = h2.astype(x.dtype)

        # 1x1 project + residual
        w3 = w3_ref[k]  # (I, C)
        h3 = jax.lax.dot_general(
            w3, h2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, HW)
        y = h3 + b3_ref[k][:, None].astype(jnp.float32) + x.astype(jnp.float32)
        return y.astype(x.dtype)

    out_ref[:] = jax.lax.fori_loop(0, k_blocks, body, x_ref[:])


def _pick_batch_tile(b: int, hw_flat: int, c: int, inner: int,
                     itemsize: int) -> int:
    """Images per program: fill lanes to ~1-4 MB of expanded activation
    without blowing VMEM (~16 MB budget across x, h1, acc, temps)."""
    budget = 600_000  # bytes for the widest (inner, BT*HW) plane
    bt = max(1, budget // max(1, hw_flat * inner * max(itemsize, 4)))
    while b % bt:  # keep the grid exact
        bt -= 1
    return max(1, bt)


@functools.partial(jax.jit, static_argnames=("hw", "interpret"))
def fused_res_chain_cf(x_cf, w1, b1, w2, b2, w3, b3, hw: Tuple[int, int],
                       interpret: bool = False):
    """Run K chained res blocks on a channels-first batch plane.

    Args:
      x_cf: (C, B*H*W) activations — batch folded into the lane axis.
      w1: (K, C, I); b1: (K, I); w2: (K, 3, 3, I); b2: (K, I);
      w3: (K, I, C); b3: (K, C).
      hw: static (H, W) of one image plane.
    """
    c, total = x_cf.shape
    h, w = hw
    hw_flat = h * w
    b = total // hw_flat
    k_blocks, _, inner = w1.shape
    dt = x_cf.dtype

    bt = _pick_batch_tile(b, hw_flat, c, inner, x_cf.dtype.itemsize)
    kern = functools.partial(_chain_kernel, hw=hw)
    return pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((c, bt * hw_flat), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, bt * hw_flat), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, total), dt),
        interpret=interpret,
    )(
        x_cf,
        w1.astype(dt), b1.astype(jnp.float32),
        w2.astype(dt), b2.astype(jnp.float32),
        w3.astype(dt), b3.astype(jnp.float32),
    )


def fused_res_chain(x, w1, b1, w2, b2, w3, b3, interpret: bool = False):
    """NHWC wrapper: (B, H, W, C) -> (B, H, W, C) through K fused res blocks.

    Transposes to channels-first at the stage boundary (amortised over the
    chain), runs :func:`fused_res_chain_cf`, transposes back.
    """
    b, h, w, c = x.shape
    x_cf = x.transpose(3, 0, 1, 2).reshape(c, b * h * w)
    y = fused_res_chain_cf(x_cf, w1, b1, w2, b2, w3, b3, (h, w),
                           interpret=interpret)
    return y.reshape(c, b, h, w).transpose(1, 2, 3, 0)


def fused_res_block(x, w1, b1, w2, b2, w3, b3, interpret: bool = False):
    """Single-block convenience wrapper (K=1 chain)."""
    return fused_res_chain(
        x, w1[None], b1[None], w2[None], b2[None], w3[None], b3[None],
        interpret=interpret,
    )


# --------------------------------------------------------- row-major variant
def _chain_rows_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                       out_ref, *, hw: Tuple[int, int]):
    """2D row-major chain: rows = flattened (image, y, x), lanes = channels.

    Wide inner channels (I = 96..224) fill the lane dimension; the depthwise
    conv becomes 9 sublane-rolls masked at image borders.  Everything stays
    rank-2, sidestepping Mosaic reshape limits entirely.
    """
    h, w = hw
    k_blocks = w1_ref.shape[0]
    rows = x_ref.shape[0]

    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % (h * w)
    rrow = ridx // w
    rcol = ridx % w

    def body(k, x):
        # x: (rows, C)
        h1 = jnp.dot(x, w1_ref[k], preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + b1_ref[k].astype(jnp.float32), 0.0)
        h1 = h1.astype(x.dtype)  # (rows, I)

        acc = jnp.zeros(h1.shape, jnp.float32)
        for dy in range(3):
            for dx in range(3):
                off_y, off_x = dy - 1, dx - 1
                shift = (-(off_y * w + off_x)) % rows
                shifted = pltpu.roll(h1, shift, 0)
                valid = (
                    (rrow + off_y >= 0) & (rrow + off_y < h)
                    & (rcol + off_x >= 0) & (rcol + off_x < w)
                )
                tap = jnp.where(valid, shifted.astype(jnp.float32), 0.0)
                acc = acc + tap * w2_ref[k, dy, dx].astype(jnp.float32)
        h2 = jnp.maximum(acc + b2_ref[k].astype(jnp.float32), 0.0).astype(x.dtype)

        h3 = jnp.dot(h2, w3_ref[k], preferred_element_type=jnp.float32)
        y = h3 + b3_ref[k].astype(jnp.float32) + x.astype(jnp.float32)
        return y.astype(x.dtype)

    out_ref[:] = jax.lax.fori_loop(0, k_blocks, body, x_ref[:])


@functools.partial(jax.jit, static_argnames=("hw", "interpret"))
def fused_res_chain_rows(x_rows, w1, b1, w2, b2, w3, b3, hw: Tuple[int, int],
                         interpret: bool = False):
    """Row-major fused chain: x_rows is (B*H*W, C) NHWC-flattened."""
    total, c = x_rows.shape
    h, w = hw
    hw_flat = h * w
    b = total // hw_flat
    k_blocks, _, inner = w1.shape
    dt = x_rows.dtype

    # rows per program: ~1 MB of the widest (rows, I) f32 plane
    budget = 1_000_000
    bt = max(1, budget // max(1, hw_flat * inner * 4))
    while b % bt:
        bt -= 1
    rows = bt * hw_flat

    kern = functools.partial(_chain_rows_kernel, hw=hw)
    return pl.pallas_call(
        kern,
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, c), dt),
        interpret=interpret,
    )(
        x_rows,
        w1.astype(dt), b1.astype(jnp.float32),
        w2.astype(dt), b2.astype(jnp.float32),
        w3.astype(dt), b3.astype(jnp.float32),
    )


def fused_res_chain_nhwc(x, w1, b1, w2, b2, w3, b3, interpret: bool = False):
    """NHWC wrapper for the row-major variant — no transposes, only a free
    collapse to (B*H*W, C)."""
    b, h, w, c = x.shape
    y = fused_res_chain_rows(x.reshape(b * h * w, c), w1, b1, w2, b2, w3, b3,
                             (h, w), interpret=interpret)
    return y.reshape(b, h, w, c)


def chain_weights_from_folded(folded, names: Sequence[str]):
    """Stack (w1, b1, w2, b2, w3, b3) for a same-shape chain of res blocks
    from a ``fold_batchnorm`` tree (``res*/conv1..conv3`` layers)."""
    w1, b1, w2, b2, w3, b3 = [], [], [], [], [], []
    for name in names:
        p1 = folded[f"{name}/conv1"]
        p2 = folded[f"{name}/conv2"]
        p3 = folded[f"{name}/conv3"]
        w1.append(np.asarray(p1["kernel"]).reshape(p1["kernel"].shape[2:]))
        b1.append(np.asarray(p1["bias"]))
        w2.append(np.asarray(p2["kernel"]).reshape(3, 3, -1))
        b2.append(np.asarray(p2["bias"]))
        w3.append(np.asarray(p3["kernel"]).reshape(p3["kernel"].shape[2:]))
        b3.append(np.asarray(p3["bias"]))
    return tuple(np.stack(a) for a in (w1, b1, w2, b2, w3, b3))

"""Quantisation-aware fine-tuning of the folded deployment graph.

PTQ (:mod:`yolofastest_tpu.quant.ptq`) rounds a trained fp model onto the
int8 grid after the fact; this module closes the loop the reference left
entirely open (its NPU path shipped fp16 with int8 as listed future work,
``rknn_deploy.py:43``, ``问题列表与理解.txt:32``): **fine-tune the folded
weights through a fake-quantised forward** so the model learns to sit on
the int8 grid it will be deployed on.

Design (standard STE fake-quant, laid out to mirror our deployed int8
semantics EXACTLY):

* :class:`FakeQuantExecutor` drives the same declarative topology as every
  other backend (``models/graph.py::walk_topology``) — per-op input
  fake-quant at the *fixed* calibrated scale (``calibrate``), per-output-
  channel weight fake-quant at the *dynamic* ``amax/127`` scale (exactly
  what :func:`~yolofastest_tpu.quant.ptq.quantize_weights` will apply at
  export), fp accumulation.  Its forward therefore matches
  :func:`~yolofastest_tpu.quant.ptq.quantized_apply` to accumulation
  precision, while remaining differentiable end to end.
* Rounding uses the straight-through estimator (identity gradient);
  clipping keeps its natural gradient (zero outside the representable
  range), so activations outside ``±127·s`` push the loss, not NaNs.
* Activation scales stay FROZEN during fine-tuning: the deployed graph
  must run at the scales it was trained against, so training them would
  require re-calibration drift loops for marginal gain at this model size.

Two supervision modes in one loop (:func:`qat_finetune`):

* **distillation** (no labels): MSE between the fake-quant student's head
  logits and the fp folded teacher's — recovers PTQ loss using nothing but
  the calibration images;
* **labels**: the real YOLOv3 loss (``losses/yolo_loss.py::total_loss``)
  through the fake-quant graph, for when a labelled set is available.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from yolofastest_tpu.models.graph import (FoldedExecutor, walk_topology,
                                          walk_topology_lite)

_WALKS = {"fastest": walk_topology, "lite": walk_topology_lite}

__all__ = ["ste_round", "fake_quant_act", "fake_quant_weight",
           "FakeQuantExecutor", "qat_apply", "qat_finetune"]


def ste_round(x):
    """Round with a straight-through (identity) gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def fake_quant_act(x, scale):
    """Per-tensor symmetric fake-quant at a fixed scale.

    Value-identical to ``Int8Executor._quant_in`` followed by dequant
    (round-half-even both here and there); gradient is identity inside the
    representable range, zero outside (natural clip gradient).
    """
    s = jnp.asarray(scale, jnp.float32)
    x = jnp.clip(x.astype(jnp.float32), -127.0 * s, 127.0 * s)
    return ste_round(x / s) * s


def fake_quant_weight(k):
    """Per-output-channel symmetric fake-quant with dynamic scale.

    The scale is recomputed from the current weights each step (and
    detached) — exactly the ``amax/127`` grid ``quantize_weights`` snaps to
    at export, so what trains is what ships.
    """
    k = k.astype(jnp.float32)
    reduce_axes = tuple(range(k.ndim - 1))
    amax = jax.lax.stop_gradient(jnp.max(jnp.abs(k), axis=reduce_axes))
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    return ste_round(jnp.clip(k / s, -127.0, 127.0)) * s


class FakeQuantExecutor(FoldedExecutor):
    """Differentiable stand-in for ``Int8Executor`` over the shared walk."""

    def __init__(self, folded, act_scales: Dict[str, float]):
        super().__init__(folded, jnp.float32)
        self.s = act_scales

    def conv(self, x, name, kernel, stride=1, depthwise=False, act=True):
        p = self.p[name]
        xq = fake_quant_act(x, self.s[name])
        kq = fake_quant_weight(jnp.asarray(p["kernel"]))
        groups = x.shape[-1] if depthwise else 1
        pad = (kernel - 1) // 2
        y = self._conv_op(xq, kq, stride, groups, pad)
        y = y + jnp.asarray(p["bias"], self.dt)
        return jax.nn.relu(y) if act else y

    def deconv2x(self, x, name):
        p = self.p[name]
        xq = fake_quant_act(x, self.s[name])
        kq = fake_quant_weight(jnp.asarray(p["kernel"]))  # (2,2,Cin,Cout)
        b, h, w, c = x.shape
        o = kq.shape[-1]
        k2 = kq.transpose(2, 0, 1, 3).reshape(c, 4 * o)
        y = jnp.dot(xq, k2, preferred_element_type=self.dt)
        y = y.reshape(b, h, w, 2, 2, o).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b, 2 * h, 2 * w, o)
        return jax.nn.relu(y + jnp.asarray(p["bias"], self.dt))

    def head(self, x, name):
        p = self.p[name]
        xq = fake_quant_act(x, self.s[name])
        kq = fake_quant_weight(jnp.asarray(p["kernel"]))
        y = self._conv_op(xq, kq, 1, 1, 0)
        return y + jnp.asarray(p["bias"], self.dt)


def qat_apply(folded, act_scales: Dict[str, float], x,
              arch: str = "fastest"):
    """Fake-quant forward: (B,H,W,1) float -> head logits, differentiable
    w.r.t. ``folded`` (kernel + bias leaves)."""
    return _WALKS[arch](x, FakeQuantExecutor(folded, act_scales))


def _as_head_tuple(heads) -> Tuple[jax.Array, ...]:
    return heads if isinstance(heads, tuple) else (heads,)


def qat_finetune(
    folded: Dict[str, Dict[str, np.ndarray]],
    act_scales: Dict[str, float],
    batches: Sequence[np.ndarray],
    *,
    arch: str = "fastest",
    targets: Optional[Sequence[np.ndarray]] = None,
    anchors: Optional[Sequence[Sequence[Tuple[float, float]]]] = None,
    input_hw: Optional[Tuple[int, int]] = None,
    num_cls: int = 3,
    steps: int = 50,
    lr: float = 1e-4,
    conf_weight: float = 1.0,
    snapshot_every: int = 0,
) -> Tuple[Dict[str, Dict[str, np.ndarray]], List[float]]:
    """Fine-tune folded weights through the fake-quant graph.

    Args:
      folded: fp folded params (``fold_batchnorm`` output); not mutated.
      act_scales: frozen activation scales from ``calibrate`` (the scales
        the deployed int8 graph will run at).
      batches: image batches (B,H,W,1) float32 — the calibration images
        are the natural choice.
      targets: optional per-batch (B,64,6) YOLO target tensors; when given
        (with ``anchors`` + ``input_hw``) the real YOLO loss supervises,
        otherwise the fp folded teacher's head logits do (distillation).
      steps: optimizer steps (batches are cycled).
      lr: Adam learning rate (small — this is a refinement, not training).

    Returns ``(finetuned_folded_numpy, per-step loss history)``.  STE
    training is noisy — every ``lr``-sized move flips the weights sitting
    within ``lr`` of a rounding boundary by a whole grid step — so the
    returned params are the **lowest-loss point on the trajectory**, not
    the last step (``history`` still records every step, so callers can
    see the raw curve).

    ``conf_weight`` > 1 emphasises the objectness channels in the
    distillation MSE (the deployment failure mode is a conf logit slipping
    under the detect gate).  ``snapshot_every`` = K > 0 additionally
    returns every K-th-step parameter snapshot as a third tuple element,
    for callers that select on a deployment metric (e.g. all-backend
    golden recall, ``tools/search_int8_recipe.py``) instead of the loss.
    """
    if targets is not None and (anchors is None or input_hw is None):
        raise ValueError("label mode needs anchors and input_hw")
    if not batches:
        raise ValueError("qat_finetune needs at least one image batch")
    if targets is not None and len(targets) != len(batches):
        raise ValueError("targets must pair 1:1 with batches")

    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), dict(folded))
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    walk = _WALKS[arch]

    if targets is None:
        # distillation teachers: fp folded forward, computed once per batch
        teacher_ex = FoldedExecutor(params, jnp.float32)
        teach = jax.jit(lambda x: _as_head_tuple(walk(x, teacher_ex)))
        refs = [jax.device_get(teach(jnp.asarray(b))) for b in batches]

        def loss_fn(p, x, ref):
            heads = _as_head_tuple(qat_apply(p, act_scales, x, arch))
            if conf_weight == 1.0:
                return sum(jnp.mean((h - r) ** 2) for h, r in zip(heads, ref)
                           ) / len(heads)
            # conf-weighted distillation: the deployment-visible failure
            # mode is a conf logit slipping under the detect gate, so the
            # objectness channel (offset 4 in each anchor's 5+C block) can
            # be emphasised over box/class channels.
            tot = 0.0
            for h, r in zip(heads, ref):
                blk = h.shape[-1] // 3  # 5 + C
                w = jnp.ones((h.shape[-1],), h.dtype)
                w = w.at[4::blk].set(conf_weight)
                tot = tot + jnp.mean((h - r) ** 2 * w) / jnp.mean(w)
            return tot / len(heads)
    else:
        from yolofastest_tpu.losses import total_loss

        refs = [jnp.asarray(t) for t in targets]

        def loss_fn(p, x, tgt):
            heads = _as_head_tuple(qat_apply(p, act_scales, x, arch))
            tot, _ = total_loss(heads, tgt, anchors, input_hw,
                                num_cls=num_cls)
            return tot

    @jax.jit
    def step(p, s, x, ref):
        l, g = jax.value_and_grad(loss_fn)(p, x, ref)
        updates, s = opt.update(g, s, p)
        return optax.apply_updates(p, updates), s, l

    history: List[float] = []
    snapshots: List[Dict[str, Dict[str, np.ndarray]]] = []
    xs = [jnp.asarray(b, jnp.float32) for b in batches]
    best_loss, best_params = np.inf, params
    for i in range(steps):
        j = i % len(xs)
        # `l` is the loss at the CURRENT params (before this update)
        new_params, opt_state, l = step(params, opt_state, xs[j], refs[j])
        l = float(l)
        history.append(l)
        if np.isfinite(l) and l < best_loss:
            best_loss, best_params = l, params
        params = new_params
        if snapshot_every and (i + 1) % snapshot_every == 0:
            snapshots.append(jax.tree_util.tree_map(np.asarray, params))
    result = jax.tree_util.tree_map(np.asarray, best_params)
    if snapshot_every:
        # caller selects on its OWN metric (e.g. all-backend golden recall)
        # — the loss is a proxy and the STE trajectory is noisy
        return result, history, snapshots
    return result, history

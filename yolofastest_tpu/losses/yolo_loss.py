"""YOLOv3 loss with fully vectorised target assignment — pure jitted functions.

Capability-equivalent of the reference ``YOLOLossV3``
(``src/model_training/loss/yolo_loss.py:27-196``), redesigned for XLA:

* The reference builds targets with a Python double loop over ``batch x 64``
  boxes on the host **every step** (``yolo_loss.py:156-194`` — its CPU hot
  spot, SURVEY.md §3.1).  Here assignment is a short ``lax.fori_loop`` over
  the 64 padded GT slots with batched scatters — it lives inside the jitted
  train step, runs on device, and is differentiable-safe (targets are
  ``stop_gradient`` by construction).
* The sequential scatter ordering reproduces the reference's exact semantics:
  later boxes overwrite earlier ones on cell collisions (``tcls`` alone is
  sticky-OR across colliding boxes, as in the reference where the one-hot
  write is never reset), and the ``break`` on the first invalid slot
  (``yolo_loss.py:158``) is a cumulative-product validity prefix.
* Means are taken over the **full** ``(bs, A, H, W)`` tensor exactly like the
  reference's ``nn.BCELoss()/nn.MSELoss()`` on masked products (masked-out
  cells contribute 0 to the numerator but count in the denominator —
  reference behaviour, kept for numeric parity; SURVEY.md §7 notes this).
* ``loss_cls`` averages over positive cells only (the reference's boolean
  indexing ``pred_cls[mask==1]``, ``yolo_loss.py:89``); when an image batch
  has zero positives the reference NaNs — we return 0 instead (documented
  divergence, the only sane choice under jit).

Shapes are NHWC end to end: heads come in as ``(B, H, W, A*(5+C))`` where the
channel dimension orders ``anchor-major, attr-minor`` — identical memory
order to the reference's NCHW ``view(bs, A, 5+C, H, W)``.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

_LOG_CLAMP = -100.0  # torch nn.BCELoss clamps log terms at -100


def _safe_log(x):
    return jnp.maximum(jnp.log(x), _LOG_CLAMP)


def _bce(pred, target):
    """Elementwise binary cross-entropy on probabilities, torch-BCELoss clamp."""
    return -(target * _safe_log(pred) + (1.0 - target) * _safe_log(1.0 - pred))


def _softplus_c(z):
    """softplus clamped at 100 == the -100 log clamp of torch BCELoss
    (``-log sigmoid(z) = softplus(-z)``)."""
    return jnp.minimum(jax.nn.softplus(z), -_LOG_CLAMP)


def _bce_logits(z, target):
    """BCE of ``sigmoid(z)`` vs target, computed FROM LOGITS.

    Analytically identical to ``_bce(sigmoid(z), target)`` including the
    torch -100 clamp, but with finite gradients when the sigmoid saturates
    to exactly 0/1 in float32 — a converged checkpoint's conf logits do,
    and ``max(log(0), -100)`` there has a ``0 * inf = NaN`` VJP that
    poisons every gradient (observed: fine-tuning from the reference
    checkpoint NaN'd on step 1 before this formulation)."""
    return target * _softplus_c(-z) + (1.0 - target) * _softplus_c(z)


def _shape_iou(gw, gh, anchors_wh):
    """Shape-only IOU of GT (w,h) vs each anchor, with the reference's
    +1-pixel convention (``utils/general.py:44-48``): boxes are
    ``[0, 0, w, h]`` corners, so inter = (min(w,aw)+1)(min(h,ah)+1).

    Args:
      gw, gh: (...,) GT sizes in feature-map units.
      anchors_wh: (A, 2) scaled anchors.
    Returns: (..., A) IOU.
    """
    aw = anchors_wh[:, 0]
    ah = anchors_wh[:, 1]
    inter = (jnp.minimum(gw[..., None], aw) + 1.0) * (jnp.minimum(gh[..., None], ah) + 1.0)
    area_g = (gw + 1.0) * (gh + 1.0)
    area_a = (aw + 1.0) * (ah + 1.0)
    return inter / (area_g[..., None] + area_a - inter + 1e-16)


def build_targets(
    targets: jax.Array,
    anchors_wh: jax.Array,
    grid_hw: Tuple[int, int],
    ignore_thre: float,
    num_cls: int = 3,
) -> Dict[str, jax.Array]:
    """Vectorised target assignment (reference ``get_target``,
    ``yolo_loss.py:144-196``).

    Args:
      targets: (B, T, 6) padded GT — ``(xc, yc, w, h, cls, valid255)``,
        coords normalised to [0, 1] (dataset convention,
        ``detect_dataset.py:158-160``).
      anchors_wh: (A, 2) anchors **in feature-map units** (net-pixel anchors
        divided by stride — reference ``scaled_anchors``, ``yolo_loss.py:56``).
      grid_hw: (H, W) of this head's feature map.
      ignore_thre: shape-IOU above which a non-best anchor is ignored
        (excluded from the no-object loss).

    Returns dict of (B, A, H, W[, C]) tensors: ``mask`` (best-anchor
    positives), ``noobj_mask``, ``tx ty tw th``, ``tcls`` (B,A,H,W,C one-hot).
    """
    b, t, _ = targets.shape
    h, w = grid_hw
    na = anchors_wh.shape[0]
    targets = jax.lax.stop_gradient(targets.astype(jnp.float32))

    gx = targets[..., 0] * w  # (B, T) feature-map coords
    gy = targets[..., 1] * h
    gw = targets[..., 2] * w
    gh = targets[..., 3] * h
    cls_id = targets[..., 4].astype(jnp.int32)

    # Reference breaks at the first slot with valid-flag < 1 (yolo_loss.py:158);
    # cumulative product gives exactly that prefix.  Degenerate boxes are
    # skipped but do not break (:166).
    flag = (targets[..., 5] >= 1.0).astype(jnp.float32)
    processed = jnp.cumprod(flag, axis=1) > 0
    active = processed & (gw > 0) & (gh > 0)  # (B, T)

    gi = jnp.clip(gx.astype(jnp.int32), 0, w - 1)
    gj = jnp.clip(gy.astype(jnp.int32), 0, h - 1)

    iou = _shape_iou(gw, gh, anchors_wh)  # (B, T, A)
    best_n = jnp.argmax(iou, axis=-1).astype(jnp.int32)  # (B, T)
    ignore = iou > ignore_thre  # (B, T, A)

    best_aw = anchors_wh[best_n, 0]
    best_ah = anchors_wh[best_n, 1]
    tx_val = gx - gi.astype(jnp.float32)
    ty_val = gy - gj.astype(jnp.float32)
    tw_val = jnp.log(gw / best_aw + 1e-16)
    th_val = jnp.log(gh / best_ah + 1e-16)

    # ---- fully vectorised scatter (no per-box loop) -------------------------
    # The reference loop writes boxes in order, so on cell collisions the
    # LAST active box wins.  We reproduce that deterministically by dropping
    # every write that a later active box to the same cell supersedes, then
    # doing ONE scatter with unique indices per image.  (A vmapped 64-step
    # scatter loop measured ~200x slower on TPU.)
    size = na * h * w
    cell = (best_n * h + gj) * w + gi  # (B, T) flat (a, j, i) index
    later = jnp.triu(jnp.ones((t, t), bool), 1)[None]  # t' > t
    same = cell[:, :, None] == cell[:, None, :]
    superseded = jnp.any(same & later & active[:, None, :], axis=2)
    write = active & ~superseded  # (B, T) unique-cell writes

    # Masked-out writes are routed to one global dump slot past the end.
    batch_off = (jnp.arange(b, dtype=jnp.int32) * (size + 1))[:, None]
    flat_idx = jnp.where(write, cell + batch_off, b * (size + 1))
    flat_idx = flat_idx.reshape(-1)

    def scatter_set(vals, init=0.0, depth=None):
        shape = (b * (size + 1) + 1,) if depth is None else (b * (size + 1) + 1, depth)
        arr = jnp.full(shape, init, jnp.float32)
        arr = arr.at[flat_idx].set(vals.reshape((-1,) if depth is None else (-1, depth)))
        out = arr[: b * (size + 1)].reshape((b, size + 1) if depth is None else (b, size + 1, depth))
        out = out[:, :size]
        return out.reshape((b, na, h, w) if depth is None else (b, na, h, w, depth))

    mask = scatter_set(write.astype(jnp.float32))
    tx = scatter_set(tx_val)
    ty = scatter_set(ty_val)
    tw = scatter_set(tw_val)
    th = scatter_set(th_val)
    # tcls is STICKY in the reference (``tcls[b,best_n,gj,gi,cls] = 1`` is
    # never reset, yolo_loss.py:189) — colliding boxes of different classes
    # accumulate one-hot bits.  Scatter-max over ALL active writes (not just
    # the last-wins survivors) reproduces that OR, order-independently.
    onehot = jax.nn.one_hot(cls_id, num_cls, dtype=jnp.float32)  # (B, T, C)
    idx_all = jnp.where(active, cell + batch_off, b * (size + 1)).reshape(-1)
    tcls_arr = jnp.zeros((b * (size + 1) + 1, num_cls), jnp.float32)
    tcls_arr = tcls_arr.at[idx_all].max(onehot.reshape(-1, num_cls))
    tcls = (
        tcls_arr[: b * (size + 1)]
        .reshape(b, size + 1, num_cls)[:, :size]
        .reshape(b, na, h, w, num_cls)
    )

    # noobj: 0 wherever ANY active box's shape-IOU exceeds the ignore
    # threshold at (a, gj, gi) — order-independent, scatter-min over all
    # (box, anchor) taps (the reference zeroes every anchor above threshold,
    # yolo_loss.py:180).
    anchor_cell = (jnp.arange(na, dtype=jnp.int32)[None, None] * h + gj[:, :, None]) * w + gi[:, :, None]
    tap = active[:, :, None] & ignore  # (B, T, A)
    noobj_idx = jnp.where(tap, anchor_cell + batch_off[:, :, None], b * (size + 1))
    noobj_arr = jnp.ones((b * (size + 1) + 1,), jnp.float32)
    noobj_arr = noobj_arr.at[noobj_idx.reshape(-1)].min(0.0)
    noobj = noobj_arr[: b * (size + 1)].reshape(b, size + 1)[:, :size]
    noobj = noobj.reshape(b, na, h, w)

    return {
        "mask": mask,
        "noobj_mask": noobj,
        "tx": tx,
        "ty": ty,
        "tw": tw,
        "th": th,
        "tcls": tcls,
    }


def yolo_loss(
    head: jax.Array,
    targets: jax.Array,
    anchors: Sequence[Tuple[float, float]],
    input_hw: Tuple[int, int],
    ignore_thre: float = 0.5,
    num_cls: int = 3,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Loss for ONE scale (reference ``YOLOLossV3.forward`` with targets,
    ``yolo_loss.py:48-97``).

    Args:
      head: (B, H, W, A*(5+C)) raw NHWC logits for this scale.
      targets: (B, T, 6) padded normalised GT.
      anchors: A x (w, h) in net-input pixels for this scale.
      input_hw: network input (H, W).

    Returns:
      (total, components) where components has ``x y w h conf cls`` scalars —
      the same 7 numbers the reference returns/logs (``train.py:151-155``).
    """
    b, h, w, _ = head.shape
    na = len(anchors)

    stride_h = input_hw[0] / h
    stride_w = input_hw[1] / w
    scaled = jnp.asarray(
        [(aw / stride_w, ah / stride_h) for aw, ah in anchors], jnp.float32
    )

    p = head.astype(jnp.float32).reshape(b, h, w, na, 5 + num_cls)
    # -> (B, A, H, W, attrs) to mirror the reference layout for readability
    p = p.transpose(0, 3, 1, 2, 4)

    zx = p[..., 0]  # raw logits; BCE computed from logits (see _bce_logits)
    zy = p[..., 1]
    tw_p = p[..., 2]
    th_p = p[..., 3]
    z_conf = p[..., 4]
    z_cls = p[..., 5:]

    tgt = build_targets(targets, scaled, (h, w), ignore_thre, num_cls)
    mask = tgt["mask"]
    noobj = tgt["noobj_mask"]

    n_total = b * na * h * w

    # Masked products + full-tensor mean == reference nn.BCELoss()(x*mask, tx*mask)
    # (masked-out cells contribute exactly 0 to the numerator).
    loss_x = jnp.sum(mask * _bce_logits(zx, tgt["tx"])) / n_total
    loss_y = jnp.sum(mask * _bce_logits(zy, tgt["ty"])) / n_total
    loss_w = jnp.sum(mask * (tw_p - tgt["tw"]) ** 2) / n_total
    loss_h = jnp.sum(mask * (th_p - tgt["th"]) ** 2) / n_total
    loss_conf = (
        jnp.sum(mask * _softplus_c(-z_conf)) / n_total  # -log sigmoid
        + 0.5 * jnp.sum(noobj * _softplus_c(z_conf)) / n_total  # -log(1-sigmoid)
    )

    n_pos = jnp.sum(mask)
    cls_sum = jnp.sum(mask[..., None] * _bce_logits(z_cls, tgt["tcls"]))
    loss_cls = jnp.where(n_pos > 0, cls_sum / (n_pos * num_cls + 1e-16), 0.0)

    lambda_xy, lambda_wh = 2.5, 2.5
    total = (
        lambda_xy * (loss_x + loss_y)
        + lambda_wh * (loss_w + loss_h)
        + loss_conf
        + loss_cls
    )
    comps = dict(x=loss_x, y=loss_y, w=loss_w, h=loss_h, conf=loss_conf, cls=loss_cls)
    return total, comps


def total_loss(
    heads: Sequence[jax.Array],
    targets: jax.Array,
    anchors: Sequence[Sequence[Tuple[float, float]]],
    input_hw: Tuple[int, int],
    ignore_thre: float = 0.5,
    num_cls: int = 3,
    branch_weight: Sequence[float] = (1.0, 1.0),
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sum of per-scale losses (reference train loop, ``train.py:124-130``)."""
    tot = 0.0
    comps: Dict[str, jax.Array] = {}
    for i, (head, anc) in enumerate(zip(heads, anchors)):
        li, ci = yolo_loss(head, targets, anc, input_hw, ignore_thre, num_cls)
        tot = tot + branch_weight[i] * li
        for k, v in ci.items():
            comps[k] = comps.get(k, 0.0) + v
    comps["total"] = tot
    return tot, comps


def decode_for_eval(
    head: jax.Array,
    anchors: Sequence[Tuple[float, float]],
    input_hw: Tuple[int, int],
) -> jax.Array:
    """Inference-mode decode of one scale to ``(B, A*H*W, 5+C)`` —
    the reference ``YOLOLossV3.forward`` with ``targets=None``
    (``yolo_loss.py:98-141``), used by the mAP validator.

    Output rows: (xc, yc, w, h) in net-input pixels, obj conf, per-class
    sigmoid scores.  Flattening order matches the reference's
    ``view(bs, A, H, W, .) -> view(bs, -1, .)``: anchor-major, then row, col.
    """
    b, h, w, c_tot = head.shape
    na = len(anchors)
    num_cls = c_tot // na - 5

    stride_h = input_hw[0] / h
    stride_w = input_hw[1] / w
    anc = jnp.asarray(anchors, jnp.float32)
    aw = anc[:, 0] / stride_w  # feature-map units
    ah = anc[:, 1] / stride_h

    p = head.astype(jnp.float32).reshape(b, h, w, na, 5 + num_cls)
    p = p.transpose(0, 3, 1, 2, 4)  # (B, A, H, W, attrs)

    grid_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    grid_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    xc = (jax.nn.sigmoid(p[..., 0]) + grid_x) * stride_w
    yc = (jax.nn.sigmoid(p[..., 1]) + grid_y) * stride_h
    bw = jnp.exp(p[..., 2]) * aw[None, :, None, None] * stride_w
    bh = jnp.exp(p[..., 3]) * ah[None, :, None, None] * stride_h
    conf = jax.nn.sigmoid(p[..., 4])
    cls = jax.nn.sigmoid(p[..., 5:])

    out = jnp.concatenate(
        [
            jnp.stack([xc, yc, bw, bh, conf], axis=-1),
            cls,
        ],
        axis=-1,
    )
    return out.reshape(b, na * h * w, 5 + num_cls)

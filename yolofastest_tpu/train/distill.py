"""Knowledge distillation: a frozen teacher supervises the train step.

The reference ships no distillation and no lite weights at all (its lite
variant, ``src/model_training/model/yolo_fastest.py:234-387``, is code-only);
our trained lite checkpoint was produced by grafting + label fine-tuning.
This module adds the principled route: train (or fine-tune) any student —
typically YoloFastest-lite — against the full model's head logits, so the
student learns the teacher's dark knowledge on top of (or instead of) the
sparse box labels.

TPU-first shape: the teacher is a **BN-folded constant pytree baked into the
jitted train step** (``folded_apply`` over the declarative topology walk).
No second model/optimizer state, no extra host↔device traffic — XLA sees one
program containing both forwards and fuses/schedules them together; under a
``data``/``spatial``-sharded mesh the teacher shards exactly like the
student because it is ordinary traced computation.

Head matching: heads are ordered coarse→fine (``(large, small)`` for the
two-head net, ``(small,)`` for lite), and both architectures share the head
convention (stride 16/32, ``num_anchors*(5+num_cls)`` channels), so a
student's heads align with the LAST ``len(student_heads)`` teacher heads —
full→full matches both scales, full→lite matches the stride-32 head.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from yolofastest_tpu.models import fold_batchnorm
from yolofastest_tpu.models.graph import folded_apply, folded_apply_lite

_APPLY = {"fastest": folded_apply, "lite": folded_apply_lite}


def make_teacher_fn(
    variables: Dict[str, Any],
    arch: str = "fastest",
    compute_dtype=jnp.float32,
) -> Callable[[jax.Array], Tuple[jax.Array, ...]]:
    """Frozen-teacher forward: (B,H,W,1) imgs -> head logits tuple.

    ``variables`` is a raw checkpoint tree (params + batch_stats); BN is
    folded once here, so the teacher inside the train step is a plain
    conv pipeline over constant weights.
    """
    if arch not in _APPLY:
        raise ValueError(f"unknown teacher arch {arch!r}")
    folded = jax.tree.map(jnp.asarray, fold_batchnorm(variables))
    apply_fn = _APPLY[arch]

    def teacher(imgs: jax.Array) -> Tuple[jax.Array, ...]:
        heads = apply_fn(folded, imgs, compute_dtype)
        return heads if isinstance(heads, tuple) else (heads,)

    return teacher


def distill_loss(
    student_heads: Tuple[jax.Array, ...],
    teacher_heads: Tuple[jax.Array, ...],
) -> jax.Array:
    """Mean per-head MSE between student and (stop-gradient) teacher logits.

    Raw-logit MSE rather than temperature-softmax KD: YOLO heads mix box
    regression, objectness and class logits in one tensor, and the deployed
    decode consumes the logits directly — matching them matches the
    deployment behavior.
    """
    if len(teacher_heads) < len(student_heads):
        raise ValueError(
            f"teacher produces {len(teacher_heads)} head(s) but the student "
            f"has {len(student_heads)}"
        )
    matched = teacher_heads[len(teacher_heads) - len(student_heads):]
    d = jnp.asarray(0.0, jnp.float32)
    for s, t in zip(student_heads, matched):
        t = jax.lax.stop_gradient(t).astype(jnp.float32)
        if s.shape != t.shape:
            raise ValueError(
                f"student head {s.shape} vs teacher head {t.shape}: "
                "teacher must share input resolution and num_cls/anchors"
            )
        d = d + jnp.mean((s.astype(jnp.float32) - t) ** 2)
    return d / len(student_heads)

"""Learning-rate schedule: per-epoch cosine x linear warmup.

Reference semantics (``src/model_training/train.py:81-111``):

* epoch factor ``lf(e) = ((1 + cos(e*pi/E)) / 2) * 0.8 + 0.2`` applied by a
  ``LambdaLR`` stepped once per epoch, so during epoch ``e`` the base LR is
  ``lr0 * lf(e)``;
* for iterations ``<= num_warm = max(3 * batch_per_epoch, 1000)`` the LR is
  linearly interpolated from 0 to ``lr0 * lf(e)``.

Combined: ``lr(it) = lr0 * lf(it // bpe) * min(it / num_warm, 1)`` — one pure
function of the step counter, usable directly as an optax schedule.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_lr_schedule(
    lr0: float,
    total_epochs: int,
    batch_per_epoch: int,
    warmup_min_iters: int = 1000,
):
    num_warm = max(3 * batch_per_epoch, warmup_min_iters)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / batch_per_epoch)
        lf = ((1.0 + jnp.cos(epoch * jnp.pi / total_epochs)) / 2.0) * 0.8 + 0.2
        warm = jnp.minimum(step / num_warm, 1.0)
        return lr0 * lf * warm

    return schedule

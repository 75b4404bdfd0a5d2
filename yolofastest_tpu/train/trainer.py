"""SPMD training loop: one jitted train step over a device mesh.

Capability-equivalent of the reference train loop
(``src/model_training/train.py:39-162``) redesigned TPU-first:

* **One compiled step.** forward + loss (with on-device target assignment)
  + backward + Adam update + BatchNorm stat update are a single XLA program;
  the reference crosses host/device every step for target building.
* **Data parallelism by sharding, not code.** The global batch is laid out
  ``P('data', ...)`` over a `jax.sharding.Mesh`; parameters are replicated.
  XLA inserts the gradient ``psum`` — there is no hand-written collective
  (the reference is single-GPU, SURVEY.md §2.3; DP is our first-class axis).
  An optional ``'spatial'`` mesh axis additionally shards the image height —
  GSPMD materialises conv halo exchanges automatically.
* **Cross-replica BatchNorm for free:** batch stats are computed on the
  global (sharded) batch inside jit, so XLA reduces across the mesh — no
  ``axis_name`` plumbing.
* **Full-state checkpoints** via orbax: params, BN stats, optimizer state
  and step — fixing the reference's weights-only "resume" that restarts the
  schedule (``train.py:91-92``, SURVEY.md §5).

Optimiser matches ``optim.Adam(lr0, betas=(0.9, 0.999), eps=1e-8)``
(``train.py:85``; the config's weight_decay is unused there too) with the
warmup-cosine schedule of :mod:`yolofastest_tpu.train.schedule`.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yolofastest_tpu.configs import Config
from yolofastest_tpu.losses import total_loss
from yolofastest_tpu.models import YoloFastest
from yolofastest_tpu.train.schedule import make_lr_schedule


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    # Exponential moving average of {params, batch_stats} when
    # ``train.ema_decay > 0``; ``None`` (an empty pytree) otherwise, so
    # non-EMA checkpoints keep their exact round-1/2 layout.
    ema: Any = None


def freeze_masks(params: Any, batch_stats: Any, spec: str):
    """Resolve a freeze spec into STATIC boolean mask pytrees.

    ``spec`` is either the alias ``"backbone"`` (every top-level module not
    named ``head*`` — the fine-tune-the-heads workflow the zoo recipes use)
    or comma-separated module-name prefixes (``"conv0"``, ``"res1,res2"``,
    ...; see ``info`` for the module names).  Every prefix must match at
    least one module (typo guard) and at least one module must stay
    trainable.

    Returns ``(param_mask, bs_mask, frozen_names)`` — mask leaves are plain
    Python bools (``True`` = frozen), so they are baked into the jit trace:
    XLA dead-code-eliminates the whole frozen backward pass instead of
    computing gradients and multiplying by zero.
    """
    names = sorted(params.keys())
    spec = spec.strip()
    if spec == "backbone":
        frozen = {n for n in names if not n.startswith("head")}
    else:
        prefixes = [p.strip() for p in spec.split(",") if p.strip()]
        if not prefixes:
            raise ValueError("empty --freeze spec")
        for p in prefixes:
            if not any(n.startswith(p) for n in names):
                raise ValueError(
                    f"--freeze prefix {p!r} matches no module; modules: "
                    f"{', '.join(names)}")
        frozen = {n for n in names
                  if any(n.startswith(p) for p in prefixes)}
    if frozen == set(names):
        raise ValueError("--freeze spec freezes every module; nothing left "
                         "to train")

    def mask_like(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: path[0].key in frozen, tree)

    return mask_like(params), mask_like(batch_stats), sorted(frozen)


def make_train_step(
    model: YoloFastest,
    tx: optax.GradientTransformation,
    config: Config,
    lr_schedule: Callable,
    distill_fn: Optional[Callable] = None,
    distill_weight: float = 1.0,
    freeze: Optional[tuple] = None,
) -> Callable:
    """Build the pure train-step function (state, imgs, targets) ->
    (state, metrics).  Jit it with shardings via :class:`Trainer` or
    directly.

    ``distill_fn`` (see :func:`yolofastest_tpu.train.distill.make_teacher_fn`)
    adds ``distill_weight * MSE(student_heads, teacher_heads)`` to the loss —
    the frozen teacher's forward is traced into the SAME XLA program, so it
    shards and fuses with the student step.

    ``freeze`` is ``(param_mask, bs_mask)`` from :func:`freeze_masks`:
    frozen params' gradients are statically zeroed (never computed — the
    masks are Python bools, so XLA drops the frozen backward pass) and
    frozen modules' BN running stats keep their old values, so frozen
    leaves stay BITWISE unchanged.  Adam's moments for frozen leaves start
    and stay zero, which keeps the opt-state layout identical to an
    unfrozen run — checkpoints remain resume-compatible across --freeze
    settings."""
    io = config.io
    tr = config.train

    def train_step(state: TrainState, imgs: jax.Array, targets: jax.Array):
        def loss_fn(params):
            heads, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs,
                train=True,
                mutable=["batch_stats"],
            )
            if not isinstance(heads, (tuple, list)):  # lite: single head
                heads = (heads,)
            loss, comps = total_loss(
                heads,
                targets,
                io.anchors,
                # the ACTUAL batch shape, not the config resolution: under
                # multi-scale training each (H, W) bucket is its own cached
                # jit trace, and stride/anchor scaling must follow the trace's
                # static shape (identical to io.input_hw when multi-scale is
                # off, so the single-scale program is unchanged)
                imgs.shape[1:3],
                ignore_thre=tr.iou_loss_thre,
                num_cls=io.num_cls,
                branch_weight=tr.branch_weight,
            )
            if distill_fn is not None:
                from yolofastest_tpu.train.distill import distill_loss

                d = distill_loss(tuple(heads), distill_fn(imgs))
                loss = loss + distill_weight * d
                comps = dict(comps)
                comps["distill"] = d
                comps["total"] = loss
            return loss, (comps, mutated["batch_stats"])

        (loss, (comps, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if freeze is not None:
            param_mask, bs_mask = freeze
            # Static masks: the frozen backward pass is dead code to XLA.
            # Zeroed BEFORE the finite gate — frozen grads are never
            # computed, so they can't (and shouldn't) trip it.
            grads = jax.tree.map(
                lambda g, m: jnp.zeros_like(g) if m else g, grads, param_mask)
            new_stats = jax.tree.map(
                lambda n, o, m: o if m else n,
                new_stats, state.batch_stats, bs_mask)
        # apply_if_finite protects params/opt state, but the BN running
        # stats mutate in the forward pass — reject them too on a
        # non-finite step, or one poisoned batch NaNs every later eval.
        # Gate on the SAME condition apply_if_finite uses (all grads finite),
        # plus finite loss: a finite-loss/non-finite-grad step skips the
        # param update, and committing BN stats there would desync them.
        grads_finite = jax.tree_util.tree_reduce(
            lambda acc, g: jnp.logical_and(acc, jnp.all(jnp.isfinite(g))),
            grads,
            jnp.asarray(True),
        )
        finite = jnp.logical_and(jnp.isfinite(loss), grads_finite)
        new_stats = jax.tree.map(
            lambda n, o: jnp.where(finite, n, o), new_stats, state.batch_stats
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema
        if tr.ema_decay > 0:
            # Ramped decay (YOLO-style): early steps use a small effective
            # decay so the average forgets the random init quickly, then
            # approach tr.ema_decay.  Pure lerp inside the same XLA program —
            # fuses with the Adam update, no extra host sync.
            d = tr.ema_decay * (
                1.0 - jnp.exp(-(state.step.astype(jnp.float32) + 1.0)
                              / float(tr.ema_ramp))
            )
            new_ema = jax.tree.map(
                lambda e, n: e - (1.0 - d) * (e - n),
                state.ema,
                {"params": new_params, "batch_stats": new_stats},
            )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
            ema=new_ema,
        )
        metrics = dict(comps)
        metrics["lr"] = lr_schedule(state.step)
        # optax.apply_if_finite bookkeeping: how many updates were skipped
        # because of non-finite gradients (0 in healthy training), and the
        # current CONSECUTIVE streak (fit() aborts cleanly on a long streak).
        metrics["skipped_nonfinite"] = new_opt.total_notfinite
        metrics["nonfinite_streak"] = new_opt.notfinite_count
        return new_state, metrics

    return train_step


class Trainer:
    """Orchestrates epochs: sharded train steps, logging in the reference's
    format (``train.py:147-150``), per-epoch mAP validation and orbax
    checkpoints.

    Args:
      config: full framework config.
      mesh: optional `jax.sharding.Mesh` with a ``'data'`` axis (and
        optionally ``'spatial'``).  Defaults to all local devices on
        ``'data'``.
      batch_per_epoch: steps per epoch (sets the schedule); inferred from the
        loader when using :meth:`fit`.
    """

    def __init__(
        self,
        config: Config,
        mesh: Optional[Mesh] = None,
        batch_per_epoch: int = 500,
        variables: Optional[Dict[str, Any]] = None,
        seed: Optional[int] = None,
        logger=None,
        compute_dtype=jnp.float32,
        shard_spatial: bool = False,
        arch: str = "fastest",
        distill_fn: Optional[Callable] = None,
        distill_weight: float = 1.0,
        freeze: Optional[str] = None,
    ):
        self.config = config
        self.logger = logger
        io = config.io
        tr = config.train
        self.batch_per_epoch = batch_per_epoch
        self.arch = arch

        from yolofastest_tpu.parallel import batch_sharding, host_to_global, make_mesh
        from yolofastest_tpu.parallel import replicate as _replicate

        self._host_to_global = host_to_global

        if mesh is None:
            mesh = make_mesh()
        self.mesh = mesh

        from yolofastest_tpu.models import build_model

        self.model = build_model(
            num_cls=io.num_cls, num_anchors=io.num_anchors,
            compute_dtype=compute_dtype, arch=arch, variables=variables,
        )
        if variables is None:
            rng = jax.random.PRNGKey(tr.seed if seed is None else seed)
            dummy = jnp.zeros((1, *io.input_hw, io.input_channels), jnp.float32)
            variables = self.model.init(rng, dummy, train=False)

        self.lr_schedule = make_lr_schedule(
            tr.lr0, tr.total_epochs, batch_per_epoch, tr.warmup_min_iters
        )
        # Failure detection/containment the reference lacks (SURVEY.md §5):
        # global-norm gradient clipping + non-finite steps skipped ON DEVICE
        # (no host sync).
        inner = [optax.adam(learning_rate=self.lr_schedule, b1=0.9, b2=0.999,
                            eps=1e-8)]
        if tr.grad_clip_norm and tr.grad_clip_norm > 0:
            inner.insert(0, optax.clip_by_global_norm(tr.grad_clip_norm))
        # max_consecutive_errors is effectively infinite: apply_if_finite
        # "gives up and ACCEPTS" the non-finite update once the budget is
        # exceeded, which destroys the params (observed in round 2).  Params
        # are therefore never poisoned; a persistent streak instead aborts
        # cleanly in fit() via the nonfinite_streak metric.
        self.tx = optax.apply_if_finite(
            optax.chain(*inner), max_consecutive_errors=2**30
        )

        replicated = _replicate(mesh)
        self.img_sharding = batch_sharding(mesh, spatial=shard_spatial)
        self.tgt_sharding = batch_sharding(mesh, spatial=False)

        ema0 = None
        if tr.ema_decay > 0:
            # seed the average at the init point; distinct host copies so the
            # donated train-step buffers never alias params
            ema0 = jax.tree.map(
                lambda x: np.array(x, copy=True),
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
            )
        state = TrainState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            ema=ema0,
        )
        # host_to_global handles multi-process meshes (every host holds the
        # full replicated state); plain device_put in single-process runs.
        self.state = jax.tree.map(
            lambda x: host_to_global(replicated, np.asarray(x)), state
        )

        self.frozen_modules: list = []
        freeze_tup = None
        if freeze:
            pm, bm, self.frozen_modules = freeze_masks(
                variables["params"], variables["batch_stats"], freeze)
            freeze_tup = (pm, bm)
            if logger:
                logger.info("freeze: %d modules pinned (%s)"
                            % (len(self.frozen_modules),
                               ", ".join(self.frozen_modules)))

        self._traced_hw: set = set()
        step_fn = make_train_step(self.model, self.tx, config, self.lr_schedule,
                                  distill_fn=distill_fn,
                                  distill_weight=distill_weight,
                                  freeze=freeze_tup)
        self._train_step = jax.jit(
            step_fn,
            in_shardings=(replicated, self.img_sharding, self.tgt_sharding),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )

    # ------------------------------------------------------------------ steps
    def step(self, imgs: np.ndarray, targets: np.ndarray) -> Dict[str, float]:
        """One SPMD step.  In a multi-process run ``imgs``/``targets`` are
        this host's SHARD of the global batch (per-host feeding,
        ``jax.make_array_from_process_local_data``); single-process runs pass
        the whole batch — one code path either way."""
        hw = tuple(imgs.shape[1:3])
        if hw not in self._traced_hw:
            # each input (H, W) is one cached jit trace — log the compile
            # event so multi-scale runs record their bucket schedule
            self._traced_hw.add(hw)
            multiscale = self.config.train.multiscale_steps > 0
            if self.logger and (multiscale or len(self._traced_hw) > 1):
                self.logger.info("multi-scale: compiling train step for "
                                 "input %dx%d" % hw)
        imgs = self._host_to_global(self.img_sharding, imgs)
        targets = self._host_to_global(self.tgt_sharding, targets)
        self.state, metrics = self._train_step(self.state, imgs, targets)
        return metrics

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.state.params, "batch_stats": self.state.batch_stats}

    @property
    def ema_variables(self) -> Optional[Dict[str, Any]]:
        """EMA model variables, or ``None`` when EMA is disabled."""
        if self.state.ema is None:
            return None
        return {"params": self.state.ema["params"],
                "batch_stats": self.state.ema["batch_stats"]}

    @property
    def eval_variables(self) -> Dict[str, Any]:
        """What validation/deployment should score: the EMA model when
        enabled, else the raw weights."""
        return self.ema_variables or self.variables

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        loader,
        total_epochs: Optional[int] = None,
        validator=None,
        checkpoint_dir: Optional[str] = None,
        log_every: Optional[int] = None,
        metrics_writer=None,
        start_epoch: int = 0,
    ):
        """Run the full training schedule (reference ``train.py:98-160``)."""
        tr = self.config.train
        total_epochs = total_epochs or tr.total_epochs
        log_every = log_every or tr.log_every
        log = self.logger.info if self.logger else print
        bpe = len(loader)
        total_steps = (total_epochs - start_epoch) * bpe
        step_count = 0
        steps_at_mark = 0
        t_mark = time.time()  # steady-state throughput: time between log syncs
        history = []

        for epoch in range(start_epoch, total_epochs):
            for batch_id, (imgs, targets) in enumerate(loader):
                metrics = self.step(imgs, targets)
                step_count += 1
                # The abort check must not depend on the logging cadence: a
                # log_every larger than the run would otherwise let a fully
                # poisoned run "succeed".  Checking costs one device sync, so
                # bound it to the streak length (detection within 2x streak).
                abort_n = tr.abort_nonfinite_streak
                last_of_epoch = batch_id + 1 == bpe
                if abort_n and (step_count % min(log_every, abort_n) == 0
                                or last_of_epoch):
                    streak = int(metrics.get("nonfinite_streak", 0))
                    if streak >= abort_n:
                        msg = (
                            "aborting: %d consecutive steps with non-finite "
                            "gradients (params untouched since the streak "
                            "began; check data/loss/lr)" % streak
                        )
                        log(msg)
                        raise RuntimeError(msg)
                if step_count % log_every == 0:
                    # float() drains the async dispatch queue, so the elapsed
                    # time since the previous log sync covers whole steps —
                    # true steady-state examples/sec, not the dispatch time
                    # of one async step.  (The first window still includes
                    # the jit compile — same warmup skew as the reference's
                    # first example/sec line.)
                    metrics = {k: float(v) for k, v in metrics.items()}
                    now = time.time()
                    duration = (now - t_mark) / max(step_count - steps_at_mark, 1)
                    t_mark, steps_at_mark = now, step_count
                    eps = imgs.shape[0] / duration
                    remain = (total_steps - step_count) * duration
                    m, s = divmod(remain, 60)
                    h, m = divmod(m, 60)
                    log(
                        "epoch [%d]: current_batch = %d/%d, total_iter = %d, "
                        "loss = %.5f, example/sec = %.3f, lr = %.5f, remain = %d:%02d:%02d"
                        % (epoch, batch_id + 1, bpe, step_count,
                           metrics["total"], eps, metrics["lr"], h, m, s)
                    )
                    if metrics_writer is not None:
                        metrics_writer(step_count, {**metrics, "example/sec": eps})

            epoch_info = {"epoch": epoch}
            if validator is not None and epoch > tr.val_after_epoch:
                if self.state.ema is not None:
                    log("validating EMA weights (decay %g, ramp %d)"
                        % (tr.ema_decay, tr.ema_ramp))
                epoch_info["mAP"] = validator(self.eval_variables, epoch)
                # multi-threshold evaluators (eval --coco-map grid) also
                # surface their grid mean in the history
                lm = getattr(validator, "last_metrics", {})
                if "mAP_grid" in lm:
                    epoch_info["mAP_grid"] = lm["mAP_grid"]
            if checkpoint_dir:
                self.save_checkpoint(checkpoint_dir, epoch,
                                     max_to_keep=tr.max_to_keep or None)
            history.append(epoch_info)
            # validation + checkpointing are not training time: reset the
            # throughput window so the next log doesn't absorb them
            t_mark, steps_at_mark = time.time(), step_count
        return history

    # ----------------------------------------------------------- checkpoints
    def save_checkpoint(self, directory: str, epoch: int,
                        max_to_keep: Optional[int] = None) -> str:
        """Full-state orbax checkpoint: params + BN stats + opt state + step
        (the reference saves weights only, train.py:160).  With
        ``max_to_keep``, older ``epoch_*`` checkpoints are rotated out (the
        reference keeps all 30)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(directory, f"epoch_{epoch}"))
        ckpt = ocp.StandardCheckpointer()
        if jax.process_count() > 1:
            # Multi-process mesh (pod training): every rank passes the LIVE
            # global jax.Arrays and orbax coordinates the distributed write
            # (device_get'ing to numpy would make every rank write the whole
            # tree to the same path — a race).  Locked by the 2-process
            # dryrun (tools/mp_dryrun_worker.py).
            ckpt.save(path, self.state, force=True)
        else:
            ckpt.save(path, jax.device_get(self.state), force=True)
        ckpt.wait_until_finished()
        if max_to_keep and jax.process_index() == 0:
            import re
            import shutil

            kept = sorted(
                (int(m.group(1)), d)
                for d in os.listdir(directory)
                if (m := re.fullmatch(r"epoch_(\d+)", d))
            )
            for _, d in kept[:-max_to_keep]:
                shutil.rmtree(os.path.join(directory, d), ignore_errors=True)
        return path

    def restore_checkpoint(self, path: str) -> None:
        """Restore full state.  EMA-elastic in both directions: a pre-/non-EMA
        checkpoint resumed into an EMA run re-seeds the average from the
        restored params; a checkpointed EMA resumed into a non-EMA run is
        dropped (the raw params ARE the full training state)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckpt = ocp.StandardCheckpointer()
        host = jax.device_get(self.state)
        # Multi-process restore: annotate the abstract tree with the
        # replicated mesh sharding so orbax hands back GLOBAL arrays every
        # rank can use directly (an unannotated restore yields per-host
        # numpy, which cannot represent a multi-host array).
        shard = (NamedSharding(self.mesh, P())
                 if jax.process_count() > 1 else None)
        aspec = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                           sharding=shard), t)
        # The abstract tree must mirror the CHECKPOINT's layout (orbax
        # rejects any ema-subtree mismatch), so shape it from metadata.
        abstract = {f: aspec(getattr(host, f))
                    for f in ("params", "batch_stats", "opt_state", "step")}
        md_tree = ckpt.metadata(path).item_metadata.tree
        if md_tree.get("ema") is not None:
            abstract["ema"] = {"params": abstract["params"],
                               "batch_stats": abstract["batch_stats"]}
        elif "ema" in md_tree:
            abstract["ema"] = None
        restored = ckpt.restore(path, abstract)
        ema = restored.get("ema")
        if host.ema is not None and ema is None:
            ema = {"params": restored["params"],
                   "batch_stats": restored["batch_stats"]}
        elif host.ema is None:
            ema = None
        state = TrainState(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
            ema=ema,
        )
        replicated = NamedSharding(self.mesh, P())
        self.state = jax.device_put(state, replicated)


def checkpoint_variables(path: str, prefer_ema: bool = True) -> Dict[str, Any]:
    """Deployable model variables from an orbax ``epoch_*`` checkpoint dir.

    Returns ``{"params", "batch_stats"}`` — the EMA model when the checkpoint
    carries one and ``prefer_ema`` (what validation scored), else the raw
    weights.  This is the bridge from a training run to every deployment
    entry point (detect/eval/export accept a checkpoint dir anywhere they
    accept a ``.npz``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    # shape the abstract tree from the checkpoint's own metadata (also
    # avoids orbax's unsafe-restore warning)
    md = ckpt.metadata(path).item_metadata.tree
    abstract = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(tuple(m.shape), m.dtype), md)
    restored = ckpt.restore(path, abstract)
    src = restored.get("ema") if prefer_ema else None
    if not src:
        src = restored
    return {"params": src["params"], "batch_stats": src["batch_stats"]}

"""`train` command (SPMD trainer wiring).

Split from the original monolithic cli.py (round-4); behavior-preserving —
the test suite is the guard.  Public entry: ``yolofastest_tpu.cli.main``.
"""

from __future__ import annotations

import os

from yolofastest_tpu.cli._common import (
    _check_arch_config,
    _get_config,
    _load_weights,
    _make_index,
)


def cmd_train(args) -> int:
    import dataclasses

    from yolofastest_tpu.data import DetectionLoader
    from yolofastest_tpu.eval import MAPEvaluator
    from yolofastest_tpu.train import Trainer
    from yolofastest_tpu.utils.logging import config_logger
    from yolofastest_tpu.utils.metrics import MetricsWriter

    cfg = _get_config(args)
    _check_arch_config(cfg, getattr(args, "arch", "fastest"))
    tr = dataclasses.replace(
        cfg.train,
        total_epochs=args.epochs or cfg.train.total_epochs,
        batch_size=args.batch_size or cfg.train.batch_size,
        max_to_keep=(cfg.train.max_to_keep if args.max_to_keep is None
                     else args.max_to_keep),
        lr0=(cfg.train.lr0 if args.lr is None else args.lr),
        warmup_min_iters=(cfg.train.warmup_min_iters
                          if args.warmup_min_iters is None
                          else args.warmup_min_iters),
        ema_decay=(cfg.train.ema_decay if args.ema is None else args.ema),
        ema_ramp=(cfg.train.ema_ramp if args.ema_ramp is None
                  else args.ema_ramp),
        multiscale_steps=(cfg.train.multiscale_steps
                          if args.multiscale is None else args.multiscale),
    )
    cfg = dataclasses.replace(cfg, train=tr)
    if getattr(args, "mosaic", None):
        cfg = dataclasses.replace(
            cfg, augment=dataclasses.replace(cfg.augment, mosaic=args.mosaic))

    logger = config_logger(args.log_dir, "train_info.log")
    logger.info("Start....")
    if cfg.train.multiscale_steps > 0:
        from yolofastest_tpu.data import multiscale_buckets

        logger.info("multi-scale training: buckets %s, redrawn every %d "
                    "batches" % (list(multiscale_buckets(cfg)),
                                 cfg.train.multiscale_every))

    train_idx = _make_index(args.train_dir, cfg.io.class_names, logger,
                            fmt=args.format)
    loader = DetectionLoader(train_idx, cfg, seed=cfg.train.seed,
                             cache=args.cache_images)

    validator = None
    if args.val_dir:
        val_idx = _make_index(args.val_dir, cfg.io.class_names, logger,
                              fmt=args.format)
        val_loader = DetectionLoader(val_idx, cfg, augment=False,
                                     shuffle=False, drop_last=False)
        iou_thresholds = None
        if getattr(args, "coco_map", False):
            from yolofastest_tpu.eval import COCO_IOU_GRID
            iou_thresholds = COCO_IOU_GRID
        validator = MAPEvaluator(cfg, val_loader, logger=logger,
                                 arch=args.arch,
                                 iou_thresholds=iou_thresholds)

    variables = (_load_weights(args.pretrained, args.arch)
                 if args.pretrained else None)
    if variables is not None:
        logger.info("Load pretrained model %s" % args.pretrained)
    else:
        logger.info("initialize model")

    distill_fn = None
    if args.distill_teacher:
        from yolofastest_tpu.train import make_teacher_fn

        distill_fn = make_teacher_fn(
            _load_weights(args.distill_teacher, args.distill_arch),
            arch=args.distill_arch)
        logger.info("Distilling from %s (%s) with weight %g"
                    % (args.distill_teacher, args.distill_arch,
                       args.distill_weight))

    import jax.numpy as jnp

    try:
        trainer = Trainer(cfg, batch_per_epoch=len(loader),
                          variables=variables, logger=logger, arch=args.arch,
                          distill_fn=distill_fn,
                          distill_weight=args.distill_weight,
                          freeze=args.freeze,
                          compute_dtype=(jnp.bfloat16 if args.bf16
                                         else jnp.float32))
    except ValueError as e:
        if args.freeze and "--freeze" in str(e):
            raise SystemExit(str(e))
        raise
    start_epoch = 0
    if args.resume:
        path = args.resume
        if path == "latest":
            # elastic restart: rerun the same command after a crash and
            # training picks up at the next epoch with full state
            import re

            cands = sorted(
                (int(m.group(1)), d)
                for d in (os.listdir(args.checkpoint_dir)
                          if os.path.isdir(args.checkpoint_dir) else [])
                if (m := re.fullmatch(r"epoch_(\d+)", d))
            )
            path = os.path.join(args.checkpoint_dir, cands[-1][1]) if cands else None
        if path:
            trainer.restore_checkpoint(path)
            start_epoch = int(trainer.state.step) // max(len(loader), 1)
            logger.info("Resumed full state from %s (epoch %d)" % (path, start_epoch))
        else:
            logger.info("No checkpoint to resume; starting fresh")

    metrics = MetricsWriter(args.log_dir)
    trainer.fit(loader, validator=validator,
                checkpoint_dir=args.checkpoint_dir, metrics_writer=metrics,
                start_epoch=start_epoch)
    metrics.close()
    return 0



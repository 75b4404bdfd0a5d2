"""`info` command (model summary).

Split from the original monolithic cli.py (round-4); behavior-preserving —
the test suite is the guard.  Public entry: ``yolofastest_tpu.cli.main``.
"""

from __future__ import annotations

from yolofastest_tpu.cli._common import (
    _check_arch_config,
    _get_config,
    _load_weights,
)


def cmd_info(args) -> int:
    """Model summary (per-layer shapes/params/MACs from the deployment
    topology walk) — the reference has no model introspection at all."""
    import json as _json

    import jax
    import jax.numpy as jnp

    from yolofastest_tpu.models import fold_batchnorm
    from yolofastest_tpu.models.summary import (device_cost_analysis,
                                                format_summary, summarize)

    cfg = _get_config(args)
    _check_arch_config(cfg, args.arch)
    arch = "yolofastest-lite" if args.arch == "lite" else "yolofastest"
    if args.weights:
        variables = _load_weights(args.weights, getattr(args, "arch", None))
    else:
        # shapes/params only need channel counts: init a fresh model
        if args.arch == "lite":
            from yolofastest_tpu.models import YoloFastestLite as _Cls
        else:
            from yolofastest_tpu.models import YoloFastest as _Cls
        model = _Cls(num_cls=cfg.io.num_cls, num_anchors=cfg.io.num_anchors)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 96, 1), jnp.float32),
                               train=False)
    folded = fold_batchnorm(jax.device_get(variables))
    s = summarize(folded, cfg.io.input_hw, arch=arch)
    cost = None
    if args.device_cost:
        cost = device_cost_analysis(folded, cfg.io.input_hw, arch=arch,
                                    batch=args.batch)
    print(format_summary(s, device_cost=cost))
    if args.json_out:
        out = dict(s)
        if cost:
            out["device_cost"] = cost
        with open(args.json_out, "w") as f:
            _json.dump(out, f, indent=1)
        print("wrote", args.json_out)
    return 0



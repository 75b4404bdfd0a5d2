"""`export` and `convert` commands (artifact emission / import).

Split from the original monolithic cli.py (round-4); behavior-preserving —
the test suite is the guard.  Public entry: ``yolofastest_tpu.cli.main``.
"""

from __future__ import annotations

import os

from yolofastest_tpu.cli._common import (
    _check_arch_config,
    _get_config,
    _load_weights,
    _load_calibration,
    _calib_kwargs,
)


def cmd_export(args) -> int:
    from yolofastest_tpu.export import (
        export_detect_pipeline,
        export_folded_forward,
        export_int8_forward,
        export_onnx,
        save_exported,
        save_native_weights,
    )
    from yolofastest_tpu.models import fold_batchnorm
    from yolofastest_tpu.quant import quantize_weights

    cfg = _get_config(args)
    _check_arch_config(cfg, getattr(args, "arch", "fastest"))
    arch = getattr(args, "arch", "fastest")
    variables = _load_weights(args.weights, getattr(args, "arch", None))
    folded = fold_batchnorm(variables)
    os.makedirs(args.out, exist_ok=True)

    cal = None
    act_scales = None
    if args.calib_data:
        from yolofastest_tpu.quant import calibrate

        # a missing/empty calib dir skips the int8 extras but must not
        # abort the main artifacts below
        cal = _load_calibration(args.calib_data, cfg.io)
        if cal is not None:
            act_scales = calibrate(folded, [cal], arch=arch,
                                   **_calib_kwargs(args))

    # the int8 artifacts may come from QAT-refined weights; the fp
    # artifacts always ship the original checkpoint
    int8_src = folded
    if getattr(args, "qat_steps", 0) > 0:
        if act_scales is None:
            print("--qat-steps needs --calib-data (skipping QAT)")
        else:
            from yolofastest_tpu.quant import qat_finetune

            int8_src, hist = qat_finetune(folded, act_scales, [cal],
                                          arch=arch, steps=args.qat_steps,
                                          lr=args.qat_lr)
            # qat_finetune ships the LOWEST-loss iterate (STE trajectories
            # are noisy), so report min(hist) — that is the exported point
            print("QAT distillation: loss %.3e -> %.3e (best of %d steps)"
                  % (hist[0], min(hist), len(hist)))

    save_native_weights(folded, os.path.join(args.out, "model.yfb"),
                        io_config=cfg.io)
    print("wrote", os.path.join(args.out, "model.yfb"))
    # with --calib-data, the int8 .yfb also carries activation scales, so
    # the C++ engine runs real int8 arithmetic on it (cpp/src/ops_int8.cpp)
    qparams = quantize_weights(int8_src)
    save_native_weights(qparams, os.path.join(args.out, "model_int8.yfb"),
                        act_scales=act_scales, io_config=cfg.io)
    print("wrote", os.path.join(args.out, "model_int8.yfb"))

    graph_arch = "yolofastest" if arch == "fastest" else "yolofastest-lite"
    export_onnx(folded, cfg.io.input_hw, os.path.join(args.out, "model.onnx"),
                arch=graph_arch)
    print("wrote", os.path.join(args.out, "model.onnx"))
    from yolofastest_tpu.export import export_onnx_detect

    export_onnx_detect(folded, cfg, os.path.join(args.out, "detect.onnx"),
                       arch=graph_arch)
    print("wrote", os.path.join(args.out, "detect.onnx"))
    from yolofastest_tpu.export import export_ncnn

    export_ncnn(folded, cfg.io.input_hw, os.path.join(args.out, "model.param"),
                os.path.join(args.out, "model.bin"), arch=graph_arch)
    print("wrote", os.path.join(args.out, "model.param"),
          "+", os.path.join(args.out, "model.bin"))
    from yolofastest_tpu.export import export_caffe

    export_caffe(folded, cfg.io.input_hw,
                 os.path.join(args.out, "model.prototxt"),
                 os.path.join(args.out, "model.caffemodel"), arch=graph_arch)
    print("wrote", os.path.join(args.out, "model.prototxt"),
          "+", os.path.join(args.out, "model.caffemodel"))
    if act_scales is not None:
        from yolofastest_tpu.export import export_onnx_qdq

        export_onnx_qdq(qparams, act_scales, cfg.io.input_hw,
                        os.path.join(args.out, "model_int8.onnx"),
                        arch=graph_arch)
        print("wrote", os.path.join(args.out, "model_int8.onnx"))
        from yolofastest_tpu.export import export_ncnn_table

        # calibration table for ncnn's own int8 compiler: ncnn2int8
        # model.param model.bin out.param out.bin model.table
        # The table MUST be derived from the same weights the shipped
        # model.param/model.bin carry (the original fp `folded` tree): with
        # --qat-steps, `qparams` holds QAT-refined weights whose reduced
        # amax multipliers would clip the fp weights ncnn2int8 actually
        # quantises. The QAT refinement ships in the self-contained int8
        # artifacts (model_int8.yfb / model_int8.onnx) instead.
        table_qparams = qparams if int8_src is folded else quantize_weights(folded)
        export_ncnn_table(table_qparams, act_scales,
                          os.path.join(args.out, "model.table"),
                          arch=graph_arch)
        print("wrote", os.path.join(args.out, "model.table"))

    try:
        from yolofastest_tpu.export import export_torchscript

        export_torchscript(folded, cfg.io.input_hw,
                           os.path.join(args.out, "model.pt"), batch=args.batch,
                           arch=graph_arch)
        print("wrote", os.path.join(args.out, "model.pt"))
    except ImportError:
        print("torch not available; skipping model.pt")

    exp = export_folded_forward(folded, cfg, batch=args.batch, arch=arch)
    save_exported(exp, os.path.join(args.out, "forward.stablehlo"))
    print("wrote", os.path.join(args.out, "forward.stablehlo"))
    from yolofastest_tpu.export import save_exported_mlir

    # textual twin for the native consumer (cpp/build/yf_shlo)
    save_exported_mlir(exp, os.path.join(args.out, "forward.mlir"))
    print("wrote", os.path.join(args.out, "forward.mlir"))
    exp = export_detect_pipeline(variables, cfg, batch=args.batch, arch=arch)
    save_exported(exp, os.path.join(args.out, "detect.stablehlo"))
    print("wrote", os.path.join(args.out, "detect.stablehlo"))
    # textual twin of the FULL pipeline for the native consumer: yf_shlo
    # runs preprocess+forward+decode+NMS from this artifact with no
    # Python/XLA in the process
    save_exported_mlir(exp, os.path.join(args.out, "detect.mlir"))
    print("wrote", os.path.join(args.out, "detect.mlir"))

    if cal is not None:
        # int8_src/act_scales carry the QAT refinement when --qat-steps ran
        exp = export_int8_forward(variables, cfg, cal, batch=args.batch,
                                  arch=arch, folded=int8_src,
                                  act_scales=act_scales)
        save_exported(exp, os.path.join(args.out, "forward_int8.stablehlo"))
        print("wrote", os.path.join(args.out, "forward_int8.stablehlo"))
    return 0


def cmd_convert(args) -> int:
    from yolofastest_tpu.models import save_variables

    given = [o for o in ("pth", "ncnn", "onnx") if getattr(args, o, None)]
    if len(given) != 1:
        print("convert: give exactly one of --pth / --ncnn / --onnx")
        return 2
    if args.ncnn:
        from yolofastest_tpu.export import import_ncnn
        from yolofastest_tpu.models import unfold_to_variables

        folded, arch = import_ncnn(args.ncnn)
        variables = unfold_to_variables(folded)
        save_variables(variables, args.out)
        print(f"{args.ncnn} ({arch}) -> {args.out}")
        print("note: batch norms are identity-lifted from the folded "
              "artifact; fine-tuning will re-estimate running stats")
        return 0
    if args.onnx:
        from yolofastest_tpu.export import import_onnx

        variables, arch, bn_preserved = import_onnx(args.onnx)
        save_variables(variables, args.out)
        print(f"{args.onnx} ({arch}) -> {args.out}")
        if not bn_preserved:
            print("note: batch norms are identity-lifted from the folded "
                  "artifact; fine-tuning will re-estimate running stats")
        return 0
    variables = _load_weights(args.pth)
    save_variables(variables, args.out)
    print(f"{args.pth} -> {args.out}")
    return 0



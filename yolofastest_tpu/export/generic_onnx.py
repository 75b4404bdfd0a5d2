"""Generic jax→ONNX exporter: serialise ANY jittable function as `.onnx`.

The reference's converter breadth comes from a 794-line monkey-patching
tracer that intercepts ~30 torch ops so *arbitrary* nets can be exported
(`src/model_training/utils/pytorch_to_caffe.py:696-773`).  This is the
TPU-native equivalent, without interception hacks: ``jax.make_jaxpr``
already IS the trace — this module walks the jaxpr and maps each primitive
to ONNX nodes, reusing the zero-dependency protobuf wire writer from
``export/onnx.py``.  Any jax/flax model whose trace stays inside the
supported primitive set exports directly — no per-architecture topology
walk needed (the hand-written walks in ``models/graph.py`` remain the
deployment path for the shipped detectors; this is the *general tool*).

Supported primitives (fail-loud on anything else, naming the primitive):
conv_general_dilated (2D, grouped, strided, padded, rhs-dilated),
dot_general (matmul form), reduce_window max/sum (2D NHWC pooling),
add sub mul div max min neg exp log tanh logistic sqrt rsqrt abs
integer_pow pow, select_n, gt lt ge le eq, reduce_sum reduce_max,
broadcast_in_dim reshape squeeze transpose concatenate slice
convert_element_type stop_gradient, and inlined jit/pjit/custom_jvp/
custom_vjp call wrappers.

Layout note: jax convs/pools carry explicit dimension numbers; ONNX is
NCHW.  Each conv/pool is wrapped in local Transpose pairs derived from the
dimension numbers — ONNX runtimes fold adjacent transposes, and the
numpy consumer (`tools/onnx_check.py`) executes them directly.

Verified by ``tests/test_generic_onnx.py``: an MLP, a conv/pool CNN and
the full YoloFastest ``model.apply`` (no hand walk) all export and
reproduce the jax outputs through the from-scratch numpy consumer.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import numpy as np
from jax.extend import core as jcore

from yolofastest_tpu.export.onnx import (
    OPSET, _IR_VERSION, _attr_int, _attr_ints, _i, _ld, _node, _s,
    _tensor, _tensor_i64, _value_info,
)


class _Graph:
    def __init__(self):
        self.nodes: List[bytes] = []
        self.initializers: List[bytes] = []
        self.n = 0

    def name(self, hint: str) -> str:
        self.n += 1
        return f"{hint}_{self.n}"

    def emit(self, op: str, ins: List[str], n_out: int = 1,
             attrs: Sequence[bytes] = (), hint: str = None) -> List[str]:
        base = self.name(hint or op.lower())
        outs = [base] if n_out == 1 else [f"{base}_o{k}" for k in range(n_out)]
        self.nodes.append(_node(op, ins, outs, base + "_node", list(attrs)))
        return outs

    def const(self, arr: np.ndarray, hint: str = "const") -> str:
        name = self.name(hint)
        self.initializers.append(_tensor(name, np.asarray(arr, np.float32)))
        return name

    def const_i64(self, values, hint: str = "shape") -> str:
        name = self.name(hint)
        self.initializers.append(
            _tensor_i64(name, np.asarray(values, np.int64)))
        return name


def _perm_to(spec: Sequence[int]) -> List[int]:
    """Permutation that maps an array whose axis roles are given by `spec`
    (e.g. lhs_spec = (batch, feature, *spatial) axis indices) into
    role-order."""
    return list(spec)


class _Lowerer:
    def __init__(self, g: _Graph):
        self.g = g
        self.env: Dict[Any, str] = {}

    # ------------------------------------------------------------- plumbing
    def read(self, var) -> str:
        if isinstance(var, jcore.Literal):
            val = np.asarray(var.val)
            if val.dtype == np.bool_:
                raise NotImplementedError("bool literals unsupported")
            # fail-loud contract: the graph carries f32 tensors, so a
            # literal that is not exactly representable in f32 (large i64,
            # f64 precision) must not silently round
            f32 = val.astype(np.float32)
            if not np.array_equal(f32.astype(val.dtype), val):
                raise NotImplementedError(
                    f"literal of dtype {val.dtype} not exactly f32-"
                    f"representable (value {val!r})")
            return self.g.const(f32, "lit")
        return self.env[var]

    def write(self, var, name: str) -> None:
        self.env[var] = name

    # ----------------------------------------------------------- primitives
    def lower_jaxpr(self, jaxpr, invals: List[str]) -> List[str]:
        for v, name in zip(jaxpr.invars, invals):
            self.write(v, name)
        for eqn in jaxpr.eqns:
            self.eqn(eqn)
        return [self.read(v) for v in jaxpr.outvars]

    def eqn(self, e) -> None:
        p = e.primitive.name
        handler = getattr(self, f"p_{p}", None)
        # inlined call-like wrappers
        if p in ("jit", "pjit", "closed_call", "core_call", "xla_call",
                 "custom_jvp_call", "custom_vjp_call",
                 "custom_jvp_call_jaxpr", "remat", "checkpoint"):
            inner = e.params.get("jaxpr") or e.params.get("call_jaxpr") \
                or e.params.get("fun_jaxpr")
            if inner is None:
                raise NotImplementedError(f"call primitive {p} without jaxpr")
            inner = inner.jaxpr if hasattr(inner, "jaxpr") else inner
            outs = self.lower_jaxpr(inner, [self.read(v) for v in e.invars])
            for v, o in zip(e.outvars, outs):
                self.write(v, o)
            return
        if handler is None:
            raise NotImplementedError(
                f"jax primitive {p!r} has no ONNX lowering "
                "(export/generic_onnx.py)")
        handler(e)

    # elementwise binaries / unaries ---------------------------------------
    def _binop(self, e, op):
        a, b = (self.read(v) for v in e.invars)
        self.write(e.outvars[0], self.g.emit(op, [a, b])[0])

    def _unop(self, e, op):
        (a,) = (self.read(v) for v in e.invars)
        self.write(e.outvars[0], self.g.emit(op, [a])[0])

    def p_add(self, e): self._binop(e, "Add")
    def p_sub(self, e): self._binop(e, "Sub")
    def p_mul(self, e): self._binop(e, "Mul")
    def p_div(self, e): self._binop(e, "Div")
    def p_max(self, e): self._binop(e, "Max")
    def p_min(self, e): self._binop(e, "Min")
    def p_pow(self, e): self._binop(e, "Pow")
    def p_gt(self, e): self._binop(e, "Greater")
    def p_lt(self, e): self._binop(e, "Less")
    def p_ge(self, e): self._binop(e, "GreaterOrEqual")
    def p_le(self, e): self._binop(e, "LessOrEqual")
    def p_eq(self, e): self._binop(e, "Equal")
    def p_neg(self, e): self._unop(e, "Neg")
    def p_exp(self, e): self._unop(e, "Exp")
    def p_log(self, e): self._unop(e, "Log")
    def p_tanh(self, e): self._unop(e, "Tanh")
    def p_logistic(self, e): self._unop(e, "Sigmoid")
    def p_sqrt(self, e): self._unop(e, "Sqrt")
    def p_abs(self, e): self._unop(e, "Abs")
    def p_stop_gradient(self, e): self._unop(e, "Identity")
    def p_copy(self, e): self._unop(e, "Identity")

    def p_log1p(self, e):
        (a,) = (self.read(v) for v in e.invars)
        one = self.g.const(np.float32(1.0), "one")
        s = self.g.emit("Add", [a, one])[0]
        self.write(e.outvars[0], self.g.emit("Log", [s])[0])

    def p_expm1(self, e):
        (a,) = (self.read(v) for v in e.invars)
        one = self.g.const(np.float32(1.0), "one")
        x = self.g.emit("Exp", [a])[0]
        self.write(e.outvars[0], self.g.emit("Sub", [x, one])[0])

    def p_rsqrt(self, e):
        (a,) = (self.read(v) for v in e.invars)
        s = self.g.emit("Sqrt", [a])[0]
        self.write(e.outvars[0], self.g.emit("Reciprocal", [s])[0])

    def p_integer_pow(self, e):
        (a,) = (self.read(v) for v in e.invars)
        y = int(e.params["y"])
        if y == 2:
            self.write(e.outvars[0], self.g.emit("Mul", [a, a])[0])
        else:
            c = self.g.const(np.float32(y), "exp")
            self.write(e.outvars[0], self.g.emit("Pow", [a, c])[0])

    def p_select_n(self, e):
        if len(e.invars) != 3:
            raise NotImplementedError("select_n with >2 cases")
        pred, x0, x1 = (self.read(v) for v in e.invars)
        # select_n picks cases[pred]: pred==1 -> x1; Where(cond, X, Y) = X
        # where cond is true
        self.write(e.outvars[0], self.g.emit("Where", [pred, x1, x0])[0])

    def p_convert_element_type(self, e):
        (a,) = (self.read(v) for v in e.invars)
        dt = np.dtype(e.params["new_dtype"])
        onnx_t = {"float32": 1, "int64": 7, "int32": 6, "bool": 9}.get(dt.name)
        if onnx_t is None:
            raise NotImplementedError(f"cast to {dt} unsupported")
        self.write(e.outvars[0],
                   self.g.emit("Cast", [a], attrs=[_attr_int("to", onnx_t)])[0])

    # shape ops ------------------------------------------------------------
    def p_reshape(self, e):
        (a,) = (self.read(v) for v in e.invars)
        shp = self.g.const_i64(e.outvars[0].aval.shape)
        self.write(e.outvars[0], self.g.emit("Reshape", [a, shp])[0])

    p_squeeze = p_reshape
    p_expand_dims = p_reshape

    def p_transpose(self, e):
        (a,) = (self.read(v) for v in e.invars)
        perm = [int(d) for d in e.params["permutation"]]
        self.write(e.outvars[0], self.g.emit(
            "Transpose", [a], attrs=[_attr_ints("perm", perm)])[0])

    def p_broadcast_in_dim(self, e):
        (a,) = (self.read(v) for v in e.invars)
        out_shape = [int(d) for d in e.params["shape"]]
        bdims = [int(d) for d in e.params["broadcast_dimensions"]]
        if bdims != sorted(bdims):
            # non-monotonic dims are semantically a transpose+broadcast;
            # Reshape+Expand would return silently wrong values
            raise NotImplementedError(
                "broadcast_in_dim with unsorted broadcast_dimensions")
        interim = [1] * len(out_shape)
        for src, dst in enumerate(bdims):
            interim[dst] = int(e.invars[0].aval.shape[src])
        r = self.g.emit("Reshape", [a, self.g.const_i64(interim)])[0]
        self.write(e.outvars[0], self.g.emit(
            "Expand", [r, self.g.const_i64(out_shape)])[0])

    def p_concatenate(self, e):
        ins = [self.read(v) for v in e.invars]
        self.write(e.outvars[0], self.g.emit(
            "Concat", ins, attrs=[_attr_int("axis", int(e.params["dimension"]))])[0])

    def p_slice(self, e):
        (a,) = (self.read(v) for v in e.invars)
        if e.params.get("strides") and any(s != 1 for s in e.params["strides"]):
            steps = [int(s) for s in e.params["strides"]]
        else:
            steps = [1] * len(e.params["start_indices"])
        starts = [int(s) for s in e.params["start_indices"]]
        ends = [int(s) for s in e.params["limit_indices"]]
        axes = list(range(len(starts)))
        self.write(e.outvars[0], self.g.emit("Slice", [
            a, self.g.const_i64(starts), self.g.const_i64(ends),
            self.g.const_i64(axes), self.g.const_i64(steps)])[0])

    # reductions -----------------------------------------------------------
    def _reduce(self, e, op):
        (a,) = (self.read(v) for v in e.invars)
        axes = [int(d) for d in e.params["axes"]]
        if op == "ReduceSum":
            # ReduceSum-13 takes axes as an INPUT (Max/Min keep the
            # attribute form until opset 18)
            self.write(e.outvars[0], self.g.emit(
                op, [a, self.g.const_i64(axes, "axes")],
                attrs=[_attr_int("keepdims", 0)])[0])
            return
        self.write(e.outvars[0], self.g.emit(op, [a], attrs=[
            _attr_ints("axes", axes), _attr_int("keepdims", 0)])[0])

    def p_reduce_sum(self, e): self._reduce(e, "ReduceSum")
    def p_reduce_max(self, e): self._reduce(e, "ReduceMax")
    def p_reduce_min(self, e): self._reduce(e, "ReduceMin")

    # conv / matmul / pooling ---------------------------------------------
    def p_conv_general_dilated(self, e):
        x, w = (self.read(v) for v in e.invars)
        dn = e.params["dimension_numbers"]
        lhs_spec, rhs_spec, out_spec = dn.lhs_spec, dn.rhs_spec, dn.out_spec
        nd = len(lhs_spec) - 2
        if nd != 2:
            raise NotImplementedError("only 2D convolutions supported")
        if any(int(d) != 1 for d in e.params.get("lhs_dilation", (1, 1))):
            raise NotImplementedError("lhs_dilation (conv_transpose) "
                                      "unsupported")
        if int(e.params.get("batch_group_count", 1)) != 1:
            raise NotImplementedError("batch_group_count != 1")
        # permute x into NCHW: lhs_spec = (batch_axis, feature_axis, *spatial)
        xp = self.g.emit("Transpose", [x],
                         attrs=[_attr_ints("perm", list(lhs_spec))])[0]
        # permute w into OIHW: rhs_spec = (out_axis, in_axis, *spatial)
        wp = self.g.emit("Transpose", [w],
                         attrs=[_attr_ints("perm", list(rhs_spec))])[0]
        pads = e.params["padding"]  # ((lo0, hi0), (lo1, hi1))
        attrs = [
            _attr_ints("strides", [int(s) for s in e.params["window_strides"]]),
            _attr_ints("pads", [int(pads[0][0]), int(pads[1][0]),
                                int(pads[0][1]), int(pads[1][1])]),
            _attr_ints("dilations",
                       [int(d) for d in e.params.get("rhs_dilation", (1, 1))]),
            _attr_int("group", int(e.params.get("feature_group_count", 1))),
        ]
        y = self.g.emit("Conv", [xp, wp], attrs=attrs)[0]
        # back from NCHW into out_spec order: out axis `out_spec[i]` holds
        # role i, so the inverse permutation scatters NCHW roles into place
        inv = [0] * len(out_spec)
        for role, axis in enumerate(out_spec):
            inv[axis] = role
        self.write(e.outvars[0], self.g.emit(
            "Transpose", [y], attrs=[_attr_ints("perm", inv)])[0])

    def p_dot_general(self, e):
        a, b = (self.read(v) for v in e.invars)
        (lc, rc), (lb, rb) = e.params["dimension_numbers"]
        if lb or rb:
            raise NotImplementedError("dot_general batch dims unsupported")
        if len(lc) != 1 or len(rc) != 1:
            raise NotImplementedError("multi-dim contraction unsupported")
        la, ra = e.invars[0].aval, e.invars[1].aval
        lrank, rrank = len(la.shape), len(ra.shape)
        if int(lc[0]) != lrank - 1:
            perm = [d for d in range(lrank) if d != int(lc[0])] + [int(lc[0])]
            a = self.g.emit("Transpose", [a],
                            attrs=[_attr_ints("perm", perm)])[0]
        if rrank != 2:
            raise NotImplementedError("dot_general rhs must be rank 2")
        if int(rc[0]) != 0:
            b = self.g.emit("Transpose", [b],
                            attrs=[_attr_ints("perm", [1, 0])])[0]
        self.write(e.outvars[0], self.g.emit("MatMul", [a, b])[0])

    def _pool(self, e, op):
        (a,) = (self.read(v) for v in e.invars)
        wd = [int(d) for d in e.params["window_dimensions"]]
        ws = [int(s) for s in e.params["window_strides"]]
        pads = e.params["padding"]
        if len(wd) != 4 or wd[0] != 1 or wd[3] != 1:
            raise NotImplementedError("pooling must be NHWC (1,kh,kw,1)")
        if any(int(d) != 1 for d in e.params.get("base_dilation", [1] * 4)) \
                or any(int(d) != 1 for d in
                       e.params.get("window_dilation", [1] * 4)):
            raise NotImplementedError("dilated pooling unsupported")
        xp = self.g.emit("Transpose", [a],
                         attrs=[_attr_ints("perm", [0, 3, 1, 2])])[0]
        attrs = [
            _attr_ints("kernel_shape", wd[1:3]),
            _attr_ints("strides", ws[1:3]),
            _attr_ints("pads", [int(pads[1][0]), int(pads[2][0]),
                                int(pads[1][1]), int(pads[2][1])]),
        ]
        if op == "AveragePool":
            attrs.append(_attr_int("count_include_pad", 1))
        y = self.g.emit(op, [xp], attrs=attrs)[0]
        out = self.g.emit("Transpose", [y],
                          attrs=[_attr_ints("perm", [0, 2, 3, 1])])[0]
        return out

    def p_reduce_window_max(self, e):
        self.write(e.outvars[0], self._pool(e, "MaxPool"))

    def p_reduce_window_sum(self, e):
        # sum window == AveragePool * window size (count_include_pad keeps
        # the arithmetic exact at the borders)
        out = self._pool(e, "AveragePool")
        wd = [int(d) for d in e.params["window_dimensions"]]
        k = self.g.const(np.float32(wd[1] * wd[2]), "winsize")
        self.write(e.outvars[0], self.g.emit("Mul", [out, k])[0])


def export_jax_onnx(fn, example_args, path: str,
                    input_names: Sequence[str] = None,
                    output_names: Sequence[str] = None) -> str:
    """Trace ``fn(*example_args)`` and write it as a self-contained `.onnx`
    (captured arrays become initializers; the example arguments become the
    graph inputs, batch dim kept static).  Returns ``path``."""
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr
    g = _Graph()
    lw = _Lowerer(g)

    flat_args = jax.tree_util.tree_leaves(example_args)
    if len(flat_args) != len(jaxpr.invars):
        raise ValueError("example_args flatten to a different arity than "
                         "the traced function's inputs")
    in_names = list(input_names or
                    [f"input_{i}" for i in range(len(jaxpr.invars))])
    # Graph inputs/outputs and initializers are declared FLOAT; anything
    # that cannot be carried exactly as f32 is a loud error, not a silent
    # cast (the module's fail-loud contract).
    for name, v in zip(in_names, jaxpr.invars):
        if v.aval.dtype != np.float32:
            raise NotImplementedError(
                f"graph input {name!r} has dtype {v.aval.dtype}; only "
                "float32 inputs are supported (cast before tracing)")
    for i, v in enumerate(jaxpr.outvars):
        if v.aval.dtype != np.float32:
            raise NotImplementedError(
                f"graph output {i} has dtype {v.aval.dtype}; only float32 "
                "outputs are supported (cast inside the function)")
    for v, c in zip(jaxpr.constvars, closed.consts):
        arr = np.asarray(c)
        if arr.dtype != np.float32:
            f32 = arr.astype(np.float32)
            with np.errstate(over="ignore", invalid="ignore"):
                exact = (arr.dtype != np.bool_
                         and np.array_equal(f32.astype(arr.dtype), arr))
            if not exact:
                raise NotImplementedError(
                    f"captured constant of dtype {arr.dtype} not exactly "
                    "f32-representable; cast it explicitly before tracing")
            arr = f32
        wname = g.name("w")
        g.initializers.append(_tensor(wname, arr))
        lw.write(v, wname)
    outs = lw.lower_jaxpr(jaxpr, in_names)
    out_names = list(output_names or
                     [f"output_{i}" for i in range(len(outs))])
    for o, public in zip(outs, out_names):
        g.nodes.append(_node("Identity", [o], [public], f"out_{public}"))

    graph = b"".join(_ld(1, n) for n in g.nodes)
    graph += _s(2, "jax_generic")
    graph += b"".join(_ld(5, t) for t in g.initializers)
    for name, v in zip(in_names, jaxpr.invars):
        graph += _ld(11, _value_info(name, tuple(int(d) for d in v.aval.shape)))
    for name, v in zip(out_names, jaxpr.outvars):
        graph += _ld(12, _value_info(name, tuple(int(d) for d in v.aval.shape)))
    model = (_i(1, _IR_VERSION) + _s(2, "yolofastest_tpu-generic") + _s(3, "0.1")
             + _ld(7, graph) + _ld(8, _i(2, OPSET)))
    with open(path, "wb") as f:
        f.write(model)
    return path

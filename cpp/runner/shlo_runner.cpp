// yf_shlo — native consumer for the exported StableHLO artifact.
//
// Parses the textual StableHLO module that `export/stablehlo.py` (via
// `yolofastest_tpu export --out DIR`) writes alongside the serialized
// jax.export artifact (forward.mlir — the conv-only folded graph, weights
// baked in as dense constants), and executes it with a from-scratch fp32
// interpreter.  This closes the loop the reference closes with its ncnn
// consumer of converted artifacts (/root/reference/src/model_deployment/
// ncnn_deploy/main.cpp:7-59): the *exported compiled graph* — not just the
// .yfb weight dump — runs natively, with no Python or XLA in the process.
//
// Like tools/onnx_check.py and tools/caffe_check.py, this is a consumer /
// verifier written from scratch against the format, so a parity failure
// indicts the exporter rather than re-running its own code.  Supported op
// set = exactly what the exported forward graphs contain (fail-loud on
// anything else): constant, broadcast_in_dim, add, maximum, convolution
// (strided/padded/grouped), reshape, transpose, dot_general (matmul form),
// concatenate, call, return.
//
// Usage:
//   yf_shlo model.mlir input.raw out_prefix [reps]
//
//   input.raw   float32 little-endian, row-major, exactly the element count
//               of @main's argument
//   out_prefix  each result i is written to <out_prefix>.out<i>.raw (f32)
//   reps        timing repetitions (default 1); per-rep wall time is printed
//               in the reference's log format ("infer time : N ms",
//               YOLO_ncnn.cpp-style) plus an avg_time line.

#include <algorithm>
#include <cctype>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

struct Tensor {
  std::vector<int64_t> shape;
  std::shared_ptr<std::vector<float>> data;  // shared: reshape aliases
  int64_t numel() const {
    int64_t n = 1;
    for (int64_t d : shape) n *= d;
    return n;
  }
  float* ptr() { return data->data(); }
  const float* ptr() const { return data->data(); }
};

Tensor make_tensor(std::vector<int64_t> shape) {
  Tensor t;
  t.shape = std::move(shape);
  t.data = std::make_shared<std::vector<float>>(t.numel(), 0.0f);
  return t;
}

[[noreturn]] void fail(const std::string& msg) {
  throw std::runtime_error("yf_shlo: " + msg);
}

// ----------------------------------------------------------------- parsing

// tensor<1x256x320x1xf32> -> {1,256,320,1}; tensor<f32> -> {} (rank 0)
std::vector<int64_t> parse_type(const std::string& s, size_t pos) {
  size_t a = s.find("tensor<", pos);
  if (a == std::string::npos) fail("type expected near: " + s.substr(pos, 60));
  a += 7;
  size_t b = s.find('>', a);
  std::string inner = s.substr(a, b - a);
  if (inner.find("f32") == std::string::npos)
    fail("only f32 tensors supported, got tensor<" + inner + ">");
  std::vector<int64_t> dims;
  size_t p = 0;
  while (p < inner.size() && isdigit(inner[p])) {
    size_t q = p;
    while (q < inner.size() && isdigit(inner[q])) q++;
    dims.push_back(std::stoll(inner.substr(p, q - p)));
    if (q < inner.size() && inner[q] == 'x') p = q + 1; else break;
  }
  return dims;
}

// first [..] integer list at/after pos; returns end position after ']'
std::vector<int64_t> parse_int_list(const std::string& s, size_t pos,
                                    size_t* end = nullptr) {
  size_t a = s.find('[', pos);
  if (a == std::string::npos) fail("int list expected: " + s.substr(pos, 60));
  std::vector<int64_t> out;
  size_t p = a + 1;
  while (p < s.size() && s[p] != ']') {
    if (isdigit(s[p]) || s[p] == '-') {
      size_t q = p + 1;
      while (q < s.size() && isdigit(s[q])) q++;
      out.push_back(std::stoll(s.substr(p, q - p)));
      p = q;
    } else {
      p++;
    }
  }
  if (end) *end = p + 1;
  return out;
}

uint8_t hexval(char c) {
  if (c >= '0' && c <= '9') return c - '0';
  if (c >= 'a' && c <= 'f') return c - 'a' + 10;
  if (c >= 'A' && c <= 'F') return c - 'A' + 10;
  fail(std::string("bad hex digit: ") + c);
}

// dense<...> literal (splat scalar, nested list, or "0x..." raw bytes)
Tensor parse_dense(const std::string& line) {
  size_t d = line.find("dense<");
  if (d == std::string::npos) fail("dense<> expected: " + line.substr(0, 80));
  size_t start = d + 6;
  // find matching '>' — nesting only via brackets/quotes, '>' not in floats
  size_t close = start;
  int depth = 0;
  bool instr = false;
  for (;; close++) {
    if (close >= line.size()) fail("unterminated dense<>");
    char c = line[close];
    if (c == '"') instr = !instr;
    if (instr) continue;
    if (c == '[') depth++;
    if (c == ']') depth--;
    if (c == '>' && depth == 0) break;
  }
  std::string lit = line.substr(start, close - start);
  Tensor t;
  t.shape = parse_type(line, close);
  t.data = std::make_shared<std::vector<float>>();
  auto& v = *t.data;
  if (!lit.empty() && lit[0] == '"') {
    // raw bytes: "0xAABBCCDD..." little-endian f32, row-major
    if (lit.size() < 4 || lit[1] != '0' || lit[2] != 'x')
      fail("unsupported string dense literal");
    size_t nhex = lit.size() - 4;  // minus quotes and 0x
    if (nhex % 8) fail("hex literal not a whole number of f32s");
    v.reserve(nhex / 8);
    for (size_t p = 3; p + 8 <= lit.size() - 1; p += 8) {
      uint32_t bits = 0;
      for (int b = 0; b < 4; b++) {
        uint32_t byte = (hexval(lit[p + 2 * b]) << 4) | hexval(lit[p + 2 * b + 1]);
        bits |= byte << (8 * b);  // bytes little-endian
      }
      float f;
      std::memcpy(&f, &bits, 4);
      v.push_back(f);
    }
  } else {
    // nested list or splat: floats in row-major order; brackets are noise
    const char* p = lit.c_str();
    const char* endp = p + lit.size();
    while (p < endp) {
      if (*p == '[' || *p == ']' || *p == ',' || isspace((unsigned char)*p)) {
        p++;
        continue;
      }
      char* next;
      double val = std::strtod(p, &next);
      if (next == p) fail("bad float in dense literal near: " + std::string(p).substr(0, 20));
      v.push_back((float)val);
      p = next;
    }
    if ((int64_t)v.size() == 1 && t.numel() > 1) v.assign(t.numel(), v[0]);  // splat
  }
  if ((int64_t)v.size() != t.numel())
    fail("dense element count " + std::to_string(v.size()) + " != shape numel " +
         std::to_string(t.numel()));
  return t;
}

struct Op {
  std::string kind;               // constant/conv/broadcast/add/max/...
  std::string out;                // SSA name
  std::vector<std::string> ins;   // SSA operand names
  std::vector<int64_t> dims;      // broadcast/transpose perm, concat dim
  std::vector<int64_t> stride, pad_lo, pad_hi;
  int64_t feature_groups = 1;
  int64_t lhs_contract = -1, rhs_contract = -1;
  std::string callee;
  Tensor cst;
  std::vector<int64_t> out_shape;
};

struct Func {
  std::vector<std::string> params;
  std::vector<std::vector<int64_t>> param_shapes;
  std::vector<Op> ops;
  std::vector<std::string> rets;
};

// %name or %arg0 at pos
std::string parse_ssa(const std::string& s, size_t pos, size_t* end = nullptr) {
  size_t a = s.find('%', pos);
  if (a == std::string::npos) fail("ssa name expected: " + s.substr(pos, 60));
  size_t q = a + 1;
  while (q < s.size() && (isalnum((unsigned char)s[q]) || s[q] == '_')) q++;
  if (end) *end = q;
  return s.substr(a, q - a);
}

std::vector<std::string> parse_operand_list(const std::string& s, size_t pos,
                                            size_t stop) {
  std::vector<std::string> out;
  size_t p = pos;
  while (true) {
    size_t a = s.find('%', p);
    if (a == std::string::npos || a >= stop) break;
    size_t e;
    out.push_back(parse_ssa(s, a, &e));
    p = e;
  }
  return out;
}

class Module {
 public:
  std::map<std::string, Func> funcs;

  void parse(const std::string& text) {
    std::istringstream ss(text);
    std::string line;
    Func* cur = nullptr;
    while (std::getline(ss, line)) {
      size_t first = line.find_first_not_of(" \t");
      if (first == std::string::npos) continue;
      std::string t = line.substr(first);
      if (t.rfind("func.func", 0) == 0) {
        size_t at = t.find('@');
        size_t par = t.find('(', at);
        std::string name = t.substr(at + 1, par - at - 1);
        cur = &funcs[name];
        // params: %argN: tensor<...> pairs inside the top-level parens
        size_t p = par + 1;
        int depth = 1;
        size_t close = p;
        for (; close < t.size() && depth; close++) {
          if (t[close] == '(') depth++;
          if (t[close] == ')') depth--;
        }
        std::string params = t.substr(p, close - p - 1);
        size_t q = 0;
        while (true) {
          size_t a = params.find('%', q);
          if (a == std::string::npos) break;
          size_t e;
          cur->params.push_back(parse_ssa(params, a, &e));
          cur->param_shapes.push_back(parse_type(params, e));
          q = params.find("tensor<", e);
          q = params.find('>', q) + 1;
        }
        continue;
      }
      if (!cur) continue;
      if (t.rfind("return", 0) == 0) {
        size_t colon = t.find(" : ");
        cur->rets = parse_operand_list(t, 0, colon == std::string::npos ? t.size() : colon);
        continue;
      }
      if (t[0] != '%') continue;  // '}' etc.
      parse_stmt(t, *cur);
    }
    if (!funcs.count("main")) fail("no @main function in module");
  }

 private:
  void parse_stmt(const std::string& t, Func& f) {
    Op op;
    size_t eq = t.find('=');
    op.out = parse_ssa(t, 0);
    std::string rhs = t.substr(eq + 1);
    auto has = [&](const char* k) { return rhs.find(k) != std::string::npos; };

    if (has("stablehlo.constant")) {
      op.kind = "constant";
      op.cst = parse_dense(rhs);
      op.out_shape = op.cst.shape;
    } else if (has("stablehlo.convolution")) {
      op.kind = "conv";
      size_t par = rhs.find('(');
      size_t close = rhs.find(')', par);
      op.ins = parse_operand_list(rhs, par, close);
      // layout is always [b,0,1,f]x[0,1,i,o]->[b,0,1,f] in our exports
      if (!has("[b, 0, 1, f]x[0, 1, i, o]->[b, 0, 1, f]"))
        fail("unsupported conv dim_numbers: " + rhs.substr(0, 160));
      if (has("lhs_dilate") || has("rhs_dilate") || has("window_reversal"))
        fail("dilated/reversed conv not supported: " + rhs.substr(0, 160));
      op.stride = {1, 1};
      op.pad_lo = {0, 0};
      op.pad_hi = {0, 0};
      size_t w = rhs.find("window = {");
      size_t wend = rhs.find('}', w);
      std::string win = rhs.substr(w, wend - w);
      size_t sp = win.find("stride = ");
      if (sp != std::string::npos) op.stride = parse_int_list(win, sp);
      size_t pp = win.find("pad = ");
      if (pp != std::string::npos) {
        // pad = [[l0, h0], [l1, h1]]
        size_t e0;
        auto p0 = parse_int_list(win, win.find('[', pp + 6) + 1, &e0);
        auto p1 = parse_int_list(win, e0, nullptr);
        op.pad_lo = {p0[0], p1[0]};
        op.pad_hi = {p0[1], p1[1]};
      }
      size_t fg = rhs.find("feature_group_count = ");
      if (fg != std::string::npos)
        op.feature_groups = std::stoll(rhs.substr(fg + 22));
      size_t bg = rhs.find("batch_group_count = ");
      if (bg != std::string::npos && std::stoll(rhs.substr(bg + 20)) != 1)
        fail("batch_group_count != 1 unsupported");
      op.out_shape = out_type_of(rhs);
    } else if (has("stablehlo.broadcast_in_dim")) {
      op.kind = "broadcast";
      op.ins = {parse_ssa(rhs, rhs.find('%'))};
      size_t d = rhs.find("dims = ");
      op.dims = parse_int_list(rhs, d);
      op.out_shape = out_type_of(rhs);
    } else if (has("stablehlo.add") || has("stablehlo.maximum") ||
               has("stablehlo.subtract") || has("stablehlo.multiply")) {
      op.kind = has("stablehlo.add") ? "add"
                : has("stablehlo.maximum") ? "max"
                : has("stablehlo.subtract") ? "sub" : "mul";
      size_t colon = rhs.find(" : ");
      op.ins = parse_operand_list(rhs, 0, colon);
      op.out_shape = parse_type(rhs, colon);
    } else if (has("stablehlo.reshape")) {
      op.kind = "reshape";
      op.ins = {parse_ssa(rhs, rhs.find('%'))};
      op.out_shape = out_type_of(rhs);
    } else if (has("stablehlo.transpose")) {
      op.kind = "transpose";
      op.ins = {parse_ssa(rhs, rhs.find('%'))};
      op.dims = parse_int_list(rhs, rhs.find("dims = "));
      op.out_shape = out_type_of(rhs);
    } else if (has("stablehlo.dot_general")) {
      op.kind = "dot";
      size_t cd = rhs.find("contracting_dims = ");
      if (cd == std::string::npos || has("batching_dims"))
        fail("unsupported dot_general form: " + rhs.substr(0, 160));
      op.ins = parse_operand_list(rhs, 0, cd);
      size_t e0;
      auto l = parse_int_list(rhs, cd, &e0);
      auto r = parse_int_list(rhs, e0, nullptr);
      if (l.size() != 1 || r.size() != 1) fail("multi-dim contraction unsupported");
      op.lhs_contract = l[0];
      op.rhs_contract = r[0];
      op.out_shape = out_type_of(rhs);
    } else if (has("stablehlo.concatenate")) {
      op.kind = "concat";
      size_t d = rhs.find("dim = ");
      op.ins = parse_operand_list(rhs, 0, d);
      op.dims = {std::stoll(rhs.substr(d + 6))};
      op.out_shape = out_type_of(rhs);
    } else if (has("call @")) {
      op.kind = "call";
      size_t at = rhs.find('@');
      size_t par = rhs.find('(', at);
      op.callee = rhs.substr(at + 1, par - at - 1);
      op.ins = parse_operand_list(rhs, par, rhs.find(')', par));
      op.out_shape = out_type_of(rhs);
    } else {
      fail("unsupported op: " + t.substr(0, 160));
    }
    f.ops.push_back(std::move(op));
  }

  // the type after "-> " (result type of the op's function-type signature)
  std::vector<int64_t> out_type_of(const std::string& rhs) {
    size_t arrow = rhs.rfind("-> ");
    if (arrow == std::string::npos) fail("no result type: " + rhs.substr(0, 120));
    return parse_type(rhs, arrow);
  }
};

// --------------------------------------------------------------- execution

std::vector<int64_t> strides_of(const std::vector<int64_t>& shape) {
  std::vector<int64_t> st(shape.size(), 1);
  for (int i = (int)shape.size() - 2; i >= 0; i--) st[i] = st[i + 1] * shape[i + 1];
  return st;
}

Tensor eval_conv(const Op& op, const Tensor& x, const Tensor& k) {
  // x: NHWC, k: HWIO (I = Cin/groups), out: NHWC
  int64_t N = x.shape[0], H = x.shape[1], W = x.shape[2], C = x.shape[3];
  int64_t KH = k.shape[0], KW = k.shape[1], KI = k.shape[2], KO = k.shape[3];
  int64_t G = op.feature_groups;
  if (KI * G != C) fail("conv channel mismatch");
  int64_t OG = KO / G;  // out channels per group
  Tensor out = make_tensor(op.out_shape);
  int64_t OH = out.shape[1], OW = out.shape[2];
  const float* xp = x.ptr();
  const float* kp = k.ptr();
  float* op_ = out.ptr();
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t n = 0; n < N; n++)
    for (int64_t oy = 0; oy < OH; oy++)
      for (int64_t ox = 0; ox < OW; ox++)
        for (int64_t oc = 0; oc < KO; oc++) {
          int64_t g = oc / OG;
          float facc = 0.0f;  // f32 accumulate, like the .yfb engine
          for (int64_t ky = 0; ky < KH; ky++) {
            int64_t iy = oy * op.stride[0] + ky - op.pad_lo[0];
            if (iy < 0 || iy >= H) continue;
            for (int64_t kx = 0; kx < KW; kx++) {
              int64_t ix = ox * op.stride[1] + kx - op.pad_lo[1];
              if (ix < 0 || ix >= W) continue;
              const float* xrow = xp + ((n * H + iy) * W + ix) * C + g * KI;
              const float* krow = kp + ((ky * KW + kx) * KI) * KO + oc;
              for (int64_t ci = 0; ci < KI; ci++)
                facc += xrow[ci] * krow[ci * KO];
            }
          }
          op_[((n * OH + oy) * OW + ox) * KO + oc] = facc;
        }
  return out;
}

Tensor eval_broadcast(const Op& op, const Tensor& x) {
  Tensor out = make_tensor(op.out_shape);
  auto ost = strides_of(out.shape);
  auto xst = strides_of(x.shape);
  const float* xp = x.ptr();
  float* o = out.ptr();
  int64_t n = out.numel();
  int rank = (int)out.shape.size();
  std::vector<int64_t> idx(rank);
  for (int64_t i = 0; i < n; i++) {
    int64_t rem = i, xoff = 0;
    for (int d = 0; d < rank; d++) {
      idx[d] = rem / ost[d];
      rem %= ost[d];
    }
    for (size_t j = 0; j < x.shape.size(); j++) {
      int64_t pos = x.shape[j] > 1 ? idx[op.dims[j]] : 0;
      xoff += pos * xst[j];
    }
    o[i] = xp[xoff];
  }
  return out;
}

Tensor eval_transpose(const Op& op, const Tensor& x) {
  Tensor out = make_tensor(op.out_shape);
  auto ost = strides_of(out.shape);
  auto xst = strides_of(x.shape);
  const float* xp = x.ptr();
  float* o = out.ptr();
  int rank = (int)out.shape.size();
  int64_t n = out.numel();
  for (int64_t i = 0; i < n; i++) {
    int64_t rem = i, xoff = 0;
    for (int d = 0; d < rank; d++) {
      int64_t pos = rem / ost[d];
      rem %= ost[d];
      xoff += pos * xst[op.dims[d]];
    }
    o[i] = xp[xoff];
  }
  return out;
}

Tensor eval_dot(const Op& op, const Tensor& a, const Tensor& b) {
  if (op.lhs_contract != (int64_t)a.shape.size() - 1 || op.rhs_contract != 0)
    fail("dot_general only supports (.., K) x (K, N)");
  int64_t K = a.shape.back();
  int64_t M = a.numel() / K;
  int64_t Nn = b.numel() / K;
  Tensor out = make_tensor(op.out_shape);
  const float* ap = a.ptr();
  const float* bp = b.ptr();
  float* o = out.ptr();
#pragma omp parallel for schedule(static)
  for (int64_t m = 0; m < M; m++)
    for (int64_t nn = 0; nn < Nn; nn++) {
      float acc = 0.0f;
      for (int64_t kk = 0; kk < K; kk++) acc += ap[m * K + kk] * bp[kk * Nn + nn];
      o[m * Nn + nn] = acc;
    }
  return out;
}

Tensor eval_concat(const Op& op, const std::vector<Tensor>& ins) {
  Tensor out = make_tensor(op.out_shape);
  int64_t dim = op.dims[0];
  auto ost = strides_of(out.shape);
  int64_t outer = 1;
  for (int64_t d = 0; d < dim; d++) outer *= out.shape[d];
  int64_t inner = ost[dim];  // elems per slice along dim
  float* o = out.ptr();
  int64_t off = 0;
  for (const Tensor& t : ins) {
    int64_t tdim = t.shape[dim];
    const float* tp = t.ptr();
    for (int64_t u = 0; u < outer; u++)
      std::memcpy(o + u * out.shape[dim] * inner + off * inner,
                  tp + u * tdim * inner, tdim * inner * sizeof(float));
    off += tdim;
  }
  return out;
}

class Interp {
 public:
  explicit Interp(const Module& m) : m_(m) {}

  std::vector<Tensor> run(const std::string& fname, std::vector<Tensor> args) {
    const Func& f = m_.funcs.at(fname);
    if (args.size() != f.params.size()) fail("arg count mismatch for @" + fname);
    std::map<std::string, Tensor> env;
    for (size_t i = 0; i < args.size(); i++) {
      int64_t want = 1;
      for (int64_t d : f.param_shapes[i]) want *= d;
      if (args[i].numel() != want) fail("arg shape mismatch for @" + fname);
      env[f.params[i]] = std::move(args[i]);
    }
    for (const Op& op : f.ops) {
      auto in = [&](size_t i) -> const Tensor& {
        auto it = env.find(op.ins[i]);
        if (it == env.end()) fail("undefined ssa value " + op.ins[i]);
        return it->second;
      };
      Tensor r;
      if (op.kind == "constant") {
        r = op.cst;
      } else if (op.kind == "conv") {
        r = eval_conv(op, in(0), in(1));
      } else if (op.kind == "broadcast") {
        r = eval_broadcast(op, in(0));
      } else if (op.kind == "add" || op.kind == "max" || op.kind == "sub" ||
                 op.kind == "mul") {
        const Tensor &a = in(0), &b = in(1);
        if (a.numel() != b.numel()) fail("elementwise shape mismatch");
        r = make_tensor(op.out_shape);
        const float* ap = a.ptr();
        const float* bp = b.ptr();
        float* o = r.ptr();
        int64_t n = r.numel();
        if (op.kind == "add")
          for (int64_t i = 0; i < n; i++) o[i] = ap[i] + bp[i];
        else if (op.kind == "max")
          for (int64_t i = 0; i < n; i++) o[i] = std::max(ap[i], bp[i]);
        else if (op.kind == "sub")
          for (int64_t i = 0; i < n; i++) o[i] = ap[i] - bp[i];
        else
          for (int64_t i = 0; i < n; i++) o[i] = ap[i] * bp[i];
      } else if (op.kind == "reshape") {
        r.shape = op.out_shape;
        r.data = in(0).data;  // aliases — row-major identical layout
      } else if (op.kind == "transpose") {
        r = eval_transpose(op, in(0));
      } else if (op.kind == "dot") {
        r = eval_dot(op, in(0), in(1));
      } else if (op.kind == "concat") {
        std::vector<Tensor> ins;
        for (size_t i = 0; i < op.ins.size(); i++) ins.push_back(in(i));
        r = eval_concat(op, ins);
      } else if (op.kind == "call") {
        std::vector<Tensor> cargs;
        for (size_t i = 0; i < op.ins.size(); i++) cargs.push_back(in(i));
        auto res = run(op.callee, std::move(cargs));
        if (res.size() != 1) fail("multi-result call unsupported");
        r = std::move(res[0]);
      } else {
        fail("unhandled op kind " + op.kind);
      }
      env[op.out] = std::move(r);
    }
    std::vector<Tensor> out;
    for (const std::string& name : f.rets) out.push_back(env.at(name));
    return out;
  }

 private:
  const Module& m_;
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: yf_shlo model.mlir input.raw out_prefix [reps]\n");
    return 2;
  }
  try {
    std::ifstream mf(argv[1]);
    if (!mf) fail(std::string("cannot open ") + argv[1]);
    std::stringstream buf;
    buf << mf.rdbuf();
    Module mod;
    mod.parse(buf.str());
    const Func& main_fn = mod.funcs.at("main");
    if (main_fn.params.size() != 1) fail("@main must take exactly one arg");

    Tensor input;
    input.shape = main_fn.param_shapes[0];
    input.data = std::make_shared<std::vector<float>>(input.numel());
    std::ifstream inf(argv[2], std::ios::binary);
    if (!inf) fail(std::string("cannot open ") + argv[2]);
    inf.read(reinterpret_cast<char*>(input.ptr()), input.numel() * 4);
    if (inf.gcount() != (std::streamsize)(input.numel() * 4))
      fail("input.raw too small for @main arg (" +
           std::to_string(input.numel() * 4) + " bytes expected)");

    int reps = argc > 4 ? std::atoi(argv[4]) : 1;
    Interp interp(mod);
    std::vector<Tensor> outs;
    double total_ms = 0.0;
    for (int rr = 0; rr < reps; rr++) {
      Tensor arg = input;  // data shared; interpreter never mutates inputs
      auto t0 = std::chrono::steady_clock::now();
      outs = interp.run("main", {arg});
      double ms = std::chrono::duration<double, std::milli>(
                      std::chrono::steady_clock::now() - t0)
                      .count();
      total_ms += ms;
      std::printf("infer time : %.2f ms\n", ms);
    }
    std::printf("avg_time:%.2fms\n", total_ms / reps);
    for (size_t i = 0; i < outs.size(); i++) {
      std::string path = std::string(argv[3]) + ".out" + std::to_string(i) + ".raw";
      std::ofstream of(path, std::ios::binary);
      of.write(reinterpret_cast<const char*>(outs[i].ptr()), outs[i].numel() * 4);
      std::printf("wrote %s (", path.c_str());
      for (size_t d = 0; d < outs[i].shape.size(); d++)
        std::printf("%s%lld", d ? "x" : "", (long long)outs[i].shape[d]);
      std::printf(" f32)\n");
    }
  } catch (const std::exception& e) {
    std::fprintf(stderr, "%s\n", e.what());
    return 1;
  }
  return 0;
}

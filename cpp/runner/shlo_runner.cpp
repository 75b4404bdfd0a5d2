// yf_shlo — native consumer for the exported StableHLO artifacts.
//
// Parses the textual StableHLO module that `export/stablehlo.py` (via
// `yolofastest_tpu export --out DIR`) writes alongside the serialized
// jax.export artifact, and executes it with a from-scratch interpreter.
// This closes the loop the reference closes with its ncnn consumer of
// converted artifacts (/root/reference/src/model_deployment/ncnn_deploy/
// main.cpp:7-59): the *exported compiled program* — not just the .yfb
// weight dump — runs natively, with no Python or XLA in the process.
//
// Two artifact families are covered:
//   forward.mlir — conv-only folded forward graph (weights as constants)
//   detect.mlir  — the FULL detect pipeline (uint8 frames in, final
//                  boxes/classes/scores/count out): preprocess, forward,
//                  sigmoid decode, confidence top-k, NMS as a stablehlo
//                  while loop, argsort compaction — i.e. the reference's
//                  native decode+NMS (YOLO_ncnn.cpp:83-234) as a compiled
//                  artifact.
//
// Like tools/onnx_check.py and tools/caffe_check.py, this is a consumer /
// verifier written from scratch against the format, so a parity failure
// indicts the exporter rather than re-running its own code.  Supported op
// set = exactly what the exported graphs contain (fail-loud on anything
// else): constant, iota, convert, broadcast_in_dim, reshape, transpose,
// slice, concatenate, convolution (strided/padded/grouped), dot_general
// (matmul form), gather, elementwise (add/sub/mul/div/max/min/and/or/not/
// neg/exp/rsqrt/round_nearest_even), compare, select, reduce (single-line
// `applies` form and the variadic reducer-region form), sort (comparator
// region), while (cond/do regions), custom_call @mhlo.topk, call, return.
// Dtypes: f32, i32, i1, ui8 (values held exactly in f32 storage — every
// integer this model manipulates is < 2^24).
//
// Usage:
//   yf_shlo model.mlir input.raw out_prefix [reps]
//
//   input.raw   little-endian, row-major, exactly the element count of
//               @main's argument; f32 for f32 args, raw bytes for ui8 args
//   out_prefix  each result i is written to <out_prefix>.out<i>.raw as f32
//               (integer/bool results are written as their exact float
//               values; consumers cast back)
//   reps        timing repetitions (default 1); per-rep wall time is
//               printed in the reference's log format plus an avg_time line.

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
#include <numeric>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

enum class DType { F32, I32, I1, UI8 };

struct Tensor {
  std::vector<int64_t> shape;
  DType dtype = DType::F32;
  std::shared_ptr<std::vector<float>> data;  // shared: reshape aliases
  int64_t numel() const {
    int64_t n = 1;
    for (int64_t d : shape) n *= d;
    return n;
  }
  float* ptr() { return data->data(); }
  const float* ptr() const { return data->data(); }
};

Tensor make_tensor(std::vector<int64_t> shape, DType dt = DType::F32) {
  Tensor t;
  t.shape = std::move(shape);
  t.dtype = dt;
  t.data = std::make_shared<std::vector<float>>(t.numel(), 0.0f);
  return t;
}

[[noreturn]] void fail(const std::string& msg) {
  throw std::runtime_error("yf_shlo: " + msg);
}

// ----------------------------------------------------------------- parsing

struct TType {
  std::vector<int64_t> dims;
  DType dtype;
};

// tensor<1x256x320x1xf32> -> {{1,256,320,1}, F32}; tensor<i1> -> {{}, I1}
TType parse_type(const std::string& s, size_t pos, size_t* end = nullptr) {
  size_t a = s.find("tensor<", pos);
  if (a == std::string::npos) fail("type expected near: " + s.substr(pos, 60));
  a += 7;
  size_t b = s.find('>', a);
  std::string inner = s.substr(a, b - a);
  if (end) *end = b + 1;
  TType t;
  if (inner.size() >= 3 && inner.compare(inner.size() - 3, 3, "f32") == 0)
    t.dtype = DType::F32;
  else if (inner.size() >= 3 && inner.compare(inner.size() - 3, 3, "i32") == 0)
    t.dtype = DType::I32;
  else if (inner.size() >= 3 && inner.compare(inner.size() - 3, 3, "ui8") == 0)
    t.dtype = DType::UI8;
  else if (inner.size() >= 2 && inner.compare(inner.size() - 2, 2, "i1") == 0)
    t.dtype = DType::I1;
  else
    fail("unsupported element type in tensor<" + inner + ">");
  size_t p = 0;
  while (p < inner.size() && isdigit(inner[p])) {
    size_t q = p;
    while (q < inner.size() && isdigit(inner[q])) q++;
    if (q < inner.size() && inner[q] == 'x') {
      t.dims.push_back(std::stoll(inner.substr(p, q - p)));
      p = q + 1;
    } else {
      break;  // the element type (e.g. "32" of f32 won't reach here)
    }
  }
  return t;
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

// dense<...> literal (splat scalar, true/false, bare 0x bit pattern,
// nested list, or "0x..." raw byte string)
Tensor parse_dense(const std::string& line) {
  size_t d = line.find("dense<");
  if (d == std::string::npos) fail("dense<> expected: " + line.substr(0, 80));
  size_t start = d + 6;
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
  TType ty = parse_type(line, close);
  Tensor t;
  t.shape = ty.dims;
  t.dtype = ty.dtype;
  t.data = std::make_shared<std::vector<float>>();
  auto& v = *t.data;
  auto bits_to_float = [](uint32_t bits) {
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
  };
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
      v.push_back(bits_to_float(bits));
    }
  } else if (lit == "true" || lit == "false") {
    v.assign(std::max<int64_t>(t.numel(), 1), lit == "true" ? 1.0f : 0.0f);
  } else if (lit.size() > 2 && lit[0] == '0' && (lit[1] == 'x' || lit[1] == 'X')
             && ty.dtype == DType::F32) {
    // bare hex scalar = raw f32 bit pattern (how MLIR prints NaN/inf)
    uint32_t bits = 0;
    for (size_t p = 2; p < lit.size(); p++) bits = (bits << 4) | hexval(lit[p]);
    v.assign(std::max<int64_t>(t.numel(), 1), bits_to_float(bits));
  } else {
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

struct Op;

struct Block {
  // region: params bound at call time, ops, return values
  std::vector<std::string> params;
  std::vector<Op> ops;
  std::vector<std::string> rets;
};

struct Op {
  std::string kind;
  std::string out;                // SSA base name (results: out or out#k)
  int n_results = 1;
  std::vector<std::string> ins;
  std::vector<int64_t> dims;      // broadcast/transpose perm, concat/iota/sort dim, reduce dims
  std::vector<int64_t> stride, pad_lo, pad_hi;        // conv
  std::vector<int64_t> slice_start, slice_limit;      // slice
  // gather attrs
  std::vector<int64_t> offset_dims, collapsed_dims, start_index_map, slice_sizes;
  std::vector<int64_t> operand_batching_dims, indices_batching_dims;
  int64_t index_vector_dim = -1;
  int64_t feature_groups = 1;
  int64_t lhs_contract = -1, rhs_contract = -1;
  int64_t topk_k = 0;
  std::string callee;             // call / simple-reduce combiner / compare dir
  Tensor cst;
  std::vector<TType> out_types;
  std::vector<Block> blocks;      // reduce: 1, sort: 1, while: cond+body
  std::vector<std::string> iter_inits;  // while: initial carried operands
};

struct Func {
  std::vector<std::string> params;
  std::vector<TType> param_types;
  Block body;
};

// %name or %arg0 (optionally %name#K) at pos
std::string parse_ssa(const std::string& s, size_t pos, size_t* end = nullptr) {
  size_t a = s.find('%', pos);
  if (a == std::string::npos) fail("ssa name expected: " + s.substr(pos, 60));
  size_t q = a + 1;
  while (q < s.size() && (isalnum((unsigned char)s[q]) || s[q] == '_')) q++;
  if (q < s.size() && s[q] == '#') {
    q++;
    while (q < s.size() && isdigit((unsigned char)s[q])) q++;
  }
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

// strip every " loc(...)" attachment (they may contain quoted strings with
// parens); returns the line without them
std::string strip_locs(const std::string& in) {
  std::string out;
  out.reserve(in.size());
  size_t i = 0;
  while (i < in.size()) {
    if (in.compare(i, 4, "loc(") == 0 &&
        (i == 0 || (!isalnum((unsigned char)in[i - 1]) && in[i - 1] != '_' &&
                    in[i - 1] != '#'))) {
      size_t j = i + 4;
      int depth = 1;
      bool instr = false;
      for (; j < in.size() && depth; j++) {
        char c = in[j];
        if (c == '"' ) {
          // skip the quoted string wholesale (may contain parens)
          if (!instr) {
            size_t k = j + 1;
            while (k < in.size() && in[k] != '"') {
              if (in[k] == '\\') k++;
              k++;
            }
            j = k;
            continue;
          }
        }
        if (c == '(') depth++;
        if (c == ')') depth--;
      }
      i = j;
      continue;
    }
    out += in[i++];
  }
  // trim trailing whitespace
  while (!out.empty() && isspace((unsigned char)out.back())) out.pop_back();
  return out;
}

class Module {
 public:
  std::map<std::string, Func> funcs;

  void parse(const std::string& text) {
    std::istringstream ss(text);
    std::string raw;
    lines_.clear();
    while (std::getline(ss, raw)) {
      size_t first = raw.find_first_not_of(" \t");
      if (first == std::string::npos) {
        lines_.push_back("");
        continue;
      }
      lines_.push_back(strip_locs(raw.substr(first)));
    }
    cur_ = 0;
    while (cur_ < lines_.size()) {
      const std::string& t = lines_[cur_];
      if (t.rfind("func.func", 0) == 0) {
        parse_func(t);
      } else {
        cur_++;
      }
    }
    if (!funcs.count("main")) fail("no @main function in module");
  }

 private:
  std::vector<std::string> lines_;
  size_t cur_ = 0;

  void parse_func(const std::string& header) {
    size_t at = header.find('@');
    size_t par = header.find('(', at);
    std::string name = header.substr(at + 1, par - at - 1);
    Func& f = funcs[name];
    // params: %argN: tensor<...> pairs inside the top-level parens
    size_t p = par + 1;
    int depth = 1;
    size_t close = p;
    for (; close < header.size() && depth; close++) {
      if (header[close] == '(') depth++;
      if (header[close] == ')') depth--;
    }
    std::string params = header.substr(p, close - p - 1);
    size_t q = 0;
    while (true) {
      size_t a = params.find('%', q);
      if (a == std::string::npos) break;
      size_t e;
      f.params.push_back(parse_ssa(params, a, &e));
      size_t te;
      f.param_types.push_back(parse_type(params, e, &te));
      q = te;
    }
    cur_++;
    parse_block(f.body, "}");
  }

  // parse statements into b until a line equal to `closer` at this level;
  // consumes the closer.  Returns the closer line actually seen (so while
  // regions can stop on "} do {").
  std::string parse_block(Block& b, const std::string& closer,
                          const std::string& alt_closer = "") {
    while (cur_ < lines_.size()) {
      const std::string& t = lines_[cur_];
      if (t == closer || t.rfind(closer, 0) == 0 ||
          (!alt_closer.empty() &&
           (t == alt_closer || t.rfind(alt_closer, 0) == 0))) {
        std::string seen = t;
        cur_++;
        return seen;
      }
      if (t.empty()) {
        cur_++;
        continue;
      }
      if (t.rfind("return", 0) == 0 || t.rfind("stablehlo.return", 0) == 0) {
        size_t colon = t.rfind(" : ");
        b.rets = parse_operand_list(
            t, 0, colon == std::string::npos ? t.size() : colon);
        cur_++;
        continue;
      }
      if (t[0] != '%') {
        cur_++;  // stray syntax (e.g. attribute-only lines)
        continue;
      }
      parse_stmt(t, b);
    }
    fail("unterminated block (missing '" + closer + "')");
  }

  // result count from "%name:N = ..." and output types from "-> (..)" or
  // the trailing single type
  void parse_results(const std::string& t, Op& op) {
    size_t eq = t.find('=');
    std::string lhs = t.substr(0, eq);
    size_t colon = lhs.find(':');
    op.out = parse_ssa(lhs, 0);
    op.n_results = colon == std::string::npos
                       ? 1
                       : (int)std::stoll(lhs.substr(colon + 1));
  }

  std::vector<TType> types_after_arrow(const std::string& rhs) {
    size_t arrow = rhs.rfind("-> ");
    if (arrow == std::string::npos) fail("no result type: " + rhs.substr(0, 120));
    std::vector<TType> out;
    size_t p = arrow;
    while (true) {
      size_t a = rhs.find("tensor<", p);
      if (a == std::string::npos) break;
      size_t e;
      out.push_back(parse_type(rhs, a, &e));
      p = e;
    }
    return out;
  }

  // result type for ops written as "... : tensor<...>" (elementwise etc.):
  // the LAST type on the line (select lists pred + value types)
  TType last_type_of(const std::string& rhs) {
    size_t p = 0, last = std::string::npos;
    while (true) {
      size_t a = rhs.find("tensor<", p);
      if (a == std::string::npos) break;
      last = a;
      p = a + 7;
    }
    if (last == std::string::npos) fail("no type: " + rhs.substr(0, 120));
    return parse_type(rhs, last);
  }

  std::vector<TType> out_types_of(const std::string& rhs) {
    if (rhs.find("-> ") != std::string::npos) return types_after_arrow(rhs);
    return {last_type_of(rhs)};
  }

  void parse_region_params(const std::string& line, Block& blk) {
    // "^bb0(%arg1: tensor<i1>, %arg2: tensor<i1>, ...):" or
    // "reducer(%a: tensor<f32>, %b: tensor<f32>) (%c: ..., %d: ...)  {"
    size_t q = 0;
    while (true) {
      size_t a = line.find('%', q);
      if (a == std::string::npos) break;
      size_t e;
      blk.params.push_back(parse_ssa(line, a, &e));
      size_t te;
      parse_type(line, e, &te);
      q = te;
    }
  }

  void parse_stmt(const std::string& t, Block& f) {
    Op op;
    size_t eq = t.find('=');
    parse_results(t, op);
    std::string rhs = t.substr(eq + 1);
    auto has = [&](const char* k) { return rhs.find(k) != std::string::npos; };

    if (has("stablehlo.constant")) {
      op.kind = "constant";
      op.cst = parse_dense(rhs);
      op.out_types = {{op.cst.shape, op.cst.dtype}};
      cur_++;
    } else if (has("stablehlo.custom_call")) {
      if (!has("@mhlo.topk")) fail("unsupported custom_call: " + rhs.substr(0, 120));
      op.kind = "topk";
      size_t par = rhs.find('(');
      op.ins = parse_operand_list(rhs, par, rhs.find(')', par));
      size_t kp = rhs.find("k = ");
      if (kp == std::string::npos) fail("topk without k attr");
      op.topk_k = std::stoll(rhs.substr(kp + 4));
      op.out_types = types_after_arrow(rhs);
      cur_++;
    } else if (has("stablehlo.while")) {
      op.kind = "while";
      // (%iterArg = %init, ...) : types...
      size_t par = rhs.find('(');
      size_t close = rhs.find(')', par);
      Block dummy;  // iterArg names become region params of both blocks
      std::vector<std::string> names_and_inits =
          parse_operand_list(rhs, par, close);
      if (names_and_inits.size() % 2) fail("odd while binding list");
      std::vector<std::string> iter_names;
      for (size_t i = 0; i < names_and_inits.size(); i += 2) {
        iter_names.push_back(names_and_inits[i]);
        op.iter_inits.push_back(names_and_inits[i + 1]);
      }
      // result types: the ": t1, t2, ..." tail of the header line
      size_t cp = rhs.find(" : ", close);
      size_t p = cp;
      while (true) {
        size_t a = rhs.find("tensor<", p);
        if (a == std::string::npos) break;
        size_t e;
        op.out_types.push_back(parse_type(rhs, a, &e));
        p = e;
      }
      if ((int)op.out_types.size() != op.n_results)
        fail("while result arity mismatch");
      cur_++;  // past header
      if (lines_[cur_].rfind("cond", 0) != 0) fail("while: expected 'cond {'");
      cur_++;
      op.blocks.emplace_back();
      op.blocks.back().params = iter_names;
      parse_block(op.blocks.back(), "} do {");
      op.blocks.emplace_back();
      op.blocks.back().params = iter_names;
      parse_block(op.blocks.back(), "}");
    } else if (has("stablehlo.sort")) {
      op.kind = "sort";
      size_t par = rhs.find('(');
      op.ins = parse_operand_list(rhs, par, rhs.find(')', par));
      size_t dp = rhs.find("dimension = ");
      op.dims = {dp == std::string::npos ? 0 : std::stoll(rhs.substr(dp + 12))};
      cur_++;  // past header line ending in "({"
      op.blocks.emplace_back();
      if (lines_[cur_].rfind("^bb0", 0) != 0) fail("sort: expected ^bb0 params");
      parse_region_params(lines_[cur_], op.blocks.back());
      cur_++;
      std::string close = parse_block(op.blocks.back(), "})");
      op.out_types = types_after_arrow(close);
      if ((int)op.out_types.size() != op.n_results)
        fail("sort result arity mismatch");
    } else if (has("stablehlo.reduce")) {
      size_t par = rhs.find('(');
      size_t dimp = rhs.find("across dimensions = ");
      if (dimp == std::string::npos) fail("reduce without dimensions");
      op.ins = parse_operand_list(rhs, par, dimp);  // op0, init0, op1, init1...
      op.dims = parse_int_list(rhs, dimp);
      op.out_types = types_after_arrow(rhs);
      size_t ap = rhs.find("applies stablehlo.");
      if (ap != std::string::npos) {
        op.kind = "reduce";
        size_t s = ap + 18;
        size_t e = s;
        while (e < rhs.size() && (isalnum((unsigned char)rhs[e]) || rhs[e] == '_')) e++;
        op.callee = rhs.substr(s, e - s);  // add / maximum / minimum / and / or
        cur_++;
      } else {
        op.kind = "reduce_region";
        cur_++;  // header
        if (lines_[cur_].rfind("reducer", 0) != 0)
          fail("reduce: expected reducer(...) region");
        op.blocks.emplace_back();
        parse_region_params(lines_[cur_], op.blocks.back());
        cur_++;
        parse_block(op.blocks.back(), "}");
      }
    } else if (has("stablehlo.convolution")) {
      op.kind = "conv";
      size_t par = rhs.find('(');
      size_t close = rhs.find(')', par);
      op.ins = parse_operand_list(rhs, par, close);
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
      op.out_types = types_after_arrow(rhs);
      cur_++;
    } else if (has("stablehlo.gather")) {
      op.kind = "gather";
      size_t par = rhs.find('(');
      op.ins = parse_operand_list(rhs, par, rhs.find(')', par));
      auto grab = [&](const char* key) -> std::vector<int64_t> {
        size_t p = rhs.find(key);
        if (p == std::string::npos) return {};
        return parse_int_list(rhs, p);
      };
      op.offset_dims = grab("offset_dims = ");
      op.collapsed_dims = grab("collapsed_slice_dims = ");
      op.start_index_map = grab("start_index_map = ");
      op.operand_batching_dims = grab("operand_batching_dims = ");
      op.indices_batching_dims = grab("start_indices_batching_dims = ");
      // the stablehlo attr printer omits zero-valued fields, so an absent
      // index_vector_dim means 0 (the index vector is the leading dim)
      size_t iv = rhs.find("index_vector_dim = ");
      op.index_vector_dim =
          iv == std::string::npos ? 0 : std::stoll(rhs.substr(iv + 19));
      size_t ssz = rhs.find("slice_sizes = array<i64:");
      if (ssz == std::string::npos) fail("gather without slice_sizes");
      // array<i64: 1, 1, 7> — ints up to '>'
      size_t endp = rhs.find('>', ssz + 10);
      std::string list = rhs.substr(ssz + 24, endp - ssz - 24);
      size_t p = 0;
      while (p < list.size()) {
        if (isdigit((unsigned char)list[p])) {
          size_t q = p;
          while (q < list.size() && isdigit((unsigned char)list[q])) q++;
          op.slice_sizes.push_back(std::stoll(list.substr(p, q - p)));
          p = q;
        } else {
          p++;
        }
      }
      op.out_types = types_after_arrow(rhs);
      cur_++;
    } else if (has("stablehlo.broadcast_in_dim")) {
      op.kind = "broadcast";
      op.ins = {parse_ssa(rhs, rhs.find('%'))};
      op.dims = parse_int_list(rhs, rhs.find("dims = "));
      op.out_types = out_types_of(rhs);
      cur_++;
    } else if (has("stablehlo.iota")) {
      op.kind = "iota";
      size_t dp = rhs.find("dim = ");
      op.dims = {std::stoll(rhs.substr(dp + 6))};
      op.out_types = {last_type_of(rhs)};
      cur_++;
    } else if (has("stablehlo.slice")) {
      op.kind = "slice";
      op.ins = {parse_ssa(rhs, rhs.find('%'))};
      auto nums = parse_int_list(rhs, rhs.find('['));
      if (nums.size() % 2) fail("slice bounds must be start:limit pairs");
      for (size_t i = 0; i < nums.size(); i += 2) {
        op.slice_start.push_back(nums[i]);
        op.slice_limit.push_back(nums[i + 1]);
      }
      op.out_types = out_types_of(rhs);
      cur_++;
    } else if (has("stablehlo.reshape")) {
      op.kind = "reshape";
      op.ins = {parse_ssa(rhs, rhs.find('%'))};
      op.out_types = out_types_of(rhs);
      cur_++;
    } else if (has("stablehlo.transpose")) {
      op.kind = "transpose";
      op.ins = {parse_ssa(rhs, rhs.find('%'))};
      op.dims = parse_int_list(rhs, rhs.find("dims = "));
      op.out_types = out_types_of(rhs);
      cur_++;
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
      op.out_types = types_after_arrow(rhs);
      cur_++;
    } else if (has("stablehlo.concatenate")) {
      op.kind = "concat";
      size_t d = rhs.find("dim = ");
      op.ins = parse_operand_list(rhs, 0, d);
      op.dims = {std::stoll(rhs.substr(d + 6))};
      op.out_types = out_types_of(rhs);
      cur_++;
    } else if (has("stablehlo.compare")) {
      op.kind = "compare";
      size_t cp = rhs.find("compare") + 7;
      while (cp < rhs.size() && rhs[cp] == ' ') cp++;
      size_t ce = rhs.find(',', cp);
      op.callee = rhs.substr(cp, ce - cp);  // EQ/NE/LT/LE/GT/GE
      size_t colon = rhs.find(" : ");
      op.ins = parse_operand_list(rhs, ce, colon);
      op.out_types = types_after_arrow(rhs);
      cur_++;
    } else if (has("stablehlo.select")) {
      op.kind = "select";
      size_t colon = rhs.find(" : ");
      op.ins = parse_operand_list(rhs, 0, colon);
      op.out_types = {last_type_of(rhs)};
      cur_++;
    } else if (has("stablehlo.convert")) {
      op.kind = "convert";
      op.ins = {parse_ssa(rhs, rhs.find('%'))};
      op.out_types = out_types_of(rhs);
      cur_++;
    } else if (has("stablehlo.add") || has("stablehlo.maximum") ||
               has("stablehlo.subtract") || has("stablehlo.multiply") ||
               has("stablehlo.divide") || has("stablehlo.minimum") ||
               has("stablehlo.and") || has("stablehlo.or ") ||
               has("stablehlo.or %")) {
      op.kind = has("stablehlo.add") ? "add"
                : has("stablehlo.maximum") ? "max"
                : has("stablehlo.subtract") ? "sub"
                : has("stablehlo.multiply") ? "mul"
                : has("stablehlo.divide") ? "div"
                : has("stablehlo.minimum") ? "min"
                : has("stablehlo.and") ? "and" : "or";
      size_t colon = rhs.find(" : ");
      op.ins = parse_operand_list(rhs, 0, colon);
      op.out_types = out_types_of(rhs);
      cur_++;
    } else if (has("stablehlo.not") || has("stablehlo.negate") ||
               has("stablehlo.exponential") || has("stablehlo.rsqrt") ||
               has("stablehlo.round_nearest_even") ||
               has("stablehlo.logistic") || has("stablehlo.sqrt") ||
               has("stablehlo.abs") || has("stablehlo.floor") ||
               has("stablehlo.tanh")) {
      op.kind = has("stablehlo.not") ? "not"
                : has("stablehlo.negate") ? "neg"
                : has("stablehlo.round_nearest_even") ? "round"
                : has("stablehlo.exponential") ? "exp"
                : has("stablehlo.rsqrt") ? "rsqrt"
                : has("stablehlo.logistic") ? "logistic"
                : has("stablehlo.sqrt") ? "sqrt"
                : has("stablehlo.abs") ? "abs"
                : has("stablehlo.floor") ? "floor" : "tanh";
      op.ins = {parse_ssa(rhs, rhs.find('%'))};
      op.out_types = out_types_of(rhs);
      cur_++;
    } else if (has("call @")) {
      op.kind = "call";
      size_t at = rhs.find('@');
      size_t par = rhs.find('(', at);
      op.callee = rhs.substr(at + 1, par - at - 1);
      op.ins = parse_operand_list(rhs, par, rhs.find(')', par));
      op.out_types = types_after_arrow(rhs);
      cur_++;
    } else {
      fail("unsupported op: " + t.substr(0, 160));
    }
    f.ops.push_back(std::move(op));
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
  Tensor out = make_tensor(op.out_types[0].dims, op.out_types[0].dtype);
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
  Tensor out = make_tensor(op.out_types[0].dims, op.out_types[0].dtype);
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
  Tensor out = make_tensor(op.out_types[0].dims, op.out_types[0].dtype);
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
  Tensor out = make_tensor(op.out_types[0].dims, op.out_types[0].dtype);
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
  Tensor out = make_tensor(op.out_types[0].dims, op.out_types[0].dtype);
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

Tensor eval_slice(const Op& op, const Tensor& x) {
  Tensor out = make_tensor(op.out_types[0].dims, op.out_types[0].dtype);
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
      xoff += (op.slice_start[d] + pos) * xst[d];
    }
    o[i] = xp[xoff];
  }
  return out;
}

// general stablehlo.gather (static slice_sizes)
Tensor eval_gather(const Op& op, const Tensor& operand, const Tensor& indices) {
  const auto& odims = operand.shape;
  Tensor out = make_tensor(op.out_types[0].dims, op.out_types[0].dtype);
  int orank = (int)odims.size();
  int out_rank = (int)out.shape.size();
  int64_t ivd = op.index_vector_dim;
  if (ivd < 0) ivd = (int64_t)indices.shape.size();  // implicit trailing dim
  // batch dims of the output = dims NOT in offset_dims, in order; they map
  // to the indices dims excluding ivd, in order
  std::vector<int> out_batch_dims, out_offset_dims(op.offset_dims.begin(),
                                                   op.offset_dims.end());
  {
    std::vector<bool> is_off(out_rank, false);
    for (int64_t d : op.offset_dims) is_off[d] = true;
    for (int d = 0; d < out_rank; d++)
      if (!is_off[d]) out_batch_dims.push_back(d);
  }
  std::vector<int> idx_batch_dims;
  for (int d = 0; d < (int)indices.shape.size(); d++)
    if (d != (int)ivd) idx_batch_dims.push_back(d);
  if (idx_batch_dims.size() != out_batch_dims.size())
    fail("gather batch rank mismatch");
  // operand dims that supply offset coordinates (neither collapsed nor
  // batching), in order
  std::vector<int> offset_src_dims;
  {
    std::vector<bool> skip(orank, false);
    for (int64_t d : op.collapsed_dims) skip[d] = true;
    for (int64_t d : op.operand_batching_dims) skip[d] = true;
    for (int d = 0; d < orank; d++)
      if (!skip[d]) offset_src_dims.push_back(d);
  }
  if (offset_src_dims.size() != out_offset_dims.size())
    fail("gather offset rank mismatch");

  auto ost = strides_of(out.shape);
  auto xst = strides_of(odims);
  auto ist = strides_of(indices.shape);
  const float* xp = operand.ptr();
  const float* ip = indices.ptr();
  float* o = out.ptr();
  int64_t n = out.numel();
  std::vector<int64_t> oidx(out_rank), start(orank);
  for (int64_t i = 0; i < n; i++) {
    int64_t rem = i;
    for (int d = 0; d < out_rank; d++) {
      oidx[d] = rem / ost[d];
      rem %= ost[d];
    }
    // gather start indices for this batch position
    std::fill(start.begin(), start.end(), 0);
    int64_t ibase = 0;
    for (size_t bi = 0; bi < idx_batch_dims.size(); bi++)
      ibase += oidx[out_batch_dims[bi]] * ist[idx_batch_dims[bi]];
    for (size_t k = 0; k < op.start_index_map.size(); k++) {
      int64_t ioff = ibase;
      if (ivd < (int64_t)indices.shape.size()) ioff += (int64_t)k * ist[ivd];
      int64_t d = op.start_index_map[k];
      int64_t s = (int64_t)ip[ioff];
      int64_t maxs = odims[d] - op.slice_sizes[d];
      start[d] = std::min(std::max<int64_t>(s, 0), maxs);
    }
    // batching dims: the operand batch coordinate tracks the paired
    // indices batch coordinate (implicitly collapsed, slice size 1)
    for (size_t k = 0; k < op.operand_batching_dims.size(); k++) {
      int64_t sb = op.indices_batching_dims[k];
      int64_t coord = -1;
      for (size_t bi = 0; bi < idx_batch_dims.size(); bi++)
        if (idx_batch_dims[bi] == (int)sb) coord = oidx[out_batch_dims[bi]];
      if (coord < 0) fail("gather: bad start_indices_batching_dims");
      start[op.operand_batching_dims[k]] = coord;
    }
    int64_t xoff = 0;
    for (int d = 0; d < orank; d++) xoff += start[d] * xst[d];
    for (size_t k = 0; k < offset_src_dims.size(); k++)
      xoff += oidx[out_offset_dims[k]] * xst[offset_src_dims[k]];
    o[i] = xp[xoff];
  }
  return out;
}

struct Env {
  std::map<std::string, Tensor> vars;
  Env* parent = nullptr;
  const Tensor& get(const std::string& name) const {
    auto it = vars.find(name);
    if (it != vars.end()) return it->second;
    if (parent) return parent->get(name);
    fail("undefined ssa value " + name);
  }
  void set(const std::string& name, Tensor t) { vars[name] = std::move(t); }
};

class Interp {
 public:
  explicit Interp(const Module& m) : m_(m) {}

  std::vector<Tensor> run(const std::string& fname, std::vector<Tensor> args) {
    const Func& f = m_.funcs.at(fname);
    if (args.size() != f.params.size()) fail("arg count mismatch for @" + fname);
    Env env;
    for (size_t i = 0; i < args.size(); i++) {
      int64_t want = 1;
      for (int64_t d : f.param_types[i].dims) want *= d;
      if (args[i].numel() != want) fail("arg shape mismatch for @" + fname);
      env.set(f.params[i], std::move(args[i]));
    }
    return eval_block(f.body, env);
  }

 private:
  const Module& m_;

  std::vector<Tensor> eval_block(const Block& b, Env& env) {
    for (const Op& op : b.ops) eval_op(op, env);
    std::vector<Tensor> out;
    for (const std::string& name : b.rets) out.push_back(env.get(name));
    return out;
  }

  // evaluate a region with the given parameter bindings, inheriting the
  // surrounding scope
  std::vector<Tensor> eval_region(const Block& blk, Env& outer,
                                  std::vector<Tensor> params) {
    if (params.size() != blk.params.size()) fail("region arity mismatch");
    Env env;
    env.parent = &outer;
    for (size_t i = 0; i < params.size(); i++)
      env.set(blk.params[i], std::move(params[i]));
    return eval_block(blk, env);
  }

  static Tensor scalar(float v, DType dt) {
    Tensor t = make_tensor({}, dt);
    (*t.data)[0] = v;
    return t;
  }

  void store_results(const Op& op, std::vector<Tensor> rs, Env& env) {
    if ((int)rs.size() != op.n_results) fail("result arity mismatch for " + op.kind);
    if (op.n_results == 1) {
      env.set(op.out, std::move(rs[0]));
    } else {
      for (int i = 0; i < op.n_results; i++)
        env.set(op.out + "#" + std::to_string(i), std::move(rs[i]));
    }
  }

  void eval_op(const Op& op, Env& env) {
    auto in = [&](size_t i) -> const Tensor& { return env.get(op.ins[i]); };
    auto out0 = [&]() {
      return make_tensor(op.out_types[0].dims, op.out_types[0].dtype);
    };
    Tensor r;
    if (op.kind == "constant") {
      r = op.cst;
    } else if (op.kind == "conv") {
      r = eval_conv(op, in(0), in(1));
    } else if (op.kind == "broadcast") {
      r = eval_broadcast(op, in(0));
    } else if (op.kind == "iota") {
      r = out0();
      auto ost = strides_of(r.shape);
      int64_t dim = op.dims[0];
      float* o = r.ptr();
      int64_t n = r.numel();
      for (int64_t i = 0; i < n; i++)
        o[i] = (float)((i / ost[dim]) % r.shape[dim]);
    } else if (op.kind == "add" || op.kind == "max" || op.kind == "sub" ||
               op.kind == "mul" || op.kind == "div" || op.kind == "min" ||
               op.kind == "and" || op.kind == "or") {
      const Tensor &a = in(0), &b = in(1);
      if (a.numel() != b.numel()) fail("elementwise shape mismatch");
      r = out0();
      const float* ap = a.ptr();
      const float* bp = b.ptr();
      float* o = r.ptr();
      int64_t n = r.numel();
      if (op.kind == "add")
        for (int64_t i = 0; i < n; i++) o[i] = ap[i] + bp[i];
      else if (op.kind == "max")
        for (int64_t i = 0; i < n; i++) o[i] = std::max(ap[i], bp[i]);
      else if (op.kind == "min")
        for (int64_t i = 0; i < n; i++) o[i] = std::min(ap[i], bp[i]);
      else if (op.kind == "sub")
        for (int64_t i = 0; i < n; i++) o[i] = ap[i] - bp[i];
      else if (op.kind == "mul")
        for (int64_t i = 0; i < n; i++) o[i] = ap[i] * bp[i];
      else if (op.kind == "div")
        for (int64_t i = 0; i < n; i++) o[i] = ap[i] / bp[i];
      else if (op.kind == "and")
        for (int64_t i = 0; i < n; i++) o[i] = (ap[i] != 0.f && bp[i] != 0.f) ? 1.f : 0.f;
      else
        for (int64_t i = 0; i < n; i++) o[i] = (ap[i] != 0.f || bp[i] != 0.f) ? 1.f : 0.f;
    } else if (op.kind == "not" || op.kind == "neg" || op.kind == "exp" ||
               op.kind == "rsqrt" || op.kind == "round" ||
               op.kind == "logistic" || op.kind == "sqrt" ||
               op.kind == "abs" || op.kind == "floor" || op.kind == "tanh") {
      const Tensor& a = in(0);
      r = out0();
      const float* ap = a.ptr();
      float* o = r.ptr();
      int64_t n = r.numel();
      if (op.kind == "not")
        for (int64_t i = 0; i < n; i++) o[i] = ap[i] != 0.f ? 0.f : 1.f;
      else if (op.kind == "neg")
        for (int64_t i = 0; i < n; i++) o[i] = -ap[i];
      else if (op.kind == "exp")
        for (int64_t i = 0; i < n; i++) o[i] = std::exp(ap[i]);
      else if (op.kind == "rsqrt")
        for (int64_t i = 0; i < n; i++) o[i] = 1.0f / std::sqrt(ap[i]);
      else if (op.kind == "round")
        for (int64_t i = 0; i < n; i++) o[i] = std::nearbyintf(ap[i]);
      else if (op.kind == "logistic")
        for (int64_t i = 0; i < n; i++) o[i] = 1.0f / (1.0f + std::exp(-ap[i]));
      else if (op.kind == "sqrt")
        for (int64_t i = 0; i < n; i++) o[i] = std::sqrt(ap[i]);
      else if (op.kind == "abs")
        for (int64_t i = 0; i < n; i++) o[i] = std::fabs(ap[i]);
      else if (op.kind == "floor")
        for (int64_t i = 0; i < n; i++) o[i] = std::floor(ap[i]);
      else
        for (int64_t i = 0; i < n; i++) o[i] = std::tanh(ap[i]);
    } else if (op.kind == "compare") {
      const Tensor &a = in(0), &b = in(1);
      if (a.numel() != b.numel()) fail("compare shape mismatch");
      r = out0();
      const float* ap = a.ptr();
      const float* bp = b.ptr();
      float* o = r.ptr();
      int64_t n = r.numel();
      const std::string& d = op.callee;
      for (int64_t i = 0; i < n; i++) {
        bool v;
        if (d == "EQ") v = ap[i] == bp[i];
        else if (d == "NE") v = ap[i] != bp[i];
        else if (d == "LT") v = ap[i] < bp[i];
        else if (d == "LE") v = ap[i] <= bp[i];
        else if (d == "GT") v = ap[i] > bp[i];
        else if (d == "GE") v = ap[i] >= bp[i];
        else fail("unsupported compare direction " + d);
        o[i] = v ? 1.f : 0.f;
      }
    } else if (op.kind == "select") {
      const Tensor &p = in(0), &a = in(1), &b = in(2);
      r = out0();
      const float* pp = p.ptr();
      const float* ap = a.ptr();
      const float* bp = b.ptr();
      float* o = r.ptr();
      int64_t n = r.numel();
      bool scalar_pred = p.numel() == 1 && n > 1;
      for (int64_t i = 0; i < n; i++)
        o[i] = (scalar_pred ? pp[0] : pp[i]) != 0.f ? ap[i] : bp[i];
    } else if (op.kind == "convert") {
      const Tensor& a = in(0);
      r = out0();
      const float* ap = a.ptr();
      float* o = r.ptr();
      int64_t n = r.numel();
      DType dt = op.out_types[0].dtype;
      for (int64_t i = 0; i < n; i++) {
        float v = ap[i];
        if (dt == DType::I32 || dt == DType::UI8)
          v = (float)(int64_t)v;  // toward zero
        else if (dt == DType::I1)
          v = v != 0.f ? 1.f : 0.f;
        o[i] = v;
      }
    } else if (op.kind == "reshape") {
      r.shape = op.out_types[0].dims;
      r.dtype = op.out_types[0].dtype;
      r.data = in(0).data;  // aliases — row-major identical layout
    } else if (op.kind == "transpose") {
      r = eval_transpose(op, in(0));
    } else if (op.kind == "slice") {
      r = eval_slice(op, in(0));
    } else if (op.kind == "dot") {
      r = eval_dot(op, in(0), in(1));
    } else if (op.kind == "concat") {
      std::vector<Tensor> ins;
      for (size_t i = 0; i < op.ins.size(); i++) ins.push_back(in(i));
      r = eval_concat(op, ins);
    } else if (op.kind == "gather") {
      r = eval_gather(op, in(0), in(1));
    } else if (op.kind == "topk") {
      const Tensor& a = in(0);
      int64_t row = a.shape.back();
      int64_t rows = a.numel() / row;
      int64_t k = op.topk_k;
      Tensor vals = make_tensor(op.out_types[0].dims, op.out_types[0].dtype);
      Tensor idxs = make_tensor(op.out_types[1].dims, op.out_types[1].dtype);
      const float* ap = a.ptr();
      for (int64_t rr = 0; rr < rows; rr++) {
        std::vector<int64_t> ord(row);
        std::iota(ord.begin(), ord.end(), 0);
        std::stable_sort(ord.begin(), ord.end(), [&](int64_t x, int64_t y) {
          return ap[rr * row + x] > ap[rr * row + y];
        });
        for (int64_t j = 0; j < k; j++) {
          vals.ptr()[rr * k + j] = ap[rr * row + ord[j]];
          idxs.ptr()[rr * k + j] = (float)ord[j];
        }
      }
      store_results(op, {std::move(vals), std::move(idxs)}, env);
      return;
    } else if (op.kind == "reduce") {
      // single-combiner form; op.ins = [operand, init]
      const Tensor& a = in(0);
      const Tensor& init = in(1);
      r = reduce_one(op, a, init.ptr()[0], op.callee);
    } else if (op.kind == "reduce_region") {
      eval_reduce_region(op, env);
      return;
    } else if (op.kind == "sort") {
      eval_sort(op, env);
      return;
    } else if (op.kind == "while") {
      eval_while(op, env);
      return;
    } else if (op.kind == "call") {
      std::vector<Tensor> cargs;
      for (size_t i = 0; i < op.ins.size(); i++) cargs.push_back(in(i));
      auto res = run(op.callee, std::move(cargs));
      store_results(op, std::move(res), env);
      return;
    } else {
      fail("unhandled op kind " + op.kind);
    }
    store_results(op, {std::move(r)}, env);
  }

  Tensor reduce_one(const Op& op, const Tensor& a, float init,
                    const std::string& comb) {
    Tensor out = make_tensor(op.out_types[0].dims, op.out_types[0].dtype);
    std::fill(out.ptr(), out.ptr() + out.numel(), init);
    auto ast = strides_of(a.shape);
    auto ost = strides_of(out.shape);
    std::vector<bool> reduced(a.shape.size(), false);
    for (int64_t d : op.dims) reduced[d] = true;
    const float* ap = a.ptr();
    float* o = out.ptr();
    int64_t n = a.numel();
    int rank = (int)a.shape.size();
    for (int64_t i = 0; i < n; i++) {
      int64_t rem = i, ooff = 0;
      int od = 0;
      for (int d = 0; d < rank; d++) {
        int64_t pos = rem / ast[d];
        rem %= ast[d];
        if (!reduced[d]) ooff += pos * ost[od++];
      }
      float v = ap[i], &acc = o[ooff];
      if (comb == "add") acc += v;
      else if (comb == "maximum") acc = std::max(acc, v);
      else if (comb == "minimum") acc = std::min(acc, v);
      else if (comb == "and") acc = (acc != 0.f && v != 0.f) ? 1.f : 0.f;
      else if (comb == "or") acc = (acc != 0.f || v != 0.f) ? 1.f : 0.f;
      else fail("unsupported reduce combiner " + comb);
    }
    return out;
  }

  void eval_reduce_region(const Op& op, Env& env) {
    // op.ins = [op0, init0, op1, init1, ...]; region params grouped as
    // (acc0, val0, acc1, val1, ...)
    size_t K = op.ins.size() / 2;
    std::vector<const Tensor*> operands(K);
    std::vector<float> inits(K);
    for (size_t k = 0; k < K; k++) {
      operands[k] = &env.get(op.ins[2 * k]);
      inits[k] = env.get(op.ins[2 * k + 1]).ptr()[0];
    }
    const Tensor& a = *operands[0];
    std::vector<Tensor> outs;
    for (size_t k = 0; k < K; k++)
      outs.push_back(make_tensor(op.out_types[k].dims, op.out_types[k].dtype));
    auto ast = strides_of(a.shape);
    auto ost = strides_of(outs[0].shape);
    std::vector<bool> reduced(a.shape.size(), false);
    for (int64_t d : op.dims) reduced[d] = true;
    int rank = (int)a.shape.size();
    int64_t n_out = outs[0].numel();
    // iterate output positions; scan the reduced dims sequentially so the
    // combiner applies left-to-right (order-independent combiners in our
    // exports, but keep it deterministic anyway)
    std::vector<int64_t> red_dims(op.dims.begin(), op.dims.end());
    int64_t red_total = 1;
    for (int64_t d : red_dims) red_total *= a.shape[d];
    for (int64_t oi = 0; oi < n_out; oi++) {
      // base offset in `a` for this output position
      int64_t rem = oi, abase = 0;
      int od = 0;
      for (int d = 0; d < rank; d++) {
        if (reduced[d]) continue;
        // consume output dims in order
        (void)od;
      }
      // recompute: map output idx -> non-reduced positions
      rem = oi;
      std::vector<int64_t> opos(outs[0].shape.size());
      for (size_t d = 0; d < outs[0].shape.size(); d++) {
        opos[d] = rem / ost[d];
        rem %= ost[d];
      }
      {
        int oc = 0;
        for (int d = 0; d < rank; d++)
          if (!reduced[d]) abase += opos[oc++] * ast[d];
      }
      std::vector<float> acc(inits);
      for (int64_t ri = 0; ri < red_total; ri++) {
        int64_t rrem = ri, aoff = abase;
        for (size_t rd = 0; rd < red_dims.size(); rd++) {
          int64_t span = 1;
          for (size_t rd2 = rd + 1; rd2 < red_dims.size(); rd2++)
            span *= a.shape[red_dims[rd2]];
          int64_t pos = rrem / span;
          rrem %= span;
          aoff += pos * ast[red_dims[rd]];
        }
        std::vector<Tensor> params;
        for (size_t k = 0; k < K; k++)
          params.push_back(scalar(acc[k], operands[k]->dtype));
        for (size_t k = 0; k < K; k++)
          params[k].dtype = operands[k]->dtype;
        // region params are grouped (acc_k, val_k) per operand
        std::vector<Tensor> bound;
        for (size_t k = 0; k < K; k++) {
          bound.push_back(scalar(acc[k], operands[k]->dtype));
          bound.push_back(scalar(operands[k]->ptr()[aoff], operands[k]->dtype));
        }
        auto res = eval_region(op.blocks[0], env, std::move(bound));
        if (res.size() != K) fail("reducer arity mismatch");
        for (size_t k = 0; k < K; k++) acc[k] = res[k].ptr()[0];
      }
      for (size_t k = 0; k < K; k++) outs[k].ptr()[oi] = acc[k];
    }
    store_results(op, std::move(outs), env);
  }

  void eval_sort(const Op& op, Env& env) {
    size_t K = op.ins.size();
    std::vector<const Tensor*> operands(K);
    for (size_t k = 0; k < K; k++) operands[k] = &env.get(op.ins[k]);
    const Tensor& a = *operands[0];
    int64_t dim = op.dims[0];
    auto ast = strides_of(a.shape);
    int64_t len = a.shape[dim];
    int64_t n = a.numel();
    int64_t n_lines = n / len;
    std::vector<Tensor> outs;
    for (size_t k = 0; k < K; k++)
      outs.push_back(make_tensor(op.out_types[k].dims, op.out_types[k].dtype));
    int rank = (int)a.shape.size();
    for (int64_t line = 0; line < n_lines; line++) {
      // base offset of this line (dim coordinate 0)
      int64_t rem = line, base = 0;
      for (int d = 0; d < rank; d++) {
        if (d == dim) continue;
        int64_t span = 1;
        for (int d2 = d + 1; d2 < rank; d2++)
          if (d2 != dim) span *= a.shape[d2];
        int64_t pos = rem / span;
        rem %= span;
        base += pos * ast[d];
      }
      std::vector<int64_t> ord(len);
      std::iota(ord.begin(), ord.end(), 0);
      std::stable_sort(ord.begin(), ord.end(), [&](int64_t x, int64_t y) {
        std::vector<Tensor> bound;
        for (size_t k = 0; k < K; k++) {
          bound.push_back(scalar(operands[k]->ptr()[base + x * ast[dim]],
                                 operands[k]->dtype));
          bound.push_back(scalar(operands[k]->ptr()[base + y * ast[dim]],
                                 operands[k]->dtype));
        }
        auto res = eval_region(op.blocks[0], env, std::move(bound));
        return res.at(0).ptr()[0] != 0.f;
      });
      for (size_t k = 0; k < K; k++)
        for (int64_t j = 0; j < len; j++)
          outs[k].ptr()[base + j * ast[dim]] =
              operands[k]->ptr()[base + ord[j] * ast[dim]];
    }
    store_results(op, std::move(outs), env);
  }

  void eval_while(const Op& op, Env& env) {
    std::vector<Tensor> carried;
    for (const std::string& init : op.iter_inits)
      carried.push_back(env.get(init));
    int guard = 0;
    while (true) {
      if (++guard > 1000000) fail("while: iteration guard tripped");
      auto c = eval_region(op.blocks[0], env, carried);
      if (c.size() != 1) fail("while cond must return one value");
      if (c[0].ptr()[0] == 0.f) break;
      carried = eval_region(op.blocks[1], env, std::move(carried));
      if (carried.size() != op.iter_inits.size())
        fail("while body arity mismatch");
    }
    store_results(op, std::move(carried), env);
  }
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

    Tensor input = make_tensor(main_fn.param_types[0].dims,
                               main_fn.param_types[0].dtype);
    std::ifstream inf(argv[2], std::ios::binary);
    if (!inf) fail(std::string("cannot open ") + argv[2]);
    if (input.dtype == DType::UI8) {
      std::vector<uint8_t> bytes(input.numel());
      inf.read(reinterpret_cast<char*>(bytes.data()), bytes.size());
      if (inf.gcount() != (std::streamsize)bytes.size())
        fail("input.raw too small for @main arg (" +
             std::to_string(bytes.size()) + " bytes expected)");
      for (int64_t i = 0; i < input.numel(); i++)
        input.ptr()[i] = (float)bytes[i];
    } else {
      inf.read(reinterpret_cast<char*>(input.ptr()), input.numel() * 4);
      if (inf.gcount() != (std::streamsize)(input.numel() * 4))
        fail("input.raw too small for @main arg (" +
             std::to_string(input.numel() * 4) + " bytes expected)");
    }

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
      const char* dt = outs[i].dtype == DType::F32 ? "f32"
                       : outs[i].dtype == DType::I32 ? "i32"
                       : outs[i].dtype == DType::I1 ? "i1" : "ui8";
      std::printf(" %s as f32)\n", dt);
    }
  } catch (const std::exception& e) {
    std::fprintf(stderr, "%s\n", e.what());
    return 1;
  }
  return 0;
}

#include "yf/weights.h"

#include <cstdio>
#include <stdexcept>

namespace yf {

namespace {

void read_exact(FILE* f, void* dst, size_t n) {
  if (fread(dst, 1, n, f) != n) throw std::runtime_error("yfb: truncated file");
}

uint32_t read_u32(FILE* f) {
  uint32_t v;
  read_exact(f, &v, 4);
  return v;  // file and all supported hosts are little-endian
}

uint64_t read_u64(FILE* f) {
  uint64_t v;
  read_exact(f, &v, 8);
  return v;
}

}  // namespace

Weights load_weights(const std::string& path) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) throw std::runtime_error("yfb: cannot open " + path);
  Weights out;
  try {
    char magic[4];
    read_exact(f, magic, 4);
    if (std::string(magic, 4) != "YFWB") throw std::runtime_error("yfb: bad magic");
    uint32_t version = read_u32(f);
    if (version != 1) throw std::runtime_error("yfb: unsupported version");
    uint32_t n = read_u32(f);
    // Header sanity bounds: a corrupt/adversarial file must fail with a
    // clean exception BEFORE any large allocation (an unbounded
    // zero-filling resize can OOM-kill the process rather than throw).
    // The real model has ~300 entries, names < 40 chars, 4-D tensors.
    if (n > 100000) throw std::runtime_error("yfb: implausible entry count");
    for (uint32_t i = 0; i < n; ++i) {
      uint32_t name_len = read_u32(f);
      if (name_len > 4096) throw std::runtime_error("yfb: implausible name length");
      std::string name(name_len, '\0');
      read_exact(f, name.data(), name_len);
      uint32_t dtype = read_u32(f);
      uint32_t ndim = read_u32(f);
      if (ndim > 8) throw std::runtime_error("yfb: implausible rank");
      NamedTensor t;
      t.shape.resize(ndim);
      uint64_t elems = 1;
      for (uint32_t d = 0; d < ndim; ++d) {
        t.shape[d] = read_u32(f);
        elems *= (uint64_t)t.shape[d];
        // 2^26 elems = 256 MB f32 — ~1000x the real model's largest tensor,
        // but small enough that the zero-filling resize below cannot OOM the
        // host before read_exact catches the (inevitably) truncated payload.
        if (elems > (1ull << 26)) throw std::runtime_error("yfb: implausible shape");
      }
      uint64_t nbytes = read_u64(f);
      if (dtype == 0) {
        // 0-D scalars (act_scale entries) have ndim 0, elems 1.
        if (nbytes != 4 * elems || nbytes % 4 != 0)
          throw std::runtime_error("yfb: f32 payload size disagrees with shape");
        t.is_f32 = true;
        t.f32.resize(nbytes / 4);
        read_exact(f, t.f32.data(), nbytes);
      } else if (dtype == 1) {
        if (nbytes != elems)
          throw std::runtime_error("yfb: int8 payload size disagrees with shape");
        t.is_f32 = false;
        t.i8.resize(nbytes);
        read_exact(f, t.i8.data(), nbytes);
      } else {
        throw std::runtime_error("yfb: unknown dtype");
      }
      out.emplace(std::move(name), std::move(t));
    }
  } catch (...) {
    fclose(f);
    throw;
  }
  fclose(f);
  return out;
}

RunMeta read_run_meta(const Weights& w) {
  RunMeta m;
  const auto a = w.find("__meta__/anchors");
  if (a == w.end()) return m;  // weights-only file
  const NamedTensor& an = a->second;
  if (an.shape.size() != 3 || an.shape[2] != 2 || !an.is_f32 ||
      an.shape[0] == 0 || an.shape[1] == 0)
    throw std::runtime_error("yfb meta: anchors must be f32 (scales, A, 2)");
  m.present = true;
  m.num_scales = (int)an.shape[0];
  m.num_anchors = (int)an.shape[1];
  m.anchors = an.f32;
  const auto cn = w.find("__meta__/conf_nms");
  if (cn != w.end()) {
    if (cn->second.f32.size() != 2)
      throw std::runtime_error("yfb meta: conf_nms must hold 2 floats");
    m.conf_thre = cn->second.f32[0];
    m.nms_thre = cn->second.f32[1];
  }
  const auto hw = w.find("__meta__/input_hw");
  if (hw != w.end()) {
    if (hw->second.f32.size() != 2)
      throw std::runtime_error("yfb meta: input_hw must hold 2 floats");
    m.input_h = (int)hw->second.f32[0];
    m.input_w = (int)hw->second.f32[1];
  }
  const auto names = w.find("__meta__/class_names");
  if (names != w.end()) {
    std::string joined(names->second.i8.begin(), names->second.i8.end());
    size_t start = 0;
    while (start <= joined.size()) {
      size_t nl = joined.find('\n', start);
      if (nl == std::string::npos) {
        m.class_names.push_back(joined.substr(start));
        break;
      }
      m.class_names.push_back(joined.substr(start, nl - start));
      start = nl + 1;
    }
  }
  return m;
}

}  // namespace yf

// Native data-path kernels for the host-side loader.
//
// The reference's data pipeline decodes PLY meshes with a per-element Python
// loop it itself flags as very slow (reference: data/ava_dataset.py:280-282)
// and resizes camera frames in PIL. On a TPU host every loader core counts:
// this library provides the two hot host-side ops as C++:
//
//   ava_parse_ply_f32   — header-aware binary/ASCII PLY vertex parse
//   ava_resize_bilinear — uint8 HWC bilinear resize (half-pixel centers)
//   ava_normalize_hwc   — fused (x - mean) / std for float32 HWC images
//
// Exposed with plain C linkage and driven from Python via ctypes
// (ava256_tpu/native/__init__.py); a pure-numpy fallback keeps the loader
// working when the library is not built.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <string>
#include <vector>

extern "C" {

// Parse the vertex element of a PLY file. Returns number of vertices parsed
// (0 on failure). out must hold max_verts * n_props floats; n_props_out
// receives the property count.
int64_t ava_parse_ply_f32(const uint8_t* data, int64_t size, float* out,
                          int64_t max_verts, int32_t* n_props_out) {
  const std::string header_end = "end_header\n";
  std::string head(reinterpret_cast<const char*>(data),
                   static_cast<size_t>(size > 65536 ? 65536 : size));
  size_t he = head.find(header_end);
  if (he == std::string::npos) return 0;
  size_t body = he + header_end.size();

  bool binary_le = head.find("format binary_little_endian") != std::string::npos;
  bool ascii = head.find("format ascii") != std::string::npos;
  if (!binary_le && !ascii) return 0;  // big-endian unsupported

  // vertex count + properties (must precede any other element)
  int64_t nverts = -1;
  int props = 0;
  size_t pos = 0;
  bool in_vertex = false;
  int prop_bytes = 0;
  while (pos < he) {
    size_t eol = head.find('\n', pos);
    if (eol == std::string::npos || eol > he) eol = he;
    std::string line = head.substr(pos, eol - pos);
    pos = eol + 1;
    if (line.rfind("element vertex ", 0) == 0) {
      nverts = std::atoll(line.c_str() + 15);
      in_vertex = true;
    } else if (line.rfind("element ", 0) == 0) {
      in_vertex = false;
    } else if (in_vertex && line.rfind("property ", 0) == 0) {
      if (line.find("property float") == 0 || line.find("property float32") == 0) {
        props++;
        prop_bytes += 4;
      } else if (line.find("property double") == 0 ||
                 line.find("property float64") == 0) {
        props++;
        prop_bytes += 8;
      } else {
        return 0;  // non-float vertex properties unsupported
      }
    }
  }
  if (nverts <= 0 || props == 0 || nverts > max_verts) return 0;
  *n_props_out = props;

  if (binary_le) {
    bool all_f32 = prop_bytes == props * 4;
    if (static_cast<int64_t>(body) + nverts * prop_bytes > size) return 0;
    const uint8_t* p = data + body;
    if (all_f32) {
      std::memcpy(out, p, static_cast<size_t>(nverts) * props * 4);
    } else {
      // mixed float/double: walk per value (rare)
      for (int64_t v = 0; v < nverts; ++v)
        for (int c = 0; c < props; ++c) {
          float val;
          std::memcpy(&val, p, 4);  // assumes f32 here; doubles unsupported mix
          out[v * props + c] = val;
          p += 4;
        }
    }
    return nverts;
  }

  // ASCII
  const char* p = reinterpret_cast<const char*>(data) + body;
  const char* end = reinterpret_cast<const char*>(data) + size;
  for (int64_t v = 0; v < nverts; ++v) {
    for (int c = 0; c < props; ++c) {
      char* next = nullptr;
      out[v * props + c] = strtof(p, &next);
      if (next == p) return 0;
      p = next;
      if (p >= end) return (c == props - 1 && v == nverts - 1) ? nverts : 0;
    }
  }
  return nverts;
}

// Bilinear resize, half-pixel centers, uint8 HWC.
void ava_resize_bilinear_u8(const uint8_t* src, int64_t sh, int64_t sw,
                            int64_t ch, uint8_t* dst, int64_t dh, int64_t dw) {
  const float scale_y = static_cast<float>(sh) / dh;
  const float scale_x = static_cast<float>(sw) / dw;
  std::vector<int64_t> x0s(dw), x1s(dw);
  std::vector<float> wxs(dw);
  for (int64_t x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * scale_x - 0.5f;
    float floor_fx = std::floor(fx);
    int64_t x0 = static_cast<int64_t>(floor_fx);
    wxs[x] = fx - floor_fx;
    x0s[x] = x0 < 0 ? 0 : (x0 > sw - 1 ? sw - 1 : x0);
    int64_t x1 = x0 + 1;
    x1s[x] = x1 < 0 ? 0 : (x1 > sw - 1 ? sw - 1 : x1);
  }
  for (int64_t y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * scale_y - 0.5f;
    float floor_fy = std::floor(fy);
    int64_t y0 = static_cast<int64_t>(floor_fy);
    float wy = fy - floor_fy;
    y0 = y0 < 0 ? 0 : (y0 > sh - 1 ? sh - 1 : y0);
    int64_t y1 = y0 + 1;
    y1 = y1 < 0 ? 0 : (y1 > sh - 1 ? sh - 1 : y1);
    const uint8_t* r0 = src + y0 * sw * ch;
    const uint8_t* r1 = src + y1 * sw * ch;
    uint8_t* drow = dst + y * dw * ch;
    for (int64_t x = 0; x < dw; ++x) {
      const float wx = wxs[x];
      const uint8_t* p00 = r0 + x0s[x] * ch;
      const uint8_t* p01 = r0 + x1s[x] * ch;
      const uint8_t* p10 = r1 + x0s[x] * ch;
      const uint8_t* p11 = r1 + x1s[x] * ch;
      for (int64_t c = 0; c < ch; ++c) {
        float top = p00[c] + (p01[c] - p00[c]) * wx;
        float bot = p10[c] + (p11[c] - p10[c]) * wx;
        float v = top + (bot - top) * wy;
        drow[x * ch + c] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// out = (x - mean) / std, all float32 HWC with per-pixel mean map.
void ava_normalize_hwc(const float* x, const float* mean, float inv_std,
                       float* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) out[i] = (x[i] - mean[i]) * inv_std;
}

}  // extern "C"

// Native data-loader core for the PSRFITS-subset reader/writer.
//
// This is the framework's equivalent of the reference's native archive
// boundary (PSRCHIVE/cfitsio, SURVEY.md section 2): the byte-level work
// of FITS binary tables — column deinterleave + big-endian swap on read,
// row interleave on write, and 16-bit dequantize/quantize with
// per-(subint,pol,chan) scales — done in multithreaded C++ instead of
// NumPy temporaries.  Exposed with a plain C ABI for ctypes
// (io/native.py); io/fits.py falls back to pure NumPy when the shared
// library is absent.
//
// Build: make -C native   (produces libppio.so)

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

inline uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
inline uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }
inline uint64_t bswap64(uint64_t v) { return __builtin_bswap64(v); }

// Run fn(lo, hi) over [0, n) split across hardware threads.
template <typename F>
void parallel_for(int64_t n, F fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t nthread = std::max<int64_t>(1, std::min<int64_t>(hw, n));
  if (nthread == 1 || n < (1 << 14)) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + nthread - 1) / nthread;
  for (int64_t t = 0; t < nthread; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=] { fn(lo, hi); });
  }
  for (auto &th : threads) th.join();
}

}  // namespace

extern "C" {

// Extract one column (nbytes wide at col_off in each row) from an
// interleaved row buffer, byteswapping elem_size-byte big-endian elements
// to native little-endian.  dst is (nrow * nbytes) contiguous.
void pp_col_extract(const uint8_t *rows, int64_t nrow, int64_t row_bytes,
                    int64_t col_off, int64_t nbytes, int elem_size,
                    uint8_t *dst) {
  parallel_for(nrow, [=](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      const uint8_t *src = rows + r * row_bytes + col_off;
      uint8_t *out = dst + r * nbytes;
      switch (elem_size) {
        case 2: {
          const uint16_t *s = reinterpret_cast<const uint16_t *>(src);
          uint16_t *o = reinterpret_cast<uint16_t *>(out);
          for (int64_t i = 0; i < nbytes / 2; ++i) o[i] = bswap16(s[i]);
          break;
        }
        case 4: {
          const uint32_t *s = reinterpret_cast<const uint32_t *>(src);
          uint32_t *o = reinterpret_cast<uint32_t *>(out);
          for (int64_t i = 0; i < nbytes / 4; ++i) o[i] = bswap32(s[i]);
          break;
        }
        case 8: {
          const uint64_t *s = reinterpret_cast<const uint64_t *>(src);
          uint64_t *o = reinterpret_cast<uint64_t *>(out);
          for (int64_t i = 0; i < nbytes / 8; ++i) o[i] = bswap64(s[i]);
          break;
        }
        default:
          std::memcpy(out, src, nbytes);
      }
    }
  });
}

// Scatter one column into an interleaved row buffer, byteswapping
// native little-endian elements to big-endian FITS order.
void pp_col_insert(const uint8_t *src, int64_t nrow, int64_t row_bytes,
                   int64_t col_off, int64_t nbytes, int elem_size,
                   uint8_t *rows) {
  parallel_for(nrow, [=](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      const uint8_t *in = src + r * nbytes;
      uint8_t *out = rows + r * row_bytes + col_off;
      switch (elem_size) {
        case 2: {
          const uint16_t *s = reinterpret_cast<const uint16_t *>(in);
          uint16_t *o = reinterpret_cast<uint16_t *>(out);
          for (int64_t i = 0; i < nbytes / 2; ++i) o[i] = bswap16(s[i]);
          break;
        }
        case 4: {
          const uint32_t *s = reinterpret_cast<const uint32_t *>(in);
          uint32_t *o = reinterpret_cast<uint32_t *>(out);
          for (int64_t i = 0; i < nbytes / 4; ++i) o[i] = bswap32(s[i]);
          break;
        }
        case 8: {
          const uint64_t *s = reinterpret_cast<const uint64_t *>(in);
          uint64_t *o = reinterpret_cast<uint64_t *>(out);
          for (int64_t i = 0; i < nbytes / 8; ++i) o[i] = bswap64(s[i]);
          break;
        }
        default:
          std::memcpy(out, in, nbytes);
      }
    }
  });
}

// value = scl[c] * raw[c, b] + offs[c] over nprof profiles of nbin bins
// (nprof = nsub*npol*nchan flattened; scl/offs per profile).
void pp_dequantize_i2(const int16_t *raw, const float *scl,
                      const float *offs, int64_t nprof, int64_t nbin,
                      float *out) {
  parallel_for(nprof, [=](int64_t lo, int64_t hi) {
    for (int64_t p = lo; p < hi; ++p) {
      const float s = scl[p], o = offs[p];
      const int16_t *r = raw + p * nbin;
      float *dst = out + p * nbin;
      for (int64_t b = 0; b < nbin; ++b)
        dst[b] = s * static_cast<float>(r[b]) + o;
    }
  });
}

// Per-profile min/max quantization to int16 (PSRFITS DAT_SCL/DAT_OFFS
// semantics): raw = round((value - offs)/scl), scl = span/65534,
// offs = (min+max)/2.  Constant profiles get scl=1.
void pp_quantize_i2(const float *data, int64_t nprof, int64_t nbin,
                    int16_t *raw, float *scl, float *offs) {
  parallel_for(nprof, [=](int64_t lo, int64_t hi) {
    for (int64_t p = lo; p < hi; ++p) {
      const float *src = data + p * nbin;
      float mn = src[0], mx = src[0];
      for (int64_t b = 1; b < nbin; ++b) {
        mn = std::min(mn, src[b]);
        mx = std::max(mx, src[b]);
      }
      float span = mx - mn;
      float s = span > 0.0f ? span / 65534.0f : 1.0f;
      float o = 0.5f * (mn + mx);
      scl[p] = s;
      offs[p] = o;
      int16_t *dst = raw + p * nbin;
      const float inv = 1.0f / s;
      for (int64_t b = 0; b < nbin; ++b) {
        float v = (src[b] - o) * inv;
        dst[b] = static_cast<int16_t>(v >= 0.0f ? v + 0.5f : v - 0.5f);
      }
    }
  });
}

}  // extern "C"

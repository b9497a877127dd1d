// Native .sens codec hot path.
//
// The reference's sensor-data container (FriedLiver/Source/sensorData/
// sensorData.h [H]) stores per-frame depth compressed with zlib or with the
// RVL codec ("occi_ushort") and color as JPEG. Decode is the one CPU-bound
// stage of the offline replayer (SURVEY.md §7 "Native-parity rule"), so the
// inner loops live here; Python falls back to a pure-numpy path when this
// library isn't built.
//
// Build: g++ -O3 -shared -fPIC -o libsensio.so sensio.cpp -lz
//
// RVL: Wilson, "Fast Lossless Depth Image Compression" (2017): alternating
// zero-run / nonzero-run lengths and zigzagged deltas, variable-length coded
// in 3-bit nibbles with a continuation bit.

#include <cstdint>
#include <cstring>
#include <zlib.h>

namespace {

struct VLEWriter {
  uint32_t* buf;
  uint32_t word = 0;
  int bits = 0;  // bits used in `word`
  size_t nwords = 0;

  void put(uint32_t value) {
    do {
      uint32_t nibble = value & 0x7u;
      value >>= 3;
      if (value) nibble |= 0x8u;  // continuation
      word |= nibble << bits;
      bits += 4;
      if (bits == 32) {
        buf[nwords++] = word;
        word = 0;
        bits = 0;
      }
    } while (value);
  }

  size_t flush() {
    if (bits) {
      buf[nwords++] = word;
      word = 0;
      bits = 0;
    }
    return nwords;
  }
};

struct VLEReader {
  const uint32_t* buf;
  uint32_t word = 0;
  int bits = 0;
  size_t pos = 0;

  uint32_t get() {
    uint32_t value = 0;
    int shift = 0;
    uint32_t nibble;
    do {
      if (bits < 4) {
        word |= (uint64_t)buf[pos++] << bits;
        bits += 32;
      }
      nibble = word & 0xFu;
      word >>= 4;
      bits -= 4;
      value |= (nibble & 0x7u) << shift;
      shift += 3;
    } while (nibble & 0x8u);
    return value;
  }
};

}  // namespace

extern "C" {

// Encode `npix` uint16 depth values. `out` must hold >= npix*3 bytes.
// Returns the encoded byte count.
long rvl_encode(const uint16_t* depth, long npix, uint8_t* out) {
  VLEWriter w{reinterpret_cast<uint32_t*>(out)};
  long i = 0;
  int prev = 0;
  while (i < npix) {
    long zeros = 0;
    while (i < npix && depth[i] == 0) {
      ++zeros;
      ++i;
    }
    w.put(static_cast<uint32_t>(zeros));
    long start = i;
    while (i < npix && depth[i] != 0) ++i;
    w.put(static_cast<uint32_t>(i - start));
    for (long j = start; j < i; ++j) {
      int delta = static_cast<int>(depth[j]) - prev;
      prev = depth[j];
      uint32_t zig = (delta << 1) ^ (delta >> 31);  // zigzag
      w.put(zig);
    }
  }
  return static_cast<long>(w.flush() * sizeof(uint32_t));
}

// Decode into `out` (npix uint16s). Returns npix on success, -1 on overrun.
long rvl_decode(const uint8_t* data, long nbytes, uint16_t* out, long npix) {
  VLEReader r{reinterpret_cast<const uint32_t*>(data)};
  const size_t max_words = (nbytes + 3) / 4;
  long i = 0;
  int current = 0;
  while (i < npix) {
    if (r.pos > max_words) return -1;
    uint32_t zeros = r.get();
    if (zeros > static_cast<uint32_t>(npix - i)) return -1;
    std::memset(out + i, 0, zeros * sizeof(uint16_t));
    i += zeros;
    if (i >= npix) break;
    uint32_t nonzeros = r.get();
    if (nonzeros > static_cast<uint32_t>(npix - i)) return -1;
    for (uint32_t k = 0; k < nonzeros; ++k) {
      uint32_t zig = r.get();
      int delta = static_cast<int>(zig >> 1) ^ -static_cast<int>(zig & 1);
      current += delta;
      out[i++] = static_cast<uint16_t>(current);
    }
  }
  return i;
}

// zlib inflate with a known output size. Returns bytes written or -1.
long zlib_inflate(const uint8_t* data, long nbytes, uint8_t* out, long out_cap) {
  uLongf dst_len = static_cast<uLongf>(out_cap);
  int rc = uncompress(out, &dst_len, data, static_cast<uLong>(nbytes));
  if (rc != Z_OK) return -1;
  return static_cast<long>(dst_len);
}

// zlib deflate. Returns compressed size or -1. out must hold compressBound.
long zlib_deflate(const uint8_t* data, long nbytes, uint8_t* out, long out_cap,
                  int level) {
  uLongf dst_len = static_cast<uLongf>(out_cap);
  int rc = compress2(out, &dst_len, data, static_cast<uLong>(nbytes), level);
  if (rc != Z_OK) return -1;
  return static_cast<long>(dst_len);
}

// Batched depth-short -> meters conversion (the replayer's unpack loop).
void depth_to_meters(const uint16_t* depth, long npix, float inv_shift,
                     float* out) {
  for (long i = 0; i < npix; ++i) out[i] = depth[i] * inv_shift;
}

}  // extern "C"

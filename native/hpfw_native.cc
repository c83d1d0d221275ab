// hpfw_tpu native runtime: WAV decode, resampling, and a threaded CPU
// Hamming matcher.
//
// The reference library is C++ end to end (SURVEY.md §2.1); in this rebuild
// the TPU owns the compute path (JAX/XLA/Pallas) and this library owns the
// host-side runtime the way the reference's native code does:
//   - audio decode + resample (the data loader feeding the TPU),
//   - the CPU matcher used by BASELINE config 1 ("match ... on CPU") and as
//     a host-side fallback, scanning offsets with XOR + POPCNT across a
//     std::thread pool over tracks (the reference's batch-driver analog,
//     SURVEY.md §2.1 row 8).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment);
// every function has a NumPy twin that tests assert bit-identical behavior
// (tests/test_native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Audio decode: WAV (PCM 8/16/24/32, float32/64, mu-law, A-law, extensible)
// and AIFF/AIFF-C (big-endian PCM, 'NONE'/'sowt'), any channel count -> mono
// float32. Returns 0 on success. On success *out_n / *out_rate are set and
// the caller passes a buffer of capacity *out_n (two-call protocol: first
// call with out=nullptr fills sizes only).
// ---------------------------------------------------------------------------
static const float* mulaw_table() {
  static float t[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) {
      uint8_t u = (uint8_t)~i;
      int exp = (u >> 4) & 7, mant = u & 0xF;
      int32_t mag = (((mant << 3) + 0x84) << exp) - 0x84;
      t[i] = (float)((u & 0x80) ? -mag : mag) / 32768.0f;
    }
    init = true;
  }
  return t;
}

static const float* alaw_table() {
  static float t[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) {
      uint8_t a = (uint8_t)(i ^ 0x55);
      int exp = (a >> 4) & 7, mant = a & 0xF;
      int32_t mag = exp == 0 ? (mant << 4) + 8 : ((mant << 4) + 0x108) << (exp - 1);
      t[i] = (float)((a & 0x80) ? -mag : mag) / 32768.0f;
    }
    init = true;
  }
  return t;
}

static uint32_t rd_be32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | p[3];
}

static double decode_f80(const uint8_t* p) {  // AIFF sample-rate field
  int e = ((p[0] & 0x7F) << 8) | p[1];
  uint64_t mant = 0;
  for (int i = 0; i < 8; ++i) mant = (mant << 8) | p[2 + i];
  if (e == 0 && mant == 0) return 0.0;
  double v = (double)mant * pow(2.0, e - 16383 - 63);
  return (p[0] & 0x80) ? -v : v;
}

static int aiff_decode(const uint8_t* data, int64_t size,
                       float* out, int64_t* out_n, int32_t* out_rate) {
  if (size < 12 || memcmp(data + 8, "AIF", 3) != 0) return -1;
  int64_t pos = 12;
  int n_ch = 0, bits = 0;
  int32_t rate = 0;
  bool little = false;  // 'sowt' AIFF-C
  const uint8_t* raw = nullptr;
  int64_t raw_size = 0;
  while (pos + 8 <= size) {
    const uint8_t* cid = data + pos;
    uint32_t csize = rd_be32(data + pos + 4);
    const uint8_t* body = data + pos + 8;
    if (pos + 8 + (int64_t)csize > size) return -2;
    if (memcmp(cid, "COMM", 4) == 0 && csize >= 18) {
      n_ch = (int16_t)((body[0] << 8) | body[1]);
      bits = (int16_t)((body[6] << 8) | body[7]);
      rate = (int32_t)(decode_f80(body + 8) + 0.5);
      if (csize >= 22) {
        if (memcmp(body + 18, "sowt", 4) == 0) little = true;
        else if (memcmp(body + 18, "NONE", 4) != 0) return -4;
      }
    } else if (memcmp(cid, "SSND", 4) == 0 && csize >= 8) {
      uint32_t off = rd_be32(body);
      raw = body + 8 + off;
      raw_size = csize - 8 - off;
    }
    pos += 8 + csize + (csize & 1);
  }
  if (!raw || n_ch <= 0 || rate <= 0) return -3;
  int64_t bytes_per = bits / 8;
  if (bytes_per <= 0) return -4;
  int64_t frames = raw_size / (bytes_per * n_ch);
  *out_n = frames;
  *out_rate = rate;
  if (!out) return 0;
  for (int64_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < n_ch; ++c) {
      const uint8_t* p = raw + (i * n_ch + c) * bytes_per;
      double v = 0.0;
      if (bits == 16) {
        int16_t s = little ? (int16_t)(p[0] | (p[1] << 8))
                           : (int16_t)((p[0] << 8) | p[1]);
        v = s / 32768.0;
      } else if (bits == 8) {
        v = (int8_t)p[0] / 128.0;
      } else if (bits == 24) {
        int32_t s = little ? (int32_t)(p[0] | (p[1] << 8) | ((int8_t)p[2] << 16))
                           : (int32_t)(p[2] | (p[1] << 8) | ((int8_t)p[0] << 16));
        v = s / 8388608.0;
      } else if (bits == 32) {
        uint32_t u = little ? (uint32_t)(p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24))
                            : rd_be32(p);
        v = (int32_t)u / 2147483648.0;
      } else return -4;
      acc += v;
    }
    out[i] = (float)(acc / n_ch);
  }
  return 0;
}

int hpfw_wav_decode(const uint8_t* data, int64_t size,
                    float* out, int64_t* out_n, int32_t* out_rate) {
  if (size >= 12 && memcmp(data, "FORM", 4) == 0)
    return aiff_decode(data, size, out, out_n, out_rate);
  if (size < 12 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return -1;
  int64_t pos = 12;
  int audio_format = 0, n_ch = 0, bits = 0;
  int32_t rate = 0;
  const uint8_t* raw = nullptr;
  int64_t raw_size = 0;
  while (pos + 8 <= size) {
    const uint8_t* cid = data + pos;
    uint32_t csize;
    memcpy(&csize, data + pos + 4, 4);
    const uint8_t* body = data + pos + 8;
    if (pos + 8 + csize > size) return -2;
    if (memcmp(cid, "fmt ", 4) == 0 && csize >= 16) {
      uint16_t fmt16, ch16, bits16;
      memcpy(&fmt16, body, 2);
      memcpy(&ch16, body + 2, 2);
      memcpy(&rate, body + 4, 4);
      memcpy(&bits16, body + 14, 2);
      audio_format = fmt16;
      n_ch = ch16;
      bits = bits16;
      if (audio_format == 0xFFFE) {
        // WAVE_FORMAT_EXTENSIBLE: real format code = first uint16 of the
        // SubFormat GUID at fmt-body offset 24.
        if (csize < 26) return -5;
        uint16_t sub16;
        memcpy(&sub16, body + 24, 2);
        audio_format = sub16;
      }
    } else if (memcmp(cid, "data", 4) == 0) {
      raw = body;
      raw_size = csize;
    }
    pos += 8 + csize + (csize & 1);
  }
  if (!raw || n_ch <= 0 || rate <= 0) return -3;

  int64_t bytes_per = bits / 8;
  int64_t n_frames_total = raw_size / (bytes_per * n_ch);
  *out_n = n_frames_total;
  *out_rate = rate;
  if (!out) return 0;

  for (int64_t i = 0; i < n_frames_total; ++i) {
    double acc = 0.0;
    for (int c = 0; c < n_ch; ++c) {
      const uint8_t* p = raw + (i * n_ch + c) * bytes_per;
      double v = 0.0;
      if (audio_format == 1) {  // integer PCM
        if (bits == 16) {
          int16_t s; memcpy(&s, p, 2); v = s / 32768.0;
        } else if (bits == 32) {
          int32_t s; memcpy(&s, p, 4); v = s / 2147483648.0;
        } else if (bits == 24) {
          int32_t s = (int32_t)(p[0] | (p[1] << 8) | ((int8_t)p[2] << 16));
          v = s / 8388608.0;
        } else if (bits == 8) {
          v = ((int)p[0] - 128) / 128.0;
        } else return -4;
      } else if (audio_format == 3) {  // IEEE float
        if (bits == 32) { float f; memcpy(&f, p, 4); v = f; }
        else if (bits == 64) { double d; memcpy(&d, p, 8); v = d; }
        else return -4;
      } else if (audio_format == 6) {  // G.711 A-law
        v = alaw_table()[p[0]];
      } else if (audio_format == 7) {  // G.711 mu-law
        v = mulaw_table()[p[0]];
      } else return -4;
      acc += v;
    }
    out[i] = (float)(acc / n_ch);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// FLAC decode. Mirrors hpfw_tpu/io/flac.py (the NumPy twin is the oracle;
// tests/test_flac.py asserts bit-identical float output): STREAMINFO, frame
// headers with CRC-8, CONSTANT/VERBATIM/FIXED/LPC subframes, Rice + Rice2
// partitions with escapes, wasted bits, all four channel assignments, frame
// CRC-16. Same two-call protocol as hpfw_wav_decode.
// ---------------------------------------------------------------------------
namespace flac {

// 64-bit-cached MSB-first bit reader: reads refill a word cache, unary
// codes consume whole cached runs via clz — ~20x faster than per-bit reads
// (FLAC ingestion feeds the TPU extraction pipeline; the reader is the
// decoder's hot loop).
struct BitR {
  const uint8_t* d;
  int64_t size;     // bytes
  int64_t bytepos;  // next byte to cache
  uint64_t cache;   // low nbits_c bits are unread, MSB-first
  int nbits_c;
};

static inline int64_t bit_pos(const BitR* b) {
  return b->bytepos * 8 - b->nbits_c;
}

static inline int fill(BitR* b, int need) {
  while (b->nbits_c < need) {
    if (b->bytepos >= b->size) return -1;
    b->cache = (b->cache << 8) | b->d[b->bytepos++];
    b->nbits_c += 8;
  }
  return 0;
}

static inline int rd(BitR* b, int n, uint32_t* out) {  // n <= 32
  if (n == 0) { *out = 0; return 0; }
  if (fill(b, n)) return -1;
  b->nbits_c -= n;
  *out = (uint32_t)((b->cache >> b->nbits_c) & ((1ull << n) - 1));
  return 0;
}

static inline int rd64(BitR* b, int n, uint64_t* out) {  // n <= 57
  if (n == 0) { *out = 0; return 0; }
  if (fill(b, n)) return -1;
  b->nbits_c -= n;
  *out = (b->cache >> b->nbits_c) & ((1ull << n) - 1);
  return 0;
}

// Signed reads must handle n up to bps+1 = 33 bits: stereo-decorrelated
// side channels of 32-bit streams carry 33-bit warmup/CONSTANT/VERBATIM
// samples, which a uint32-truncating read would corrupt.
static inline int rds(BitR* b, int n, int64_t* out) {  // signed, 1 <= n <= 57
  uint64_t v;
  if (rd64(b, n, &v)) return -1;
  int64_t s = (int64_t)v;
  if (v & (1ull << (n - 1))) s -= (1ll << n);
  *out = s;
  return 0;
}

static inline int rd_unary(BitR* b, uint32_t* q) {
  uint32_t total = 0;
  for (;;) {
    if (b->nbits_c == 0 && fill(b, 1)) return -1;
    uint64_t mask = b->nbits_c >= 64 ? b->cache
                                     : b->cache & ((1ull << b->nbits_c) - 1);
    if (mask == 0) {                 // all cached bits are zeros: consume
      total += (uint32_t)b->nbits_c;
      b->nbits_c = 0;
      continue;
    }
    int top = 63 - __builtin_clzll(mask);   // highest set bit
    total += (uint32_t)(b->nbits_c - 1 - top);
    b->nbits_c = top;                // consume the zeros AND the one-bit
    *q = total;
    return 0;
  }
}

static inline void align_byte(BitR* b) {
  b->nbits_c -= b->nbits_c & 7;
}

static uint8_t crc8(const uint8_t* d, int64_t n) {
  uint8_t c = 0;
  for (int64_t i = 0; i < n; ++i) {
    c ^= d[i];
    for (int k = 0; k < 8; ++k) c = (c & 0x80) ? (uint8_t)((c << 1) ^ 0x07) : (uint8_t)(c << 1);
  }
  return c;
}

static uint16_t crc16(const uint8_t* d, int64_t n) {
  uint16_t c = 0;
  for (int64_t i = 0; i < n; ++i) {
    c ^= (uint16_t)(d[i] << 8);
    for (int k = 0; k < 8; ++k)
      c = (c & 0x8000) ? (uint16_t)((c << 1) ^ 0x8005) : (uint16_t)(c << 1);
  }
  return c;
}

static int utf8_num(BitR* b, uint64_t* out) {
  uint32_t b0;
  if (rd(b, 8, &b0)) return -1;
  if (b0 < 0x80) { *out = b0; return 0; }
  int n_extra = 0;
  for (uint32_t mask = 0x40; b0 & mask; mask >>= 1) ++n_extra;
  if (n_extra == 0 || n_extra > 6) return -1;
  uint64_t v = b0 & ((0x40u >> n_extra) - 1);
  for (int i = 0; i < n_extra; ++i) {
    uint32_t bb;
    if (rd(b, 8, &bb) || (bb & 0xC0) != 0x80) return -1;
    v = (v << 6) | (bb & 0x3F);
  }
  *out = v;
  return 0;
}

static int residual(BitR* b, int blocksize, int order, int64_t* res) {
  uint32_t method, porder;
  if (rd(b, 2, &method) || method > 1) return -1;
  int pbits = method == 0 ? 4 : 5;
  uint32_t escape = (1u << pbits) - 1;
  if (rd(b, 4, &porder)) return -1;
  int n_part = 1 << porder;
  if (blocksize % n_part) return -1;
  int64_t filled = 0;
  for (int p = 0; p < n_part; ++p) {
    int count = blocksize >> porder;
    if (p == 0) count -= order;
    if (count < 0) return -1;
    uint32_t param;
    if (rd(b, pbits, &param)) return -1;
    if (param == escape) {
      uint32_t raw_bits;
      if (rd(b, 5, &raw_bits)) return -1;
      for (int k = 0; k < count; ++k) {
        int64_t v = 0;
        if (raw_bits && rds(b, (int)raw_bits, &v)) return -1;
        res[filled++] = v;
      }
    } else {
      for (int k = 0; k < count; ++k) {
        uint32_t q, r = 0;
        if (rd_unary(b, &q)) return -1;
        if (param && rd(b, (int)param, &r)) return -1;
        uint64_t u = ((uint64_t)q << param) | r;
        res[filled++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
      }
    }
  }
  return 0;
}

static const int kFixedCoef[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

static int subframe(BitR* b, int blocksize, int bps, int64_t* out) {
  uint32_t pad, ftype, wflag;
  if (rd(b, 1, &pad) || pad) return -1;
  if (rd(b, 6, &ftype)) return -1;
  if (rd(b, 1, &wflag)) return -1;
  int wasted = 0;
  if (wflag) {
    uint32_t q;
    if (rd_unary(b, &q)) return -1;
    wasted = (int)q + 1;
  }
  int eff = bps - wasted;
  if (eff <= 0) return -1;
  std::vector<int64_t> res(blocksize);
  if (ftype == 0) {  // CONSTANT
    int64_t v;
    if (rds(b, eff, &v)) return -1;
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (ftype == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i)
      if (rds(b, eff, &out[i])) return -1;
  } else if (ftype >= 8 && ftype <= 12) {  // FIXED
    int order = (int)ftype - 8;
    for (int i = 0; i < order; ++i)
      if (rds(b, eff, &out[i])) return -1;
    if (residual(b, blocksize, order, res.data())) return -1;
    for (int i = order; i < blocksize; ++i) {
      int64_t p = 0;
      for (int j = 0; j < order; ++j) p += kFixedCoef[order][j] * out[i - 1 - j];
      out[i] = res[i - order] + p;
    }
  } else if (ftype >= 32) {  // LPC
    int order = (int)(ftype & 31) + 1;
    for (int i = 0; i < order; ++i)
      if (rds(b, eff, &out[i])) return -1;
    uint32_t prec4;
    if (rd(b, 4, &prec4) || prec4 == 15) return -1;
    int prec = (int)prec4 + 1;
    int64_t shift;
    if (rds(b, 5, &shift) || shift < 0) return -1;
    int64_t coef[32];
    for (int i = 0; i < order; ++i)
      if (rds(b, prec, &coef[i])) return -1;
    if (residual(b, blocksize, order, res.data())) return -1;
    for (int i = order; i < blocksize; ++i) {
      int64_t p = 0;
      for (int j = 0; j < order; ++j) p += coef[j] * out[i - 1 - j];
      out[i] = res[i - order] + (p >> shift);
    }
  } else {
    return -1;
  }
  if (wasted)
    for (int i = 0; i < blocksize; ++i) out[i] <<= wasted;
  return 0;
}

}  // namespace flac

int hpfw_flac_decode(const uint8_t* data, int64_t size,
                     float* out, int64_t* out_n, int32_t* out_rate) {
  using namespace flac;
  if (size < 42 || memcmp(data, "fLaC", 4) != 0) return -1;
  int64_t pos = 4;
  int32_t sr = 0;
  int n_ch = 0, bps = 0;
  int64_t total = -1;
  while (pos + 4 <= size) {
    uint8_t hdr = data[pos];
    uint32_t bsize = ((uint32_t)data[pos + 1] << 16) |
                     ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    const uint8_t* body = data + pos + 4;
    if (pos + 4 + bsize > size) return -2;
    if ((hdr & 0x7F) == 0 && bsize >= 34) {  // STREAMINFO
      sr = ((int32_t)body[10] << 12) | ((int32_t)body[11] << 4) | (body[12] >> 4);
      n_ch = ((body[12] >> 1) & 7) + 1;
      bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1;
      total = ((int64_t)(body[13] & 0xF) << 32) | rd_be32(body + 14);
    }
    pos += 4 + bsize;
    if (hdr & 0x80) break;
  }
  if (sr <= 0 || n_ch <= 0 || n_ch > 8 || bps <= 0) return -3;
  // total_samples == 0 in STREAMINFO means "unknown" (streamed encodes):
  // decode until the bitstream ends, mirroring the NumPy twin.
  if (total == 0) total = -1;

  static const int kBsCode[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                                  256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
  static const int kSsCode[8] = {0, 8, 12, -1, 16, 20, 24, 32};
  BitR br{data, size, pos, 0, 0};
  int64_t count = 0;
  std::vector<std::vector<int64_t>> ch(n_ch);
  double scale = (double)(1ll << (bps - 1));
  while (bit_pos(&br) + 40 <= size * 8 && (total < 0 || count < total)) {
    int64_t frame_start = bit_pos(&br) >> 3;
    uint32_t sync, resv, bs_code, sr_code, ch_code, ss_code;
    if (rd(&br, 14, &sync) || sync != 0x3FFE) return -10;
    if (rd(&br, 2, &resv)) return -10;  // reserved + blocking strategy
    if (rd(&br, 4, &bs_code) || rd(&br, 4, &sr_code) ||
        rd(&br, 4, &ch_code) || rd(&br, 3, &ss_code) || rd(&br, 1, &resv))
      return -10;
    uint64_t fnum;
    if (utf8_num(&br, &fnum)) return -10;
    int blocksize;
    if (bs_code == 6) {
      uint32_t v; if (rd(&br, 8, &v)) return -10;
      blocksize = (int)v + 1;
    } else if (bs_code == 7) {
      uint32_t v; if (rd(&br, 16, &v)) return -10;
      blocksize = (int)v + 1;
    } else {
      blocksize = kBsCode[bs_code];
      if (blocksize <= 0) return -10;
    }
    if (sr_code == 12) { uint32_t v; if (rd(&br, 8, &v)) return -10; }
    else if (sr_code == 13 || sr_code == 14) { uint32_t v; if (rd(&br, 16, &v)) return -10; }
    else if (sr_code == 15) return -10;
    int frame_bps = ss_code ? kSsCode[ss_code] : bps;
    if (frame_bps <= 0) return -10;
    int64_t crc8_pos = bit_pos(&br) >> 3;
    uint32_t hcrc;
    if (rd(&br, 8, &hcrc)) return -10;
    if (crc8(data + frame_start, crc8_pos - frame_start) != (uint8_t)hcrc)
      return -11;

    std::vector<std::vector<int64_t>> sub;
    if (ch_code < 8) {
      if ((int)ch_code + 1 != n_ch) return -12;
      sub.assign(n_ch, std::vector<int64_t>(blocksize));
      for (int c = 0; c < n_ch; ++c)
        if (subframe(&br, blocksize, frame_bps, sub[c].data())) return -13;
    } else if (ch_code <= 10) {
      if (n_ch != 2) return -12;
      int lb = frame_bps + (ch_code == 9 ? 1 : 0);
      int rb = frame_bps + (ch_code != 9 ? 1 : 0);
      std::vector<int64_t> a(blocksize), bch(blocksize);
      if (subframe(&br, blocksize, lb, a.data())) return -13;
      if (subframe(&br, blocksize, rb, bch.data())) return -13;
      sub.assign(2, std::vector<int64_t>(blocksize));
      for (int i = 0; i < blocksize; ++i) {
        if (ch_code == 8) {        // left/side
          sub[0][i] = a[i];
          sub[1][i] = a[i] - bch[i];
        } else if (ch_code == 9) { // right/side
          sub[0][i] = bch[i] + a[i];
          sub[1][i] = bch[i];
        } else {                   // mid/side
          int64_t mid = (a[i] << 1) | (bch[i] & 1);
          sub[0][i] = (mid + bch[i]) >> 1;
          sub[1][i] = (mid - bch[i]) >> 1;
        }
      }
    } else {
      return -12;
    }
    align_byte(&br);
    int64_t crc16_pos = bit_pos(&br) >> 3;
    uint32_t fcrc;
    if (rd(&br, 16, &fcrc)) return -10;
    if (crc16(data + frame_start, crc16_pos - frame_start) != (uint16_t)fcrc)
      return -14;
    for (int c = 0; c < n_ch; ++c)
      ch[c].insert(ch[c].end(), sub[c].begin(), sub[c].end());
    count += blocksize;
  }
  if (total >= 0 && count > total) count = total;
  *out_n = count;
  *out_rate = sr;
  if (!out) return 0;
  for (int64_t i = 0; i < count; ++i) {
    double acc = 0.0;
    for (int c = 0; c < n_ch; ++c) acc += (double)ch[c][i];
    out[i] = (float)(acc / n_ch / scale);
  }
  return 0;
}

// Linear resampler — arithmetic identical to io/wav.py resample_linear.
int64_t hpfw_resample_len(int64_t n_in, int32_t sr_in, int32_t sr_out) {
  return (int64_t)((double)n_in * sr_out / sr_in);
}

void hpfw_resample_linear(const float* in, int64_t n_in, int32_t sr_in,
                          int32_t sr_out, float* out, int64_t n_out) {
  double step = (double)sr_in / sr_out;
  for (int64_t i = 0; i < n_out; ++i) {
    double src = i * step;
    int64_t i0 = (int64_t)src;
    if (i0 > n_in - 1) i0 = n_in - 1;
    int64_t i1 = i0 + 1 < n_in ? i0 + 1 : n_in - 1;
    float frac = (float)(src - (double)i0);
    out[i] = (1.0f - frac) * in[i0] + frac * in[i1];
  }
}

// ---------------------------------------------------------------------------
// Polyphase windowed-sinc (Kaiser) resampler — the reference-grade default.
// Mirrors io/wav.py resample_sinc (scipy.resample_poly-equivalent design);
// float64 accumulation, so the NumPy twin matches to ~1 float32 ulp
// (tests/test_resample.py margin-tests rather than bit-asserts — the only
// twin pair that is float, not integer).
// ---------------------------------------------------------------------------
static double bessel_i0(double x) {
  // Power series; converges fast for the beta*sqrt(...) <= 5 range used.
  double sum = 1.0, term = 1.0, hx = x / 2.0;
  for (int k = 1; k < 256; ++k) {
    double f = hx / k;
    term *= f * f;
    sum += term;
    if (term < sum * 1e-18) break;
  }
  return sum;
}

static int64_t gcd64(int64_t a, int64_t b) {
  while (b) { int64_t t = a % b; a = b; b = t; }
  return a;
}

int64_t hpfw_resample_sinc_len(int64_t n_in, int32_t sr_in, int32_t sr_out) {
  int64_t g = gcd64(sr_in, sr_out);
  int64_t l = sr_out / g, m = sr_in / g;
  if (l == m) return n_in;
  return (n_in * l + m - 1) / m;
}

void hpfw_resample_sinc(const float* in, int64_t n_in, int32_t sr_in,
                        int32_t sr_out, float* out, int64_t n_out) {
  int64_t g = gcd64(sr_in, sr_out);
  int64_t l = sr_out / g, m = sr_in / g;
  if (l == m) {
    for (int64_t i = 0; i < n_out && i < n_in; ++i) out[i] = in[i];
    return;
  }
  const double beta = 5.0;                   // scipy resample_poly default
  int64_t mx = l > m ? l : m;
  int64_t half = 10 * mx;
  int64_t taps = 2 * half + 1;
  std::vector<double> h(taps);
  double denom = bessel_i0(beta);
  double alpha = (double)(taps - 1) / 2.0;
  double sum = 0.0;
  for (int64_t i = 0; i < taps; ++i) {
    double t = (double)(i - half);
    double a = M_PI * t / (double)mx;
    double snc = t == 0.0 ? 1.0 : sin(a) / a;
    double r = ((double)i - alpha) / alpha;
    double w = bessel_i0(beta * sqrt(std::max(0.0, 1.0 - r * r))) / denom;
    h[i] = (1.0 / (double)mx) * snc * w;
    sum += h[i];
  }
  for (int64_t i = 0; i < taps; ++i) h[i] = h[i] / sum * (double)l;
  int64_t d = half;                          // center-tap group delay
  for (int64_t o = 0; o < n_out; ++o) {
    int64_t u = d + o * m;                   // position on upsampled grid
    int64_t ihi = u / l;
    double acc = 0.0;
    for (int64_t i = ihi; i >= 0; --i) {     // tap index ascending, like the twin
      int64_t k = u - l * i;
      if (k >= taps) break;
      if (i < n_in) acc += h[k] * (double)in[i];
    }
    out[o] = (float)acc;
  }
}

// ---------------------------------------------------------------------------
// Hashprint extraction (the reference's C++ fingerprint() surface,
// SURVEY.md §1.2): framed NDFT CQT -> log magnitude -> context-window
// projection -> delta -> sign -> packed 64-bit hashprints. Mirrors
// hpfw_tpu/oracle/pipeline.py in float64; the sign threshold makes the
// result equal to the oracle except at ~zero delta margins
// (tests/test_native.py margin-audits it). Frames parallelize across a
// std::thread pool — the reference's CPU batch-driver style.
// Two-call protocol like the decoders; out holds uint64 hashprints.
// ---------------------------------------------------------------------------
static void parallel_for(int64_t n, int32_t n_threads,
                         const std::function<void(int64_t)>& fn) {
  if (n_threads <= 0)
    n_threads = (int32_t)std::max(1u, std::thread::hardware_concurrency());
  n_threads = (int32_t)std::min<int64_t>(n_threads, n);
  if (n_threads <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n) return;
      fn(i);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int32_t i = 0; i < n_threads; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

int hpfw_fingerprint(
    const float* pcm, int64_t n_samples, const float* filters,
    int32_t sample_rate, int32_t frame_len, int32_t hop, int32_t n_bins,
    double fmin, int32_t bins_per_octave, int32_t window_hamming,
    double log_eps, int32_t context_w, int32_t delta_lag,
    int32_t bit_order_msb0, int32_t tie_ge, int32_t n_threads,
    uint64_t* out, int64_t* out_n) {
  if (sample_rate <= 0 || frame_len <= 0 || hop <= 0 || n_bins <= 0 ||
      context_w <= 0 || delta_lag <= 0)
    return -1;
  int64_t n_frames =
      n_samples < frame_len ? 0 : 1 + (n_samples - frame_len) / hop;
  int64_t n_ctx = n_frames - context_w + 1;
  int64_t n_prints = n_ctx - delta_lag;
  if (n_prints < 0) n_prints = 0;
  *out_n = n_prints;
  if (!out) return 0;
  if (n_prints == 0) return 0;

  // Per-bin CQT kernels (window-weighted complex exponentials / n_k).
  double q = 1.0 / (pow(2.0, 1.0 / bins_per_octave) - 1.0);
  std::vector<int32_t> koff(n_bins), klen(n_bins);
  std::vector<std::vector<double>> kre(n_bins), kim(n_bins);
  for (int32_t k = 0; k < n_bins; ++k) {
    double f_k = fmin * pow(2.0, (double)k / bins_per_octave);
    int32_t n_k = (int32_t)ceil(q * sample_rate / f_k);
    if (n_k > frame_len) return -2;
    klen[k] = n_k;
    koff[k] = (frame_len - n_k) / 2;
    kre[k].resize(n_k);
    kim[k].resize(n_k);
    for (int32_t n = 0; n < n_k; ++n) {
      double win =
          window_hamming
              ? 0.54 - 0.46 * cos(2.0 * M_PI * (n + 0.5) / n_k)
              : 0.5 - 0.5 * cos(2.0 * M_PI * (n + 0.5) / n_k);
      double ph = -2.0 * M_PI * f_k * n / sample_rate;
      kre[k][n] = win * cos(ph) / n_k;
      kim[k][n] = win * sin(ph) / n_k;
    }
  }

  // Log-magnitude CQT, frames across the thread pool.
  std::vector<double> spec((size_t)n_frames * n_bins);
  parallel_for(n_frames, n_threads, [&](int64_t t) {
    const float* fr = pcm + t * hop;
    for (int32_t k = 0; k < n_bins; ++k) {
      const double* re = kre[k].data();
      const double* im = kim[k].data();
      const float* x = fr + koff[k];
      double sr_ = 0.0, si = 0.0;
      for (int32_t n = 0; n < klen[k]; ++n) {
        double v = (double)x[n];
        sr_ += v * re[n];
        si += v * im[n];
      }
      spec[t * n_bins + k] = log(log_eps + sqrt(sr_ * sr_ + si * si));
    }
  });

  // Context projection y(n) = F^T x(n), then delta/sign/pack per print.
  std::vector<double> y((size_t)n_ctx * 64);
  parallel_for(n_ctx, n_threads, [&](int64_t n) {
    double acc[64] = {0.0};
    for (int32_t j = 0; j < context_w; ++j) {
      const double* s = &spec[(n + j) * n_bins];
      const float* frow = filters + (size_t)j * n_bins * 64;
      for (int32_t b = 0; b < n_bins; ++b) {
        double v = s[b];
        const float* fcol = frow + (size_t)b * 64;
        for (int32_t f = 0; f < 64; ++f) acc[f] += v * (double)fcol[f];
      }
    }
    for (int32_t f = 0; f < 64; ++f) y[n * 64 + f] = acc[f];
  });

  parallel_for(n_prints, n_threads, [&](int64_t n) {
    uint64_t h = 0;
    for (int32_t f = 0; f < 64; ++f) {
      double d = y[n * 64 + f] - y[(n + delta_lag) * 64 + f];
      bool bit = tie_ge ? (d >= 0.0) : (d > 0.0);
      int32_t pos = bit_order_msb0 ? 63 - f : f;
      if (bit) h |= (uint64_t)1 << pos;
    }
    out[n] = h;
  });
  return 0;
}

// ---------------------------------------------------------------------------
// CPU Hamming matcher. Packed prints as uint64 words (lo|hi<<32 of the
// uint32 pairs). Semantics identical to oracle.match_track: offsets
// [0, len-N] for len >= N, else truncated head overlap at offset 0; best
// score with first-offset tie-break.
// ---------------------------------------------------------------------------
static inline int64_t score_at(const uint64_t* q, int64_t nq,
                               const uint64_t* d) {
  int64_t pop = 0;
  for (int64_t n = 0; n < nq; ++n)
    pop += __builtin_popcountll(q[n] ^ d[n]);
  return 64 * nq - pop;
}

void hpfw_match_track(const uint64_t* query, int64_t n_query,
                      const uint64_t* track, int64_t n_track,
                      int64_t* best_score, int64_t* best_offset) {
  if (n_track < n_query) {
    *best_score = score_at(query, n_track, track);
    *best_offset = 0;
    return;
  }
  int64_t bs = -1, bo = 0;
  for (int64_t o = 0; o + n_query <= n_track; ++o) {
    int64_t s = score_at(query, n_query, track + o);
    if (s > bs) { bs = s; bo = o; }
  }
  *best_score = bs;
  *best_offset = bo;
}

// Batch scan: tracks are rows of a padded (n_tracks, max_len) uint64 array
// with per-track lengths; a thread pool splits tracks (the reference's
// CPU-parallel catalog driver, rebuilt).
void hpfw_match_db(const uint64_t* query, int64_t n_query,
                   const uint64_t* db, const int64_t* lengths,
                   int64_t n_tracks, int64_t max_len,
                   int64_t* scores, int64_t* offsets, int32_t n_threads) {
  if (n_threads <= 0)
    n_threads = (int32_t)std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t t = next.fetch_add(1);
      if (t >= n_tracks) return;
      hpfw_match_track(query, n_query, db + t * max_len, lengths[t],
                       &scores[t], &offsets[t]);
    }
  };
  std::vector<std::thread> pool;
  int32_t n = (int32_t)std::min<int64_t>(n_threads, n_tracks);
  pool.reserve(n);
  for (int32_t i = 0; i < n; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"

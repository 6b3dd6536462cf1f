// qvc_audio: native audio decode for the QuickVC-TPU data layer.
//
// The reference pipeline reads VCTK mic2 FLAC through librosa/libsndfile
// (reference downsample.py:27, data_utils_new_new.py:59). This library is a
// dependency-free C++ implementation of the same capability for hosts
// without libsndfile: a FLAC decoder (16/24-bit, constant/verbatim/fixed/
// LPC subframes, Rice-coded residuals, all stereo decorrelation modes) and
// a RIFF/WAV reader (PCM 8/16/24/32 and float32).
//
// C ABI (ctypes-friendly):
//   qvc_probe(path, &sr, &channels, &bps, &frames) -> 0 | negative error
//   qvc_decode(path, int32* out, long long capacity) -> samples written
//       (interleaved; int32 left-aligned to the source bit depth's value
//        range, i.e. raw integer sample values, NOT normalized)
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

// ---------------------------------------------------------------- bit reader
struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // 0..7, MSB first
  bool error = false;

  BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  bool eof() const { return byte_pos >= size; }

  uint32_t read_bit() {
    if (byte_pos >= size) { error = true; return 0; }
    uint32_t b = (data[byte_pos] >> (7 - bit_pos)) & 1u;
    if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
    return b;
  }

  uint64_t read_bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
    return v;
  }

  int64_t read_signed(int n) {
    if (n <= 0) return 0;  // malformed bps (e.g. wasted >= bps) reaches here
    uint64_t v = read_bits(n);
    if (n < 64 && (v & (1ull << (n - 1)))) v |= ~((1ull << n) - 1);  // sign extend
    return (int64_t)v;
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    while (!error && read_bit() == 0) ++q;
    return q;
  }

  void align() { if (bit_pos != 0) { bit_pos = 0; ++byte_pos; } }
};

// ---------------------------------------------------------------- utf8 coded
uint64_t read_utf8_u64(BitReader& br) {
  uint32_t b0 = (uint32_t)br.read_bits(8);
  if (b0 < 0x80) return b0;
  int n = 0;
  for (uint32_t m = 0x80; b0 & m; m >>= 1) ++n;  // leading ones
  uint64_t v = b0 & (0x7F >> n);
  for (int i = 1; i < n; ++i) v = (v << 6) | (br.read_bits(8) & 0x3F);
  return v;
}

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total_samples = 0;
};

struct FlacFile {
  std::vector<uint8_t> bytes;
  StreamInfo info;
  size_t first_frame = 0;
};

int load_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize((size_t)n);
  size_t rd = fread(out.data(), 1, (size_t)n, f);
  fclose(f);
  return rd == (size_t)n ? 0 : -2;
}

int parse_flac_header(FlacFile& ff) {
  const auto& b = ff.bytes;
  if (b.size() < 42 || memcmp(b.data(), "fLaC", 4) != 0) return -3;
  size_t pos = 4;
  bool last = false;
  bool have_info = false;
  while (!last) {
    if (pos + 4 > b.size()) return -4;
    last = (b[pos] & 0x80) != 0;
    int type = b[pos] & 0x7F;
    uint32_t len = ((uint32_t)b[pos + 1] << 16) | ((uint32_t)b[pos + 2] << 8) | b[pos + 3];
    pos += 4;
    if (pos + len > b.size()) return -4;
    if (type == 0 && len >= 34) {
      BitReader br(b.data() + pos, len);
      br.read_bits(16); br.read_bits(16);             // min/max blocksize
      br.read_bits(24); br.read_bits(24);             // min/max framesize
      ff.info.sample_rate = (uint32_t)br.read_bits(20);
      ff.info.channels = (int)br.read_bits(3) + 1;
      ff.info.bps = (int)br.read_bits(5) + 1;
      ff.info.total_samples = br.read_bits(36);
      have_info = true;
    }
    pos += len;
  }
  if (!have_info) return -5;
  ff.first_frame = pos;
  return 0;
}

// residual: Rice-partitioned; fills res[0..blocksize-order)
bool read_residual(BitReader& br, int blocksize, int order, int64_t* res) {
  int method = (int)br.read_bits(2);
  if (method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  int po = (int)br.read_bits(4);
  int partitions = 1 << po;
  int idx = 0;
  for (int p = 0; p < partitions; ++p) {
    int n = blocksize >> po;
    if (p == 0) n -= order;
    if (n < 0) return false;
    uint32_t param = (uint32_t)br.read_bits(pbits);
    if (param == escape) {
      int raw = (int)br.read_bits(5);
      for (int i = 0; i < n; ++i) res[idx++] = raw ? br.read_signed(raw) : 0;
    } else {
      for (int i = 0; i < n; ++i) {
        uint32_t q = br.read_unary();
        uint64_t u = ((uint64_t)q << param) | br.read_bits((int)param);
        res[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
      }
    }
    if (br.error) return false;
  }
  return true;
}

// Wrapping signed ops via uint64: malformed streams can drive predictor
// state arbitrarily large, and signed int64 overflow is UB — two's-
// complement wraparound keeps the (garbage-in, garbage-out) arithmetic
// defined so the fuzz/ASAN gate is meaningful.
inline int64_t wadd(int64_t a, int64_t b) { return (int64_t)((uint64_t)a + (uint64_t)b); }
inline int64_t wsub(int64_t a, int64_t b) { return (int64_t)((uint64_t)a - (uint64_t)b); }
inline int64_t wmul(int64_t a, int64_t b) { return (int64_t)((uint64_t)a * (uint64_t)b); }
inline int64_t wshl(int64_t a, int n) { return (int64_t)((uint64_t)a << n); }

bool decode_subframe(BitReader& br, int blocksize, int bps, int64_t* out) {
  if (br.read_bit() != 0) return false;  // padding bit
  int type = (int)br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) wasted = (int)br.read_unary() + 1;
  // wasted-bits count is unary-coded and attacker-controlled: past the
  // sample width the subframe is malformed (and <<= wasted would be UB)
  if (wasted >= bps || wasted > 32) return false;
  bps -= wasted;

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) out[i] = br.read_signed(bps);
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0..4
    int order = type & 7;
    // a frame may not declare more warmup samples than it holds — the
    // warmup write below would overflow the blocksize-sized buffer
    if (order > blocksize) return false;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    std::vector<int64_t> res(blocksize);
    if (!read_residual(br, blocksize, order, res.data())) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t r = res[i - order];
      switch (order) {
        case 0: out[i] = r; break;
        case 1: out[i] = wadd(r, out[i - 1]); break;
        case 2: out[i] = wsub(wadd(r, wmul(2, out[i - 1])), out[i - 2]); break;
        case 3: out[i] = wadd(wsub(wadd(r, wmul(3, out[i - 1])),
                                   wmul(3, out[i - 2])), out[i - 3]); break;
        case 4: out[i] = wsub(wadd(wsub(wadd(r, wmul(4, out[i - 1])),
                                        wmul(6, out[i - 2])),
                                   wmul(4, out[i - 3])), out[i - 4]); break;
      }
    }
  } else if (type >= 32) {  // LPC, order 1..32
    int order = (type & 31) + 1;
    if (order > blocksize) return false;  // same warmup-overflow guard
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    int precision = (int)br.read_bits(4) + 1;
    if (precision == 16) return false;  // 0b1111 invalid
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
    std::vector<int64_t> res(blocksize);
    if (!read_residual(br, blocksize, order, res.data())) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc = wadd(acc, wmul(coef[j], out[i - 1 - j]));
      out[i] = wadd(res[i - order], acc >> shift);
    }
  } else {
    return false;  // reserved
  }
  if (wasted) for (int i = 0; i < blocksize; ++i) out[i] = wshl(out[i], wasted);
  return !br.error;
}

// Decode all frames; returns total per-channel samples decoded, or <0.
int64_t decode_flac(FlacFile& ff, int32_t* out, int64_t capacity, bool count_only) {
  BitReader br(ff.bytes.data() + ff.first_frame, ff.bytes.size() - ff.first_frame);
  const StreamInfo& si = ff.info;
  int64_t written = 0;  // per-channel samples

  static const int bs_table[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                                   256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
  static const int ss_table[8] = {0, 8, 12, 0, 16, 20, 24, 32};

  while (!br.eof()) {
    br.align();
    // find frame sync (14 bits 0b11111111111110)
    if (br.byte_pos + 2 > br.size) break;
    if (br.data[br.byte_pos] != 0xFF || (br.data[br.byte_pos + 1] & 0xFC) != 0xF8) {
      // padding / garbage at EOF
      ++br.byte_pos;
      continue;
    }
    br.read_bits(14);
    br.read_bit();                        // reserved
    br.read_bit();                        // blocking strategy
    int bs_code = (int)br.read_bits(4);
    int sr_code = (int)br.read_bits(4);
    int ch_asgn = (int)br.read_bits(4);
    int ss_code = (int)br.read_bits(3);
    br.read_bit();                        // reserved
    read_utf8_u64(br);                    // frame/sample number
    int blocksize;
    if (bs_code == 6) blocksize = (int)br.read_bits(8) + 1;
    else if (bs_code == 7) blocksize = (int)br.read_bits(16) + 1;
    else blocksize = bs_table[bs_code];
    if (blocksize <= 0) return -10;
    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);
    int bps = ss_code == 0 ? si.bps : ss_table[ss_code];
    if (bps == 0) return -11;
    br.read_bits(8);                      // header CRC-8 (not verified)

    int channels = si.channels;
    bool left_side = false, right_side = false, mid_side = false;
    if (ch_asgn >= 8 && ch_asgn <= 10) {
      channels = 2;
      left_side = ch_asgn == 8;
      right_side = ch_asgn == 9;
      mid_side = ch_asgn == 10;
    } else {
      channels = ch_asgn + 1;
    }
    if (channels != si.channels) return -12;

    std::vector<std::vector<int64_t>> ch(channels, std::vector<int64_t>(blocksize));
    for (int c = 0; c < channels; ++c) {
      int sub_bps = bps;
      if ((left_side && c == 1) || (right_side && c == 0) || (mid_side && c == 1))
        sub_bps += 1;  // side channel carries one extra bit
      if (!decode_subframe(br, blocksize, sub_bps, ch[c].data())) return -13;
    }
    br.align();
    br.read_bits(16);                     // frame CRC-16 (not verified)
    if (br.error) return -14;

    // stereo decorrelation (wrapping ops: values are attacker-controlled)
    if (left_side) {
      for (int i = 0; i < blocksize; ++i) ch[1][i] = wsub(ch[0][i], ch[1][i]);
    } else if (right_side) {
      for (int i = 0; i < blocksize; ++i) ch[0][i] = wadd(ch[1][i], ch[0][i]);
    } else if (mid_side) {
      for (int i = 0; i < blocksize; ++i) {
        int64_t side = ch[1][i];
        int64_t mid = wshl(ch[0][i], 1) | (side & 1);
        ch[0][i] = wadd(mid, side) >> 1;
        ch[1][i] = wsub(mid, side) >> 1;
      }
    }

    if (!count_only) {
      if ((written + blocksize) * channels > capacity) return -15;
      for (int i = 0; i < blocksize; ++i)
        for (int c = 0; c < channels; ++c)
          out[(written + i) * channels + c] = (int32_t)ch[c][i];
    }
    written += blocksize;
    if (si.total_samples && (uint64_t)written >= si.total_samples) break;
  }
  if (si.total_samples && (uint64_t)written > si.total_samples)
    written = (int64_t)si.total_samples;
  return written;
}

// ----------------------------------------------------------------- WAV part
struct WavInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bps = 0;           // container bits
  int format = 1;        // 1 = PCM, 3 = float
  size_t data_off = 0;
  size_t data_len = 0;
};

int parse_wav(const std::vector<uint8_t>& b, WavInfo& wi) {
  if (b.size() < 44 || memcmp(b.data(), "RIFF", 4) != 0 || memcmp(b.data() + 8, "WAVE", 4) != 0)
    return -3;
  size_t pos = 12;
  bool have_fmt = false;
  while (pos + 8 <= b.size()) {
    uint32_t len;
    memcpy(&len, b.data() + pos + 4, 4);
    const uint8_t* tag = b.data() + pos;
    // a truncated file may declare a chunk longer than the remaining
    // bytes — clamp before reading chunk CONTENTS (the fmt reads below
    // would otherwise run past the buffer)
    size_t avail = b.size() - (pos + 8);
    if ((size_t)len > avail) len = (uint32_t)avail;
    if (memcmp(tag, "fmt ", 4) == 0 && len >= 16) {
      uint16_t fmt, ch, bits; uint32_t sr;
      memcpy(&fmt, b.data() + pos + 8, 2);
      memcpy(&ch, b.data() + pos + 10, 2);
      memcpy(&sr, b.data() + pos + 12, 4);
      memcpy(&bits, b.data() + pos + 22, 2);
      if (fmt == 0xFFFE && len >= 40) memcpy(&fmt, b.data() + pos + 32, 2);  // extensible
      wi.format = fmt; wi.channels = ch; wi.sample_rate = sr; wi.bps = bits;
      have_fmt = true;
    } else if (memcmp(tag, "data", 4) == 0) {
      wi.data_off = pos + 8;
      wi.data_len = len < b.size() - wi.data_off ? len : b.size() - wi.data_off;
    }
    pos += 8 + len + (len & 1);
  }
  return (have_fmt && wi.data_len) ? 0 : -4;
}

int64_t decode_wav(const std::vector<uint8_t>& b, const WavInfo& wi,
                   int32_t* out, int64_t capacity, bool count_only) {
  int bytes = wi.bps / 8;
  // malformed fmt chunks can declare bps < 8 or zero channels — the
  // frame-count division below would divide by zero
  if (bytes <= 0 || wi.channels <= 0) return -16;
  int64_t n = (int64_t)(wi.data_len / (size_t)(bytes * wi.channels));
  if (count_only) return n;
  if (n * wi.channels > capacity) return -15;
  const uint8_t* d = b.data() + wi.data_off;
  int64_t total = n * wi.channels;
  for (int64_t i = 0; i < total; ++i) {
    const uint8_t* p = d + i * bytes;
    int32_t v = 0;
    if (wi.format == 3 && wi.bps == 32) {
      // float32 -> Q8.23 fixed point: exact for |x| < 1, headroom to +-256
      float fv; memcpy(&fv, p, 4);
      if (fv > 255.f) fv = 255.f; if (fv < -255.f) fv = -255.f;
      v = (int32_t)(fv * 8388608.0f);
    } else if (wi.bps == 16) {
      int16_t s; memcpy(&s, p, 2); v = s;
    } else if (wi.bps == 24) {
      v = (int32_t)((uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16));
      if (v & 0x800000) v |= ~0xFFFFFF;
    } else if (wi.bps == 32) {
      memcpy(&v, p, 4);
    } else if (wi.bps == 8) {
      v = (int32_t)p[0] - 128;
    } else {
      return -16;
    }
    out[i] = v;
  }
  return n;
}

}  // namespace

extern "C" {

// Probe any supported file. Returns 0 on success.
// kind: 1 = flac, 2 = wav. float_fmt: 1 if WAV float32 payload.
int qvc_probe(const char* path, int* kind, int* sample_rate, int* channels,
              int* bps, long long* frames, int* float_fmt) {
  std::vector<uint8_t> b;
  int rc = load_file(path, b);
  if (rc) return rc;
  *float_fmt = 0;
  if (b.size() >= 4 && memcmp(b.data(), "fLaC", 4) == 0) {
    FlacFile ff; ff.bytes.swap(b);
    rc = parse_flac_header(ff);
    if (rc) return rc;
    *kind = 1;
    *sample_rate = (int)ff.info.sample_rate;
    *channels = ff.info.channels;
    *bps = ff.info.bps;
    long long n = (long long)ff.info.total_samples;
    if (n == 0) n = decode_flac(ff, nullptr, 0, true);
    *frames = n;
    return n >= 0 ? 0 : (int)n;
  }
  WavInfo wi;
  rc = parse_wav(b, wi);
  if (rc) return rc;
  *kind = 2;
  *sample_rate = (int)wi.sample_rate;
  *channels = wi.channels;
  *bps = wi.bps;
  *float_fmt = wi.format == 3 ? 1 : 0;
  *frames = decode_wav(b, wi, nullptr, 0, true);
  return 0;
}

// Decode to interleaved int32. Returns per-channel frame count, or <0 error.
long long qvc_decode(const char* path, int32_t* out, long long capacity) {
  std::vector<uint8_t> b;
  int rc = load_file(path, b);
  if (rc) return rc;
  if (b.size() >= 4 && memcmp(b.data(), "fLaC", 4) == 0) {
    FlacFile ff; ff.bytes.swap(b);
    rc = parse_flac_header(ff);
    if (rc) return rc;
    return decode_flac(ff, out, capacity, false);
  }
  WavInfo wi;
  rc = parse_wav(b, wi);
  if (rc) return rc;
  return decode_wav(b, wi, out, capacity, false);
}

}  // extern "C"

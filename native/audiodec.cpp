// audiodec: native host-side audio ingestion for audio-tokens-tpu.
//
// The reference pipeline delegated decode/resample to torchaudio's C++
// backends (reference: processors/spectrogram_generator.py:99,117-121); this
// library is the standalone equivalent: WAV (PCM 8/16/24/32 + IEEE float) and
// FLAC (constant/verbatim/fixed/LPC subframes, rice/rice2 residuals, all
// stereo decorrelation modes) decoders, a rational-rate polyphase
// windowed-sinc resampler, and a threaded batch API that decodes N clips
// directly into the reflect-padded fixed-shape buffer the device mel program
// consumes (see audio_tokens_tpu/ops/mel.py::reflect_pad_clip for the layout
// contract) — so the host never touches the samples again after decode.
//
// Python binding: ctypes (audio_tokens_tpu/data/native_loader.py).
// Build: python native/build.py  ->  native/libaudiodec.so
//
// The pure-python decoders in audio_tokens_tpu/data/{audio_io,flac}.py are
// the correctness reference; tests cross-check both on identical fixtures.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

// Last decode error. Guarded by a mutex (NOT thread_local): batch decode
// errors happen on worker threads, and the Python caller reads the error
// from its own thread.
std::mutex g_error_mutex;
std::string g_error_store;

void set_error(const std::string& msg) {
  std::lock_guard<std::mutex> lock(g_error_mutex);
  g_error_store = msg;
}

struct Decoded {
  std::vector<float> mono;  // mono float32 in [-1, 1]
  int sample_rate = 0;
};

// ---------------------------------------------------------------------------
// File loading
// ---------------------------------------------------------------------------
bool read_file(const char* path, std::vector<uint8_t>& out) {
  std::ifstream f(path, std::ios::binary | std::ios::ate);
  if (!f) {
    set_error(std::string("cannot open file: ") + path);
    return false;
  }
  auto size = f.tellg();
  out.resize(static_cast<size_t>(size));
  f.seekg(0);
  f.read(reinterpret_cast<char*>(out.data()), size);
  return static_cast<bool>(f);
}

// ---------------------------------------------------------------------------
// WAV
// ---------------------------------------------------------------------------
uint32_t rd_u32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) { return p[0] | (p[1] << 8); }

bool decode_wav(const std::vector<uint8_t>& d, Decoded& out) {
  if (d.size() < 12 || memcmp(d.data(), "RIFF", 4) || memcmp(d.data() + 8, "WAVE", 4)) {
    set_error("not a RIFF/WAVE file");
    return false;
  }
  size_t pos = 12;
  int audio_format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const uint8_t* raw = nullptr;
  size_t raw_size = 0;
  while (pos + 8 <= d.size()) {
    const uint8_t* cid = d.data() + pos;
    uint32_t size = rd_u32(d.data() + pos + 4);
    const uint8_t* body = d.data() + pos + 8;
    size_t body_size = std::min<size_t>(size, d.size() - pos - 8);
    if (!memcmp(cid, "fmt ", 4) && body_size >= 16) {
      audio_format = rd_u16(body);
      channels = rd_u16(body + 2);
      sample_rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (audio_format == 0xFFFE) {
        // WAVE_FORMAT_EXTENSIBLE: the real format code is the first two
        // bytes of the SubFormat GUID at offset 24.
        if (body_size >= 26) {
          audio_format = rd_u16(body + 24);
        } else {
          set_error("truncated WAVE_FORMAT_EXTENSIBLE fmt chunk");
          return false;
        }
      }
    } else if (!memcmp(cid, "data", 4)) {
      raw = body;
      raw_size = body_size;
    }
    pos += 8 + size + (size & 1);
  }
  if (!raw || channels < 1) {
    set_error("missing fmt/data chunk or bad channel count");
    return false;
  }
  if (bits < 8 || bits > 64 || bits % 8) {  // guards the division below too
    set_error("invalid bits_per_sample " + std::to_string(bits));
    return false;
  }

  size_t bytes_per = bits / 8;
  size_t n_frames = raw_size / (bytes_per * channels);
  out.mono.assign(n_frames, 0.f);
  out.sample_rate = static_cast<int>(sample_rate);
  const float inv_ch = 1.0f / channels;

  auto accumulate = [&](auto sample_at) {
    for (size_t i = 0; i < n_frames; ++i) {
      float acc = 0.f;
      for (int c = 0; c < channels; ++c) acc += sample_at(i * channels + c);
      out.mono[i] = acc * inv_ch;
    }
  };

  if (audio_format == 1 && bits == 16) {
    accumulate([&](size_t k) {
      int16_t v;
      memcpy(&v, raw + 2 * k, 2);
      return v / 32768.0f;
    });
  } else if (audio_format == 1 && bits == 32) {
    accumulate([&](size_t k) {
      int32_t v;
      memcpy(&v, raw + 4 * k, 4);
      return static_cast<float>(v / 2147483648.0);
    });
  } else if (audio_format == 1 && bits == 24) {
    accumulate([&](size_t k) {
      const uint8_t* b = raw + 3 * k;
      int32_t v = b[0] | (b[1] << 8) | (b[2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      return v / 8388608.0f;
    });
  } else if (audio_format == 1 && bits == 8) {
    accumulate([&](size_t k) { return (raw[k] - 128) / 128.0f; });
  } else if (audio_format == 3 && bits == 32) {
    accumulate([&](size_t k) {
      float v;
      memcpy(&v, raw + 4 * k, 4);
      return v;
    });
  } else if (audio_format == 3 && bits == 64) {
    accumulate([&](size_t k) {
      double v;
      memcpy(&v, raw + 8 * k, 8);
      return static_cast<float>(v);
    });
  } else {
    set_error("unsupported WAV format " + std::to_string(audio_format) + "/" +
              std::to_string(bits) + "bit");
    return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// FLAC
// ---------------------------------------------------------------------------
// MSB-first bit reader over a 64-bit buffer: reads are served from the top
// of ``buf`` (invariant: bits below the top ``nbits`` are zero), unary runs
// are counted with one CLZ instead of per-bit loops — the rice residual
// decode is the FLAC hot path and this buffering measured ~3x over the
// byte-at-a-time round-2 reader.
struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;  // next byte to load into the buffer
  uint64_t buf = 0;     // MSB-aligned pending bits
  int nbits = 0;        // valid bits at the top of buf

  bool fail = false;

  void refill() {
    if (byte_pos + 8 <= size) {
      // one unaligned 8-byte big-endian load inserts every whole byte that
      // fits (up to 7), replacing the per-byte loop on the decode hot path
      uint64_t chunk;
      memcpy(&chunk, data + byte_pos, 8);
      chunk = __builtin_bswap64(chunk);
      int bytes = (63 - nbits) >> 3;  // 0..7, keeps nbits <= 63
      buf |= (chunk & ~(~0ULL >> (bytes * 8))) >> nbits;
      nbits += bytes * 8;
      byte_pos += bytes;
      return;
    }
    while (nbits <= 56 && byte_pos < size) {  // stream tail
      buf |= uint64_t(data[byte_pos++]) << (56 - nbits);
      nbits += 8;
    }
  }

  size_t bits_left() const { return (size - byte_pos) * 8 + nbits; }
  size_t bit_pos() const { return byte_pos * 8 - nbits; }

  uint32_t read(int n) {  // n in [0, 32]
    if (n == 0) return 0;
    if (n > nbits) {
      refill();
      if (n > nbits) {
        fail = true;
        buf = 0;
        nbits = 0;
        return 0;
      }
    }
    uint32_t v = static_cast<uint32_t>(buf >> (64 - n));
    buf <<= n;
    nbits -= n;
    return v;
  }

  int64_t read_signed(int n) {
    int64_t v = read(n);
    if (v >= (int64_t(1) << (n - 1))) v -= (int64_t(1) << n);
    return v;
  }

  uint32_t read_unary() {
    uint32_t count = 0;
    for (;;) {
      if (nbits == 0) {
        refill();
        if (nbits == 0) {
          fail = true;
          return 0;
        }
      }
      if (buf == 0) {  // all valid bits are zeros: consume and keep counting
        count += nbits;
        nbits = 0;
        continue;
      }
      int z = __builtin_clzll(buf);
      if (z >= nbits) {  // zeros run past the valid bits
        count += nbits;
        buf = 0;
        nbits = 0;
        continue;
      }
      count += z;
      // consume the zeros and the terminating 1; z can be 63 (a full
      // 64-bit run), so shift in two steps — `buf <<= 64` is UB and on
      // x86 leaves buf unchanged, corrupting the stream
      buf <<= z;
      buf <<= 1;
      nbits -= z + 1;
      return count;
    }
  }

  void align() {
    int rem = static_cast<int>(bit_pos() & 7);
    if (!rem) return;
    int k = 8 - rem;
    if (nbits < k) refill();
    if (nbits >= k) {
      buf <<= k;
      nbits -= k;
    } else {
      buf = 0;
      nbits = 0;
    }
  }

  uint64_t read_utf8() {
    uint32_t first = read(8);
    if (first < 0x80) return first;
    int n_extra = 0;
    uint32_t mask = 0x40;
    while (first & mask) {
      ++n_extra;
      mask >>= 1;
    }
    if (n_extra == 0) {
      fail = true;
      return 0;
    }
    uint64_t value = first & (mask - 1);
    for (int i = 0; i < n_extra; ++i) {
      uint32_t b = read(8);
      if ((b & 0xC0) != 0x80) {
        fail = true;
        return 0;
      }
      value = (value << 6) | (b & 0x3F);
    }
    return value;
  }
};

const int kFixedCoeffs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_residual(BitReader& br, int block_size, int order,
                     std::vector<int64_t>& residual) {
  uint32_t method = br.read(2);
  if (method > 1) {
    set_error("reserved residual method");
    return false;
  }
  if (order > block_size) {
    set_error("subframe order exceeds block size");
    return false;
  }
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = (1u << param_bits) - 1;
  int partition_order = br.read(4);
  int n_partitions = 1 << partition_order;
  if (block_size % n_partitions) {
    set_error("invalid partition order");
    return false;
  }
  if ((block_size >> partition_order) <= order && partition_order > 0) {
    // libFLAC validates this too: the predictor warm-up must fit inside
    // the FIRST partition, or its sample count goes negative and the
    // remaining partitions write past residual[block_size - order]
    // (heap corruption from one corrupt clip, not a skip-and-log)
    set_error("partition order incompatible with predictor order");
    return false;
  }
  residual.resize(block_size - order);
  size_t idx = 0;
  for (int p = 0; p < n_partitions; ++p) {
    int n = block_size >> partition_order;
    if (p == 0) n -= order;
    uint32_t param = br.read(param_bits);
    if (param == escape) {
      int raw_bits = br.read(5);
      for (int i = 0; i < n; ++i)
        residual[idx++] = raw_bits ? br.read_signed(raw_bits) : 0;
    } else {
      // Fused rice fast path: local register copies of the reader state,
      // one bulk refill + one CLZ per sample when the whole
      // (unary run + stop bit + param remainder) sample fits the buffer —
      // removes the per-sample function-call/double-refill overhead of
      // read_unary()+read().  Long runs / stream tails take the slow path.
      uint64_t buf = br.buf;
      int nbits = br.nbits;
      size_t byte_pos = br.byte_pos;
      const uint8_t* data = br.data;
      const size_t size = br.size;
      const int upfront = static_cast<int>(param) + 16;  // covers runs <= 15
      for (int i = 0; i < n; ++i) {
        if (nbits < upfront && byte_pos + 8 <= size) {
          // predictive refill: well-matched rice params put most runs
          // under 16, so this keeps the common case at ONE clz per sample
          uint64_t chunk;
          memcpy(&chunk, data + byte_pos, 8);
          chunk = __builtin_bswap64(chunk);
          int bytes = (63 - nbits) >> 3;
          buf |= (chunk & ~(~0ULL >> (bytes * 8))) >> nbits;
          nbits += bytes * 8;
          byte_pos += bytes;
        }
        int z = buf ? __builtin_clzll(buf) : 64;
        int need = z + 1 + static_cast<int>(param);
        if (need > nbits && byte_pos + 8 <= size) {
          // refill ON DEMAND (not per sample): short samples drain the
          // buffer across iterations; the run length can change once new
          // bits land below an all-zero prefix, so recompute
          uint64_t chunk;
          memcpy(&chunk, data + byte_pos, 8);
          chunk = __builtin_bswap64(chunk);
          int bytes = (63 - nbits) >> 3;
          buf |= (chunk & ~(~0ULL >> (bytes * 8))) >> nbits;
          nbits += bytes * 8;
          byte_pos += bytes;
          z = buf ? __builtin_clzll(buf) : 64;
          need = z + 1 + static_cast<int>(param);
        }
        uint64_t v;
        if (need <= nbits) {  // nbits <= 63 after refill: all shifts < 64
          uint64_t rest = buf << z;  // drop the zeros...
          rest <<= 1;                // ...and the terminating 1
          uint64_t r = param ? (rest >> (64 - param)) : 0;
          buf = rest << param;
          nbits -= need;
          v = (uint64_t(z) << param) | r;
        } else {  // run exceeds the buffer (or tail): the general reader
          br.buf = buf;
          br.nbits = nbits;
          br.byte_pos = byte_pos;
          uint64_t q = br.read_unary();
          uint64_t r = param ? br.read(param) : 0;
          v = (q << param) | r;
          buf = br.buf;
          nbits = br.nbits;
          byte_pos = br.byte_pos;
          if (br.fail) break;
        }
        residual[idx++] = (v >> 1) ^ -(int64_t)(v & 1);  // zigzag
      }
      br.buf = buf;
      br.nbits = nbits;
      br.byte_pos = byte_pos;
    }
    if (br.fail) {
      set_error("unexpected end of FLAC stream");
      return false;
    }
  }
  return true;
}

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& out) {
  if (br.read(1) != 0) {
    set_error("invalid subframe padding bit");
    return false;
  }
  uint32_t sf_type = br.read(6);
  int wasted = 0;
  if (br.read(1)) wasted = 1 + br.read_unary();
  bps -= wasted;
  // Reject out-of-range effective bit depths: a malformed wasted-bits code
  // can drive bps <= 0 (negative shift UB in read_signed), and >32 (33-bit
  // side channels of a 32-bit stream) overflows the 32-bit read accumulator.
  if (bps < 1 || bps > 32) {
    set_error("invalid effective bits-per-sample " + std::to_string(bps));
    return false;
  }

  out.resize(block_size);
  std::vector<int64_t> residual;

  if (sf_type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    std::fill(out.begin(), out.end(), v);
  } else if (sf_type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; ++i) out[i] = br.read_signed(bps);
  } else if (sf_type >= 8 && sf_type <= 12) {  // FIXED
    int order = sf_type - 8;
    if (order > block_size) {
      set_error("subframe order exceeds block size");
      return false;
    }
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    if (!decode_residual(br, block_size, order, residual)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += kFixedCoeffs[order][j] * out[i - 1 - j];
      out[i] = residual[i - order] + pred;
    }
  } else if (sf_type >= 32) {  // LPC
    int order = sf_type - 31;
    if (order > block_size) {
      set_error("subframe order exceeds block size");
      return false;
    }
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bps);
    int precision = br.read(4) + 1;
    if (precision == 16) {
      set_error("invalid LPC precision");
      return false;
    }
    int shift = static_cast<int>(br.read_signed(5));
    if (shift < 0) {
      set_error("negative LPC shift");
      return false;
    }
    std::vector<int64_t> coeffs(order);
    for (int j = 0; j < order; ++j) coeffs[j] = br.read_signed(precision);
    if (!decode_residual(br, block_size, order, residual)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coeffs[j] * out[i - 1 - j];
      out[i] = residual[i - order] + (pred >> shift);
    }
  } else {
    set_error("reserved subframe type");
    return false;
  }
  if (br.fail) {
    set_error("unexpected end of FLAC stream");
    return false;
  }
  if (wasted)
    for (auto& v : out) v <<= wasted;
  return true;
}

const int kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, -8, -16,
                             256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

bool decode_flac(const std::vector<uint8_t>& d, Decoded& out) {
  if (d.size() < 8 || memcmp(d.data(), "fLaC", 4)) {
    set_error("not a FLAC file");
    return false;
  }
  size_t pos = 4;
  const uint8_t* si = nullptr;
  while (pos + 4 <= d.size()) {
    uint8_t header = d[pos];
    bool is_last = header >> 7;
    uint8_t btype = header & 0x7F;
    uint32_t length = (d[pos + 1] << 16) | (d[pos + 2] << 8) | d[pos + 3];
    if (btype == 0) {
      // STREAMINFO is exactly 34 bytes; a truncated file or a lying block
      // length must not let the BitReader run past the buffer.
      if (length < 34 || pos + 4 + 34 > d.size()) {
        set_error("truncated STREAMINFO");
        return false;
      }
      si = d.data() + pos + 4;
    }
    pos += 4 + length;
    if (is_last) break;
  }
  if (!si) {
    set_error("missing STREAMINFO");
    return false;
  }
  BitReader sir{si, 34};
  sir.read(16); sir.read(16); sir.read(24); sir.read(24);
  uint32_t sample_rate = sir.read(20);
  int channels = sir.read(3) + 1;
  int bps_stream = sir.read(5) + 1;
  uint64_t total_samples = (uint64_t(sir.read(4)) << 32) | sir.read(32);

  out.sample_rate = static_cast<int>(sample_rate);
  const float scale = 1.0f / float(int64_t(1) << (bps_stream - 1));
  const float inv_ch = 1.0f / channels;
  if (total_samples) {
    // untrusted 36-bit field: cap the upfront reservation (vector still
    // grows on demand for genuinely long streams)
    out.mono.reserve(std::min<uint64_t>(total_samples, 1ull << 26));
  }

  BitReader br{d.data(), d.size()};
  br.byte_pos = pos;
  std::vector<std::vector<int64_t>> sub(channels);
  uint64_t decoded = 0;

  while (br.bits_left() >= 16 &&
         (total_samples == 0 || decoded < total_samples)) {
    if (br.read(14) != 0x3FFE) {
      set_error("lost frame sync");
      return false;
    }
    br.read(1);
    br.read(1);
    int bs_code = br.read(4);
    int sr_code = br.read(4);
    int chan_assign = br.read(4);
    int ss_code = br.read(3);
    br.read(1);
    br.read_utf8();

    int block_size;
    if (bs_code == 0) {
      set_error("reserved block size code");
      return false;
    } else if (bs_code == 6) {
      block_size = br.read(8) + 1;
    } else if (bs_code == 7) {
      block_size = br.read(16) + 1;
    } else {
      block_size = kBlockSizes[bs_code];
    }
    if (sr_code == 12) br.read(8);
    else if (sr_code == 13 || sr_code == 14) br.read(16);
    int bps = kSampleSizes[ss_code] ? kSampleSizes[ss_code] : bps_stream;
    br.read(8);  // CRC-8

    if (chan_assign < 8) {
      if (chan_assign + 1 != channels) {
        set_error("frame/stream channel mismatch");
        return false;
      }
      for (int c = 0; c < channels; ++c)
        if (!decode_subframe(br, block_size, bps, sub[c])) return false;
    } else if (chan_assign <= 10 && channels != 2) {
      // the stereo-decorrelated assignments imply exactly 2 channels; a
      // bit-flipped header on a mono stream would otherwise write through
      // sub[1] (out of bounds — sub has one entry per STREAMINFO channel)
      set_error("frame/stream channel mismatch");
      return false;
    } else if (chan_assign == 8) {  // left/side
      if (!decode_subframe(br, block_size, bps, sub[0])) return false;
      if (!decode_subframe(br, block_size, bps + 1, sub[1])) return false;
      for (int i = 0; i < block_size; ++i) sub[1][i] = sub[0][i] - sub[1][i];
    } else if (chan_assign == 9) {  // right/side
      if (!decode_subframe(br, block_size, bps + 1, sub[0])) return false;
      if (!decode_subframe(br, block_size, bps, sub[1])) return false;
      for (int i = 0; i < block_size; ++i) sub[0][i] = sub[1][i] + sub[0][i];
    } else if (chan_assign == 10) {  // mid/side
      if (!decode_subframe(br, block_size, bps, sub[0])) return false;
      if (!decode_subframe(br, block_size, bps + 1, sub[1])) return false;
      for (int i = 0; i < block_size; ++i) {
        int64_t mid = sub[0][i], side = sub[1][i];
        int64_t left = ((mid << 1) | (side & 1)) + side;
        sub[0][i] = left >> 1;
        sub[1][i] = (left - (side << 1)) >> 1;
      }
    } else {
      set_error("reserved channel assignment");
      return false;
    }
    br.align();
    br.read(16);  // CRC-16

    uint64_t keep = block_size;
    if (total_samples && decoded + keep > total_samples)
      keep = total_samples - decoded;
    for (uint64_t i = 0; i < keep; ++i) {
      float acc = 0.f;
      for (int c = 0; c < channels; ++c) acc += sub[c][i] * scale;
      out.mono.push_back(acc * inv_ch);
    }
    decoded += block_size;
  }
  return true;
}

// ---------------------------------------------------------------------------
// Polyphase resampler (same construction as audio_io.py::_resample_kernel)
// ---------------------------------------------------------------------------
struct ResampleKernel {
  std::vector<float> taps;  // (new_r, width_taps) row-major
  int width = 0, n_taps = 0, orig_r = 0, new_r = 0;
};

std::mutex g_kernel_mutex;
std::map<std::pair<int, int>, ResampleKernel> g_kernels;

int64_t gcd64(int64_t a, int64_t b) { return b ? gcd64(b, a % b) : a; }

const ResampleKernel& get_kernel(int orig_sr, int new_sr) {
  std::lock_guard<std::mutex> lock(g_kernel_mutex);
  auto key = std::make_pair(orig_sr, new_sr);
  auto it = g_kernels.find(key);
  if (it != g_kernels.end()) return it->second;

  const int lowpass_width = 6;
  const double rolloff = 0.99;
  int g = static_cast<int>(gcd64(orig_sr, new_sr));
  int orig = orig_sr / g, nnew = new_sr / g;
  double base_freq = std::min(orig, nnew) * rolloff;
  int width = static_cast<int>(std::ceil(lowpass_width * orig / base_freq));
  int n_taps = 2 * width + orig;

  ResampleKernel k;
  k.width = width;
  k.n_taps = n_taps;
  k.orig_r = orig;
  k.new_r = nnew;
  k.taps.resize(size_t(nnew) * n_taps);
  double scale = base_freq / orig;
  for (int p = 0; p < nnew; ++p) {
    for (int j = 0; j < n_taps; ++j) {
      double idx = double(j - width) / orig;
      double t = (double(-p) / nnew + idx) * base_freq;
      t = std::max(-double(lowpass_width), std::min(double(lowpass_width), t));
      double w = std::cos(t * M_PI / lowpass_width / 2);
      w *= w;
      double sinc = t == 0.0 ? 1.0 : std::sin(M_PI * t) / (M_PI * t);
      k.taps[size_t(p) * n_taps + j] = static_cast<float>(sinc * w * scale);
    }
  }
  return g_kernels.emplace(key, std::move(k)).first->second;
}

void resample(std::vector<float>& x, int orig_sr, int new_sr) {
  if (orig_sr == new_sr) return;
  const ResampleKernel& k = get_kernel(orig_sr, new_sr);
  int64_t n_in = static_cast<int64_t>(x.size());
  int64_t target_len =
      (n_in * new_sr + orig_sr - 1) / orig_sr;  // ceil(new*n/orig)
  int64_t n_blocks = (n_in + k.orig_r - 1) / k.orig_r;

  std::vector<float> padded(k.width + n_in + k.width + k.orig_r, 0.f);
  std::copy(x.begin(), x.end(), padded.begin() + k.width);

  std::vector<float> out;
  out.reserve(n_blocks * k.new_r);
  for (int64_t b = 0; b < n_blocks; ++b) {
    const float* base = padded.data() + b * k.orig_r;
    for (int p = 0; p < k.new_r; ++p) {
      const float* taps = k.taps.data() + size_t(p) * k.n_taps;
      float acc = 0.f;
      for (int j = 0; j < k.n_taps; ++j) acc += base[j] * taps[j];
      out.push_back(acc);
    }
  }
  out.resize(target_len);
  x = std::move(out);
}

// ---------------------------------------------------------------------------
// Decode one file (by extension) to mono @ target_sr
// ---------------------------------------------------------------------------
bool decode_any(const char* path, int target_sr, Decoded& out) {
  std::vector<uint8_t> data;
  if (!read_file(path, data)) return false;
  std::string p(path);
  auto ends_with = [&](const char* ext) {
    size_t n = strlen(ext);
    return p.size() >= n &&
           std::equal(p.end() - n, p.end(), ext,
                      [](char a, char b) { return tolower(a) == b; });
  };
  bool ok;
  if (ends_with(".wav")) ok = decode_wav(data, out);
  else if (ends_with(".flac")) ok = decode_flac(data, out);
  else {
    set_error("unsupported container: " + p);
    return false;
  }
  if (!ok) return false;
  if (out.sample_rate <= 0) {  // sr 0 would NaN the resampler ratio (UB cast)
    set_error("invalid sample rate " + std::to_string(out.sample_rate));
    return false;
  }
  if (target_sr > 0 && out.sample_rate != target_sr) {
    resample(out.mono, out.sample_rate, target_sr);
    out.sample_rate = target_sr;
  }
  return true;
}

// Exception firewall: nothing may throw across the extern "C" boundary
// (or out of a worker thread -> std::terminate).
bool safe_decode(const char* path, int target_sr, Decoded& out) {
  try {
    return decode_any(path, target_sr, out);
  } catch (const std::exception& e) {
    set_error(std::string("decode exception: ") + e.what());
    return false;
  } catch (...) {
    set_error("decode exception: unknown");
    return false;
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// C API
// ---------------------------------------------------------------------------
extern "C" {

int atk_version() { return 3; }

static std::string g_last_error_copy;
static std::mutex g_err_mutex;

const char* atk_last_error() {
  std::lock_guard<std::mutex> lock(g_err_mutex);
  std::lock_guard<std::mutex> lock2(g_error_mutex);
  g_last_error_copy = g_error_store;
  return g_last_error_copy.c_str();
}

// Decode one file to mono float32 @ target_sr. Returns sample count written
// (clamped to max_samples), or -1 on error.
int64_t atk_decode_file(const char* path, int target_sr, float* out,
                        int64_t max_samples) {
  Decoded d;
  if (!safe_decode(path, target_sr, d)) return -1;
  int64_t n = std::min<int64_t>(d.mono.size(), max_samples);
  memcpy(out, d.mono.data(), n * sizeof(float));
  return n;
}

// Threaded batch decode into the device-ready padded layout:
//   row b = [reflect(head,pad) | clip | reflect(tail,pad) | zeros]
// with pad = n_fft/2.  ``row_len`` is the output row stride; pass 0 for the
// minimal clip_samples + 2*pad.  Consumers that need wider rows (the Pallas
// megakernel's over-allocated DMA windows) pass their stride directly so no
// host-side re-pad copy is ever needed — a (B, row) re-pad of a 10 s x64
// batch measured ~0.8 s on a 1-core host, dwarfing the decode itself.
// lengths[b] = clip samples (clamped to clip_samples), or -1 on decode error.
// ``fmt``: 0 = float32 rows; 1 = int16 PCM rows (sample = round(x*32768)
// clamped — the natural wire format: halves the host->device transfer, and
// the device reconstructs x = s/32768.  Exact roundtrip for mono 16-bit
// sources at the target rate; resampled/downmixed clips carry <=0.5/32768
// quantization noise, ~-96 dB).
// Returns the number of successfully decoded clips, or -1 on bad args.
}  // extern "C" (templates/overloads below need C++ linkage)

namespace {

inline void convert_sample(float x, float& out) { out = x; }
inline void convert_sample(float x, int16_t& out) {
  float v = x * 32768.0f;
  v = std::max(-32768.0f, std::min(32767.0f, v));
  out = static_cast<int16_t>(std::lrintf(v));
}

template <typename T>
int decode_batch_impl(const char** paths, int n, int target_sr,
                      int clip_samples, int n_fft, int n_threads,
                      int64_t row_len, T* out, int32_t* lengths) {
  const int pad = n_fft / 2;
  std::atomic<int> next{0}, n_ok{0};

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      T* row = out + int64_t(i) * row_len;
      Decoded d;
      if (!safe_decode(paths[i], target_sr, d) ||
          static_cast<int>(d.mono.size()) < n_fft) {
        memset(row, 0, row_len * sizeof(T));
        lengths[i] = -1;
        continue;
      }
      int len = std::min<int>(d.mono.size(), clip_samples);
      const float* x = d.mono.data();
      // non-finite screen runs HERE, before sample conversion: the int16
      // wire format cannot carry a NaN marker (std::min(32767, NaN) would
      // silently clamp it to full scale), so both wire formats report such
      // clips as decode failures — matching the pipeline's skip-and-log
      // semantics for the float path's downstream isfinite screen
      bool finite = true;
      for (int j = 0; j < len; ++j) {
        if (!std::isfinite(x[j])) { finite = false; break; }
      }
      if (!finite) {
        set_error(std::string(paths[i]) + ": non-finite samples");
        memset(row, 0, row_len * sizeof(T));
        lengths[i] = -1;
        continue;
      }
      for (int j = 0; j < len; ++j) convert_sample(x[j], row[pad + j]);
      for (int j = 0; j < pad; ++j) {
        // reflect = copies of already-converted samples (order-exact)
        row[j] = row[pad + (pad - j)];          // head: x[1..pad] reversed
        row[pad + len + j] = row[pad + len - 2 - j];  // tail reflect
      }
      // zero only the unwritten tail (the head/clip/reflect span is fully
      // written above): full-row memsets cost more than the decode at wide
      // megakernel strides
      const int64_t written = int64_t(pad) + len + pad;
      memset(row + written, 0, (row_len - written) * sizeof(T));
      lengths[i] = len;
      n_ok.fetch_add(1);
    }
  };

  int threads = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return n_ok.load();
}

}  // namespace

extern "C" int atk_decode_batch(
    const char** paths, int n, int target_sr,
    int clip_samples, int n_fft, int n_threads,
    int64_t row_len, int fmt, void* out, int32_t* lengths) {
  const int pad = n_fft / 2;
  const int64_t row_min = int64_t(clip_samples) + 2 * pad;
  if (clip_samples < n_fft) {
    // the head/tail reflections read back pad already-written samples of the
    // clip span, which requires len >= pad+1 on every decoded row; clips are
    // clamped to clip_samples, so requiring a full analysis window bounds it
    set_error("clip_samples " + std::to_string(clip_samples) + " < n_fft " +
              std::to_string(n_fft) + " (reflection padding needs one window)");
    return -1;
  }
  if (row_len == 0) row_len = row_min;
  if (row_len < row_min) {
    set_error("row_len " + std::to_string(row_len) + " < clip+2*pad " +
              std::to_string(row_min));
    return -1;
  }
  if (fmt == 0)
    return decode_batch_impl(paths, n, target_sr, clip_samples, n_fft,
                             n_threads, row_len, static_cast<float*>(out),
                             lengths);
  if (fmt == 1)
    return decode_batch_impl(paths, n, target_sr, clip_samples, n_fft,
                             n_threads, row_len, static_cast<int16_t*>(out),
                             lengths);
  set_error("unknown fmt " + std::to_string(fmt));
  return -1;
}

// Native runtime components (SURVEY.md §2.2: TPU-native equivalents of the
// reference's C++ pieces).
//
//   * WAV decode (replaces torchaudio/sox C++): PCM16/24/32 + float32, mono
//     downmix, threaded batch API for the data-loader hot path.
//   * ARPA n-gram loader + dense-table expansion (replaces the KenLM C++
//     binding): parses the LM and fully applies backoff into the dense
//     (V^(n-1), V) table the TPU beam-search kernels gather from.  The pure
//     -Python expansion is O(V^n) interpreter loops (minutes at 4-gram);
//     this runs in ~a second.
//   * batch Levenshtein (WER/CER scoring hot loop at eval time).
//
// C ABI only (ctypes-bound from pytorch_asr_tpu/native/__init__.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- WAV decode

// Returns 0 on success; fills out[0:n_samples] (mono, [-1,1]) and *sample_rate.
int asr_read_wav(const char* path, float* out, int64_t max_samples,
                 int64_t* n_samples, int32_t* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  auto fail = [&](int code) { fclose(f); return code; };

  char riff[4];
  uint32_t riff_size;
  char wave[4];
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) ||
      fread(&riff_size, 4, 1, f) != 1 || fread(wave, 1, 4, f) != 4 ||
      memcmp(wave, "WAVE", 4))
    return fail(2);

  uint16_t fmt_code = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  bool got_fmt = false;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) return fail(3);
    if (!memcmp(id, "fmt ", 4)) {
      uint16_t block_align;
      uint32_t byte_rate;
      if (fread(&fmt_code, 2, 1, f) != 1 || fread(&channels, 2, 1, f) != 1 ||
          fread(&rate, 4, 1, f) != 1 || fread(&byte_rate, 4, 1, f) != 1 ||
          fread(&block_align, 2, 1, f) != 1 || fread(&bits, 2, 1, f) != 1)
        return fail(4);
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
      got_fmt = true;
    } else if (!memcmp(id, "data", 4)) {
      if (!got_fmt || channels == 0) return fail(5);
      int64_t bytes_per = bits / 8;
      int64_t frames = size / (bytes_per * channels);
      int64_t n = std::min<int64_t>(frames, max_samples);
      std::vector<uint8_t> buf(size);
      if (fread(buf.data(), 1, size, f) != size) return fail(6);
      for (int64_t i = 0; i < n; i++) {
        double acc = 0;
        for (int c = 0; c < channels; c++) {
          const uint8_t* p = buf.data() + (i * channels + c) * bytes_per;
          double v = 0;
          if (fmt_code == 3 && bits == 32) {          // IEEE float
            float fv;
            memcpy(&fv, p, 4);
            v = fv;
          } else if (bits == 16) {
            int16_t s;
            memcpy(&s, p, 2);
            v = s / 32768.0;
          } else if (bits == 32) {
            int32_t s;
            memcpy(&s, p, 4);
            v = s / 2147483648.0;
          } else if (bits == 24) {
            int32_t s = (p[0] << 8) | (p[1] << 16) | ((int32_t)(int8_t)p[2] << 24);
            v = (s >> 8) / 8388608.0;
          } else if (bits == 8) {
            v = ((int)p[0] - 128) / 128.0;
          } else {
            return fail(7);
          }
          acc += v;
        }
        out[i] = (float)(acc / channels);
      }
      *n_samples = n;
      *sample_rate = (int32_t)rate;
      fclose(f);
      return 0;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
}

// Threaded batch decode into a contiguous (n, max_samples) buffer.
// rc[i] = per-file return code; n_samples[i] = valid samples.
void asr_read_wav_batch(const char** paths, int32_t n, float* out,
                        int64_t max_samples, int64_t* n_samples,
                        int32_t* rates, int32_t* rc, int32_t n_threads) {
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    while (true) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      rc[i] = asr_read_wav(paths[i], out + (int64_t)i * max_samples,
                           max_samples, &n_samples[i], &rates[i]);
    }
  };
  int32_t nt = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// --------------------------------------------------------------- FLAC decode
//
// From-scratch FLAC subset decoder (replaces torchaudio/sox's libFLAC path;
// no FLAC library exists in this environment).  Supports CONSTANT/VERBATIM/
// FIXED(0-4)/LPC(1-32) subframes, RICE/RICE2 partitioned residuals with
// escapes, wasted bits, all channel assignments, 8..32-bit samples, fixed and
// variable blocking, CRC-8/16 verification.  Bit-exact vs the Python oracle
// in pytorch_asr_tpu/data/flac.py (tested in tests/test_native.py).

namespace flacdec {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte = 0;
  int bit = 0;
  bool bad = false;

  uint64_t read(int n) {
    uint64_t out = 0;
    while (n > 0) {
      if (byte >= size) { bad = true; return 0; }
      int avail = 8 - bit;
      int take = n < avail ? n : avail;
      out = (out << take) | ((data[byte] >> (avail - take)) & ((1u << take) - 1));
      bit += take;
      n -= take;
      if (bit == 8) { bit = 0; byte++; }
    }
    return out;
  }
  int64_t read_signed(int n) {
    uint64_t v = read(n);
    if (n > 0 && (v >> (n - 1)) & 1) return (int64_t)v - ((int64_t)1 << n);
    return (int64_t)v;
  }
  int read_unary() {
    int q = 0;
    while (!bad && read(1) == 0) q++;
    return q;
  }
  void align() { if (bit) { bit = 0; byte++; } }
  int64_t read_utf8() {
    uint32_t b0 = (uint32_t)read(8);
    if (b0 < 0x80) return b0;
    int n = 0;
    for (uint32_t m = 0x80; b0 & m; m >>= 1) n++;
    if (n < 2 || n > 7) { bad = true; return -1; }
    int64_t v = b0 & (0xFFu >> (n + 1));
    for (int i = 0; i < n - 1; i++) {
      uint32_t c = (uint32_t)read(8);
      if ((c & 0xC0u) != 0x80u) { bad = true; return -1; }
      v = (v << 6) | (c & 0x3F);
    }
    return v;
  }
};

inline uint8_t crc8(const uint8_t* p, size_t n) {
  uint8_t crc = 0;
  for (size_t i = 0; i < n; i++) {
    crc ^= p[i];
    for (int b = 0; b < 8; b++)
      crc = (crc & 0x80) ? (uint8_t)((crc << 1) ^ 0x07) : (uint8_t)(crc << 1);
  }
  return crc;
}

inline uint16_t crc16(const uint8_t* p, size_t n) {
  uint16_t crc = 0;
  for (size_t i = 0; i < n; i++) {
    crc ^= (uint16_t)(p[i] << 8);
    for (int b = 0; b < 8; b++)
      crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x8005) : (uint16_t)(crc << 1);
  }
  return crc;
}

static const int kFixedCoeffs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

// residual into res[0:blocksize-order]; false on malformed stream
bool decode_residual(BitReader& br, int blocksize, int order,
                     std::vector<int64_t>& res) {
  int method = (int)br.read(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = (1u << plen) - 1;
  int po = (int)br.read(4);
  int nparts = 1 << po;
  if (blocksize % nparts) return false;
  if (po > 0 && (blocksize >> po) <= order) return false;
  if ((blocksize >> po) < order) return false;
  res.clear();
  res.reserve(blocksize - order);
  for (int p = 0; p < nparts; p++) {
    int count = (blocksize >> po) - (p == 0 ? order : 0);
    uint32_t param = (uint32_t)br.read(plen);
    if (param == escape) {
      int bits = (int)br.read(5);
      for (int i = 0; i < count; i++)
        res.push_back(bits ? br.read_signed(bits) : 0);
    } else {
      for (int i = 0; i < count; i++) {
        uint64_t q = (uint64_t)br.read_unary();
        uint64_t r = param ? br.read(param) : 0;
        uint64_t v = (q << param) | r;
        res.push_back((int64_t)(v >> 1) ^ -(int64_t)(v & 1));  // zigzag
      }
    }
    if (br.bad) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int blocksize, int bps,
                     std::vector<int64_t>& out) {
  if (br.read(1)) return false;                       // padding bit
  int t = (int)br.read(6);
  int wasted = 0;
  if (br.read(1)) wasted = 1 + br.read_unary();
  int eff = bps - wasted;
  if (eff <= 0 || br.bad) return false;
  out.clear();
  out.reserve(blocksize);
  std::vector<int64_t> res;
  if (t == 0) {                                       // CONSTANT
    int64_t v = br.read_signed(eff);
    out.assign(blocksize, v);
  } else if (t == 1) {                                // VERBATIM
    for (int i = 0; i < blocksize; i++) out.push_back(br.read_signed(eff));
  } else if (t >= 8 && t <= 12) {                     // FIXED
    int order = t - 8;
    for (int i = 0; i < order; i++) out.push_back(br.read_signed(eff));
    if (!decode_residual(br, blocksize, order, res)) return false;
    for (int i = order; i < blocksize; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++)
        pred += (int64_t)kFixedCoeffs[order][j] * out[i - 1 - j];
      out.push_back(res[i - order] + pred);
    }
  } else if (t >= 32) {                               // LPC
    int order = t - 31;
    for (int i = 0; i < order; i++) out.push_back(br.read_signed(eff));
    int prec = (int)br.read(4);
    if (prec == 15) return false;
    prec += 1;
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    int64_t coefs[32];
    for (int i = 0; i < order; i++) coefs[i] = br.read_signed(prec);
    if (!decode_residual(br, blocksize, order, res)) return false;
    for (int i = order; i < blocksize; i++) {
      int64_t acc = 0;
      for (int j = 0; j < order; j++) acc += coefs[j] * out[i - 1 - j];
      out.push_back(res[i - order] + (acc >> shift));
    }
  } else {
    return false;                                     // reserved
  }
  if (br.bad) return false;
  if (wasted)
    for (auto& v : out) v <<= wasted;
  return true;
}

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bps = 0;
  uint64_t total = 0;
};

// (blocksize, channels) samples appended per-channel; false on error
bool decode_frame(BitReader& br, const StreamInfo& si,
                  std::vector<std::vector<int64_t>>& chans, int* out_bs) {
  size_t start = br.byte;
  if (br.read(14) != 0x3FFE) return false;
  if (br.read(1)) return false;
  br.read(1);                                         // blocking strategy
  int bs_code = (int)br.read(4);
  int sr_code = (int)br.read(4);
  int ch_code = (int)br.read(4);
  int ss_code = (int)br.read(3);
  if (br.read(1)) return false;
  br.read_utf8();
  int blocksize;
  if (bs_code == 0) return false;
  else if (bs_code == 1) blocksize = 192;
  else if (bs_code <= 5) blocksize = 576 << (bs_code - 2);
  else if (bs_code == 6) blocksize = (int)br.read(8) + 1;
  else if (bs_code == 7) blocksize = (int)br.read(16) + 1;
  else blocksize = 256 << (bs_code - 8);
  if (sr_code == 12) br.read(8);
  else if (sr_code == 13 || sr_code == 14) br.read(16);
  else if (sr_code == 15) return false;
  static const int ss_map[8] = {0, 8, 12, -1, 16, 20, 24, 32};
  int bps = ss_code == 0 ? si.bps : ss_map[ss_code];
  if (bps <= 0) return false;
  br.align();
  if (br.bad) return false;
  uint8_t hdr_crc = (uint8_t)br.read(8);
  if (crc8(br.data + start, br.byte - 1 - start) != hdr_crc) return false;

  int nch = ch_code <= 7 ? ch_code + 1 : 2;
  if (nch != si.channels) return false;        // frame vs STREAMINFO mismatch
  if ((int)chans.size() < nch) chans.resize(nch);
  std::vector<int64_t> a, b;
  if (ch_code <= 7) {
    for (int c = 0; c < nch; c++) {
      if (!decode_subframe(br, blocksize, bps, a)) return false;
      chans[c].insert(chans[c].end(), a.begin(), a.end());
    }
  } else if (ch_code == 8) {                          // left/side
    if (!decode_subframe(br, blocksize, bps, a)) return false;
    if (!decode_subframe(br, blocksize, bps + 1, b)) return false;
    for (int i = 0; i < blocksize; i++) {
      chans[0].push_back(a[i]);
      chans[1].push_back(a[i] - b[i]);
    }
  } else if (ch_code == 9) {                          // right/side
    if (!decode_subframe(br, blocksize, bps + 1, a)) return false;
    if (!decode_subframe(br, blocksize, bps, b)) return false;
    for (int i = 0; i < blocksize; i++) {
      chans[0].push_back(a[i] + b[i]);
      chans[1].push_back(b[i]);
    }
  } else if (ch_code == 10) {                         // mid/side
    if (!decode_subframe(br, blocksize, bps, a)) return false;
    if (!decode_subframe(br, blocksize, bps + 1, b)) return false;
    for (int i = 0; i < blocksize; i++) {
      int64_t m2 = (a[i] << 1) | (b[i] & 1);
      chans[0].push_back((m2 + b[i]) >> 1);
      chans[1].push_back((m2 - b[i]) >> 1);
    }
  } else {
    return false;
  }
  br.align();
  if (br.bad) return false;
  uint16_t frame_crc = (uint16_t)br.read(16);
  if (crc16(br.data + start, br.byte - 2 - start) != frame_crc) return false;
  *out_bs = blocksize;
  return !br.bad;
}

}  // namespace flacdec

// Returns 0 on success; fills out[0:n_samples] (mono downmix, [-1,1]).
int asr_read_flac(const char* path, float* out, int64_t max_samples,
                  int64_t* n_samples, int32_t* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data((size_t)fsize);
  if (fsize <= 8 || fread(data.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
    fclose(f);
    return 2;
  }
  fclose(f);
  if (memcmp(data.data(), "fLaC", 4)) return 3;

  flacdec::StreamInfo si;
  size_t pos = 4;
  bool have_si = false;
  while (true) {
    if (pos + 4 > data.size()) return 4;
    bool last = data[pos] & 0x80;
    int btype = data[pos] & 0x7F;
    uint32_t len = ((uint32_t)data[pos + 1] << 16) |
                   ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    if (pos + 4 + len > data.size()) return 4;
    if (btype == 0) {
      if (len < 34) return 5;
      flacdec::BitReader br{data.data() + pos + 4, len};
      br.read(16); br.read(16); br.read(24); br.read(24);
      si.sample_rate = (uint32_t)br.read(20);
      si.channels = (int)br.read(3) + 1;
      si.bps = (int)br.read(5) + 1;
      si.total = br.read(36);
      have_si = true;
    }
    pos += 4 + len;
    if (last) break;
  }
  if (!have_si) return 5;

  flacdec::BitReader br{data.data(), data.size()};
  br.byte = pos;
  std::vector<std::vector<int64_t>> chans;
  uint64_t got = 0;
  while ((si.total == 0 || got < si.total) && br.byte < br.size) {
    int bs = 0;
    if (!flacdec::decode_frame(br, si, chans, &bs)) return 6;
    got += (uint64_t)bs;
  }
  int nch = (int)chans.size();
  if (nch == 0) { *n_samples = 0; *sample_rate = (int32_t)si.sample_rate; return 0; }
  int64_t n = (int64_t)chans[0].size();
  if (si.total) n = std::min<int64_t>(n, (int64_t)si.total);
  n = std::min(n, max_samples);
  double scale = 1.0 / (double)((int64_t)1 << (si.bps - 1));
  for (int64_t i = 0; i < n; i++) {
    double acc = 0;
    for (int c = 0; c < nch; c++) acc += (double)chans[c][i];
    out[i] = (float)(acc / nch * scale);
  }
  *n_samples = n;
  *sample_rate = (int32_t)si.sample_rate;
  return 0;
}

void asr_read_flac_batch(const char** paths, int32_t n, float* out,
                         int64_t max_samples, int64_t* n_samples,
                         int32_t* rates, int32_t* rc, int32_t n_threads) {
  std::atomic<int32_t> next(0);
  auto worker = [&]() {
    while (true) {
      int32_t i = next.fetch_add(1);
      if (i >= n) break;
      rc[i] = asr_read_flac(paths[i], out + (int64_t)i * max_samples,
                            max_samples, &n_samples[i], &rates[i]);
    }
  };
  int32_t nt = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// ---------------------------------------------------------- batch Levenshtein

int64_t asr_edit_distance(const int32_t* a, int64_t na, const int32_t* b,
                          int64_t nb) {
  if (na < nb) {
    std::swap(a, b);
    std::swap(na, nb);
  }
  std::vector<int64_t> prev(nb + 1), cur(nb + 1);
  for (int64_t j = 0; j <= nb; j++) prev[j] = j;
  for (int64_t i = 1; i <= na; i++) {
    cur[0] = i;
    for (int64_t j = 1; j <= nb; j++) {
      int64_t sub = prev[j - 1] + (a[i - 1] != b[j - 1]);
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

void asr_edit_distance_batch(const int32_t* refs, const int64_t* ref_off,
                             const int64_t* ref_len, const int32_t* hyps,
                             const int64_t* hyp_off, const int64_t* hyp_len,
                             int64_t n, int64_t* out, int32_t n_threads) {
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      out[i] = asr_edit_distance(refs + ref_off[i], ref_len[i],
                                 hyps + hyp_off[i], hyp_len[i]);
    }
  };
  int32_t nt = std::max(1, (int32_t)std::min<int64_t>(n_threads, n));
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// ------------------------------------------------- ARPA -> dense fusion table

namespace {

struct NgramTables {
  int order = 1;
  // key: ids packed base-(V+1), value: {logprob, backoff} (natural log)
  std::vector<std::unordered_map<uint64_t, std::pair<float, float>>> grams;
};

uint64_t pack(const std::vector<int>& ids, int base) {
  uint64_t k = 0;
  for (int id : ids) k = k * base + (uint64_t)(id + 1);
  return k;
}

// Backoff score: log P(c | ctx) with ctx as id vector (no zeros).
float score(const NgramTables& t, std::vector<int> ctx, int c, int vocab) {
  if ((int)ctx.size() > t.order - 1)
    ctx.erase(ctx.begin(), ctx.end() - (t.order - 1));
  float backoff = 0.0f;
  while (true) {
    std::vector<int> ng = ctx;
    ng.push_back(c);
    uint64_t key = pack(ng, vocab + 1);
    auto& m = t.grams[ng.size()];
    auto it = m.find(key);
    if (it != m.end()) return it->second.first + backoff;
    if (ctx.empty()) {
      auto u = t.grams[1].find(pack({c}, vocab + 1));
      return backoff + (u != t.grams[1].end() ? u->second.first : -20.0f);
    }
    auto bo = t.grams[ctx.size()].find(pack(ctx, vocab + 1));
    if (bo != t.grams[ctx.size()].end()) backoff += bo->second.second;
    ctx.erase(ctx.begin());
  }
}

}  // namespace

// Parses an ARPA char-LM and writes the fully-backed-off dense table
// (n_ctx = n_vocab^(order-1) rows, n_vocab cols, natural log).
// vocab: n_vocab strings; tokens matching none (e.g. <s>) are skipped.
// Returns the LM order, or -1 on error.
int32_t asr_arpa_dense(const char* path, const char** vocab, int32_t n_vocab,
                       int32_t order_cap, float* out, int32_t n_threads) {
  FILE* f = fopen(path, "r");
  if (!f) return -1;
  std::unordered_map<std::string, int> sym2id;
  for (int i = 0; i < n_vocab; i++) sym2id[vocab[i]] = i;
  sym2id["<space>"] = sym2id.count(" ") ? sym2id[" "] : -1;

  NgramTables t;
  t.grams.resize(16);
  char line[4096];
  int cur_n = 0;
  while (fgets(line, sizeof line, f)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.empty()) continue;
    if (s[0] == '\\') {
      size_t dash = s.find("-grams:");
      if (dash != std::string::npos) {
        cur_n = atoi(s.substr(1, dash - 1).c_str());
        t.order = std::max(t.order, cur_n);
      }
      if (s.rfind("\\end\\", 0) == 0) break;
      continue;
    }
    if (cur_n == 0) continue;
    // fields: logprob \t w1 w2 .. wn [\t backoff]
    std::vector<std::string> fields;
    size_t start = 0;
    for (size_t i = 0; i <= s.size(); i++) {
      if (i == s.size() || s[i] == '\t' || s[i] == ' ') {
        if (i > start) fields.push_back(s.substr(start, i - start));
        start = i + 1;
      }
    }
    if ((int)fields.size() < cur_n + 1) continue;
    float lp = strtof(fields[0].c_str(), nullptr) * (float)M_LN10;
    std::vector<int> ids;
    bool ok = true;
    for (int i = 0; i < cur_n; i++) {
      auto it = sym2id.find(fields[1 + i]);
      if (it == sym2id.end() || it->second < 0) {
        ok = false;
        break;
      }
      ids.push_back(it->second);
    }
    if (!ok) continue;
    float bo = 0.0f;
    if ((int)fields.size() >= cur_n + 2)
      bo = strtof(fields[1 + cur_n].c_str(), nullptr) * (float)M_LN10;
    t.grams[cur_n][pack(ids, n_vocab + 1)] = {lp, bo};
  }
  fclose(f);

  int order = std::min((int)t.order, (int)order_cap);
  int64_t n_ctx = 1;
  for (int i = 0; i < order - 1; i++) n_ctx *= n_vocab;

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      int64_t row = next.fetch_add(1);
      if (row >= n_ctx) break;
      // decode row as base-V digits (oldest most significant), drop zeros
      std::vector<int> ctx;
      int64_t r = row;
      std::vector<int> digits(order - 1);
      for (int pos = order - 2; pos >= 0; pos--) {
        digits[pos] = r % n_vocab;
        r /= n_vocab;
      }
      for (int d : digits)
        if (d != 0) ctx.push_back(d);
      for (int c = 0; c < n_vocab; c++)
        out[row * n_vocab + c] = score(t, ctx, c, n_vocab);
    }
  };
  int nt = std::max(1, (int)std::min<int64_t>(n_threads, n_ctx));
  std::vector<std::thread> threads;
  for (int i = 0; i < nt; i++) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return order;
}

}  // extern "C"

// fqruntime: native host runtime for the TPU FASTQ codec.
//
// The TPU does the dense transforms; this library does the host-side
// irregular byte work at memory speed with sequential access patterns:
// FASTQ record scanning (the C++ analog of the reference's ReadSlice-based
// parser hot loop, internal/fqparser/parser.go:188-243), variable-length
// row gather/flatten/scatter between padded matrices and wire streams,
// u16-length-prefixed and N-position stream building/parsing
// (internal/compress/compress.go:490-519,944-1078), record assembly, and
// in-place quality integration for the CPU fallback path.
//
// Build: g++ -O3 -shared -fPIC (see build.py). Pure C ABI for ctypes.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <ctime>
#include <mutex>
#include <new>
#include <vector>

#include <zstd.h>

#if defined(__AVX2__)
#include <immintrin.h>
#define FQ_AVX2 1
#endif

// ---------------------------------------------------------------------------
// SIMD row kernels (AVX2/SSE). Each has a scalar twin in the callers below;
// byte-identical output is asserted by the runtime equivalence tests
// (tests/test_codec_reference.py, tests/test_mt_pipeline.py) against
// ops/reference.py.
// ---------------------------------------------------------------------------
#ifdef FQ_AVX2
namespace {

// 2-bit pack of 32 bases -> 8 bytes (LSB-first within byte,
// reference sequence.go:70-73 layout). Returns a 32-bit mask of
// non-ACGT positions (bit j = seq[j] invalid) for N-side-stream
// handling by the caller. Case-insensitive via &0xDF, matching the
// scalar code_lut (non-ACGT packs as code 0 == 'A').
inline uint32_t pack32_avx2(const uint8_t* seq, uint8_t* dst) {
  const __m256i v = _mm256_loadu_si256((const __m256i*)seq);
  const __m256i up = _mm256_and_si256(v, _mm256_set1_epi8((char)0xDF));
  const __m256i isA = _mm256_cmpeq_epi8(up, _mm256_set1_epi8('A'));
  const __m256i isC = _mm256_cmpeq_epi8(up, _mm256_set1_epi8('C'));
  const __m256i isG = _mm256_cmpeq_epi8(up, _mm256_set1_epi8('G'));
  const __m256i isT = _mm256_cmpeq_epi8(up, _mm256_set1_epi8('T'));
  const __m256i code = _mm256_or_si256(
      _mm256_or_si256(_mm256_and_si256(isC, _mm256_set1_epi8(1)),
                      _mm256_and_si256(isG, _mm256_set1_epi8(2))),
      _mm256_and_si256(isT, _mm256_set1_epi8(3)));
  const __m256i valid = _mm256_or_si256(_mm256_or_si256(isA, isC),
                                        _mm256_or_si256(isG, isT));
  // c0 + 4*c1 per byte pair -> u16, then + 16*(c2 + 4*c3) -> u32 whose
  // low byte is c0|c1<<2|c2<<4|c3<<6.
  const __m256i m1 =
      _mm256_maddubs_epi16(code, _mm256_set1_epi16(0x0401));
  const __m256i m2 = _mm256_madd_epi16(m1, _mm256_set1_epi32(0x00100001));
  const __m256i shuf = _mm256_shuffle_epi8(
      m2, _mm256_setr_epi8(0, 4, 8, 12, -1, -1, -1, -1, -1, -1, -1, -1, -1,
                           -1, -1, -1, 0, 4, 8, 12, -1, -1, -1, -1, -1, -1,
                           -1, -1, -1, -1, -1, -1));
  const uint32_t lo = (uint32_t)_mm_cvtsi128_si32(_mm256_castsi256_si128(shuf));
  const uint32_t hi =
      (uint32_t)_mm_cvtsi128_si32(_mm256_extracti128_si256(shuf, 1));
  memcpy(dst, &lo, 4);
  memcpy(dst + 4, &hi, 4);
  return ~(uint32_t)_mm256_movemask_epi8(valid);
}

// Unpack 16 packed bytes -> 64 bases via nibble pshufb LUTs + byte
// interleave; the inverse of pack32_avx2 sans N patching.
inline void unpack16_sse(const __m128i p, uint8_t* dst) {
  const __m128i lut_f0 = _mm_setr_epi8('A', 'C', 'G', 'T', 'A', 'C', 'G', 'T',
                                       'A', 'C', 'G', 'T', 'A', 'C', 'G', 'T');
  const __m128i lut_f1 = _mm_setr_epi8('A', 'A', 'A', 'A', 'C', 'C', 'C', 'C',
                                       'G', 'G', 'G', 'G', 'T', 'T', 'T', 'T');
  const __m128i mask0f = _mm_set1_epi8(0x0F);
  const __m128i lo = _mm_and_si128(p, mask0f);
  const __m128i hi = _mm_and_si128(_mm_srli_epi16(p, 4), mask0f);
  const __m128i b0 = _mm_shuffle_epi8(lut_f0, lo);
  const __m128i b1 = _mm_shuffle_epi8(lut_f1, lo);
  const __m128i b2 = _mm_shuffle_epi8(lut_f0, hi);
  const __m128i b3 = _mm_shuffle_epi8(lut_f1, hi);
  const __m128i t0 = _mm_unpacklo_epi8(b0, b1);
  const __m128i t1 = _mm_unpackhi_epi8(b0, b1);
  const __m128i t2 = _mm_unpacklo_epi8(b2, b3);
  const __m128i t3 = _mm_unpackhi_epi8(b2, b3);
  _mm_storeu_si128((__m128i*)dst, _mm_unpacklo_epi16(t0, t2));
  _mm_storeu_si128((__m128i*)(dst + 16), _mm_unpackhi_epi16(t0, t2));
  _mm_storeu_si128((__m128i*)(dst + 32), _mm_unpacklo_epi16(t1, t3));
  _mm_storeu_si128((__m128i*)(dst + 48), _mm_unpackhi_epi16(t1, t3));
}

// Unpack a whole row with exact-length stores (no overshoot: the tail
// goes through a stack temp so short rows and final records are safe).
inline void unpack_row_sse(const uint8_t* packed, long long len,
                           uint8_t* dst) {
  long long j = 0;
  while (j + 64 <= len) {
    unpack16_sse(_mm_loadu_si128((const __m128i*)(packed + (j >> 2))), dst + j);
    j += 64;
  }
  if (j < len) {
    uint8_t ptmp[16], otmp[64];
    const long long prem = ((len - j) + 3) >> 2;
    memcpy(ptmp, packed + (j >> 2), (size_t)prem);
    unpack16_sse(_mm_loadu_si128((const __m128i*)ptmp), otmp);
    memcpy(dst + j, otmp, (size_t)(len - j));
  }
}

// Quality delta-integrate + denormalize one row: dst[k] = qoffset +
// sum(src[0..k]) mod 256, via SSE byte prefix sums with a running carry.
inline void integrate_row_sse(const uint8_t* src, long long len,
                              uint8_t qoffset, uint8_t* dst) {
  uint8_t carry = qoffset;
  long long j = 0;
  for (; j + 16 <= len; j += 16) {
    __m128i x = _mm_loadu_si128((const __m128i*)(src + j));
    x = _mm_add_epi8(x, _mm_slli_si128(x, 1));
    x = _mm_add_epi8(x, _mm_slli_si128(x, 2));
    x = _mm_add_epi8(x, _mm_slli_si128(x, 4));
    x = _mm_add_epi8(x, _mm_slli_si128(x, 8));
    x = _mm_add_epi8(x, _mm_set1_epi8((char)carry));
    _mm_storeu_si128((__m128i*)(dst + j), x);
    carry = (uint8_t)_mm_extract_epi8(x, 15);
  }
  for (; j < len; j++) {
    carry = (uint8_t)(carry + src[j]);
    dst[j] = carry;
  }
}

}  // namespace
#endif  // FQ_AVX2

extern "C" {

// Error codes shared with bindings.py
enum {
  FQ_OK = 0,
  FQ_ERR_HEADER = 1,      // header line must start with '@'
  FQ_ERR_PLUS = 2,        // separator line must start with '+'
  FQ_ERR_LEN_MISMATCH = 3 // sequence and quality lengths must match
};

// ---------------------------------------------------------------------------
// FASTQ record scanning
// ---------------------------------------------------------------------------

#ifdef FQ_AVX2
// Forward-only newline iterator: one 32-byte compare+movemask sweep feeds
// positions from a cached bitmask, replacing 4 memchr calls per record
// (each with fixed call overhead on ~38-152 byte FASTQ lines).
struct FqNlIter {
  const uint8_t* data;
  long long n;
  long long cur;   // base offset of the block `mask` covers
  uint32_t mask;   // unconsumed '\n' bits in [cur, cur+32)
  FqNlIter(const uint8_t* d, long long nn)
      : data(d), n(nn), cur(-32), mask(0) {}
  // next unconsumed newline offset, or -1 at end of buffer
  inline long long next() {
    for (;;) {
      if (mask) {
        const int b = __builtin_ctz(mask);
        mask &= mask - 1;
        return cur + b;
      }
      cur += 32;
      if (cur >= n) return -1;
      if (cur + 32 <= n) {
        const __m256i v = _mm256_loadu_si256((const __m256i*)(data + cur));
        mask = (uint32_t)_mm256_movemask_epi8(
            _mm256_cmpeq_epi8(v, _mm256_set1_epi8('\n')));
      } else {  // tail block
        for (long long i = cur; i < n; i++)
          if (data[i] == '\n') mask |= 1u << (i - cur);
        if (!mask) { cur = n; return -1; }
      }
    }
  }
};
#endif

// Scan up to max_records complete 4-line records from data[0:n).
// offsets layout per record: {hdr_start, hdr_len, seq_start, seq_len,
//                             plus_start, plus_len, qual_start, qual_len}
// ('@'/'+' already stripped from starts/lens; '\r' before '\n' stripped).
// On success returns the record count, sets *consumed to the byte offset
// one past the last complete record, *error to FQ_OK.
// On a validation error returns -1 with *error set.
// Validation order matches record-at-a-time parsing: the failing check at
// the lowest line index wins.
// ``offsets`` may be null (validate/frame only — the MT prelude, whose
// workers re-parse their blocks in the fused walk anyway, E056).
// ``qmin_io``: optional 2-byte {min, any} accumulator for Phred
// detection, folded into this same pass so the prelude touches the text
// once instead of scanning then re-reading the quality lines.
long long fq_scan_records_ex(const uint8_t* data, long long n,
                             long long max_records, long long* offsets,
                             long long* consumed, int* error,
                             uint8_t* qmin_io) {
  *error = FQ_OK;
  *consumed = 0;
  long long pos = 0;
  long long rec = 0;
#ifdef FQ_AVX2
  FqNlIter nl_it(data, n);
  __m256i vqmin = _mm256_set1_epi8((char)0xFF);
#endif
  uint8_t qmn = 0xFF;
  bool qany = false;
  while (rec < max_records) {
    long long line_start[4], line_len[4];
    long long p = pos;
    int complete = 1;
    for (int li = 0; li < 4; li++) {
#ifdef FQ_AVX2
      const long long end = nl_it.next();
      if (end < 0) {
        // Partial record at EOF: its complete lines were already validated
        // as they were read (matching the sequential reader); unterminated
        // trailing bytes are never validated.
        complete = 0;
        break;
      }
#else
      const uint8_t* nl =
          (const uint8_t*)memchr(data + p, '\n', (size_t)(n - p));
      if (!nl) {
        complete = 0;
        break;
      }
      long long end = nl - data;
#endif
      long long len = end - p;
      if (len > 0 && data[end - 1] == '\r') len--;
      // structural checks as each line is read
      if (li == 0) {
        if (len == 0 || data[p] != '@') {
          *error = FQ_ERR_HEADER;
          return -1;
        }
        line_start[0] = p + 1;
        line_len[0] = len - 1;
      } else if (li == 2) {
        if (len == 0 || data[p] != '+') {
          *error = FQ_ERR_PLUS;
          return -1;
        }
        line_start[2] = p + 1;
        line_len[2] = len - 1;
      } else {
        line_start[li] = p;
        line_len[li] = len;
      }
      p = end + 1;
    }
    if (!complete) break;
    if (line_len[1] != line_len[3]) {
      *error = FQ_ERR_LEN_MISMATCH;
      return -1;
    }
    if (offsets) {
      long long* o = offsets + rec * 8;
      o[0] = line_start[0]; o[1] = line_len[0];
      o[2] = line_start[1]; o[3] = line_len[1];
      o[4] = line_start[2]; o[5] = line_len[2];
      o[6] = line_start[3]; o[7] = line_len[3];
    }
    if (qmin_io) {
      const uint8_t* q = data + line_start[3];
      const long long qlen = line_len[3];
      if (qlen > 0) qany = true;
      long long j = 0;
#ifdef FQ_AVX2
      for (; j + 32 <= qlen; j += 32)
        vqmin = _mm256_min_epu8(
            vqmin, _mm256_loadu_si256((const __m256i*)(q + j)));
#endif
      for (; j < qlen; j++)
        if (q[j] < qmn) qmn = q[j];
    }
    pos = p;
    rec++;
  }
  if (qmin_io) {
#ifdef FQ_AVX2
    uint8_t tmp[32];
    _mm256_storeu_si256((__m256i*)tmp, vqmin);
    for (int k = 0; k < 32; k++)
      if (tmp[k] < qmn) qmn = tmp[k];
#endif
    if (qmn < qmin_io[0]) qmin_io[0] = qmn;
    qmin_io[1] |= qany ? 1 : 0;
  }
  *consumed = pos;
  return rec;
}

long long fq_scan_records(const uint8_t* data, long long n,
                          long long max_records, long long* offsets,
                          long long* consumed, int* error) {
  return fq_scan_records_ex(data, n, max_records, offsets, consumed,
                            error, nullptr);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// CRC32 (IEEE 802.3, reflected 0xEDB88320) — the v3 block-integrity field.
// Scalar slice-by-8 baseline plus a PCLMULQDQ folding path (Intel's
// CRC-folding scheme; constants are the published ones for this
// polynomial). The PCLMUL path is validated against the scalar tables on
// first use and silently disabled on mismatch, so a wrong constant can
// only cost speed, never correctness.
// ---------------------------------------------------------------------------

namespace {

static uint32_t g_crc_tab[8][256];

// thread-safe one-time table fill: compress workers race to the first
// CRC call, and C++11 magic-static init is the defined-behavior guard
bool crc32_tab_init() {
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    g_crc_tab[0][i] = c;
  }
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = g_crc_tab[0][i];
    for (int t = 1; t < 8; t++) {
      c = g_crc_tab[0][c & 0xFF] ^ (c >> 8);
      g_crc_tab[t][i] = c;
    }
  }
  return true;
}

// crc is the in-progress inverted register (caller handles ~ conditioning)
uint32_t crc32_slice8(uint32_t crc, const uint8_t* p, size_t n) {
  static const bool init_done = crc32_tab_init();
  (void)init_done;
  while (n >= 8) {
    uint32_t lo;
    memcpy(&lo, p, 4);
    lo ^= crc;
    uint32_t hi;
    memcpy(&hi, p + 4, 4);
    crc = g_crc_tab[7][lo & 0xFF] ^ g_crc_tab[6][(lo >> 8) & 0xFF] ^
          g_crc_tab[5][(lo >> 16) & 0xFF] ^ g_crc_tab[4][lo >> 24] ^
          g_crc_tab[3][hi & 0xFF] ^ g_crc_tab[2][(hi >> 8) & 0xFF] ^
          g_crc_tab[1][(hi >> 16) & 0xFF] ^ g_crc_tab[0][hi >> 24];
    p += 8;
    n -= 8;
  }
  while (n--) crc = g_crc_tab[0][(crc ^ *p++) & 0xFF] ^ (crc >> 8);
  return crc;
}

#if defined(__PCLMUL__)
// 64-byte CRC folding (Gopal et al., "Fast CRC Computation for Generic
// Polynomials Using PCLMULQDQ"); reflected-domain constants for
// 0x04C11DB7. Input/output use the same inverted-register convention as
// crc32_slice8. Requires n >= 64.
uint32_t crc32_pclmul(uint32_t crc, const uint8_t* buf, size_t n) {
  const __m128i k1k2 =
      _mm_set_epi64x((long long)0x00000001c6e41596, 0x0000000154442bd4);
  const __m128i k3k4 =
      _mm_set_epi64x((long long)0x00000000ccaa009e, 0x00000001751997d0);
  const __m128i k5k0 = _mm_set_epi64x(0, 0x0000000163cd6124);
  const __m128i poly =
      _mm_set_epi64x((long long)0x00000001f7011641, 0x00000001db710641);
  __m128i x1 = _mm_loadu_si128((const __m128i*)(buf + 0x00));
  __m128i x2 = _mm_loadu_si128((const __m128i*)(buf + 0x10));
  __m128i x3 = _mm_loadu_si128((const __m128i*)(buf + 0x20));
  __m128i x4 = _mm_loadu_si128((const __m128i*)(buf + 0x30));
  x1 = _mm_xor_si128(x1, _mm_cvtsi32_si128((int)crc));
  buf += 64;
  n -= 64;
  while (n >= 64) {
    __m128i x5 = _mm_clmulepi64_si128(x1, k1k2, 0x00);
    __m128i x6 = _mm_clmulepi64_si128(x2, k1k2, 0x00);
    __m128i x7 = _mm_clmulepi64_si128(x3, k1k2, 0x00);
    __m128i x8 = _mm_clmulepi64_si128(x4, k1k2, 0x00);
    x1 = _mm_clmulepi64_si128(x1, k1k2, 0x11);
    x2 = _mm_clmulepi64_si128(x2, k1k2, 0x11);
    x3 = _mm_clmulepi64_si128(x3, k1k2, 0x11);
    x4 = _mm_clmulepi64_si128(x4, k1k2, 0x11);
    x1 = _mm_xor_si128(_mm_xor_si128(x1, x5),
                       _mm_loadu_si128((const __m128i*)(buf + 0x00)));
    x2 = _mm_xor_si128(_mm_xor_si128(x2, x6),
                       _mm_loadu_si128((const __m128i*)(buf + 0x10)));
    x3 = _mm_xor_si128(_mm_xor_si128(x3, x7),
                       _mm_loadu_si128((const __m128i*)(buf + 0x20)));
    x4 = _mm_xor_si128(_mm_xor_si128(x4, x8),
                       _mm_loadu_si128((const __m128i*)(buf + 0x30)));
    buf += 64;
    n -= 64;
  }
  // fold the four lanes into one
  __m128i x5 = _mm_clmulepi64_si128(x1, k3k4, 0x00);
  x1 = _mm_clmulepi64_si128(x1, k3k4, 0x11);
  x1 = _mm_xor_si128(_mm_xor_si128(x1, x5), x2);
  x5 = _mm_clmulepi64_si128(x1, k3k4, 0x00);
  x1 = _mm_clmulepi64_si128(x1, k3k4, 0x11);
  x1 = _mm_xor_si128(_mm_xor_si128(x1, x5), x3);
  x5 = _mm_clmulepi64_si128(x1, k3k4, 0x00);
  x1 = _mm_clmulepi64_si128(x1, k3k4, 0x11);
  x1 = _mm_xor_si128(_mm_xor_si128(x1, x5), x4);
  while (n >= 16) {
    x5 = _mm_clmulepi64_si128(x1, k3k4, 0x00);
    x1 = _mm_clmulepi64_si128(x1, k3k4, 0x11);
    x1 = _mm_xor_si128(_mm_xor_si128(x1, x5),
                       _mm_loadu_si128((const __m128i*)buf));
    buf += 16;
    n -= 16;
  }
  // fold 128 -> 64
  __m128i x0 = _mm_clmulepi64_si128(x1, k3k4, 0x10);
  const __m128i mask = _mm_setr_epi32(~0, 0, ~0, 0);
  x1 = _mm_srli_si128(x1, 8);
  x1 = _mm_xor_si128(x1, x0);
  x0 = _mm_srli_si128(x1, 4);
  x1 = _mm_and_si128(x1, mask);
  x1 = _mm_clmulepi64_si128(x1, k5k0, 0x00);
  x1 = _mm_xor_si128(x1, x0);
  // Barrett reduction to 32 bits
  x0 = _mm_and_si128(x1, mask);
  x0 = _mm_clmulepi64_si128(x0, poly, 0x10);
  x0 = _mm_and_si128(x0, mask);
  x0 = _mm_clmulepi64_si128(x0, poly, 0x00);
  x1 = _mm_xor_si128(x1, x0);
  uint32_t out = (uint32_t)_mm_extract_epi32(x1, 1);
  // scalar tail
  return crc32_slice8(out, buf, n);
}

int crc32_pclmul_selfcheck() {
  uint8_t v[257];
  for (int i = 0; i < 257; i++) v[i] = (uint8_t)(i * 131 + 7);
  const size_t lens[] = {64, 65, 96, 128, 200, 255, 256, 257};
  for (size_t li = 0; li < sizeof(lens) / sizeof(lens[0]); li++) {
    uint32_t a = crc32_slice8(0xFFFFFFFFu, v, lens[li]);
    uint32_t b = crc32_pclmul(0xFFFFFFFFu, v, lens[li]);
    if (a != b) return -1;
    // nonzero seed
    a = crc32_slice8(0x12345678u, v, lens[li]);
    b = crc32_pclmul(0x12345678u, v, lens[li]);
    if (a != b) return -1;
  }
  return 1;
}
#endif  // __PCLMUL__

}  // namespace

extern "C" {

// zlib-compatible CRC32: crc_in/return are the public (conditioned)
// values, so fq_crc32(fq_crc32(0, a), b) == zlib.crc32(a+b).
uint32_t fq_crc32(uint32_t crc_in, const uint8_t* data, long long n) {
  uint32_t c = crc_in ^ 0xFFFFFFFFu;
#if defined(__PCLMUL__)
  // magic-static: self-check runs exactly once, thread-safely
  static const int pclmul_ok = crc32_pclmul_selfcheck();
  if (pclmul_ok > 0 && n >= 64)
    c = crc32_pclmul(c, data, (size_t)n);
  else
    c = crc32_slice8(c, data, (size_t)n);
#else
  c = crc32_slice8(c, data, (size_t)n);
#endif
  return c ^ 0xFFFFFFFFu;
}

}  // extern "C"

extern "C" {

// 256-bin byte histogram. Four interleaved sub-histograms dodge the
// store-forward dependency on repeated bytes; numpy's bincount on this
// host swings 0.3-15 s/GB (first-touch + per-element dispatch), this
// stays ~1 ns/byte.
void fq_hist256(const uint8_t* data, long long n, long long* out) {
  // 8 sub-histograms of u32 counters: byte-histogramming is bound by
  // store-to-load forwarding stalls when adjacent bytes collide in one
  // table; 8 tables cut the collision rate and the u32 counters halve
  // the L1 footprint (8 KB vs 16 KB). u32 cannot overflow: each table
  // sees n/8 <= block-size bytes, far under 2^32. Loading 8 bytes as
  // one u64 also removes 7 of 8 load uops.
  uint32_t h[8][256];
  memset(h, 0, sizeof(h));
  long long i = 0;
  for (; i + 8 <= n; i += 8) {
    uint64_t w;
    memcpy(&w, data + i, 8);
    h[0][w & 0xFF]++;
    h[1][(w >> 8) & 0xFF]++;
    h[2][(w >> 16) & 0xFF]++;
    h[3][(w >> 24) & 0xFF]++;
    h[4][(w >> 32) & 0xFF]++;
    h[5][(w >> 40) & 0xFF]++;
    h[6][(w >> 48) & 0xFF]++;
    h[7][w >> 56]++;
  }
  for (; i < n; i++) h[0][data[i]]++;
  for (int k = 0; k < 256; k++) {
    long long s = 0;
    for (int t = 0; t < 8; t++) s += h[t][k];
    out[k] = s;
  }
}

// ---------------------------------------------------------------------------
// Variable-length row movement (sequential memcpy per row)
// ---------------------------------------------------------------------------

void fq_gather_rows(const uint8_t* data, const long long* starts,
                    const long long* lens, long long r, long long width,
                    uint8_t fill, uint8_t* out) {
  for (long long i = 0; i < r; i++) {
    uint8_t* row = out + i * width;
    long long l = lens[i];
    if (l > width) l = width;
    memcpy(row, data + starts[i], (size_t)l);
    if (l < width) memset(row + l, fill, (size_t)(width - l));
  }
}

// Concatenate the first lens[i] bytes of each padded row into out;
// returns total bytes written.
long long fq_flatten_rows(const uint8_t* padded, const long long* lens,
                          long long r, long long width, uint8_t* out) {
  long long off = 0;
  for (long long i = 0; i < r; i++) {
    memcpy(out + off, padded + i * width, (size_t)lens[i]);
    off += lens[i];
  }
  return off;
}

void fq_scatter_rows(uint8_t* out, const uint8_t* flat,
                     const long long* dst_starts, const long long* lens,
                     long long r) {
  long long off = 0;
  for (long long i = 0; i < r; i++) {
    memcpy(out + dst_starts[i], flat + off, (size_t)lens[i]);
    off += lens[i];
  }
}

// ---------------------------------------------------------------------------
// u16-length-prefixed streams (headers / plus payloads)
// ---------------------------------------------------------------------------

long long fq_build_len16(const uint8_t* data, const long long* starts,
                         const long long* lens, long long r, uint8_t* out) {
  long long off = 0;
  for (long long i = 0; i < r; i++) {
    long long l = lens[i];
    if (l > 0xFFFF) return -1;
    out[off] = (uint8_t)(l & 0xFF);
    out[off + 1] = (uint8_t)(l >> 8);
    memcpy(out + off + 2, data + starts[i], (size_t)l);
    off += 2 + l;
  }
  return off;
}

// Parse count u16-length-prefixed entries; fills starts/lens.
// Returns consumed bytes, or -1 on truncation.
long long fq_parse_len16(const uint8_t* data, long long n, long long count,
                         long long* starts, long long* lens) {
  long long off = 0;
  for (long long i = 0; i < count; i++) {
    if (off + 2 > n) return -1;
    long long l = (long long)data[off] | ((long long)data[off + 1] << 8);
    off += 2;
    if (off + l > n) return -1;
    starts[i] = off;
    lens[i] = l;
    off += l;
  }
  return off;
}

// ---------------------------------------------------------------------------
// N-position stream (u16 count + u16 positions per record)
// ---------------------------------------------------------------------------

// nmask_bits: (r, stride) little-endian bitmask rows; n_counts: per record.
// Returns bytes written to out.
long long fq_build_npos(const uint8_t* nmask_bits, const int32_t* n_counts,
                        long long r, long long stride, long long max_len,
                        uint8_t* out) {
  long long off = 0;
  for (long long i = 0; i < r; i++) {
    int32_t c = n_counts[i];
    out[off] = (uint8_t)(c & 0xFF);
    out[off + 1] = (uint8_t)((c >> 8) & 0xFF);
    off += 2;
    if (c == 0) continue;
    const uint8_t* row = nmask_bits + i * stride;
    for (long long byte = 0; byte < stride; byte++) {
      uint8_t b = row[byte];
      if (!b) continue;
      for (int bit = 0; bit < 8; bit++) {
        if (b & (1u << bit)) {
          long long posn = byte * 8 + bit;
          if (posn >= max_len) break;
          out[off] = (uint8_t)(posn & 0xFF);
          out[off + 1] = (uint8_t)((posn >> 8) & 0xFF);
          off += 2;
        }
      }
    }
  }
  return off;
}

// Parse the npos stream: writes per-record counts, and (row, pos) pairs for
// every recorded N. Returns total N count, or -1 on truncation, or -2 if
// total exceeds max_out.
long long fq_parse_npos(const uint8_t* data, long long n, long long count,
                        int32_t* counts, int32_t* rows, int32_t* poss,
                        long long max_out) {
  long long off = 0;
  long long total = 0;
  for (long long i = 0; i < count; i++) {
    if (off + 2 > n) return -1;
    long long c = (long long)data[off] | ((long long)data[off + 1] << 8);
    off += 2;
    counts[i] = (int32_t)c;
    if (off + 2 * c > n) return -1;
    if (total + c > max_out) return -2;
    for (long long j = 0; j < c; j++) {
      rows[total] = (int32_t)i;
      poss[total] =
          (int32_t)((long long)data[off] | ((long long)data[off + 1] << 8));
      off += 2;
      total++;
    }
  }
  return total;
}

// ---------------------------------------------------------------------------
// FASTQ text assembly (decode side, compress.go:944-1078)
// ---------------------------------------------------------------------------

// Assemble '@hdr\nseq\n+plus\nqual\n' per record. seq/qual are padded
// matrices of width seq_width. has_plus=0 emits bare '+' lines (v1).
// Returns total bytes written.
long long fq_assemble(const uint8_t* hdr_data, const long long* hdr_starts,
                      const long long* hdr_lens, const uint8_t* plus_data,
                      const long long* plus_starts, const long long* plus_lens,
                      int has_plus, const uint8_t* seq_mat,
                      const uint8_t* qual_mat, long long seq_width,
                      const long long* lens, long long r, uint8_t* out) {
  long long off = 0;
  for (long long i = 0; i < r; i++) {
    long long l = lens[i];
    out[off++] = '@';
    memcpy(out + off, hdr_data + hdr_starts[i], (size_t)hdr_lens[i]);
    off += hdr_lens[i];
    out[off++] = '\n';
    memcpy(out + off, seq_mat + i * seq_width, (size_t)l);
    off += l;
    out[off++] = '\n';
    out[off++] = '+';
    if (has_plus) {
      memcpy(out + off, plus_data + plus_starts[i], (size_t)plus_lens[i]);
      off += plus_lens[i];
    }
    out[off++] = '\n';
    memcpy(out + off, qual_mat + i * seq_width, (size_t)l);
    off += l;
    out[off++] = '\n';
  }
  return off;
}

// ---------------------------------------------------------------------------
// CPU fallback pieces of the dense codec (sequential, autovectorized)
// ---------------------------------------------------------------------------

// In-place per-row byte cumsum + offset add: delta decode + denormalize
// (quality.go:107-118 + 66-75) over a padded matrix.
void fq_qual_integrate_rows(uint8_t* qual, long long r, long long w,
                            uint8_t offset) {
  for (long long i = 0; i < r; i++) {
    uint8_t* row = qual + i * w;
    uint8_t acc = 0;
    for (long long j = 0; j < w; j++) {
      acc = (uint8_t)(acc + row[j]);
      row[j] = (uint8_t)(acc + offset);
    }
  }
}

// Per-row delta encode with offset subtraction (quality.go:53-103):
// out[0] = q[0]-offset, out[j] = q[j]-q[j-1].
void fq_qual_delta_rows(const uint8_t* qual, long long r, long long w,
                        uint8_t offset, uint8_t* out) {
  if (w == 0) return;
  for (long long i = 0; i < r; i++) {
    const uint8_t* row = qual + i * w;
    uint8_t* orow = out + i * w;
    orow[0] = (uint8_t)(row[0] - offset);
    for (long long j = 1; j < w; j++) {
      orow[j] = (uint8_t)(row[j] - row[j - 1]);
    }
  }
}

// 2-bit pack one padded codes matrix (r, w4) -> (r, w4/4) LSB-first.
void fq_pack2_rows(const uint8_t* codes, long long r, long long w4,
                   uint8_t* out) {
  long long pw = w4 / 4;
  for (long long i = 0; i < r; i++) {
    const uint8_t* row = codes + i * w4;
    uint8_t* orow = out + i * pw;
    for (long long j = 0; j < pw; j++) {
      orow[j] = (uint8_t)(row[4 * j] | (row[4 * j + 1] << 2) |
                          (row[4 * j + 2] << 4) | (row[4 * j + 3] << 6));
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused dense block encode (CPU twin of the Pallas kernel)
// ---------------------------------------------------------------------------

extern "C" {

// One sequential pass over a padded (r, w) block: 2-bit pack (LSB-first),
// ambiguity bitmask (little-endian bits, positions < npos_cap), per-record
// ambiguity counts, and offset+delta quality coding
// (reference semantics: sequence.go:58-98, quality.go:53-103).
// Outputs: packed (r, ceil(w/4)), nmask (r, ceil(w/8)), ncnt (r,),
// delta (r, w). Rows are independent; w is the padded width, lens[i] the
// true record length.
void fq_encode_block(const uint8_t* seq, const uint8_t* qual,
                     const long long* lens, long long r, long long w,
                     long long npos_cap, uint8_t qoffset, uint8_t* packed,
                     uint8_t* nmask, int32_t* ncnt, uint8_t* delta) {
  const long long pw = (w + 3) / 4;
  const long long mw = (w + 7) / 8;
  static uint8_t code_lut[256];
  static uint8_t valid_lut[256];
  // one-time fill under a C++11 magic-static guard: compress/decode
  // workers race to the first call, and the old `if (!lut_init)`
  // double-check was a genuine data race (caught by make test-tsan)
  static const bool lut_ready = [&] {
    for (int i = 0; i < 256; i++) {
      int u = i & 0xDF;
      code_lut[i] = (uint8_t)((u == 'C') ? 1 : (u == 'G') ? 2 : (u == 'T') ? 3 : 0);
      valid_lut[i] = (uint8_t)(u == 'A' || u == 'C' || u == 'G' || u == 'T');
    }
    return true;
  }();
  (void)lut_ready;
  for (long long i = 0; i < r; i++) {
    const uint8_t* srow = seq + i * w;
    const uint8_t* qrow = qual + i * w;
    uint8_t* prow = packed + i * pw;
    uint8_t* mrow = nmask + i * mw;
    uint8_t* drow = delta + i * w;
    const long long len = lens[i];
    memset(prow, 0, (size_t)pw);
    memset(mrow, 0, (size_t)mw);
    int32_t cnt = 0;
    const long long cap = len < npos_cap ? len : npos_cap;

    // 8-at-a-time: one packed pair + one full mask byte per iteration,
    // branchless ambiguity accumulation.
    long long j = 0;
    const long long fast = (cap / 8) * 8;
    for (; j < fast; j += 8) {
      uint8_t b0 = srow[j], b1 = srow[j + 1], b2 = srow[j + 2],
              b3 = srow[j + 3], b4 = srow[j + 4], b5 = srow[j + 5],
              b6 = srow[j + 6], b7 = srow[j + 7];
      prow[j >> 2] =
          (uint8_t)(code_lut[b0] | (code_lut[b1] << 2) |
                    (code_lut[b2] << 4) | (code_lut[b3] << 6));
      prow[(j >> 2) + 1] =
          (uint8_t)(code_lut[b4] | (code_lut[b5] << 2) |
                    (code_lut[b6] << 4) | (code_lut[b7] << 6));
      uint8_t m =
          (uint8_t)((!valid_lut[b0]) | ((!valid_lut[b1]) << 1) |
                    ((!valid_lut[b2]) << 2) | ((!valid_lut[b3]) << 3) |
                    ((!valid_lut[b4]) << 4) | ((!valid_lut[b5]) << 5) |
                    ((!valid_lut[b6]) << 6) | ((!valid_lut[b7]) << 7));
      mrow[j >> 3] = m;
      cnt += __builtin_popcount(m);
    }
    for (; j < len; j++) {
      uint8_t b = srow[j];
      prow[j >> 2] = (uint8_t)(prow[j >> 2] | (code_lut[b] << ((j & 3) << 1)));
      if (j < cap && !valid_lut[b]) {
        mrow[j >> 3] = (uint8_t)(mrow[j >> 3] | (1u << (j & 7)));
        cnt++;
      }
    }
    ncnt[i] = cnt;
    if (len > 0) {
      drow[0] = (uint8_t)(qrow[0] - qoffset);
      for (long long jj = 1; jj < len; jj++) {
        drow[jj] = (uint8_t)(qrow[jj] - qrow[jj - 1]);
      }
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Wide (u32) N-position streams: FQZ v3 long-read extension
// ---------------------------------------------------------------------------

extern "C" {

// v3 removes the reference's 65,536 bp N-tracking cap (sequence.go:11,
// compress.go:477-488) by storing u32 count + u32 positions per record.
long long fq_build_npos32(const uint8_t* nmask_bits, const int32_t* n_counts,
                          long long r, long long stride, long long max_len,
                          uint8_t* out) {
  long long off = 0;
  for (long long i = 0; i < r; i++) {
    uint32_t c = (uint32_t)n_counts[i];
    memcpy(out + off, &c, 4);
    off += 4;
    if (c == 0) continue;
    const uint8_t* row = nmask_bits + i * stride;
    for (long long byte = 0; byte < stride; byte++) {
      uint8_t b = row[byte];
      if (!b) continue;
      for (int bit = 0; bit < 8; bit++) {
        if (b & (1u << bit)) {
          long long posn = byte * 8 + bit;
          if (posn >= max_len) break;
          uint32_t p32 = (uint32_t)posn;
          memcpy(out + off, &p32, 4);
          off += 4;
        }
      }
    }
  }
  return off;
}

long long fq_parse_npos32(const uint8_t* data, long long n, long long count,
                          int32_t* counts, int32_t* rows, int32_t* poss,
                          long long max_out) {
  long long off = 0;
  long long total = 0;
  for (long long i = 0; i < count; i++) {
    if (off + 4 > n) return -1;
    uint32_t c;
    memcpy(&c, data + off, 4);
    off += 4;
    counts[i] = (int32_t)c;
    if (off + 4LL * c > n) return -1;
    if (total + c > max_out) return -2;
    for (uint32_t j = 0; j < c; j++) {
      uint32_t p32;
      memcpy(&p32, data + off, 4);
      off += 4;
      rows[total] = (int32_t)i;
      poss[total] = (int32_t)p32;
      total++;
    }
  }
  return total;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused dense block decode: 2-bit unpack to ASCII
// ---------------------------------------------------------------------------

extern "C" {

// Expand packed rows (r, pw) to ASCII base rows (r, w): LSB-first 2-bit
// codes -> "ACGT", one u32 LUT store per packed byte (the decode twin of
// fq_encode_block; reference semantics sequence.go:101-135). N restore is
// a separate sparse scatter by the caller.
void fq_decode_block(const uint8_t* packed, const long long* lens,
                     long long r, long long pw, long long w,
                     uint8_t* out) {
  static uint32_t lut[256];
  // one-time fill under a C++11 magic-static guard: compress/decode
  // workers race to the first call, and the old `if (!lut_init)`
  // double-check was a genuine data race (caught by make test-tsan)
  static const bool lut_ready = [&] {
    const char bases[4] = {'A', 'C', 'G', 'T'};
    for (int i = 0; i < 256; i++) {
      uint32_t v = 0;
      for (int k = 0; k < 4; k++) {
        v |= ((uint32_t)(uint8_t)bases[(i >> (2 * k)) & 3]) << (8 * k);
      }
      lut[i] = v;
    }
    return true;
  }();
  (void)lut_ready;
  for (long long i = 0; i < r; i++) {
    const uint8_t* prow = packed + i * pw;
    uint8_t* orow = out + i * w;
    const long long len = lens[i];
    const long long full = len >> 2;
    for (long long j = 0; j < full; j++) {
      uint32_t v = lut[prow[j]];
      memcpy(orow + 4 * j, &v, 4);
    }
    const long long rem = len & 3;
    if (rem) {
      uint32_t v = lut[prow[full]];
      memcpy(orow + 4 * full, &v, (size_t)rem);
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Single-pass stream builder: FASTQ text + scan offsets -> all six wire
// streams (no padded-matrix intermediate)
// ---------------------------------------------------------------------------

extern "C" {

// offs: (n, 8) from fq_scan_records. Writes the six raw streams in wire
// layout (compress.go:490-519): seq 2-bit packed, qual offset+delta,
// headers/plus u16-length-prefixed, npos u16 (wide=0) or u32 (wide=1),
// lengths u32. sizes_out[0..5] receive byte counts; min_qual_out gets the
// minimum quality byte (for Phred detection); returns 0, or 1 if a
// header/plus field exceeds 65535 bytes.
// Inline small copy tuned for FASTQ header/plus fields (tens of bytes,
// uniform within a file so every branch predicts): fixed-size memcpy
// chunks compile to bare register moves, and the overlapping final chunk
// bounds every read and write to [p, p+n) exactly — no overshoot, so no
// slack contract on either buffer. A libc memcpy call costs ~20-30 cycles
// of PLT + size dispatch per field, which at two fields per record was
// ~20% of fq_build_streams (E056).
static inline void fq_copy_small(uint8_t* d, const uint8_t* s, size_t n) {
  if (n >= 32) {
    size_t i = 0;
    do {
      memcpy(d + i, s + i, 32);
      i += 32;
    } while (i + 32 <= n);
    if (i < n) memcpy(d + n - 32, s + n - 32, 32);
  } else if (n >= 16) {
    memcpy(d, s, 16);
    memcpy(d + n - 16, s + n - 16, 16);
  } else if (n >= 8) {
    memcpy(d, s, 8);
    memcpy(d + n - 8, s + n - 8, 8);
  } else if (n >= 4) {
    memcpy(d, s, 4);
    memcpy(d + n - 4, s + n - 4, 4);
  } else {
    for (size_t i = 0; i < n; i++) d[i] = s[i];
  }
}

int fq_build_streams(const uint8_t* text, const long long* offs,
                     long long n, uint8_t qoffset, int wide,
                     long long npos_cap, uint8_t* seq_out, uint8_t* qual_out,
                     uint8_t* hdr_out, uint8_t* plus_out, uint8_t* npos_out,
                     uint8_t* len_out, long long* sizes_out,
                     int32_t* min_qual_out) {
  static uint8_t code_lut[256];
  static uint8_t valid_lut[256];
  // one-time fill under a C++11 magic-static guard: compress/decode
  // workers race to the first call, and the old `if (!lut_init)`
  // double-check was a genuine data race (caught by make test-tsan)
  static const bool lut_ready = [&] {
    for (int i = 0; i < 256; i++) {
      int u = i & 0xDF;
      code_lut[i] = (uint8_t)((u == 'C') ? 1 : (u == 'G') ? 2 : (u == 'T') ? 3 : 0);
      valid_lut[i] = (uint8_t)(u == 'A' || u == 'C' || u == 'G' || u == 'T');
    }
    return true;
  }();
  (void)lut_ready;
  long long so = 0, qo = 0, ho = 0, po = 0, no = 0, lo = 0;
  int32_t minq = 255;
#ifdef FQ_AVX2
  __m256i vminall = _mm256_set1_epi8((char)0xFF);
#endif
  for (long long i = 0; i < n; i++) {
    const long long* o = offs + i * 8;
    const uint8_t* seq = text + o[2];
    const uint8_t* qual = text + o[6];
    const long long len = o[3];

    // sequence: 2-bit pack + N positions inline
    long long j = 0;
    const long long cap = len < npos_cap ? len : npos_cap;
    long long npos_cnt_off = no;  // reserve count slot
    no += wide ? 4 : 2;
    uint32_t cnt = 0;
#ifdef FQ_AVX2
    for (; j + 32 <= len; j += 32) {
      uint32_t inv = pack32_avx2(seq + j, seq_out + so);
      so += 8;
      while (inv) {  // rare: ambiguous bases -> N side stream
        const long long pos = j + __builtin_ctz(inv);
        inv &= inv - 1;
        if (pos < cap) {
          if (wide) {
            uint32_t p32 = (uint32_t)pos;
            memcpy(npos_out + no, &p32, 4);
            no += 4;
          } else {
            npos_out[no++] = (uint8_t)(pos & 0xFF);
            npos_out[no++] = (uint8_t)(pos >> 8);
          }
          cnt++;
        }
      }
    }
#endif
    for (; j + 4 <= len; j += 4) {
      uint8_t b0 = seq[j], b1 = seq[j + 1], b2 = seq[j + 2], b3 = seq[j + 3];
      seq_out[so++] =
          (uint8_t)(code_lut[b0] | (code_lut[b1] << 2) |
                    (code_lut[b2] << 4) | (code_lut[b3] << 6));
      // rare branch: any ambiguous base in this quad
      if (!(valid_lut[b0] & valid_lut[b1] & valid_lut[b2] & valid_lut[b3])) {
        for (int k = 0; k < 4; k++) {
          long long pos = j + k;
          if (pos < cap && !valid_lut[seq[pos]]) {
            if (wide) {
              uint32_t p32 = (uint32_t)pos;
              memcpy(npos_out + no, &p32, 4);
              no += 4;
            } else {
              npos_out[no++] = (uint8_t)(pos & 0xFF);
              npos_out[no++] = (uint8_t)(pos >> 8);
            }
            cnt++;
          }
        }
      }
    }
    if (j < len) {
      uint8_t b = 0;
      for (long long k = j; k < len; k++) {
        b = (uint8_t)(b | (code_lut[seq[k]] << ((k - j) << 1)));
        if (k < cap && !valid_lut[seq[k]]) {
          if (wide) {
            uint32_t p32 = (uint32_t)k;
            memcpy(npos_out + no, &p32, 4);
            no += 4;
          } else {
            npos_out[no++] = (uint8_t)(k & 0xFF);
            npos_out[no++] = (uint8_t)(k >> 8);
          }
          cnt++;
        }
      }
      seq_out[so++] = b;
    }
    if (wide) {
      memcpy(npos_out + npos_cnt_off, &cnt, 4);
    } else {
      npos_out[npos_cnt_off] = (uint8_t)(cnt & 0xFF);
      npos_out[npos_cnt_off + 1] = (uint8_t)((cnt >> 8) & 0xFF);
    }

    // quality: offset + delta, plus running min for Phred detection
    if (len > 0) {
      qual_out[qo++] = (uint8_t)(qual[0] - qoffset);
      if (qual[0] < minq) minq = qual[0];
      long long k = 1;
#ifdef FQ_AVX2
      for (; k + 32 <= len; k += 32) {
        const __m256i cur = _mm256_loadu_si256((const __m256i*)(qual + k));
        const __m256i prev =
            _mm256_loadu_si256((const __m256i*)(qual + k - 1));
        _mm256_storeu_si256((__m256i*)(qual_out + qo),
                            _mm256_sub_epi8(cur, prev));
        qo += 32;
        vminall = _mm256_min_epu8(vminall, cur);
      }
#endif
      for (; k < len; k++) {
        qual_out[qo++] = (uint8_t)(qual[k] - qual[k - 1]);
        if (qual[k] < minq) minq = qual[k];
      }
    }

    // header / plus: u16 length prefix + bytes
    if (o[1] > 0xFFFF || o[5] > 0xFFFF) return 1;
    hdr_out[ho++] = (uint8_t)(o[1] & 0xFF);
    hdr_out[ho++] = (uint8_t)(o[1] >> 8);
    fq_copy_small(hdr_out + ho, text + o[0], (size_t)o[1]);
    ho += o[1];
    plus_out[po++] = (uint8_t)(o[5] & 0xFF);
    plus_out[po++] = (uint8_t)(o[5] >> 8);
    fq_copy_small(plus_out + po, text + o[4], (size_t)o[5]);
    po += o[5];

    // length: u32le
    uint32_t l32 = (uint32_t)len;
    memcpy(len_out + lo, &l32, 4);
    lo += 4;
  }
#ifdef FQ_AVX2
  {  // fold the vector min lanes into the scalar running min
    uint8_t mtmp[32];
    _mm256_storeu_si256((__m256i*)mtmp, vminall);
    for (int k = 0; k < 32; k++)
      if (mtmp[k] < minq) minq = mtmp[k];
  }
#endif
  sizes_out[0] = so; sizes_out[1] = qo; sizes_out[2] = ho;
  sizes_out[3] = po; sizes_out[4] = no; sizes_out[5] = lo;
  *min_qual_out = minq;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Single-pass block decode: six raw streams -> FASTQ text
// ---------------------------------------------------------------------------

extern "C" {

// Inverse of fq_build_streams composed with assembly
// (compress.go:944-1078 as one walk): per record reads the length, the
// N positions, unpacks 2-bit bases straight into the output (LUT u32
// stores, then sparse 'N' patch), delta-decodes quality in place, and
// emits '@hdr\nseq\n+plus\nqual\n'. has_plus=0 emits bare '+' (v1).
// Returns bytes written, or a negative stream index (-1..-6) on
// truncation/bounds error.
long long fq_decode_block_full(
    const uint8_t* seq_s, long long seq_n, const uint8_t* qual_s,
    long long qual_n, const uint8_t* hdr_s, long long hdr_n,
    const uint8_t* plus_s, long long plus_n, const uint8_t* npos_s,
    long long npos_n, const uint8_t* len_s, long long len_n,
    long long n, uint8_t qoffset, int wide, int has_plus, uint8_t* out) {
  static uint32_t lut[256];
  // one-time fill under a C++11 magic-static guard: compress/decode
  // workers race to the first call, and the old `if (!lut_init)`
  // double-check was a genuine data race (caught by make test-tsan)
  static const bool lut_ready = [&] {
    const char bases[4] = {'A', 'C', 'G', 'T'};
    for (int i = 0; i < 256; i++) {
      uint32_t v = 0;
      for (int k = 0; k < 4; k++)
        v |= ((uint32_t)(uint8_t)bases[(i >> (2 * k)) & 3]) << (8 * k);
      lut[i] = v;
    }
    return true;
  }();
  (void)lut_ready;
  long long so = 0, qo = 0, ho = 0, po = 0, no = 0, lo = 0, oo = 0;
  for (long long i = 0; i < n; i++) {
    // length (u32le)
    if (lo + 4 > len_n) return -6;
    uint32_t len32;
    memcpy(&len32, len_s + lo, 4);
    lo += 4;
    const long long len = (long long)len32;

    // header
    if (ho + 2 > hdr_n) return -3;
    long long hl = (long long)hdr_s[ho] | ((long long)hdr_s[ho + 1] << 8);
    ho += 2;
    if (ho + hl > hdr_n) return -3;
    out[oo++] = '@';
    memcpy(out + oo, hdr_s + ho, (size_t)hl);
    oo += hl;
    ho += hl;
    out[oo++] = '\n';

    // sequence: unpack + patch Ns
    const long long plen = (len + 3) / 4;
    if (so + plen > seq_n) return -1;
    uint8_t* seq_dst = out + oo;
#ifdef FQ_AVX2
    unpack_row_sse(seq_s + so, len, seq_dst);
#else
    {
      const long long full = len >> 2;
      for (long long j = 0; j < full; j++) {
        uint32_t v = lut[seq_s[so + j]];
        memcpy(seq_dst + 4 * j, &v, 4);
      }
      const long long rem = len & 3;
      if (rem) {
        uint32_t v = lut[seq_s[so + full]];
        memcpy(seq_dst + 4 * full, &v, (size_t)rem);
      }
    }
#endif
    so += plen;
    // N positions
    if (wide) {
      if (no + 4 > npos_n) return -5;
      uint32_t cnt;
      memcpy(&cnt, npos_s + no, 4);
      no += 4;
      if (no + 4LL * cnt > npos_n) return -5;
      for (uint32_t k = 0; k < cnt; k++) {
        uint32_t p;
        memcpy(&p, npos_s + no, 4);
        no += 4;
        if ((long long)p >= len) return -5;
        seq_dst[p] = 'N';
      }
    } else {
      if (no + 2 > npos_n) return -5;
      long long cnt = (long long)npos_s[no] | ((long long)npos_s[no + 1] << 8);
      no += 2;
      if (no + 2 * cnt > npos_n) return -5;
      for (long long k = 0; k < cnt; k++) {
        long long p = (long long)npos_s[no] | ((long long)npos_s[no + 1] << 8);
        no += 2;
        if (p >= len) return -5;
        seq_dst[p] = 'N';
      }
    }
    oo += len;
    out[oo++] = '\n';

    // plus line
    out[oo++] = '+';
    if (has_plus) {
      if (po + 2 > plus_n) return -4;
      long long pl = (long long)plus_s[po] | ((long long)plus_s[po + 1] << 8);
      po += 2;
      if (po + pl > plus_n) return -4;
      memcpy(out + oo, plus_s + po, (size_t)pl);
      oo += pl;
      po += pl;
    }
    out[oo++] = '\n';

    // quality: delta integrate + denormalize
    if (qo + len > qual_n) return -2;
    uint8_t* qdst = out + oo;
#ifdef FQ_AVX2
    integrate_row_sse(qual_s + qo, len, qoffset, qdst);
#else
    uint8_t acc = 0;
    for (long long j = 0; j < len; j++) {
      acc = (uint8_t)(acc + qual_s[qo + j]);
      qdst[j] = (uint8_t)(acc + qoffset);
    }
#endif
    qo += len;
    oo += len;
    out[oo++] = '\n';
  }
  return oo;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Header token-delta codec (FQZ v3 header stream transform)
// ---------------------------------------------------------------------------
// Native twin of ops/tokenize.py (the semantics reference; wire layout
// documented there). Headers split into digit / non-digit runs; each token
// codes against the previous record's same-index token as MATCH / numeric
// DELTA (zigzag varint) / LITERAL. Exactly invertible on the
// u16-length-prefixed wire stream.

namespace {

enum TokOp {
  TOK_END = 0x00,
  TOK_MATCH = 0x01,
  TOK_DELTA = 0x02,
  TOK_DELTA_PAD = 0x03,
  TOK_LIT = 0x04
};

struct TokSpan {
  const uint8_t* p;
  long long len;
};

inline bool tok_write_varint(uint8_t* out, long long cap, long long& off,
                             unsigned long long v) {
  while (v >= 0x80) {
    if (off >= cap) return false;
    out[off++] = (uint8_t)((v & 0x7F) | 0x80);
    v >>= 7;
  }
  if (off >= cap) return false;
  out[off++] = (uint8_t)v;
  return true;
}

inline bool tok_read_varint(const uint8_t* data, long long n, long long& off,
                            unsigned long long& v) {
  v = 0;
  int shift = 0;
  for (;;) {
    if (off >= n || shift > 63) return false;
    uint8_t b = data[off++];
    v |= ((unsigned long long)(b & 0x7F)) << shift;
    if (!(b & 0x80)) return true;
    shift += 7;
  }
}

inline unsigned long long tok_zigzag(long long v) {
  return ((unsigned long long)v << 1) ^ (unsigned long long)(v >> 63);
}

inline long long tok_unzigzag(unsigned long long v) {
  return (long long)(v >> 1) ^ -(long long)(v & 1);
}

inline bool tok_is_digit(uint8_t b) { return b >= '0' && b <= '9'; }

// numeric := all digits, 1..18 of them (fits int64); returns value or -1
inline long long tok_numeric_value(const uint8_t* p, long long len) {
  if (len < 1 || len > 18) return -1;
  long long v = 0;
  for (long long i = 0; i < len; i++) {
    if (!tok_is_digit(p[i])) return -1;
    v = v * 10 + (p[i] - '0');
  }
  return v;
}

}  // namespace

extern "C" {

// Encode a u16-length-prefixed headers stream (count records) into the
// tokenized form. Returns bytes written, or -1 on malformed input /
// insufficient out_cap (callers size out with encode_bound).
long long fq_tok_encode(const uint8_t* data, long long n, long long count,
                        uint8_t* out, long long out_cap) {
  long long oo = 0;
  if (!tok_write_varint(out, out_cap, oo, (unsigned long long)n)) return -1;
  // encode-side spans cache the parsed numeric value (-1 = non-numeric):
  // re-parsing the previous record's tokens and snprintf-rendering for
  // the canonical-form check dominated this loop (~50% of v3 header time)
  struct SpanE {
    const uint8_t* p;
    long long len;
    long long num;
  };
  std::vector<SpanE> prev, cur;
  prev.reserve(32);
  cur.reserve(32);
  long long off = 0;
  for (long long rec = 0; rec < count; rec++) {
    if (off + 2 > n) return -1;
    long long hlen = (long long)data[off] | ((long long)data[off + 1] << 8);
    off += 2;
    if (off + hlen > n) return -1;
    const uint8_t* h = data + off;
    off += hlen;
    cur.clear();
    // split into maximal digit / non-digit runs, parsing digit runs as
    // they are scanned (<= 18 digits fit int64; longer runs are literal)
    for (long long i = 0; i < hlen;) {
      long long j = i;
      if (tok_is_digit(h[i])) {
        long long v = 0;
        while (j < hlen && tok_is_digit(h[j])) {
          if (j - i < 18) v = v * 10 + (h[j] - '0');
          j++;
        }
        cur.push_back({h + i, j - i, (j - i <= 18) ? v : -1});
      } else {
        while (j < hlen && !tok_is_digit(h[j])) j++;
        cur.push_back({h + i, j - i, -1});
      }
      i = j;
    }
    for (size_t i = 0; i < cur.size(); i++) {
      const SpanE& t = cur[i];
      const SpanE* p = (i < prev.size()) ? &prev[i] : nullptr;
      if (p && p->len == t.len && memcmp(p->p, t.p, (size_t)t.len) == 0) {
        if (oo >= out_cap) return -1;
        out[oo++] = TOK_MATCH;
        continue;
      }
      if (p && t.num >= 0 && p->num >= 0) {
        // an all-digit token is str(value) exactly iff it has no leading
        // zeros; otherwise it is str(value) zero-padded to its width, so
        // DELTA_PAD applies whenever the field width is preserved
        const bool plain = (t.len == 1 || t.p[0] != '0');
        if (plain || t.len == p->len) {
          if (oo >= out_cap) return -1;
          out[oo++] = plain ? TOK_DELTA : TOK_DELTA_PAD;
          if (!tok_write_varint(out, out_cap, oo,
                                tok_zigzag(t.num - p->num)))
            return -1;
          continue;
        }
      }
      if (oo >= out_cap) return -1;
      out[oo++] = TOK_LIT;
      if (!tok_write_varint(out, out_cap, oo, (unsigned long long)t.len))
        return -1;
      if (oo + t.len > out_cap) return -1;
      memcpy(out + oo, t.p, (size_t)t.len);
      oo += t.len;
    }
    if (oo >= out_cap) return -1;
    out[oo++] = TOK_END;
    prev.swap(cur);
  }
  if (off != n) return -1;  // trailing bytes after last record
  return oo;
}

// Decoded (original) stream size from the varint prefix; -1 on error.
long long fq_tok_decoded_size(const uint8_t* data, long long n) {
  long long off = 0;
  unsigned long long v;
  if (!tok_read_varint(data, n, off, v)) return -1;
  if (v > (1ULL << 62)) return -1;
  return (long long)v;
}

// Decode the tokenized stream back to the u16-length-prefixed original.
// Returns bytes written (== fq_tok_decoded_size), or -1 on corrupt data.
long long fq_tok_decode(const uint8_t* data, long long n, long long count,
                        uint8_t* out, long long out_cap) {
  long long off = 0;
  unsigned long long total;
  if (!tok_read_varint(data, n, off, total)) return -1;
  // prev tokens point into `out` (already-written bytes are stable);
  // spans cache their parsed numeric value so DELTA never re-parses the
  // previous token, and rendering is a digits loop instead of snprintf
  struct SpanD {
    const uint8_t* p;
    long long len;
    long long num;
  };
  std::vector<SpanD> prev, cur;
  prev.reserve(32);
  cur.reserve(32);
  long long oo = 0;
  for (long long rec = 0; rec < count; rec++) {
    if (oo + 2 > out_cap) return -1;
    long long len_slot = oo;  // u16 prefix backfilled after the tokens
    oo += 2;
    long long hstart = oo;
    cur.clear();
    for (;;) {
      if (off >= n) return -1;
      uint8_t op = data[off++];
      if (op == TOK_END) break;
      size_t i = cur.size();
      if (op == TOK_MATCH) {
        // batch a run of MATCH ops: prev spans abut in the previous
        // record's output region, so the run is one contiguous memcpy
        size_t k = 1;
        while (off < n && data[off] == TOK_MATCH &&
               i + k < prev.size()) {
          k++;
          off++;
        }
        if (i + k > prev.size()) return -1;
        long long run_bytes = 0;
        for (size_t m = 0; m < k; m++) run_bytes += prev[i + m].len;
        if (oo + run_bytes > out_cap) return -1;
        memcpy(out + oo, prev[i].p, (size_t)run_bytes);
        for (size_t m = 0; m < k; m++) {
          cur.push_back({out + oo, prev[i + m].len, prev[i + m].num});
          oo += prev[i + m].len;
        }
      } else if (op == TOK_DELTA || op == TOK_DELTA_PAD) {
        if (i >= prev.size()) return -1;
        const SpanD& p = prev[i];
        const long long pv = p.num;
        if (pv < 0) return -1;
        unsigned long long zz;
        if (!tok_read_varint(data, n, off, zz)) return -1;
        long long v = pv + tok_unzigzag(zz);
        if (v < 0) return -1;
        char buf[20];
        int sl = 0;
        {
          long long w = v;
          char tmp[20];
          int k = 0;
          do {
            tmp[k++] = (char)('0' + (w % 10));
            w /= 10;
          } while (w);
          while (k) buf[sl++] = tmp[--k];
        }
        long long tlen = sl;
        long long pad = 0;
        if (op == TOK_DELTA_PAD) {
          if (sl > (int)p.len) return -1;
          tlen = p.len;
          pad = p.len - sl;
        }
        if (oo + tlen > out_cap) return -1;
        memset(out + oo, '0', (size_t)pad);
        memcpy(out + oo + pad, buf, (size_t)sl);
        cur.push_back({out + oo, tlen, v});
        oo += tlen;
      } else if (op == TOK_LIT) {
        unsigned long long ln;
        if (!tok_read_varint(data, n, off, ln)) return -1;
        if (ln > (unsigned long long)(n - off)) return -1;
        if (oo + (long long)ln > out_cap) return -1;
        memcpy(out + oo, data + off, (size_t)ln);
        cur.push_back({out + oo, (long long)ln,
                       tok_numeric_value(data + off, (long long)ln)});
        off += (long long)ln;
        oo += (long long)ln;
      } else {
        return -1;
      }
    }
    long long hlen = oo - hstart;
    if (hlen > 0xFFFF) return -1;
    out[len_slot] = (uint8_t)(hlen & 0xFF);
    out[len_slot + 1] = (uint8_t)(hlen >> 8);
    prev.swap(cur);
  }
  if ((unsigned long long)oo != total) return -1;
  return oo;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Order-1 context-modeled quality rANS (FQZ v3 TAG_QCTX)
//
// Semantics are defined by the numpy reference in ops/qualctx.py (context
// layout, chunk balancing, table normalization all happen there / in
// Python); this is the production walk: one sequential pass integrates
// the delta stream and builds the (384, 256) context histogram, a second
// backward pass encodes with reciprocal-multiplication division
// (Granlund-Montgomery round-up method, exact for 32-bit dividends), and
// the decoder walks forward with per-context 4096-slot tables.
// rANS conventions match ops/rans.py: 32-bit state, 16-bit renorm words,
// 12-bit probabilities, L = 1<<16.

namespace {

constexpr int QCTX_QBINS = 48;
constexpr int QCTX_PBUCKETS = 8;
constexpr int QCTX_Q2B = 8;  // prev2 buckets (model 1)
constexpr int QCTX_NCTX = QCTX_QBINS * QCTX_PBUCKETS;  // 384 (model 0)
constexpr int QCTX_NCTX2 = QCTX_NCTX * QCTX_Q2B;       // 3072 (model 1)
constexpr int QCTX_CHUNKS = 4;
constexpr int QCTX_PROB_BITS = 12;
constexpr uint32_t QCTX_SCALE = 1u << QCTX_PROB_BITS;
constexpr uint32_t QCTX_L = 1u << 16;

inline int qctx_ctx(long long p, int prev) {
  int qbin = (p == 0) ? (QCTX_QBINS - 1) : (prev < 46 ? prev : 46);
  long long pb = p >> 4;
  if (pb > QCTX_PBUCKETS - 1) pb = QCTX_PBUCKETS - 1;
  return (int)pb * QCTX_QBINS + qbin;
}

// model 0: order-1 context; model 1: adds the bucketed second-previous
// value (sentinel bucket 7 at p < 2) — 3072 contexts.
inline int qctx_ctx_m(int model, long long p, int prev, int prev2) {
  int c = qctx_ctx(p, prev);
  if (!model) return c;
  int q2b = (p < 2) ? (QCTX_Q2B - 1) : ((prev2 < 46 ? prev2 : 46) >> 3);
  return c * QCTX_Q2B + q2b;
}

// Record/symbol chunk bounds; must match ops/qualctx.py chunk_bounds.
inline void qctx_chunks(const long long* lengths, long long nrec,
                        long long* rb, long long* sb) {
  long long total = 0;
  for (long long r = 0; r < nrec; r++) total += lengths[r];
  rb[0] = 0;
  sb[0] = 0;
  long long csum = 0, r = 0;
  for (int k = 1; k < QCTX_CHUNKS; k++) {
    long long target = total * k / QCTX_CHUNKS;
    long long b;
    if (total == 0) {
      b = 0;
    } else {
      // first record index whose cumulative sum >= target, then +1
      while (r < nrec && csum + lengths[r] < target) csum += lengths[r++];
      b = (r < nrec) ? r + 1 : nrec;
    }
    if (b < rb[k - 1]) b = rb[k - 1];
    if (b > nrec) b = nrec;
    rb[k] = b;
  }
  rb[QCTX_CHUNKS] = nrec;
  // symbol bounds from record bounds
  long long cs = 0, rr = 0;
  for (int k = 1; k <= QCTX_CHUNKS; k++) {
    while (rr < rb[k]) cs += lengths[rr++];
    sb[k] = cs;
  }
}

}  // namespace

extern "C" {

// Pass 1: integrate delta -> raw, build the max-model (3072, 256)
// histogram (model-0 tables are marginalizations over the prev2 axis).
// Returns 0, or -1 if sum(lengths) != n.
int fq_qctx_prepare(const uint8_t* delta, long long n,
                    const long long* lengths, long long nrec,
                    uint8_t* raw, long long* hist) {
  memset(hist, 0, sizeof(long long) * (size_t)QCTX_NCTX2 * 256);
  long long j = 0;
  for (long long r = 0; r < nrec; r++) {
    long long L = lengths[r];
    if (L < 0 || j + L > n) return -1;
    uint8_t q = 0;
    int prev = 0, prev2 = 0;
    for (long long p = 0; p < L; p++, j++) {
      q = (uint8_t)(q + delta[j]);
      raw[j] = q;
      hist[(size_t)qctx_ctx_m(1, p, prev, prev2) * 256 + q]++;
      prev2 = prev;
      prev = q;
    }
  }
  return (j == n) ? 0 : -1;
}

// Pass 2: backward rANS encode of every chunk.
// words has capacity n; chunk k's words end up at
// words[sb[k+1]-nwords[k] .. sb[k+1]) in forward (decoder) order.
// Returns 0, or -1 on invalid tables (freq==0 for a present symbol).
int fq_qctx_encode(const uint8_t* raw, long long n, const long long* lengths,
                   long long nrec, const uint16_t* freq, const uint32_t* cum,
                   uint16_t* words, uint32_t* states, long long* nwords,
                   int model) {
  const int nctx = model ? QCTX_NCTX2 : QCTX_NCTX;
  // Reciprocal tables for the used (ctx, sym) entries: exact
  // floor(x / f) = (x * M) >> (32 + s) with s = ceil_log2(f),
  // M = ceil(2^(32+s) / f)  (x < 2^32, f <= 4096).
  std::vector<uint64_t> M((size_t)nctx * 256, 0);
  std::vector<uint8_t> SH((size_t)nctx * 256, 0);
  for (size_t i = 0; i < (size_t)nctx * 256; i++) {
    uint32_t f = freq[i];
    if (!f) continue;
    int s = 0;
    while ((1u << s) < f) s++;
    unsigned __int128 num = ((unsigned __int128)1) << (32 + s);
    M[i] = (uint64_t)((num + f - 1) / f);
    SH[i] = (uint8_t)(32 + s);
  }

  long long rb[QCTX_CHUNKS + 1], sb[QCTX_CHUNKS + 1];
  qctx_chunks(lengths, nrec, rb, sb);

  // 4 interleaved states per chunk: symbol at chunk-local index t
  // belongs to state t & 3 (breaks the serial x-update chain; the
  // backward walk emits words from the end so they land in the forward
  // decoder's consumption order, as in fq_rans_encode).
  for (int k = 0; k < QCTX_CHUNKS; k++) {
    uint32_t xs[4] = {QCTX_L, QCTX_L, QCTX_L, QCTX_L};
    long long wpos = sb[k + 1];
    long long j = sb[k + 1];
    for (long long r = rb[k + 1] - 1; r >= rb[k]; r--) {
      long long L = lengths[r];
      for (long long p = L - 1; p >= 0; p--) {
        j--;
        int si = (int)((j - sb[k]) & 3);
        uint32_t x = xs[si];
        int prev = (p > 0) ? raw[j - 1] : 0;
        int prev2 = (p > 1) ? raw[j - 2] : 0;
        size_t e = (size_t)qctx_ctx_m(model, p, prev, prev2) * 256 + raw[j];
        uint32_t f = freq[e];
        if (!f) return -1;
        if ((x >> 20) >= f) {
          words[--wpos] = (uint16_t)(x & 0xFFFF);
          x >>= 16;
        }
        uint32_t q = (uint32_t)(((unsigned __int128)x * M[e]) >> SH[e]);
        xs[si] = (q << QCTX_PROB_BITS) + (x - q * f) + cum[e];
      }
    }
    for (int si = 0; si < 4; si++) states[k * 4 + si] = xs[si];
    nwords[k] = sb[k + 1] - wpos;
  }
  return 0;
}

// Forward decode: words runs are concatenated per chunk (wstarts[k] is
// chunk k's first word index, nwords[k] its count). Emits the *delta*
// stream directly. Returns 0, or a negative error on corrupt input.
// Pair-interleaved qctx decode machinery (E084, same design as the
// sctx walk): chunks are the independence boundary; two chunks decode
// in one loop so their slot-table load chains overlap.
struct QctxDCtx {
  const uint16_t* words;
  const uint8_t* slot_tab;   // (nctx, 4096) slot -> symbol
  const uint32_t* fcum;      // (nctx, 256) f<<12 | cum — ONE load where
                             // the old walk did freq[] + cum[]
  const long long* lengths;
  uint8_t* out;
  int model;
};

struct QctxCur {
  uint32_t x0, x1, x2, x3;
  long long wi, wend;
  long long r, rend;
  long long p, L;
  long long j;  // flat output index
  int prev, prev2;
  int err;
};

static inline bool qctx_start_record(const QctxDCtx& e, QctxCur& c) {
  for (;;) {
    if (c.r >= c.rend) {
      if (c.wi != c.wend && !c.err) c.err = -3;
      return false;
    }
    const long long L = e.lengths[c.r++];
    c.p = 0;
    c.prev = 0;
    c.prev2 = 0;
    c.L = L;
    if (L > 0) return true;
  }
}

__attribute__((always_inline)) static inline bool qctx_step_fast(const QctxDCtx& e, uint32_t& x0,
                                  uint32_t& x1, uint32_t& x2, uint32_t& x3,
                                  long long& wi, long long& p, long long& j,
                                  int& prev, int& prev2) {
  uint32_t x = x0;
  const int qbin = (p == 0) ? (QCTX_QBINS - 1) : (prev < 46 ? prev : 46);
  long long pb = p >> 4;
  if (pb > QCTX_PBUCKETS - 1) pb = QCTX_PBUCKETS - 1;
  size_t cb = (size_t)(pb * QCTX_QBINS + qbin);
  if (e.model) {
    const int q2b = (p < 2) ? (QCTX_Q2B - 1)
                            : ((prev2 < 46 ? prev2 : 46) >> 3);
    cb = cb * QCTX_Q2B + (size_t)q2b;
  }
  const uint32_t sl = x & (QCTX_SCALE - 1);
  const uint32_t s = e.slot_tab[cb * QCTX_SCALE + sl];
  const uint32_t ec = e.fcum[cb * 256 + s];
  const uint32_t f = ec >> QCTX_PROB_BITS;
  if (!f) return false;
  x = f * (x >> QCTX_PROB_BITS) + sl - (ec & (QCTX_SCALE - 1));
  const uint32_t lt = x < QCTX_L;
  const uint32_t w = e.words[wi];
  x = lt ? ((x << 16) | w) : x;
  wi += lt;
  x0 = x1;
  x1 = x2;
  x2 = x3;
  x3 = x;
  e.out[j] = (uint8_t)((int)s - (p > 0 ? prev : 0));
  prev2 = prev;
  prev = (int)s;
  p++;
  j++;
  return true;
}

// Scarce-word flavor (see sctx_step_scarce). Returns 0, -2 or -5.
__attribute__((always_inline)) static inline int qctx_step_scarce(
    const QctxDCtx& e, uint32_t& x0, uint32_t& x1, uint32_t& x2,
    uint32_t& x3, long long& wi, long long wend, long long& p,
    long long& j, int& prev, int& prev2) {
  uint32_t x = x0;
  const int qbin = (p == 0) ? (QCTX_QBINS - 1) : (prev < 46 ? prev : 46);
  long long pb = p >> 4;
  if (pb > QCTX_PBUCKETS - 1) pb = QCTX_PBUCKETS - 1;
  size_t cb = (size_t)(pb * QCTX_QBINS + qbin);
  if (e.model) {
    const int q2b = (p < 2) ? (QCTX_Q2B - 1)
                            : ((prev2 < 46 ? prev2 : 46) >> 3);
    cb = cb * QCTX_Q2B + (size_t)q2b;
  }
  const uint32_t sl = x & (QCTX_SCALE - 1);
  const uint32_t s = e.slot_tab[cb * QCTX_SCALE + sl];
  const uint32_t ec = e.fcum[cb * 256 + s];
  const uint32_t f = ec >> QCTX_PROB_BITS;
  if (!f) return -5;
  x = f * (x >> QCTX_PROB_BITS) + sl - (ec & (QCTX_SCALE - 1));
  if (x < QCTX_L) {
    if (wi >= wend) return -2;
    x = (x << 16) | e.words[wi++];
  }
  x0 = x1;
  x1 = x2;
  x2 = x3;
  x3 = x;
  e.out[j] = (uint8_t)((int)s - (p > 0 ? prev : 0));
  prev2 = prev;
  prev = (int)s;
  p++;
  j++;
  return 0;
}

static void qctx_finish_single(const QctxDCtx& e, QctxCur& c, bool live) {
  while (live) {
    const long long m = c.L - c.p;
    const bool fast = c.wend - c.wi >= m;
    uint32_t x0 = c.x0, x1 = c.x1, x2 = c.x2, x3 = c.x3;
    long long wi = c.wi, p = c.p, j = c.j;
    int prev = c.prev, prev2 = c.prev2;
    if (fast) {
      for (long long t = 0; t < m; t++) {
        if (!qctx_step_fast(e, x0, x1, x2, x3, wi, p, j, prev, prev2)) {
          c.err = -5;
          return;
        }
      }
    } else {
      for (long long t = 0; t < m; t++) {
        const int rc = qctx_step_scarce(e, x0, x1, x2, x3, wi, c.wend, p,
                                        j, prev, prev2);
        if (rc) {
          c.err = rc;
          return;
        }
      }
    }
    c.x0 = x0; c.x1 = x1; c.x2 = x2; c.x3 = x3;
    c.wi = wi; c.p = p; c.j = j;
    c.prev = prev; c.prev2 = prev2;
    live = qctx_start_record(e, c);
  }
}

int fq_qctx_decode(const uint16_t* words, const long long* wstarts,
                   const long long* nwords, const uint32_t* states,
                   long long n, const long long* lengths, long long nrec,
                   const uint16_t* freq, uint8_t* delta_out, int model) {
  const int nctx = model ? QCTX_NCTX2 : QCTX_NCTX;
  // slot -> symbol table plus a combined f<<12|cum row (E084: one
  // dependent load on the symbol where the old walk did two)
  std::vector<uint8_t> slot((size_t)nctx * QCTX_SCALE, 0);
  std::vector<uint32_t> fcum((size_t)nctx * 256, 0);
  for (int c = 0; c < nctx; c++) {
    uint32_t acc = 0;
    uint8_t* sl = slot.data() + (size_t)c * QCTX_SCALE;
    for (int s = 0; s < 256; s++) {
      uint32_t f = freq[(size_t)c * 256 + s];
      fcum[(size_t)c * 256 + s] = (f << QCTX_PROB_BITS) | acc;
      if (acc + f > QCTX_SCALE) return -4;
      for (uint32_t i = 0; i < f; i++) sl[acc + i] = (uint8_t)s;
      acc += f;
    }
  }

  long long rb[QCTX_CHUNKS + 1], sb[QCTX_CHUNKS + 1];
  qctx_chunks(lengths, nrec, rb, sb);

  long long total = 0;
  for (long long r = 0; r < nrec; r++) total += lengths[r];
  if (total != n) return -1;

  const QctxDCtx e{words, slot.data(), fcum.data(), lengths, delta_out,
                   model};
  auto init_cur = [&](int k, QctxCur& c) {
    c.x0 = states[k * 4];
    c.x1 = states[k * 4 + 1];
    c.x2 = states[k * 4 + 2];
    c.x3 = states[k * 4 + 3];
    c.wi = wstarts[k];
    c.wend = c.wi + nwords[k];
    c.r = rb[k];
    c.rend = rb[k + 1];
    c.p = 0;
    c.L = 0;
    c.j = sb[k];
    c.prev = 0;
    c.prev2 = 0;
    c.err = 0;
  };

  for (int kp = 0; kp < QCTX_CHUNKS; kp += 2) {
    QctxCur A, B;
    init_cur(kp, A);
    const bool have_b = kp + 1 < QCTX_CHUNKS;
    if (have_b) init_cur(kp + 1, B);
    bool al = qctx_start_record(e, A);
    bool bl = have_b && qctx_start_record(e, B);
    while (al && bl) {
      const long long ma = A.L - A.p;
      const long long mb = B.L - B.p;
      const long long m = ma < mb ? ma : mb;
      const bool af = A.wend - A.wi >= m;
      const bool bf = B.wend - B.wi >= m;
      uint32_t ax0 = A.x0, ax1 = A.x1, ax2 = A.x2, ax3 = A.x3;
      uint32_t bx0 = B.x0, bx1 = B.x1, bx2 = B.x2, bx3 = B.x3;
      long long awi = A.wi, bwi = B.wi;
      long long ap = A.p, bp = B.p;
      long long aj = A.j, bj = B.j;
      int aprev = A.prev, aprev2 = A.prev2;
      int bprev = B.prev, bprev2 = B.prev2;
      for (long long t = 0; t < m; t++) {
        int rc;
        if (af)
          rc = qctx_step_fast(e, ax0, ax1, ax2, ax3, awi, ap, aj, aprev,
                              aprev2)
                   ? 0
                   : -5;
        else
          rc = qctx_step_scarce(e, ax0, ax1, ax2, ax3, awi, A.wend, ap,
                                aj, aprev, aprev2);
        if (rc) return rc;
        if (bf)
          rc = qctx_step_fast(e, bx0, bx1, bx2, bx3, bwi, bp, bj, bprev,
                              bprev2)
                   ? 0
                   : -5;
        else
          rc = qctx_step_scarce(e, bx0, bx1, bx2, bx3, bwi, B.wend, bp,
                                bj, bprev, bprev2);
        if (rc) return rc;
      }
      A.x0 = ax0; A.x1 = ax1; A.x2 = ax2; A.x3 = ax3;
      A.wi = awi; A.p = ap; A.j = aj; A.prev = aprev; A.prev2 = aprev2;
      B.x0 = bx0; B.x1 = bx1; B.x2 = bx2; B.x3 = bx3;
      B.wi = bwi; B.p = bp; B.j = bj; B.prev = bprev; B.prev2 = bprev2;
      if (A.p >= A.L) al = qctx_start_record(e, A);
      if (B.p >= B.L) bl = qctx_start_record(e, B);
    }
    qctx_finish_single(e, A, al);
    if (have_b) qctx_finish_single(e, B, bl);
    if (A.err) return A.err;
    if (have_b && B.err) return B.err;
  }
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Order-0 interleaved-lane rANS (FQZ v3 TAG_RANS streams), host backend.
//
// Wire semantics are defined by ops/rans.py (the XLA lane coder): N lanes,
// lane l codes symbols l, l+N, l+2N, ...; 32-bit state, 16-bit renorm
// words, 12-bit probabilities; encode walks backward, words land in global
// (step, lane) order — exactly the forward decoder's consumption order, so
// this sequential decoder advances one pointer through the word stream.
// Both directions are byte-identical to the XLA kernels (tested), letting
// host and device backends read each other's containers.

extern "C" {

// Backward encode of all lanes. `words` capacity ceil(n/N)*N; N must be a
// power of two; `pad_sym` fills the final partial row (included in `freq`).
// Returns total emitted words, or -1 if a present symbol has freq 0.
long long fq_rans_encode(const uint8_t* data, long long n, int N, int pad_sym,
                         const uint16_t* freq, const uint32_t* cum,
                         uint16_t* words, uint32_t* states) {
  long long steps = (n + N - 1) / N;
  long long total_slots = steps * (long long)N;
  // Reciprocal division (Granlund-Montgomery round-up, exact for u32):
  // floor(x / f) = (x * M[s]) >> SH[s].
  uint64_t M[256];
  uint8_t SH[256];
  for (int s = 0; s < 256; s++) {
    uint32_t f = freq[s];
    if (!f) { M[s] = 0; SH[s] = 0; continue; }
    int sh = 0;
    while ((1u << sh) < f) sh++;
    unsigned __int128 num = ((unsigned __int128)1) << (32 + sh);
    M[s] = (uint64_t)((num + f - 1) / f);
    SH[s] = (uint8_t)(32 + sh);
  }
  // The backward walk visits slots in descending global (step, lane)
  // order, so filling `words` from the end leaves the emitted words in
  // exactly the forward (decoder) order — no emit matrix, no compaction.
  std::vector<uint32_t> x((size_t)N, 1u << 16);
  long long wpos = total_slots;
  for (long long idx = total_slots - 1; idx >= n; idx--) {
    int l = (int)(idx & (long long)(N - 1));
    uint8_t s = (uint8_t)pad_sym;
    uint32_t f = freq[s];
    if (!f) return -1;
    uint32_t xs = x[l];
    if ((xs >> 20) >= f) {
      words[--wpos] = (uint16_t)(xs & 0xFFFF);
      xs >>= 16;
    }
    uint32_t q = (uint32_t)(((unsigned __int128)xs * M[s]) >> SH[s]);
    x[l] = (q << 12) + (xs - q * f) + cum[s];
  }
  for (long long idx = n - 1; idx >= 0; idx--) {
    int l = (int)(idx & (long long)(N - 1));
    uint8_t s = data[idx];
    uint32_t f = freq[s];
    if (!f) return -1;
    uint32_t xs = x[l];
    if ((xs >> 20) >= f) {
      words[--wpos] = (uint16_t)(xs & 0xFFFF);
      xs >>= 16;
    }
    uint32_t q = (uint32_t)(((unsigned __int128)xs * M[s]) >> SH[s]);
    x[l] = (q << 12) + (xs - q * f) + cum[s];
  }
  long long total = total_slots - wpos;
  if (wpos > 0) memmove(words, words + wpos, sizeof(uint16_t) * (size_t)total);
  memcpy(states, x.data(), sizeof(uint32_t) * (size_t)N);
  return total;
}

// Forward decode. `states_in` are the encoder's final states. Writes
// raw_len bytes to `out`. Returns 0, or a negative error on corrupt input.
int fq_rans_decode(const uint16_t* words, long long total_words,
                   const uint32_t* states_in, int N, const uint16_t* freq,
                   long long raw_len, uint8_t* out) {
  long long steps = (raw_len + N - 1) / N;
  uint8_t slot_sym[4096];
  uint32_t cum[256];
  uint32_t acc = 0;
  for (int s = 0; s < 256; s++) {
    cum[s] = acc;
    uint32_t f = freq[s];
    if (acc + f > 4096u) return -4;
    for (uint32_t i = 0; i < f; i++) slot_sym[acc + i] = (uint8_t)s;
    acc += f;
  }
  if (acc != 4096u) return -4;
  std::vector<uint32_t> x(states_in, states_in + N);
  long long wi = 0;
  long long total_slots = steps * (long long)N;
  for (long long idx = 0; idx < total_slots; idx++) {
    int l = (int)(idx & (long long)(N - 1));
    uint32_t xs = x[l];
    uint32_t sl = xs & 4095u;
    uint8_t s = slot_sym[sl];
    xs = (uint32_t)freq[s] * (xs >> 12) + sl - cum[s];
    if (xs < (1u << 16)) {
      if (wi >= total_words) return -2;
      xs = (xs << 16) | words[wi++];
    }
    x[l] = xs;
    if (idx < raw_len) out[idx] = s;
  }
  if (wi != total_words) return -3;
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Order-k context-modeled sequence coder (FQZ v3 TAG_SCTX)
//
// Semantics defined by the numpy reference in ops/seqctx.py: 2-bit base
// symbols, context = previous `order` bases of the record packed
// little-endian (missing predecessors = 0), per-context 12-bit rANS
// tables over the 4-symbol alphabet, 4 record-aligned chunks (same
// balancing as qctx), rANS conventions as ops/rans.py. The decoder
// resolves symbols with 3 compares (no slot tables) and re-packs the
// wire's packed-row layout byte-identically (zero padding bits).

namespace {
constexpr int SCTX_MAX_ORDER = 6;
constexpr int SCTX_CHUNKS = 4;
constexpr uint32_t SCTX_SCALE = 1u << 12;
constexpr uint32_t SCTX_L = 1u << 16;
}  // namespace

extern "C" {

// Pass 1: unpack packed rows -> flat base symbols + max-order histogram
// ((4^6, 4) int64). Returns 0, or -1 if packed size mismatches lengths.
int fq_sctx_prepare(const uint8_t* packed, long long packed_len,
                    const long long* lengths, long long nrec,
                    uint8_t* bases, long long* hist) {
  memset(hist, 0, sizeof(long long) * (size_t)(1 << (2 * SCTX_MAX_ORDER)) * 4);
  const uint32_t mask = (1u << (2 * SCTX_MAX_ORDER)) - 1;
  long long j = 0, pi = 0;
  for (long long r = 0; r < nrec; r++) {
    long long L = lengths[r];
    if (L < 0 || pi + ((L + 3) >> 2) > packed_len) return -1;
    uint32_t ctx = 0;
    for (long long p = 0; p < L; p++, j++) {
      uint8_t s = (packed[pi + (p >> 2)] >> ((p & 3) * 2)) & 3;
      bases[j] = s;
      hist[(size_t)ctx * 4 + s]++;
      ctx = ((ctx << 2) | s) & mask;
    }
    pi += (L + 3) >> 2;
  }
  return (pi == packed_len) ? 0 : -1;
}

// Pass 2: backward rANS encode of every chunk at the picked order.
// words has capacity n; chunk k's words end at words[sb[k+1]) as in qctx.
// Returns 0, or -1 on invalid tables.
int fq_sctx_encode(const uint8_t* bases, long long n, const long long* lengths,
                   long long nrec, int order, const uint16_t* freq,
                   const uint32_t* cum, uint16_t* words, uint32_t* states,
                   long long* nwords) {
  const int nctx = 1 << (2 * order);
  const uint32_t mask = (uint32_t)nctx - 1;
  std::vector<uint64_t> M((size_t)nctx * 4, 0);
  std::vector<uint8_t> SH((size_t)nctx * 4, 0);
  for (size_t i = 0; i < (size_t)nctx * 4; i++) {
    uint32_t f = freq[i];
    if (!f) continue;
    int s = 0;
    while ((1u << s) < f) s++;
    unsigned __int128 num = ((unsigned __int128)1) << (32 + s);
    M[i] = (uint64_t)((num + f - 1) / f);
    SH[i] = (uint8_t)(32 + s);
  }
  // forward pass: per-symbol context ids (low 2*order bits of rolling ctx)
  std::vector<uint16_t> ctxv((size_t)(n > 0 ? n : 1));
  {
    long long j = 0;
    for (long long r = 0; r < nrec; r++) {
      long long L = lengths[r];
      uint32_t ctx = 0;
      for (long long p = 0; p < L; p++, j++) {
        ctxv[j] = (uint16_t)ctx;
        ctx = ((ctx << 2) | bases[j]) & mask;
      }
    }
    if (j != n) return -1;
  }

  long long rb[SCTX_CHUNKS + 1], sb[SCTX_CHUNKS + 1];
  qctx_chunks(lengths, nrec, rb, sb);

  // 4 interleaved states per chunk (symbol at chunk-local index t
  // belongs to state t & 3), words emitted from the end in forward
  // consumption order.
  for (int k = 0; k < SCTX_CHUNKS; k++) {
    uint32_t xs[4] = {SCTX_L, SCTX_L, SCTX_L, SCTX_L};
    long long wpos = sb[k + 1];
    for (long long j = sb[k + 1] - 1; j >= sb[k]; j--) {
      int si = (int)((j - sb[k]) & 3);
      uint32_t x = xs[si];
      size_t e = (size_t)ctxv[j] * 4 + bases[j];
      uint32_t f = freq[e];
      if (!f) return -1;
      if ((x >> 20) >= f) {
        words[--wpos] = (uint16_t)(x & 0xFFFF);
        x >>= 16;
      }
      uint32_t q = (uint32_t)(((unsigned __int128)x * M[e]) >> SH[e]);
      xs[si] = (q << 12) + (x - q * f) + cum[e];
    }
    for (int si = 0; si < 4; si++) states[k * 4 + si] = xs[si];
    nwords[k] = sb[k + 1] - wpos;
  }
  return 0;
}

// Pair-interleaved sctx decode machinery (E084). The single-chunk walk
// is bound by its serial ctx -> row-load -> compare -> ctx chain
// (~9-11 cycles/symbol), not by ALU width; chunks are the independence
// boundary (states and words interleave across lanes WITHIN a chunk,
// ctx resets per record but the lane queue does not), so two chunks
// decoded in one loop overlap their chains for ~free.
struct SctxDCtx {
  const uint16_t* words;
  const uint16_t* rowbase;  // {0, c1, c2, c3, f0..f3} x16B per context
  uint32_t mask;
  const long long* lengths;
  uint8_t* out;
  long long cap;
};

struct SctxCur {
  uint32_t x0, x1, x2, x3;  // rotating lane queue (lane of next symbol
                            // is always x0; chunk starts at lane 0)
  uint32_t ctx;
  long long wi, wend;
  long long r, rend;
  long long p, L;
  long long po;
  uint8_t* orow;
  uint8_t acc;
  int err;  // 0 ok; -2 truncated words, -3 trailing, -5 bad freq,
            // -6 packed overflow, -1 bad length
};

// Advance to the next record with symbols; false at chunk end or error.
static inline bool sctx_start_record(const SctxDCtx& e, SctxCur& c) {
  for (;;) {
    if (c.r >= c.rend) {
      if (c.wi != c.wend && !c.err) c.err = -3;
      return false;
    }
    const long long L = e.lengths[c.r++];
    if (L < 0) {
      c.err = -1;
      return false;
    }
    const long long rowb = (L + 3) >> 2;
    if (c.po + rowb > e.cap) {
      c.err = -6;
      return false;
    }
    c.orow = e.out + c.po;
    c.po += rowb;
    c.p = 0;
    c.ctx = 0;
    c.acc = 0;
    c.L = L;
    if (L > 0) return true;
  }
}

// One symbol with branchless renorm; the caller guarantees words[wi] is
// readable (word budget >= symbols this run). Returns false on a
// zero-frequency row (corrupt table walk).
__attribute__((always_inline)) static inline bool sctx_step_fast(const SctxDCtx& e, uint32_t& x0,
                                  uint32_t& x1, uint32_t& x2, uint32_t& x3,
                                  uint32_t& ctx, long long& wi,
                                  uint8_t& acc, long long& p,
                                  uint8_t* orow) {
  uint32_t x = x0;
  const uint32_t slot = x & (SCTX_SCALE - 1);
  const uint16_t* row = e.rowbase + (size_t)ctx * 8;
  const uint32_t s = (uint32_t)((slot >= row[1]) + (slot >= row[2]) +
                                (slot >= row[3]));
  const uint32_t f = row[4 + s];
  if (!f) return false;
  x = f * (x >> 12) + slot - row[s];
  const uint32_t lt = x < SCTX_L;
  const uint32_t w = e.words[wi];
  x = lt ? ((x << 16) | w) : x;
  wi += lt;
  ctx = ((ctx << 2) | s) & e.mask;
  x0 = x1;
  x1 = x2;
  x2 = x3;
  x3 = x;
  acc |= (uint8_t)(s << ((p & 3) * 2));
  if ((p & 3) == 3) {
    orow[p >> 2] = acc;
    acc = 0;
  }
  p++;
  return true;
}

// Scarce-word flavor: renorm is a (rare, well-predicted) branch with an
// in-branch bounds check — for highly-skewed streams whose word count
// is far below the symbol count, where the branchless read would run
// past the stream. Returns 0, -2 (words exhausted) or -5 (bad table).
__attribute__((always_inline)) static inline int sctx_step_scarce(
    const SctxDCtx& e, uint32_t& x0, uint32_t& x1, uint32_t& x2,
    uint32_t& x3, uint32_t& ctx, long long& wi, long long wend,
    uint8_t& acc, long long& p, uint8_t* orow) {
  uint32_t x = x0;
  const uint32_t slot = x & (SCTX_SCALE - 1);
  const uint16_t* row = e.rowbase + (size_t)ctx * 8;
  const uint32_t s = (uint32_t)((slot >= row[1]) + (slot >= row[2]) +
                                (slot >= row[3]));
  const uint32_t f = row[4 + s];
  if (!f) return -5;
  x = f * (x >> 12) + slot - row[s];
  if (x < SCTX_L) {
    if (wi >= wend) return -2;
    x = (x << 16) | e.words[wi++];
  }
  ctx = ((ctx << 2) | s) & e.mask;
  x0 = x1;
  x1 = x2;
  x2 = x3;
  x3 = x;
  acc |= (uint8_t)(s << ((p & 3) * 2));
  if ((p & 3) == 3) {
    orow[p >> 2] = acc;
    acc = 0;
  }
  p++;
  return 0;
}

// Finish one chunk alone: whole-record runs on register-cached state;
// the renorm flavor per run is branchless when the word budget covers
// the run and branchy-rare otherwise.
static void sctx_finish_single(const SctxDCtx& e, SctxCur& c, bool live) {
  while (live) {
    const long long m = c.L - c.p;
    const bool fast = c.wend - c.wi >= m;
    uint32_t x0 = c.x0, x1 = c.x1, x2 = c.x2, x3 = c.x3, ctx = c.ctx;
    long long wi = c.wi, p = c.p;
    uint8_t acc = c.acc;
    uint8_t* orow = c.orow;
    if (fast) {
      for (long long t = 0; t < m; t++) {
        if (!sctx_step_fast(e, x0, x1, x2, x3, ctx, wi, acc, p, orow)) {
          c.err = -5;
          return;
        }
      }
    } else {
      for (long long t = 0; t < m; t++) {
        const int rc = sctx_step_scarce(e, x0, x1, x2, x3, ctx, wi,
                                        c.wend, acc, p, orow);
        if (rc) {
          c.err = rc;
          return;
        }
      }
    }
    c.x0 = x0;
    c.x1 = x1;
    c.x2 = x2;
    c.x3 = x3;
    c.ctx = ctx;
    c.wi = wi;
    c.p = p;
    c.acc = acc;
    if (c.L & 3) c.orow[c.L >> 2] = c.acc;
    live = sctx_start_record(e, c);
  }
}

// Forward decode straight into the packed-row wire layout.
// Returns 0, or a negative error on corrupt input.
int fq_sctx_decode(const uint16_t* words, const long long* wstarts,
                   const long long* nwords, const uint32_t* states,
                   long long n, const long long* lengths, long long nrec,
                   int order, const uint16_t* freq, uint8_t* packed_out,
                   long long packed_cap) {
  const int nctx = 1 << (2 * order);
  const uint32_t mask = (uint32_t)nctx - 1;
  long long total = 0;
  for (long long r = 0; r < nrec; r++) total += lengths[r];
  if (total != n) return -1;

  // Interleaved per-context row: {0, cum1, cum2, cum3, f0, f1, f2, f3}
  // (u16 x8 = 16 B) — slot -> symbol is three compares off one cache
  // line, and the leading 0 makes the cum subtraction an unconditional
  // row[s] load (E082: the old `s ? row[s-1] : 0` cmov sat on the
  // critical path).
  std::vector<uint16_t> rows((size_t)nctx * 8);
  for (int c = 0; c < nctx; c++) {
    const uint16_t* fr = freq + (size_t)c * 4;
    uint16_t* row = rows.data() + (size_t)c * 8;
    row[0] = 0;
    row[1] = fr[0];
    row[2] = (uint16_t)(fr[0] + fr[1]);
    row[3] = (uint16_t)(fr[0] + fr[1] + fr[2]);
    row[4] = fr[0];
    row[5] = fr[1];
    row[6] = fr[2];
    row[7] = fr[3];
  }
  const uint16_t* rowbase = rows.data();

  long long rb[SCTX_CHUNKS + 1], sb[SCTX_CHUNKS + 1];
  qctx_chunks(lengths, nrec, rb, sb);

  // packed byte offset of each chunk's first record
  long long pchunk[SCTX_CHUNKS + 1];
  {
    long long pref = 0, rr = 0;
    for (int k = 0; k <= SCTX_CHUNKS; k++) {
      while (rr < rb[k]) pref += (lengths[rr++] + 3) >> 2;
      pchunk[k] = pref;
    }
  }

  const SctxDCtx e{words, rowbase, mask, lengths, packed_out, packed_cap};
  auto init_cur = [&](int k, SctxCur& c) {
    c.x0 = states[k * 4];
    c.x1 = states[k * 4 + 1];
    c.x2 = states[k * 4 + 2];
    c.x3 = states[k * 4 + 3];
    c.ctx = 0;
    c.wi = wstarts[k];
    c.wend = c.wi + nwords[k];
    c.r = rb[k];
    c.rend = rb[k + 1];
    c.p = 0;
    c.L = 0;
    c.po = pchunk[k];
    c.orow = nullptr;
    c.acc = 0;
    c.err = 0;
  };

  for (int kp = 0; kp < SCTX_CHUNKS; kp += 2) {
    SctxCur A, B;
    init_cur(kp, A);
    const bool have_b = kp + 1 < SCTX_CHUNKS;
    if (have_b) init_cur(kp + 1, B);
    bool al = sctx_start_record(e, A);
    bool bl = have_b && sctx_start_record(e, B);
    while (al && bl) {
      const long long ma = A.L - A.p;
      const long long mb = B.L - B.p;
      const long long m = ma < mb ? ma : mb;
      // renorm flavor per stream per run: branchless when the word
      // budget covers the run, branchy-rare otherwise (skewed streams
      // carry far fewer words than symbols — the budget would
      // otherwise starve every run down to the slow path)
      const bool af = A.wend - A.wi >= m;
      const bool bf = B.wend - B.wi >= m;
      uint32_t ax0 = A.x0, ax1 = A.x1, ax2 = A.x2, ax3 = A.x3;
      uint32_t bx0 = B.x0, bx1 = B.x1, bx2 = B.x2, bx3 = B.x3;
      uint32_t actx = A.ctx, bctx = B.ctx;
      long long awi = A.wi, bwi = B.wi;
      long long ap = A.p, bp = B.p;
      uint8_t aacc = A.acc, bacc = B.acc;
      uint8_t* aor = A.orow;
      uint8_t* bor = B.orow;
      for (long long t = 0; t < m; t++) {
        int rc;
        if (af)
          rc = sctx_step_fast(e, ax0, ax1, ax2, ax3, actx, awi, aacc, ap,
                              aor)
                   ? 0
                   : -5;
        else
          rc = sctx_step_scarce(e, ax0, ax1, ax2, ax3, actx, awi, A.wend,
                                aacc, ap, aor);
        if (rc) return rc;
        if (bf)
          rc = sctx_step_fast(e, bx0, bx1, bx2, bx3, bctx, bwi, bacc, bp,
                              bor)
                   ? 0
                   : -5;
        else
          rc = sctx_step_scarce(e, bx0, bx1, bx2, bx3, bctx, bwi, B.wend,
                                bacc, bp, bor);
        if (rc) return rc;
      }
      A.x0 = ax0; A.x1 = ax1; A.x2 = ax2; A.x3 = ax3;
      A.ctx = actx; A.wi = awi; A.p = ap; A.acc = aacc;
      B.x0 = bx0; B.x1 = bx1; B.x2 = bx2; B.x3 = bx3;
      B.ctx = bctx; B.wi = bwi; B.p = bp; B.acc = bacc;
      if (A.p >= A.L) {
        if (A.L & 3) A.orow[A.L >> 2] = A.acc;
        al = sctx_start_record(e, A);
      }
      if (B.p >= B.L) {
        if (B.L & 3) B.orow[B.L >> 2] = B.acc;
        bl = sctx_start_record(e, B);
      }
    }
    sctx_finish_single(e, A, al);
    if (have_b) sctx_finish_single(e, B, bl);
    if (A.err) return A.err;
    if (have_b && B.err) return B.err;
  }
  return 0;
}

// Flat packed seq stream (per-record rows, zero padding bits) <-> flat
// base codes: the TAG_SLDM payload transform (ops/sldm.py). Unpack emits
// 4 codes per packed byte through a u32 LUT; pack masks every code to
// 2 bits so hostile payload bytes cannot bleed into neighbouring bases.
int fq_sldm_unpack(const uint8_t* packed, long long packed_len,
                   const long long* lengths, long long nrec,
                   uint8_t* bases) {
  static uint32_t lut[256];
  // one-time fill under a C++11 magic-static guard: compress/decode
  // workers race to the first call, and the old `if (!lut_init)`
  // double-check was a genuine data race (caught by make test-tsan)
  static const bool lut_ready = [&] {
    for (int b = 0; b < 256; b++)
      lut[b] = (uint32_t)((b & 3) | (((b >> 2) & 3) << 8) |
                          (((b >> 4) & 3) << 16) | (((b >> 6) & 3) << 24));
    return true;
  }();
  (void)lut_ready;
  long long j = 0, pi = 0;
  for (long long r = 0; r < nrec; r++) {
    const long long L = lengths[r];
    if (L < 0 || pi + ((L + 3) >> 2) > packed_len) return -1;
    const uint8_t* row = packed + pi;
    long long p = 0;
    for (; p + 4 <= L; p += 4) {
      const uint32_t v = lut[row[p >> 2]];
      memcpy(bases + j + p, &v, 4);
    }
    for (; p < L; p++) bases[j + p] = (row[p >> 2] >> ((p & 3) * 2)) & 3;
    j += L;
    pi += (L + 3) >> 2;
  }
  return (pi == packed_len) ? 0 : -1;
}

int fq_sldm_pack(const uint8_t* bases, long long total,
                 const long long* lengths, long long nrec, uint8_t* packed) {
  long long j = 0, pi = 0;
  for (long long r = 0; r < nrec; r++) {
    const long long L = lengths[r];
    if (L < 0 || j + L > total) return -1;
    const uint8_t* b = bases + j;
    uint8_t* orow = packed + pi;
    long long p = 0;
    for (; p + 4 <= L; p += 4) {
      orow[p >> 2] = (uint8_t)((b[p] & 3) | ((b[p + 1] & 3) << 2) |
                               ((b[p + 2] & 3) << 4) | ((b[p + 3] & 3) << 6));
    }
    if (p < L) {
      uint8_t v = 0;
      for (; p < L; p++) v |= (uint8_t)((b[p] & 3) << ((p & 3) * 2));
      orow[L >> 2] = v;
    }
    j += L;
    pi += (L + 3) >> 2;
  }
  return (j == total) ? 0 : -1;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused v1/v2 block encode: FASTQ text + scan offsets -> entropy-coded block
// payload in one GIL-released call. The Python pipeline previously composed
// fq_build_streams + six ctypes zstd calls per block; the per-call glue
// (dst-buffer memsets, .tobytes() copies, ctypes marshalling) held the GIL
// for ~40% of worker time and capped 2-thread scaling at ~1.3x. This path
// leaves Python one call per block (reference analog: the whole of
// compressBlockWithBuffers, internal/compress/compress.go:471-552).
//
// zstd policy mirrors entropy/zstd.py: level 1 (SpeedFastest), hashLog 13,
// frame checksums on, plus the E028 incompressibility probe (sample 128 KB
// of streams >= 1 MB; near-incompressible streams recompress under an
// accelerated context with targetLength 1024).
// ---------------------------------------------------------------------------

namespace {

constexpr size_t kProbeBytes = 128u << 10;
constexpr size_t kProbeMinStream = 1u << 20;
constexpr size_t kRawBlockMax = 128u << 10;   // RFC8878 Block_Maximum_Size
constexpr size_t kStoreMaxStream = 32u << 20; // keep window under decoder caps

// FQZ_MT_STATS sub-stage split inside the fused encoder (transform walk vs
// zstd loop) — dumped and reset by MtStats::dump. File-scope because the
// fused encoder and the MT driver live in different namespaces.
std::atomic<long long> g_fused_transform_us{0};
std::atomic<long long> g_fused_zstd_us{0};
inline bool fq_stats_on() {
  static const bool on = [] {
    const char* v = getenv("FQZ_MT_STATS");
    return v && v[0] == '1';
  }();
  return on;
}
inline double fq_stats_now() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

// XXH64 (xxHash64, public-domain algorithm): zstd frame checksums are the
// low 32 bits of XXH64(content, seed 0). libzstd does not export its copy.
static inline uint64_t xxh_rotl64(uint64_t x, int r) {
  return (x << r) | (x >> (64 - r));
}
uint64_t fq_xxh64(const uint8_t* p, size_t len, uint64_t seed) {
  const uint64_t P1 = 11400714785074694791ULL;
  const uint64_t P2 = 14029467366897019727ULL;
  const uint64_t P3 = 1609587929392839161ULL;
  const uint64_t P4 = 9650029242287828579ULL;
  const uint64_t P5 = 2870177450012600261ULL;
  const uint8_t* end = p + len;
  uint64_t h;
  if (len >= 32) {
    uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* lim = end - 32;
    do {
      uint64_t k;
      memcpy(&k, p, 8); v1 = xxh_rotl64(v1 + k * P2, 31) * P1; p += 8;
      memcpy(&k, p, 8); v2 = xxh_rotl64(v2 + k * P2, 31) * P1; p += 8;
      memcpy(&k, p, 8); v3 = xxh_rotl64(v3 + k * P2, 31) * P1; p += 8;
      memcpy(&k, p, 8); v4 = xxh_rotl64(v4 + k * P2, 31) * P1; p += 8;
    } while (p <= lim);
    h = xxh_rotl64(v1, 1) + xxh_rotl64(v2, 7) + xxh_rotl64(v3, 12) +
        xxh_rotl64(v4, 18);
    v1 *= P2; v1 = xxh_rotl64(v1, 31); v1 *= P1; h ^= v1; h = h * P1 + P4;
    v2 *= P2; v2 = xxh_rotl64(v2, 31); v2 *= P1; h ^= v2; h = h * P1 + P4;
    v3 *= P2; v3 = xxh_rotl64(v3, 31); v3 *= P1; h ^= v3; h = h * P1 + P4;
    v4 *= P2; v4 = xxh_rotl64(v4, 31); v4 *= P1; h ^= v4; h = h * P1 + P4;
  } else {
    h = seed + P5;
  }
  h += (uint64_t)len;
  while (p + 8 <= end) {
    uint64_t k;
    memcpy(&k, p, 8);
    k *= P2; k = xxh_rotl64(k, 31); k *= P1;
    h ^= k; h = xxh_rotl64(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    uint32_t k;
    memcpy(&k, p, 4);
    h ^= (uint64_t)k * P1; h = xxh_rotl64(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= (uint64_t)(*p) * P5; h = xxh_rotl64(h, 11) * P1;
    p++;
  }
  h ^= h >> 33; h *= P2; h ^= h >> 29; h *= P3; h ^= h >> 32;
  return h;
}

// Stored zstd frame (all raw blocks, RFC8878): for probe-detected
// incompressible streams (2-bit packed high-entropy DNA) the match search
// is pure waste -- a conformant raw-block frame costs one memcpy + XXH64
// and any standard decoder (libzstd, klauspost) reads it. Layout: magic,
// FHD 0xE4 (single-segment, 8-byte FCS, checksum), FCS, raw blocks
// (u24le (size<<3)|last), XXH64 low 32 bits. Returns bytes written, or 0
// when cap is too small (caller falls back to real zstd).
size_t fq_zstd_store_raw(const uint8_t* src, size_t n, uint8_t* dst,
                         size_t cap) {
  const size_t nblocks = n ? (n + kRawBlockMax - 1) / kRawBlockMax : 1;
  const size_t need = 4 + 1 + 8 + 3 * nblocks + n + 4;
  if (cap < need || n == 0) return 0;
  uint8_t* p = dst;
  const uint32_t magic = 0xFD2FB528u;
  memcpy(p, &magic, 4); p += 4;
  *p++ = 0xE4;
  const uint64_t fcs = (uint64_t)n;
  memcpy(p, &fcs, 8); p += 8;
  size_t off = 0;
  do {
    const size_t bn = (n - off < kRawBlockMax) ? n - off : kRawBlockMax;
    const uint32_t bh = ((uint32_t)bn << 3) | ((off + bn >= n) ? 1u : 0u);
    memcpy(p, &bh, 3); p += 3;
    memcpy(p, src + off, bn); p += bn;
    off += bn;
  } while (off < n);
  const uint32_t cks = (uint32_t)fq_xxh64(src, n, 0);
  memcpy(p, &cks, 4); p += 4;
  return (size_t)(p - dst);
}

// Grow-only UNINITIALIZED arena: std::vector::resize would memset the
// whole capacity, and the stream-build arenas are written before they are
// read — on the fused path that memset alone (~250 MB per fresh worker
// thread) costs more than a block's entire encode (E056).
struct RawArena {
  uint8_t* p = nullptr;
  size_t cap = 0;
  RawArena() = default;
  RawArena(const RawArena&) = delete;
  RawArena& operator=(const RawArena&) = delete;
  ~RawArena() { free(p); }
  size_t size() const { return cap; }
  uint8_t* data() { return p; }
  bool ensure(size_t n) {
    if (cap >= n) return true;
    uint8_t* q = (uint8_t*)realloc(p, n);
    if (!q) return false;
    p = q;
    cap = n;
    return true;
  }
};

struct ZstdWorker {
  ZSTD_CCtx* cctx = nullptr;   // normal level-1 context
  ZSTD_CCtx* accel = nullptr;  // incompressible-stream context
  ZSTD_CCtx* ldm = nullptr;    // coverage-redundancy context (ops/sldm.py)
  RawArena scratch;            // raw stream build arena (grow-only, no init)
  std::vector<uint8_t> probe;  // probe compress destination (tiny)
  ~ZstdWorker() {
    if (cctx) ZSTD_freeCCtx(cctx);
    if (accel) ZSTD_freeCCtx(accel);
    if (ldm) ZSTD_freeCCtx(ldm);
  }
  // zstd-LDM profile of entropy/zstd.py ZstdCodec(level=1, ldm=True) —
  // the TAG_SLDM candidate's coder (window 2^25, min-match 16, LDM hash
  // 2^24, rate 2^2; journal E039). Byte-identical frames to the Python
  // codec: same libzstd, same parameters, one-shot ZSTD_compress2.
  ZSTD_CCtx* ldm_ctx() {
    if (ldm == nullptr) {
      ZSTD_CCtx* c = ZSTD_createCCtx();
      if (!c) return nullptr;
      ZSTD_CCtx_setParameter(c, ZSTD_c_compressionLevel, 1);
      ZSTD_CCtx_setParameter(c, ZSTD_c_enableLongDistanceMatching, 1);
      ZSTD_CCtx_setParameter(c, ZSTD_c_windowLog, 25);
      ZSTD_CCtx_setParameter(c, ZSTD_c_ldmMinMatch, 16);
      ZSTD_CCtx_setParameter(c, ZSTD_c_ldmHashLog, 24);
      ZSTD_CCtx_setParameter(c, ZSTD_c_ldmHashRateLog, 2);
      ZSTD_CCtx_setParameter(c, ZSTD_c_hashLog, 13);
      ZSTD_CCtx_setParameter(c, ZSTD_c_checksumFlag, 1);
      ldm = c;
    }
    return ldm;
  }
  ZSTD_CCtx* ctx(bool accelerated) {
    ZSTD_CCtx** slot = accelerated ? &accel : &cctx;
    if (*slot == nullptr) {
      ZSTD_CCtx* c = ZSTD_createCCtx();
      if (!c) return nullptr;
      ZSTD_CCtx_setParameter(c, ZSTD_c_compressionLevel, 1);
      // hashLog 13 = 32 KB fast-strategy hash table, fits L1d (E055):
      // ~1.5x faster than hashLog 15 on the quality-delta stream at
      // byte-equal compressed sizes on every stream in the FASTQ mix
      ZSTD_CCtx_setParameter(c, ZSTD_c_hashLog, 13);
      ZSTD_CCtx_setParameter(c, ZSTD_c_checksumFlag, 1);
      if (accelerated) ZSTD_CCtx_setParameter(c, ZSTD_c_targetLength, 1024);
      *slot = c;
    }
    return *slot;
  }
  // (A negative-level "fast" context for match-dominated streams lived
  // here from r2's E060 and was removed after re-measurement: +13-14%
  // stream size for <= 2% speed on the warm heap — journal E060.)
};

thread_local ZstdWorker g_zstd_worker;

// MT worker threads are created per fq_compress_mt call, so their
// thread_local workers (and grow-only arenas) would be torn down and
// re-faulted every run. They borrow pooled workers instead; the Python
// per-block path keeps the plain thread_local (its executor threads are
// long-lived).
std::mutex g_zw_mu;
std::vector<ZstdWorker*> g_zw_pool;
thread_local ZstdWorker* g_zw_override = nullptr;

inline ZstdWorker& current_zstd_worker() {
  return g_zw_override ? *g_zw_override : g_zstd_worker;
}

ZstdWorker* zw_acquire() {
  {
    std::lock_guard<std::mutex> lk(g_zw_mu);
    if (!g_zw_pool.empty()) {
      ZstdWorker* w = g_zw_pool.back();
      g_zw_pool.pop_back();
      return w;
    }
  }
  return new (std::nothrow) ZstdWorker();
}

void zw_release(ZstdWorker* w) {
  if (!w) return;
  std::lock_guard<std::mutex> lk(g_zw_mu);
  g_zw_pool.push_back(w);
}

// compress_adaptive twin (entropy/zstd.py:199-226): probe big streams,
// accelerate the incompressible ones. Returns compressed size or a zstd
// error code (check with ZSTD_isError).
size_t fq_zstd_adaptive(ZstdWorker& w, const uint8_t* src, size_t n,
                        uint8_t* dst, size_t cap) {
  bool accelerated = false;
  if (n >= kProbeMinStream) {
    const size_t pbound = ZSTD_compressBound(kProbeBytes);
    if (w.probe.size() < pbound) w.probe.resize(pbound);
    ZSTD_CCtx* c = w.ctx(false);
    if (!c) return ZSTD_CONTENTSIZE_ERROR;
    const size_t pn =
        ZSTD_compress2(c, w.probe.data(), pbound, src, kProbeBytes);
    if (!ZSTD_isError(pn) &&
        (double)pn >= 0.97 * (double)kProbeBytes) {
      accelerated = true;
    }
  }
  if (accelerated && n <= kStoreMaxStream) {
    // E041: skip the codec entirely -- a stored raw-block frame at memcpy
    // speed (the Python codec twin emits the identical bytes)
    const size_t sn = fq_zstd_store_raw(src, n, dst, cap);
    if (sn) return sn;
  }
  ZSTD_CCtx* c = w.ctx(accelerated);
  if (!c) return ZSTD_CONTENTSIZE_ERROR;
  return ZSTD_compress2(c, dst, cap, n ? src : nullptr, n);
}

}  // namespace

extern "C" {

// exported for equivalence tests against the Python xxhash module
// Order-1 quality-context sampling probe (qualctx.sample_estimate twin,
// E067): integrate the delta stream over the first `nrec` records,
// accumulate the model-0 (position-bucket x prev-bin) context histogram,
// and return the empirical conditional entropy in BITS (plus the
// present-cell count via *cells_out). Empirical entropy lower-bounds the
// 12-bit-quantized coded size, which is the optimistic direction a
// skip-gate needs. Sequential access only — the numpy version's fancy
// indexing costs ~10 ms where this walk costs ~0.2 ms.
double fq_qctx_sample_bits(const uint8_t* delta, const long long* lengths,
                           long long nrec, long long* cells_out) {
  constexpr int kCtx = 8 * 48;
  static thread_local std::vector<uint32_t> hist;
  if (hist.size() < (size_t)kCtx * 256) hist.resize((size_t)kCtx * 256);
  memset(hist.data(), 0, (size_t)kCtx * 256 * 4);
  long long pos = 0;
  for (long long r = 0; r < nrec; r++) {
    const long long len = lengths[r];
    uint8_t acc = 0;
    int prev_bin = 47;  // record-start sentinel
    for (long long j = 0; j < len; j++) {
      acc = (uint8_t)(acc + delta[pos + j]);
      int pb = (int)(j >> 4);
      if (pb > 7) pb = 7;
      hist[(size_t)((pb * 48 + prev_bin) * 256 + acc)]++;
      prev_bin = acc < 46 ? acc : 46;
    }
    pos += len;
  }
  double bits = 0.0;
  long long cells = 0;
  for (int c = 0; c < kCtx; c++) {
    const uint32_t* row = hist.data() + (size_t)c * 256;
    uint64_t tot = 0;
    for (int s = 0; s < 256; s++) tot += row[s];
    if (!tot) continue;
    const double lt = log2((double)tot);
    for (int s = 0; s < 256; s++) {
      if (!row[s]) continue;
      cells++;
      bits += (double)row[s] * (lt - log2((double)row[s]));
    }
  }
  *cells_out = cells;
  return bits;
}

uint64_t fq_xxh64_c(const uint8_t* p, long long n, uint64_t seed) {
  return fq_xxh64(p, (size_t)n, seed);
}

// rANS word-stream compaction (host finish of the device encode,
// ops/rans.py E057): the TPU kernel emits a dense (steps, lanes) word
// matrix plus an LSB-first emit bitmask; every on-device compaction
// formulation (scatter, sort, prefix sums, routing nets) hits XLA:TPU
// de-vectorization at 16M+ slots, while this sequential pass runs at
// memcpy speed. Writes emitted words in slot order (the decoder's
// global (step, lane) consumption order); returns the word count.
long long fq_rans_compact(const uint16_t* emits, const uint8_t* mask_bits,
                          long long n_slots, uint16_t* out) {
  long long w = 0;
  long long i = 0;
  const long long nb = n_slots >> 3;
  for (long long b = 0; b < nb; b++) {
    uint8_t m = mask_bits[b];
    if (m == 0xFF) {  // common on dense streams: copy the whole byte run
      memcpy(out + w, emits + (b << 3), 16);
      w += 8;
      continue;
    }
    while (m) {
      const int bit = __builtin_ctz(m);
      m = (uint8_t)(m & (m - 1));
      out[w++] = emits[(b << 3) + bit];
    }
  }
  for (i = nb << 3; i < n_slots; i++) {
    if (mask_bits[i >> 3] & (1u << (i & 7))) out[w++] = emits[i];
  }
  return w;
}
long long fq_zstd_store_raw_c(const uint8_t* src, long long n, uint8_t* dst,
                              long long cap) {
  return (long long)fq_zstd_store_raw(src, (size_t)n, dst, (size_t)cap);
}

// offs: (n, 8) from fq_scan_records; version 1 or 2 selects the wire
// stream set (v1 drops the plus stream, compress.go:738-758). The caller
// reserves hdr_reserve bytes at the front of out for the block header it
// writes afterwards from comp_sizes/total_len. N positions use the u16
// layout with the reference's 65,536 bp tracking cap; the caller performs
// the long-read ambiguous-base fail-fast beforehand (compress.go:477-488).
//
// Returns payload bytes written after hdr_reserve, or:
//   -1  header/plus field longer than 65535 bytes
//   -3  out_cap too small
//   -4  zstd error
long long fq_encode_block_v2(const uint8_t* text, const long long* offs,
                             long long n, uint8_t qoffset, int version,
                             long long hdr_reserve, uint8_t* out,
                             long long out_cap, long long* comp_sizes,
                             long long* total_len_out) {
  // raw stream capacity bookkeeping (mirrors bindings.build_raw_streams)
  long long total_len = 0, hdr_bytes = 0, plus_bytes = 0, seq_cap = 0;
  for (long long i = 0; i < n; i++) {
    const long long* o = offs + i * 8;
    total_len += o[3];
    hdr_bytes += o[1];
    plus_bytes += o[5];
    seq_cap += (o[3] + 3) >> 2;
  }
  const long long hdr_cap = 2 * n + hdr_bytes;
  const long long plus_cap = 2 * n + plus_bytes;
  const long long npos_cap = 2 * n + 2 * total_len;
  const long long len_cap = 4 * n;

  ZstdWorker& w = current_zstd_worker();
  const size_t need = (size_t)(seq_cap + total_len + hdr_cap + plus_cap +
                               npos_cap + len_cap + 64);
  if (!w.scratch.ensure(need)) return -4;
  uint8_t* seq_s = w.scratch.data();
  uint8_t* qual_s = seq_s + seq_cap;
  uint8_t* hdr_s = qual_s + total_len;
  uint8_t* plus_s = hdr_s + hdr_cap;
  uint8_t* npos_s = plus_s + plus_cap;
  uint8_t* len_s = npos_s + npos_cap;

  long long sizes[6];
  int32_t minq = 255;
  int rc = fq_build_streams(text, offs, n, qoffset, /*wide=*/0,
                            /*npos_cap=*/65536, seq_s, qual_s, hdr_s,
                            plus_s, npos_s, len_s, sizes, &minq);
  if (rc != 0) return -1;

  const uint8_t* stream_ptr[6] = {seq_s, qual_s, hdr_s, plus_s, npos_s,
                                  len_s};
  long long pos = hdr_reserve;
  int out_idx = 0;
  for (int i = 0; i < 6; i++) {
    if (version == 1 && i == 3) continue;  // v1 has no plus stream
    const size_t bound = ZSTD_compressBound((size_t)sizes[i]);
    if (pos + (long long)bound > out_cap) return -3;
    const size_t cn = fq_zstd_adaptive(w, stream_ptr[i], (size_t)sizes[i],
                                       out + pos, (size_t)(out_cap - pos));
    if (ZSTD_isError(cn)) return -4;
    comp_sizes[out_idx++] = (long long)cn;
    pos += (long long)cn;
  }
  *total_len_out = total_len;
  return pos - hdr_reserve;
}

// One-pass scan+encode of a line-framed FASTQ slice (E056): parse, 2-bit
// pack, quality delta, header/plus/npos/length stream build, and zstd all
// in a single walk over the text — no offsets table (the scan->offs->
// re-walk pipeline moved ~190 MB of extra memory traffic per 136 MB input).
// The slice must start at a line boundary that is also a record boundary;
// block framing by line count is semantically exact because the parser
// always consumes exactly 4 lines per record with no resynchronization, so
// record k occupies lines [4k, 4k+4) wherever the block boundaries fall.
// Validation matches fq_scan_records line for line (same FQ_ERR codes,
// complete lines of a trailing partial record are validated, unterminated
// tail bytes are not), and the wire payload matches fq_encode_block_v2
// byte for byte.
//
// Phase split (deferred Phred detection, r3): `_scan` is the transform
// walk alone — it leaves the six raw streams in the calling worker's
// arena, with each record's FIRST quality byte stored RAW (un-offset);
// the remaining quality bytes are ordinary deltas q[k]-q[k-1], which are
// offset-independent. `_finish` subtracts the resolved offset from those
// first bytes (their positions are the running prefix sums of the
// lengths stream) and entropy-codes the streams. The split lets the MT
// pipeline start every block's transform BEFORE the file-level Phred
// flag is resolved: detection-window blocks fold their own quality
// minimum during the same walk (qmin_io/qmin_cap, the fq_scan_records_ex
// convention), which replaced the serial whole-window prelude scan the
// pipeline used to pay before any worker could start.
//
// fq_encode_block_fused_scan returns 0 on success (fb filled), or:
//   -1   header/plus field longer than 65535 bytes
//   -6   ambiguous bases beyond the u16 npos tracking cap
//        (err_detail[0] = record row in slice, err_detail[1] = its length);
//        reported only when no parse error exists anywhere in the slice —
//        parse errors win, matching the scan-first offs-table path
//   -10  FASTQ parse error (err_detail[0] = FQ_ERR_*)
//   -12  allocation failure
// fq_encode_block_fused_finish returns payload bytes after hdr_reserve, or:
//   -3   out_cap too small (caller sized the buffer wrong)
//   -4   zstd error
struct FqFusedBlock {
  const uint8_t* streams[6];  // seq, qual, headers, plus, npos, lengths
  long long sizes[6];
  long long nrec = 0;
  long long total_len = 0;
  long long consumed = 0;  // bytes of complete records (resync proof chain)
  uint8_t* qual_mut = nullptr;  // mutable alias of streams[1] (offset patch)
};

long long fq_encode_block_fused_scan(const uint8_t* text, long long n,
                                     FqFusedBlock* fb,
                                     long long* err_detail,
                                     uint8_t* qmin_io,
                                     long long qmin_cap);
long long fq_encode_block_fused_scan_wide(const uint8_t* text, long long n,
                                          FqFusedBlock* fb,
                                          long long* err_detail,
                                          uint8_t* qmin_io,
                                          long long qmin_cap);

}  // extern "C"

// WIDE=0: the v1/v2 layout — u16 npos entries, the reference's 65,536 bp
// ambiguous-base tracking cap with its long-read fail-fast
// (compress.go:477-488). WIDE=1: the v3 layout — u32 count + u32
// positions, uncapped (SURVEY §5 long-read mandate: do not inherit the
// u16 cap), no ambiguity fail-fast.
template <int WIDE>
static long long fq_fused_scan_impl(const uint8_t* text, long long n,
                                    FqFusedBlock* fb,
                                    long long* err_detail,
                                    uint8_t* qmin_io,
                                    long long qmin_cap) {
  static uint8_t code_lut[256];
  static uint8_t valid_lut[256];
  // one-time fill under a C++11 magic-static guard: compress/decode
  // workers race to the first call, and the old `if (!lut_init)`
  // double-check was a genuine data race (caught by make test-tsan)
  static const bool lut_ready = [&] {
    for (int i = 0; i < 256; i++) {
      int u = i & 0xDF;
      code_lut[i] =
          (uint8_t)((u == 'C') ? 1 : (u == 'G') ? 2 : (u == 'T') ? 3 : 0);
      valid_lut[i] = (uint8_t)(u == 'A' || u == 'C' || u == 'G' || u == 'T');
    }
    return true;
  }();
  (void)lut_ready;
  err_detail[0] = err_detail[1] = 0;
  fb->nrec = 0;
  fb->total_len = 0;
  const bool sub_stats = fq_stats_on();
  const double t_fused0 = sub_stats ? fq_stats_now() : 0.0;
#ifdef FQ_AVX2
  __m256i vqmin = _mm256_set1_epi8((char)0xFF);
#endif
  uint8_t qmn = 0xFF;
  bool qany = false;

  // Stream arenas sized from the slice alone (single pass, so per-record
  // sums are unknown upfront): nrec <= n/6 (minimal record "@\n\n+\n\n"),
  // seq lines sum to < n/2 of the slice. Grow-only per worker.
  ZstdWorker& w = current_zstd_worker();
  const long long nrec_bound = n / 6 + 1;
  const long long seq_cap = (n >> 2) + nrec_bound + 64;
  const long long qual_cap = n + 64;
  const long long hdr_cap = n + 2 * nrec_bound + 64;
  const long long plus_cap = n + 2 * nrec_bound + 64;
  const long long npos_cap_b =
      WIDE ? 4 * n + 4 * nrec_bound + 64 : 2 * n + 2 * nrec_bound + 64;
  const long long len_cap = 4 * nrec_bound + 64;
  const size_t need = (size_t)(seq_cap + qual_cap + hdr_cap + plus_cap +
                               npos_cap_b + len_cap + 64);
  if (!w.scratch.ensure(need)) return -12;
  uint8_t* seq_s = w.scratch.data();
  uint8_t* qual_s = seq_s + seq_cap;
  uint8_t* hdr_s = qual_s + qual_cap;
  uint8_t* plus_s = hdr_s + hdr_cap;
  uint8_t* npos_s = plus_s + plus_cap;
  uint8_t* len_s = npos_s + npos_cap_b;

  // u16 N-tracking cap (sequence.go:11); the wide (v3) layout is uncapped
  const long long npos_cap = WIDE ? (1LL << 62) : 65536;
  long long so = 0, qo = 0, ho = 0, po = 0, no = 0, lo = 0;
  long long nrec = 0, total_len = 0;
  long long ambig_row = -1, ambig_len = 0;

#ifdef FQ_AVX2
  FqNlIter nl_it(text, n);
#endif
  long long pos = 0;
  for (;;) {
    long long line_start[4], line_len[4];
    long long p = pos;
    int complete = 1;
    for (int li = 0; li < 4; li++) {
#ifdef FQ_AVX2
      const long long end = nl_it.next();
      if (end < 0) {
        complete = 0;
        break;
      }
#else
      const uint8_t* nl =
          (const uint8_t*)memchr(text + p, '\n', (size_t)(n - p));
      if (!nl) {
        complete = 0;
        break;
      }
      long long end = nl - text;
#endif
      long long len = end - p;
      if (len > 0 && text[end - 1] == '\r') len--;
      if (li == 0) {
        if (len == 0 || text[p] != '@') {
          err_detail[0] = FQ_ERR_HEADER;
          return -10;
        }
        line_start[0] = p + 1;
        line_len[0] = len - 1;
      } else if (li == 2) {
        if (len == 0 || text[p] != '+') {
          err_detail[0] = FQ_ERR_PLUS;
          return -10;
        }
        line_start[2] = p + 1;
        line_len[2] = len - 1;
      } else {
        line_start[li] = p;
        line_len[li] = len;
      }
      p = end + 1;
    }
    if (!complete) break;
    if (line_len[1] != line_len[3]) {
      err_detail[0] = FQ_ERR_LEN_MISMATCH;
      return -10;
    }
    pos = p;
    const long long len = line_len[1];

    // Long-read ambiguous-base fail-fast (compress.go:477-488): remember
    // the first offending record but keep PARSING (not encoding) so a
    // later parse error in the slice still wins, like the path where the
    // whole block is scanned before any encode. The wide (v3) layout has
    // no tracking cap, so the guard compiles out.
    if constexpr (!WIDE) {
      if (len > npos_cap && ambig_row < 0) {
        const uint8_t* s = text + line_start[1];
        for (long long j2 = npos_cap; j2 < len; j2++) {
          if (!valid_lut[s[j2]]) {
            ambig_row = nrec;
            ambig_len = len;
            break;
          }
        }
      }
      if (ambig_row >= 0) {
        nrec++;
        continue;  // validation-only mode
      }
    }

    const uint8_t* seq = text + line_start[1];
    const uint8_t* qual = text + line_start[3];

    // sequence: 2-bit pack + N positions inline (fq_build_streams body)
    long long j = 0;
    const long long cap = len < npos_cap ? len : npos_cap;
    const long long npos_cnt_off = no;
    no += WIDE ? 4 : 2;
    uint32_t cnt = 0;
    auto emit_npos = [&](long long posn) {
      if constexpr (WIDE) {
        const uint32_t p32 = (uint32_t)posn;
        memcpy(npos_s + no, &p32, 4);
        no += 4;
      } else {
        npos_s[no++] = (uint8_t)(posn & 0xFF);
        npos_s[no++] = (uint8_t)(posn >> 8);
      }
      cnt++;
    };
#ifdef FQ_AVX2
    for (; j + 32 <= len; j += 32) {
      uint32_t inv = pack32_avx2(seq + j, seq_s + so);
      so += 8;
      while (inv) {
        const long long posn = j + __builtin_ctz(inv);
        inv &= inv - 1;
        if (posn < cap) emit_npos(posn);
      }
    }
    // Vector tail (E061): pack the remainder down to the last 4-aligned
    // base with one OVERLAPPING 32-base window ending there — re-packing
    // the overlap writes byte-identical values, and its N bits are masked
    // out of `inv` so positions emit exactly once. The 151/152 bp scalar
    // tail was ~90 cycles/record; this is one pack32 call.
    if (j < len) {
      const long long t = len & ~3LL;
      if (t > j && t >= 32) {
        const long long w = t - 32;      // 4-aligned, >= 0
        const long long ov = j - w;      // bases already packed, in [4,28]
        uint32_t inv = pack32_avx2(seq + w, seq_s + so - (ov >> 2));
        so += (32 - ov) >> 2;
        inv &= ~0u << ov;
        while (inv) {
          const long long posn = w + __builtin_ctz(inv);
          inv &= inv - 1;
          if (posn < cap) emit_npos(posn);
        }
        j = t;
      }
    }
#endif
    for (; j + 4 <= len; j += 4) {
      uint8_t b0 = seq[j], b1 = seq[j + 1], b2 = seq[j + 2], b3 = seq[j + 3];
      seq_s[so++] = (uint8_t)(code_lut[b0] | (code_lut[b1] << 2) |
                              (code_lut[b2] << 4) | (code_lut[b3] << 6));
      if (!(valid_lut[b0] & valid_lut[b1] & valid_lut[b2] & valid_lut[b3])) {
        for (int k = 0; k < 4; k++) {
          const long long posn = j + k;
          if (posn < cap && !valid_lut[seq[posn]]) emit_npos(posn);
        }
      }
    }
    if (j < len) {
      uint8_t b = 0;
      for (long long k = j; k < len; k++) {
        b = (uint8_t)(b | (code_lut[seq[k]] << ((k - j) << 1)));
        if (k < cap && !valid_lut[seq[k]]) emit_npos(k);
      }
      seq_s[so++] = b;
    }
    if constexpr (WIDE) {
      memcpy(npos_s + npos_cnt_off, &cnt, 4);
    } else {
      npos_s[npos_cnt_off] = (uint8_t)(cnt & 0xFF);
      npos_s[npos_cnt_off + 1] = (uint8_t)((cnt >> 8) & 0xFF);
    }

    // Detection-window quality minimum, folded into the walk while the
    // line is cache-hot (fq_scan_records_ex semantics: complete records
    // only — partial tails never reach this point — and only the first
    // qmin_cap records of the slice participate).
    if (qmin_io && nrec < qmin_cap) {
      if (len > 0) qany = true;
      long long k = 0;
#ifdef FQ_AVX2
      for (; k + 32 <= len; k += 32)
        vqmin = _mm256_min_epu8(
            vqmin, _mm256_loadu_si256((const __m256i*)(qual + k)));
#endif
      for (; k < len; k++)
        if (qual[k] < qmn) qmn = qual[k];
    }

    // quality: raw first byte (offset patched in _finish) + delta
    if (len > 0) {
      qual_s[qo++] = qual[0];
      long long k = 1;
#ifdef FQ_AVX2
      for (; k + 32 <= len; k += 32) {
        const __m256i cur = _mm256_loadu_si256((const __m256i*)(qual + k));
        const __m256i prev =
            _mm256_loadu_si256((const __m256i*)(qual + k - 1));
        _mm256_storeu_si256((__m256i*)(qual_s + qo),
                            _mm256_sub_epi8(cur, prev));
        qo += 32;
      }
      // Vector tail (E061): one OVERLAPPING window ending at len —
      // deltas are position-local (q[p]-q[p-1]), so rewriting the
      // overlap stores byte-identical values.
      if (k < len && len >= 33) {
        const long long ks = len - 32;  // >= 1, so prev-load stays in row
        const __m256i cur = _mm256_loadu_si256((const __m256i*)(qual + ks));
        const __m256i prev =
            _mm256_loadu_si256((const __m256i*)(qual + ks - 1));
        _mm256_storeu_si256((__m256i*)(qual_s + qo + (ks - k)),
                            _mm256_sub_epi8(cur, prev));
        qo += len - k;
        k = len;
      }
#endif
      for (; k < len; k++) qual_s[qo++] = (uint8_t)(qual[k] - qual[k - 1]);
    }

    // header / plus: u16 length prefix + bytes
    if (line_len[0] > 0xFFFF || line_len[2] > 0xFFFF) return -1;
    hdr_s[ho++] = (uint8_t)(line_len[0] & 0xFF);
    hdr_s[ho++] = (uint8_t)(line_len[0] >> 8);
    fq_copy_small(hdr_s + ho, text + line_start[0], (size_t)line_len[0]);
    ho += line_len[0];
    plus_s[po++] = (uint8_t)(line_len[2] & 0xFF);
    plus_s[po++] = (uint8_t)(line_len[2] >> 8);
    fq_copy_small(plus_s + po, text + line_start[2], (size_t)line_len[2]);
    po += line_len[2];

    const uint32_t l32 = (uint32_t)len;
    memcpy(len_s + lo, &l32, 4);
    lo += 4;

    total_len += len;
    nrec++;
  }

  if (qmin_io) {
#ifdef FQ_AVX2
    uint8_t tmp[32];
    _mm256_storeu_si256((__m256i*)tmp, vqmin);
    for (int k = 0; k < 32; k++)
      if (tmp[k] < qmn) qmn = tmp[k];
#endif
    if (qmn < qmin_io[0]) qmin_io[0] = qmn;
    qmin_io[1] |= qany ? 1 : 0;
  }
  if (sub_stats)
    g_fused_transform_us.fetch_add(
        (long long)((fq_stats_now() - t_fused0) * 1e6));
  if (ambig_row >= 0) {
    err_detail[0] = ambig_row;
    err_detail[1] = ambig_len;
    return -6;
  }
  fb->nrec = nrec;
  fb->total_len = total_len;
  fb->consumed = pos;
  fb->sizes[0] = so; fb->sizes[1] = qo; fb->sizes[2] = ho;
  fb->sizes[3] = po; fb->sizes[4] = no; fb->sizes[5] = lo;
  fb->streams[0] = seq_s; fb->streams[1] = qual_s; fb->streams[2] = hdr_s;
  fb->streams[3] = plus_s; fb->streams[4] = npos_s; fb->streams[5] = len_s;
  fb->qual_mut = qual_s;
  return 0;
}

extern "C" {

long long fq_encode_block_fused_scan(const uint8_t* text, long long n,
                                     FqFusedBlock* fb,
                                     long long* err_detail,
                                     uint8_t* qmin_io,
                                     long long qmin_cap) {
  return fq_fused_scan_impl<0>(text, n, fb, err_detail, qmin_io, qmin_cap);
}

long long fq_encode_block_fused_scan_wide(const uint8_t* text, long long n,
                                          FqFusedBlock* fb,
                                          long long* err_detail,
                                          uint8_t* qmin_io,
                                          long long qmin_cap) {
  return fq_fused_scan_impl<1>(text, n, fb, err_detail, qmin_io, qmin_cap);
}

long long fq_encode_block_fused_finish(FqFusedBlock* fb, uint8_t qoffset,
                                       int version, long long hdr_reserve,
                                       uint8_t* out, long long out_cap,
                                       long long* comp_sizes) {
  const bool sub_stats = fq_stats_on();
  const double t_zstd0 = sub_stats ? fq_stats_now() : 0.0;
  if (fb->nrec == 0) {
    for (int i = 0; i < 6; i++) comp_sizes[i] = 0;
    return 0;
  }
  // Patch the per-record first quality bytes with the resolved offset:
  // record starts in the quality stream are the prefix sums of the
  // lengths stream (zero-length records contributed no byte).
  if (qoffset != 0) {
    uint8_t* q = fb->qual_mut;
    const uint8_t* lens = fb->streams[5];
    long long off = 0;
    for (long long i = 0; i < fb->nrec; i++) {
      uint32_t l;
      memcpy(&l, lens + 4 * i, 4);
      if (l > 0) {
        q[off] = (uint8_t)(q[off] - qoffset);
        off += l;
      }
    }
  }
  ZstdWorker& w = current_zstd_worker();
  long long opos = hdr_reserve;
  int out_idx = 0;
  for (int i = 0; i < 6; i++) {
    if (version == 1 && i == 3) continue;  // v1 has no plus stream
    const size_t bound = ZSTD_compressBound((size_t)fb->sizes[i]);
    if (opos + (long long)bound > out_cap) return -3;
    const size_t cn =
        fq_zstd_adaptive(w, fb->streams[i], (size_t)fb->sizes[i],
                         out + opos, (size_t)(out_cap - opos));
    if (ZSTD_isError(cn)) return -4;
    comp_sizes[out_idx++] = (long long)cn;
    opos += (long long)cn;
  }
  if (sub_stats)
    g_fused_zstd_us.fetch_add((long long)((fq_stats_now() - t_zstd0) * 1e6));
  return opos - hdr_reserve;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// FQZ v3 whole-file native compress: the per-block empirical-pick encoder
// (E080). Semantics are defined by pipeline/native.py encode_block_native
// (the numpy/Python reference): per-stream candidates are measured/estimated
// and the smallest wins — zstd-adaptive vs order-0 rANS vs the order-k
// sequence context model (TAG_SCTX, ops/seqctx.py) vs coverage-LDM
// (TAG_SLDM, ops/sldm.py) for the seq slot; zstd vs rANS vs the order-1/2
// quality context model (TAG_QCTX, ops/qualctx.py) for the qual slot;
// token-delta (TAG_TOK, ops/tokenize.py) vs plain for headers; plain
// zstd-adaptive for plus/npos/lengths. Identical pick thresholds, margins
// (SCTX_WIN_MARGIN), probe memoization (PickMemo) and stream assembly, so
// containers are byte-identical to the Python per-block path (given equal
// framing; FQZ_MT_SEQ_FRAMING=1 pins framing for the identity tests).
// ---------------------------------------------------------------------------

namespace fqv3 {

constexpr long long kRansMin = 16384;  // native.py RANS_MIN_BYTES
constexpr double kCtxMargin = 0.98;    // native.py SCTX_WIN_MARGIN
// wire tag values: format/container.py:51-56
constexpr uint8_t TAG_RANS = 0, TAG_ZSTD = 1, TAG_TOK = 2, TAG_QCTX = 3,
                  TAG_SCTX = 4, TAG_SLDM = 5;

// Cross-block probe memoization — PickMemo (pipeline/native.py, E072).
// Counter updates are racy across workers exactly like the Python
// GIL-atomic increments: a lost update only shifts WHICH block re-probes.
struct Memo {
  static constexpr int kProbeEvery = 4;
  static constexpr int kStreak = 2;
  std::atomic<int> sctx_miss{0}, sctx_seen{0}, cov_miss{0}, cov_seen{0};
  bool sctx_should_probe() {
    const int s = sctx_seen.fetch_add(1) + 1;
    if (sctx_miss.load() < kStreak) return true;
    return s % kProbeEvery == 0;
  }
  void sctx_outcome(bool hopeless) {
    if (hopeless)
      sctx_miss.fetch_add(1);
    else
      sctx_miss.store(0);
  }
  bool cov_should_probe() {
    const int s = cov_seen.fetch_add(1) + 1;
    if (cov_miss.load() < kStreak) return true;
    return s % kProbeEvery == 0;
  }
  void cov_outcome(bool hit) {
    if (hit)
      cov_miss.store(0);
    else
      cov_miss.fetch_add(1);
  }
};

// Grow-only per-worker scratch for the v3 pick paths (lives in the pooled
// ZstdWorker's v3 arena; ZstdWorker::scratch holds the six raw streams and
// must stay untouched through the whole block encode).
struct Scratch {
  RawArena lens;   // int64 record lengths
  RawArena bases;  // sctx unpacked codes / qctx integrated qualities
  RawArena hist;   // sctx hist6 (int64[16384]) / qctx hist2 (int64[786432])
  RawArena freq;   // u16 tables
  RawArena cum;    // u32 cumulative tables
  RawArena words;  // u16 rANS word scratch
  std::vector<uint8_t> cand;   // candidate payload A
  std::vector<uint8_t> cand2;  // candidate payload B
  std::vector<uint8_t> blob;   // serialized+zstd'd table blob
};

inline void append_bytes(std::vector<uint8_t>& v, const void* p, size_t n) {
  const uint8_t* b = (const uint8_t*)p;
  v.insert(v.end(), b, b + n);
}
inline void append_u32(std::vector<uint8_t>& v, uint32_t x) {
  append_bytes(v, &x, 4);
}
inline void put_u32_le(uint8_t* p, uint32_t v) { memcpy(p, &v, 4); }

// ---- order-0 rANS helpers (ops/rans.py semantics) ----

inline int pick_lanes(long long n) {
  if (n >= (8LL << 20)) return 16384;
  return n >= (2LL << 20) ? 4096 : 256;
}

// rans.normalize_freqs: floor-scale, bump present zeros to 1, settle the
// residual largest-remainder style over a STABLE descending-frequency
// order (np.argsort(-freq, kind="stable") — ties by symbol index).
inline bool normalize_freqs256(const long long* hist, uint16_t* freq_out) {
  long long total = 0;
  for (int s = 0; s < 256; s++) total += hist[s];
  if (total == 0) return false;
  long long freq[256];
  long long fsum = 0;
  for (int s = 0; s < 256; s++) {
    freq[s] = hist[s] * 4096 / total;
    if (hist[s] > 0 && freq[s] == 0) freq[s] = 1;
    fsum += freq[s];
  }
  long long diff = 4096 - fsum;
  if (diff != 0) {
    int order[256];
    for (int s = 0; s < 256; s++) order[s] = s;
    std::stable_sort(order, order + 256,
                     [&](int a, int b) { return freq[a] > freq[b]; });
    int i = 0;
    long long remaining = diff > 0 ? diff : -diff;
    const int step = diff > 0 ? 1 : -1;
    while (remaining > 0) {
      const int s = order[i & 255];
      if (step > 0 && freq[s] > 0) {
        freq[s]++;
        remaining--;
      } else if (step < 0 && freq[s] > 1) {
        freq[s]--;
        remaining--;
      }
      i++;
      if (i > 100000) return false;  // mirrors the Python safety net
    }
  }
  for (int s = 0; s < 256; s++) freq_out[s] = (uint16_t)freq[s];
  return true;
}

// native.py _rans_size_estimate: exact order-0 coded bits from the
// histogram plus the lane-state wire overhead.
inline long long rans_size_estimate(const long long* hist, long long n) {
  uint16_t freq[256];
  if (!normalize_freqs256(hist, freq)) return 1LL << 60;
  double bits = 0.0;
  for (int s = 0; s < 256; s++) {
    if (hist[s] > 0)
      bits += (double)hist[s] * (12.0 - log2((double)freq[s]));
  }
  const int lanes = pick_lanes(n);
  const long long overhead = 8 + 512 + 4LL * lanes + 4;
  return (long long)(bits / 8.0) + overhead;
}

// rans.encode_stream (host backend): pad-adjusted tables + fq_rans_encode,
// assembled to the ops/rans.py wire layout.
inline bool rans_encode_stream(const uint8_t* s, long long n,
                               const long long* hist_in, Scratch& sc,
                               std::vector<uint8_t>& out) {
  out.clear();
  if (n == 0) {
    const uint8_t hdr[8] = {0};
    append_bytes(out, hdr, 8);
    return true;
  }
  const int N = pick_lanes(n);
  const long long steps = (n + N - 1) / N;
  long long hist[256];
  memcpy(hist, hist_in, sizeof(hist));
  int pad_sym = 0;
  for (int k = 1; k < 256; k++)
    if (hist[k] > hist[pad_sym]) pad_sym = k;  // np.argmax: first max
  hist[pad_sym] += steps * (long long)N - n;
  uint16_t freq[256];
  if (!normalize_freqs256(hist, freq)) return false;
  uint32_t cum[256];
  uint32_t acc = 0;
  for (int k = 0; k < 256; k++) {
    cum[k] = acc;
    acc += freq[k];
  }
  const long long wcap = steps * (long long)N;
  if (!sc.words.ensure((size_t)wcap * 2)) return false;
  uint16_t* words = (uint16_t*)sc.words.data();
  std::vector<uint32_t> states((size_t)N);
  const long long total =
      fq_rans_encode(s, n, N, pad_sym, freq, cum, words, states.data());
  if (total < 0) return false;
  out.reserve((size_t)(8 + 512 + 4 * N + 4 + 2 * total));
  uint32_t n32 = (uint32_t)n;
  append_u32(out, n32);
  int lanes_log2 = 0;
  while ((1 << (lanes_log2 + 1)) <= N) lanes_log2++;
  const uint8_t lb[4] = {(uint8_t)lanes_log2, 0, 0, 0};
  append_bytes(out, lb, 4);
  append_bytes(out, freq, 512);
  append_bytes(out, states.data(), (size_t)N * 4);
  append_u32(out, (uint32_t)total);
  append_bytes(out, words, (size_t)total * 2);
  return true;
}

// Plain zstd frame on the worker's normal context — the twin of
// entropy/zstd.py ZstdCodec.compress (level 1, hashLog 13, checksum on).
inline bool zstd_plain(ZstdWorker& w, const uint8_t* src, size_t n,
                       std::vector<uint8_t>& out) {
  ZSTD_CCtx* c = w.ctx(false);
  if (!c) return false;
  const size_t bound = ZSTD_compressBound(n);
  out.resize(bound);
  const size_t cn =
      ZSTD_compress2(c, out.data(), bound, n ? src : nullptr, n);
  if (ZSTD_isError(cn)) return false;
  out.resize(cn);
  return true;
}

// ---- order-k sequence context model (ops/seqctx.py semantics) ----

constexpr int kSctxOrders[3] = {2, 4, 6};

// seqctx.normalize_tables: vectorized per-context normalization over the
// 4-symbol alphabet — floor-scale, bump present zeros, residual onto the
// (first) largest bucket.
inline void sctx_normalize(const long long* hist, int nctx, uint16_t* freq) {
  for (int c = 0; c < nctx; c++) {
    const long long* h = hist + (size_t)c * 4;
    uint16_t* f = freq + (size_t)c * 4;
    const long long total = h[0] + h[1] + h[2] + h[3];
    if (total <= 0) {
      f[0] = f[1] = f[2] = f[3] = 0;
      continue;
    }
    long long fr[4];
    long long fsum = 0;
    for (int s = 0; s < 4; s++) {
      fr[s] = h[s] * 4096 / total;
      if (h[s] > 0 && fr[s] == 0) fr[s] = 1;
      fsum += fr[s];
    }
    int top = 0;
    for (int s = 1; s < 4; s++)
      if (fr[s] > fr[top]) top = s;
    fr[top] += 4096 - fsum;
    for (int s = 0; s < 4; s++) f[s] = (uint16_t)fr[s];
  }
}

// seqctx.marginalize: sum the max-order histogram over the oldest
// (high) context bits down to 4^order contexts.
inline void sctx_marginalize(const long long* h6, int order, long long* hk) {
  const int nctx6 = 1 << (2 * SCTX_MAX_ORDER);
  const int nctx = 1 << (2 * order);
  memset(hk, 0, sizeof(long long) * (size_t)nctx * 4);
  for (int c = 0; c < nctx6; c++) {
    const int lo = c & (nctx - 1);
    for (int s = 0; s < 4; s++) hk[(size_t)lo * 4 + s] += h6[(size_t)c * 4 + s];
  }
}

inline long long sctx_table_overhead(int order, const uint16_t* freq) {
  const int nctx = 1 << (2 * order);
  long long used = 0;
  for (int c = 0; c < nctx; c++) {
    const uint16_t* f = freq + (size_t)c * 4;
    if ((int)f[0] + f[1] + f[2] + f[3] > 0) used++;
  }
  return 12 + 4 + (long long)((double)(used * 8 + nctx / 8) * 0.5) +
         SCTX_CHUNKS * (4 * 4 + 4);
}

inline double sctx_bits(const long long* hist, const uint16_t* freq,
                        int nctx) {
  double bits = 0.0;
  for (size_t i = 0; i < (size_t)nctx * 4; i++) {
    if (hist[i] > 0) {
      const double f = freq[i] >= 1 ? (double)freq[i] : 1.0;
      bits += (double)hist[i] * (12.0 - log2(f));
    }
  }
  return bits;
}

// seqctx.estimate_size at one order from the max-order histogram;
// scratch arenas hold the marginalized histogram and tables.
inline long long sctx_estimate(const long long* h6, int order, Scratch& sc) {
  const int nctx = 1 << (2 * order);
  if (!sc.freq.ensure((size_t)nctx * 4 * 2) ||
      !sc.cum.ensure((size_t)nctx * 4 * 8))
    return -1;
  long long* hk = (long long*)sc.cum.data();  // reuse as hist scratch
  const long long* hist = h6;
  if (order < SCTX_MAX_ORDER) {
    sctx_marginalize(h6, order, hk);
    hist = hk;
  }
  uint16_t* freq = (uint16_t*)sc.freq.data();
  sctx_normalize(hist, nctx, freq);
  const double bits = sctx_bits(hist, freq, nctx);
  return (long long)(bits / 8.0) + sctx_table_overhead(order, freq);
}

// seqctx.pick_order: smallest estimate wins, first order on ties.
inline int sctx_pick_order(const long long* h6, Scratch& sc,
                           long long* est_out) {
  int best = kSctxOrders[0];
  long long best_sz = -1;
  for (int oi = 0; oi < 3; oi++) {
    const long long sz = sctx_estimate(h6, kSctxOrders[oi], sc);
    if (sz < 0) return -1;
    if (best_sz < 0 || sz < best_sz) {
      best = kSctxOrders[oi];
      best_sz = sz;
    }
  }
  *est_out = best_sz;
  return best;
}

// seqctx.sample_estimate: optimistic projection from a <=1 Mbase
// record-aligned prefix. Returns -1 for "no verdict" (stream within 2x
// of the sample budget — run the real estimate).
inline long long sctx_sample_estimate(const uint8_t* packed, long long plen,
                                      const long long* lens, long long nrec,
                                      long long total, Scratch& sc) {
  const long long max_bases = 1LL << 20;
  if (total <= 2 * max_bases) return -1;
  long long nrec_s = 0, nb = 0;
  while (nrec_s < nrec && nb + lens[nrec_s] <= max_bases) {
    // np.searchsorted(csum, max_bases, "right"): count records whose
    // cumulative sum stays <= the budget
    nb += lens[nrec_s];
    nrec_s++;
  }
  if (nrec_s < 1) {
    nrec_s = 1;
    nb = lens[0];
  }
  if (nb == 0) return -1;
  long long plen_s = 0;
  for (long long r = 0; r < nrec_s; r++) plen_s += (lens[r] + 3) >> 2;
  if (plen_s > plen) return -1;
  const int nctx6 = 1 << (2 * SCTX_MAX_ORDER);
  if (!sc.bases.ensure((size_t)(nb > 0 ? nb : 1)) ||
      !sc.hist.ensure((size_t)nctx6 * 4 * 8))
    return -1;
  long long* h6 = (long long*)sc.hist.data();
  if (fq_sctx_prepare(packed, plen_s, lens, nrec_s, sc.bases.data(), h6) != 0)
    return -1;
  long long best = -1;
  for (int oi = 0; oi < 3; oi++) {
    const int k = kSctxOrders[oi];
    const int nctx = 1 << (2 * k);
    if (!sc.freq.ensure((size_t)nctx * 4 * 2) ||
        !sc.cum.ensure((size_t)nctx * 4 * 8))
      return -1;
    long long* hk = (long long*)sc.cum.data();
    const long long* hist = h6;
    if (k < SCTX_MAX_ORDER) {
      sctx_marginalize(h6, k, hk);
      hist = hk;
    }
    uint16_t* freq = (uint16_t*)sc.freq.data();
    sctx_normalize(hist, nctx, freq);
    const double bits = sctx_bits(hist, freq, nctx);
    const long long proj =
        (long long)(bits / (double)nb * (double)total / 8.0) +
        sctx_table_overhead(k, freq);
    if (best < 0 || proj < best) best = proj;
  }
  return best;
}

// seqctx.encode_prepared: pick the order, build tables, run the chunk
// coder (fq_sctx_encode), assemble the TAG_SCTX payload.
inline bool sctx_encode_stream(const uint8_t* bases, long long n,
                               const long long* lens, long long nrec,
                               const long long* h6, ZstdWorker& w,
                               Scratch& sc, std::vector<uint8_t>& out) {
  long long est = 0;
  const int order = sctx_pick_order(h6, sc, &est);
  if (order < 0) return false;
  const int nctx = 1 << (2 * order);
  if (!sc.freq.ensure((size_t)nctx * 4 * 2) ||
      !sc.cum.ensure((size_t)nctx * 4 * (8 + 4)))
    return false;
  long long* hk = (long long*)sc.cum.data();  // transient hist scratch
  const long long* hist = h6;
  if (order < SCTX_MAX_ORDER) {
    sctx_marginalize(h6, order, hk);
    hist = hk;
  }
  uint16_t* freq = (uint16_t*)sc.freq.data();
  sctx_normalize(hist, nctx, freq);
  // exclusive per-row cumulative sums (u32), AFTER the hist scratch use
  uint32_t* cum = (uint32_t*)sc.cum.data();
  for (int c = 0; c < nctx; c++) {
    uint32_t acc = 0;
    for (int s = 0; s < 4; s++) {
      cum[(size_t)c * 4 + s] = acc;
      acc += freq[(size_t)c * 4 + s];
    }
  }
  if (!sc.words.ensure((size_t)(n > 0 ? n : 1) * 2)) return false;
  uint16_t* words = (uint16_t*)sc.words.data();
  uint32_t states[SCTX_CHUNKS * 4];
  long long nwords[SCTX_CHUNKS];
  if (fq_sctx_encode(bases, n, lens, nrec, order, freq, cum, words, states,
                     nwords) != 0)
    return false;
  // dense little-endian u16 table blob, plain-zstd compressed
  if (!zstd_plain(w, (const uint8_t*)freq, (size_t)nctx * 4 * 2, sc.blob))
    return false;
  long long sb[SCTX_CHUNKS + 1], rb[SCTX_CHUNKS + 1];
  qctx_chunks(lens, nrec, rb, sb);
  long long total_words = 0;
  for (int k = 0; k < SCTX_CHUNKS; k++) total_words += nwords[k];
  out.clear();
  out.reserve((size_t)(12 + sc.blob.size() + SCTX_CHUNKS * 20 +
                       2 * total_words));
  append_u32(out, (uint32_t)n);
  const uint8_t ob[4] = {(uint8_t)order, (uint8_t)SCTX_CHUNKS, 0, 0};
  append_bytes(out, ob, 4);
  append_u32(out, (uint32_t)sc.blob.size());
  append_bytes(out, sc.blob.data(), sc.blob.size());
  for (int k = 0; k < SCTX_CHUNKS; k++) {
    append_bytes(out, states + k * 4, 16);
    append_u32(out, (uint32_t)nwords[k]);
  }
  for (int k = 0; k < SCTX_CHUNKS; k++)
    append_bytes(out, words + (sb[k + 1] - nwords[k]), (size_t)nwords[k] * 2);
  return true;
}

// ---- coverage-redundancy candidate (ops/sldm.py semantics) ----

// sldm.coverage_probe: duplicate fraction among sampled u32 (16-base)
// windows of the packed stream.
inline double coverage_probe(const uint8_t* packed, long long plen) {
  const long long n = plen - 4;
  if (n < 4 * 4096) return 0.0;
  long long stride = n / 65536;
  if (stride < 4) stride = 4;
  std::vector<uint32_t> words;
  words.reserve((size_t)(n / stride + 1));
  for (long long off = 0; off < n; off += stride) {
    uint32_t v;
    memcpy(&v, packed + off, 4);
    words.push_back(v);
  }
  std::sort(words.begin(), words.end());
  size_t distinct = 0;
  for (size_t i = 0; i < words.size(); i++)
    if (i == 0 || words[i] != words[i - 1]) distinct++;
  return 1.0 - (double)distinct / (double)words.size();
}

// sldm.encode / encode_bases: one zstd-LDM frame over the unpacked
// codes, optionally matched against the container dictionary prefix
// (ZSTD_CCtx_refPrefix, one-shot — byte-identical to the Python
// codec.compress(data, prefix=...) path).
inline bool sldm_encode(const uint8_t* bases, long long n, ZstdWorker& w,
                        std::vector<uint8_t>& out,
                        const uint8_t* prefix = nullptr,
                        long long prefix_len = 0) {
  ZSTD_CCtx* c = w.ldm_ctx();
  if (!c) return false;
  if (prefix_len > 0 &&
      ZSTD_isError(ZSTD_CCtx_refPrefix(c, prefix, (size_t)prefix_len)))
    return false;
  const size_t bound = ZSTD_compressBound((size_t)n);
  out.resize(bound);
  const size_t cn =
      ZSTD_compress2(c, out.data(), bound, n ? bases : nullptr, (size_t)n);
  if (ZSTD_isError(cn)) return false;
  out.resize(cn);
  return true;
}

// ---- order-1/2 quality context model (ops/qualctx.py semantics) ----

// qualctx.normalize_tables: per-used-context rans.normalize_freqs over
// the 256-symbol alphabet.
inline void qctx_normalize(const long long* hist, int nctx, uint16_t* freq) {
  for (int c = 0; c < nctx; c++) {
    const long long* h = hist + (size_t)c * 256;
    uint16_t* f = freq + (size_t)c * 256;
    long long total = 0;
    for (int s = 0; s < 256; s++) total += h[s];
    if (total == 0) {
      memset(f, 0, 512);
      continue;
    }
    normalize_freqs256(h, f);
  }
}

inline double qctx_bits(const long long* hist, const uint16_t* freq,
                        int nctx) {
  double bits = 0.0;
  for (size_t i = 0; i < (size_t)nctx * 256; i++) {
    if (hist[i] > 0) {
      const double f = freq[i] >= 1 ? (double)freq[i] : 1.0;
      bits += (double)hist[i] * (12.0 - log2(f));
    }
  }
  return bits;
}

// qualctx.estimate_size for one model's own histogram+tables.
inline long long qctx_estimate(const long long* hist, const uint16_t* freq,
                               int nctx) {
  const double bits = qctx_bits(hist, freq, nctx);
  long long table_syms = 0;
  for (size_t i = 0; i < (size_t)nctx * 256; i++)
    if (hist[i] > 0) table_syms++;
  const long long table_bytes =
      (long long)((double)(nctx * 2 + table_syms * 3) * 0.6);
  const long long overhead =
      8 + 4 + table_bytes + QCTX_CHUNKS * (4 * 4 + 4);
  return (long long)(bits / 8.0) + overhead;
}

// qualctx.sample_estimate via the native sampling probe
// (fq_qctx_sample_bits). Returns -1 for "no verdict".
inline long long qctx_sample_estimate(const uint8_t* delta,
                                      const long long* lens, long long nrec,
                                      long long total) {
  const long long max_syms = 1LL << 17;
  if (total <= 2 * max_syms) return -1;
  long long nrec_s = 0, nb = 0;
  while (nrec_s < nrec && nb + lens[nrec_s] <= max_syms) {
    nb += lens[nrec_s];
    nrec_s++;
  }
  if (nrec_s < 1) {
    nrec_s = 1;
    nb = lens[0];
  }
  if (nb == 0) return -1;
  long long cells = 0;
  const double bits = fq_qctx_sample_bits(delta, lens, nrec_s, &cells);
  const long long table_bytes =
      (long long)((double)(QCTX_NCTX * 2 + cells * 3) * 0.6);
  return (long long)(bits / (double)nb * (double)total / 8.0 * 0.93) + 12 +
         table_bytes;
}

// qualctx.pick_model from the max-model histogram; fills the chosen
// model's tables into sc.freq. Returns the model, with its estimate in
// *est_out, or -1 on alloc failure.
inline int qctx_pick_model(const long long* hist2, Scratch& sc,
                           long long* est_out, const long long** hist_out) {
  // model-0 histogram = marginalization over the inner q2b axis
  if (!sc.cum.ensure((size_t)QCTX_NCTX * 256 * 8) ||
      !sc.freq.ensure((size_t)QCTX_NCTX2 * 256 * 2))
    return -1;
  long long* h0 = (long long*)sc.cum.data();
  memset(h0, 0, (size_t)QCTX_NCTX * 256 * 8);
  for (int c = 0; c < QCTX_NCTX2; c++) {
    const long long* src = hist2 + (size_t)c * 256;
    long long* dst = h0 + (size_t)(c / QCTX_Q2B) * 256;
    for (int s = 0; s < 256; s++) dst[s] += src[s];
  }
  uint16_t* freq = (uint16_t*)sc.freq.data();
  qctx_normalize(h0, QCTX_NCTX, freq);
  const long long est0 = qctx_estimate(h0, freq, QCTX_NCTX);
  qctx_normalize(hist2, QCTX_NCTX2, freq);
  const long long est1 = qctx_estimate(hist2, freq, QCTX_NCTX2);
  // strict <: model 0 wins ties (MODELS iteration order)
  if (est1 < est0) {
    *est_out = est1;
    *hist_out = hist2;
    return 1;  // sc.freq already holds model-1 tables
  }
  *est_out = est0;
  *hist_out = nullptr;  // caller re-normalizes model 0 into sc.freq
  return 0;
}

// qualctx.serialize_tables: sparse per-context blob (u16 nsyms, then
// (u8 sym, u16 freq) pairs).
inline void qctx_serialize(const uint16_t* freq, int nctx,
                           std::vector<uint8_t>& out) {
  out.clear();
  for (int c = 0; c < nctx; c++) {
    const uint16_t* f = freq + (size_t)c * 256;
    int nsyms = 0;
    for (int s = 0; s < 256; s++)
      if (f[s]) nsyms++;
    const uint16_t n16 = (uint16_t)nsyms;
    append_bytes(out, &n16, 2);
    for (int s = 0; s < 256; s++) {
      if (!f[s]) continue;
      const uint8_t s8 = (uint8_t)s;
      append_bytes(out, &s8, 1);
      append_bytes(out, &f[s], 2);
    }
  }
}

// qualctx.encode_prepared: pick the model, build tables, run the chunk
// coder (fq_qctx_encode), assemble the TAG_QCTX payload.
inline bool qctx_encode_stream(const uint8_t* raw, long long n,
                               const long long* lens, long long nrec,
                               const long long* hist2, ZstdWorker& w,
                               Scratch& sc, std::vector<uint8_t>& out) {
  long long est = 0;
  const long long* model_hist = nullptr;
  const int model = qctx_pick_model(hist2, sc, &est, &model_hist);
  if (model < 0) return false;
  const int nctx = model ? QCTX_NCTX2 : QCTX_NCTX;
  uint16_t* freq = (uint16_t*)sc.freq.data();
  if (model == 0) {
    // h0 still lives in sc.cum from the pick
    qctx_normalize((const long long*)sc.cum.data(), QCTX_NCTX, freq);
  }
  std::vector<uint8_t> ser;
  qctx_serialize(freq, nctx, ser);
  if (!zstd_plain(w, ser.data(), ser.size(), sc.blob)) return false;
  // cumulative tables (exclusive, u32) for the used entries
  std::vector<uint32_t> cum((size_t)nctx * 256);
  for (int c = 0; c < nctx; c++) {
    uint32_t acc = 0;
    for (int s = 0; s < 256; s++) {
      cum[(size_t)c * 256 + s] = acc;
      acc += freq[(size_t)c * 256 + s];
    }
  }
  if (!sc.words.ensure((size_t)(n > 0 ? n : 1) * 2)) return false;
  uint16_t* words = (uint16_t*)sc.words.data();
  uint32_t states[QCTX_CHUNKS * 4];
  long long nwords[QCTX_CHUNKS];
  if (fq_qctx_encode(raw, n, lens, nrec, freq, cum.data(), words, states,
                     nwords, model) != 0)
    return false;
  long long sb[QCTX_CHUNKS + 1], rb[QCTX_CHUNKS + 1];
  qctx_chunks(lens, nrec, rb, sb);
  long long total_words = 0;
  for (int k = 0; k < QCTX_CHUNKS; k++) total_words += nwords[k];
  out.clear();
  out.reserve((size_t)(12 + sc.blob.size() + QCTX_CHUNKS * 20 +
                       2 * total_words));
  append_u32(out, (uint32_t)n);
  const uint8_t mb[4] = {(uint8_t)QCTX_CHUNKS, (uint8_t)model, 0, 0};
  append_bytes(out, mb, 4);
  append_u32(out, (uint32_t)sc.blob.size());
  append_bytes(out, sc.blob.data(), sc.blob.size());
  for (int k = 0; k < QCTX_CHUNKS; k++) {
    append_bytes(out, states + k * 4, 16);
    append_u32(out, (uint32_t)nwords[k]);
  }
  for (int k = 0; k < QCTX_CHUNKS; k++)
    append_bytes(out, words + (sb[k + 1] - nwords[k]), (size_t)nwords[k] * 2);
  return true;
}

// Pooled per-worker scratch (same lifecycle reasoning as zw_acquire: MT
// worker threads live for one call, so thread_locals would re-fault every
// run).
inline std::mutex g_v3_mu;
inline std::vector<Scratch*> g_v3_pool;
inline Scratch* scratch_acquire() {
  {
    std::lock_guard<std::mutex> lk(g_v3_mu);
    if (!g_v3_pool.empty()) {
      Scratch* s = g_v3_pool.back();
      g_v3_pool.pop_back();
      return s;
    }
  }
  return new (std::nothrow) Scratch();
}
inline void scratch_release(Scratch* s) {
  if (!s) return;
  std::lock_guard<std::mutex> lk(g_v3_mu);
  g_v3_pool.push_back(s);
}

// native.py _encode_tagged_seq: the sequence-slot pick. Writes the tagged
// winner at `out` (cap bytes available); returns its size or a negative
// error (-4 zstd, -12 alloc).
inline long long encode_seq_stream(const uint8_t* s, long long n,
                                   const long long* lens, long long nrec,
                                   long long total_len, Memo* memo,
                                   ZstdWorker& w, Scratch& sc, uint8_t* out,
                                   long long cap,
                                   const uint8_t* dict = nullptr,
                                   long long dict_len = 0) {
  out[0] = TAG_ZSTD;
  const size_t zn =
      fq_zstd_adaptive(w, s, (size_t)n, out + 1, (size_t)(cap - 1));
  if (ZSTD_isError(zn)) return -4;
  if (n < kRansMin) return 1 + (long long)zn;
  long long hist[256];
  fq_hist256(s, n, hist);
  const long long r0 = rans_size_estimate(hist, n);
  long long bar = std::min((long long)zn, r0);
  // sctx candidate: sampled pre-gate (memoized) -> full estimate -> coder
  bool hopeless = false;
  if (memo != nullptr && !memo->sctx_should_probe()) {
    hopeless = true;
  } else {
    const long long proj =
        sctx_sample_estimate(s, n, lens, nrec, total_len, sc);
    hopeless = proj >= 0 && (double)proj >= (double)bar * kCtxMargin;
    if (memo != nullptr) memo->sctx_outcome(hopeless);
  }
  bool have_bases = false;
  long long est_s = -1;
  const int nctx6 = 1 << (2 * SCTX_MAX_ORDER);
  if (!hopeless) {
    if (!sc.bases.ensure((size_t)(total_len > 0 ? total_len : 1)) ||
        !sc.hist.ensure((size_t)nctx6 * 4 * 8))
      return -12;
    if (fq_sctx_prepare(s, n, lens, nrec, sc.bases.data(),
                        (long long*)sc.hist.data()) == 0) {
      have_bases = true;
      if (sctx_pick_order((const long long*)sc.hist.data(), sc, &est_s) < 0)
        return -12;
    }
  }
  const std::vector<uint8_t>* best = nullptr;
  uint8_t best_tag = 0;
  if (est_s >= 0 && (double)est_s < (double)bar * kCtxMargin) {
    if (!sctx_encode_stream(sc.bases.data(), total_len, lens, nrec,
                            (const long long*)sc.hist.data(), w, sc,
                            sc.cand))
      return -12;
    if ((long long)sc.cand.size() < bar) {
      best = &sc.cand;
      best_tag = TAG_SCTX;
      bar = (long long)sc.cand.size();
    }
  }
  // coverage-redundancy candidate: always measured when the container
  // dictionary is present (native.py run_cov = seq_dict is not None);
  // otherwise gated on the sampled 16-mer probe
  bool run_cov = dict_len > 0;
  if (!run_cov && (memo == nullptr || memo->cov_should_probe())) {
    run_cov = coverage_probe(s, n) >= 0.002;
    if (memo != nullptr) memo->cov_outcome(run_cov);
  }
  if (run_cov) {
    const uint8_t* bases = sc.bases.data();
    bool ok = have_bases;
    if (!ok) {
      if (!sc.bases.ensure((size_t)(total_len > 0 ? total_len : 1)))
        return -12;
      ok = fq_sldm_unpack(s, n, lens, nrec,
                          (uint8_t*)sc.bases.data()) == 0;
      bases = sc.bases.data();
    }
    if (ok) {
      if (!sldm_encode(bases, total_len, w, sc.cand2, dict, dict_len))
        return -4;
      if ((long long)sc.cand2.size() < bar) {
        best = &sc.cand2;
        best_tag = TAG_SLDM;
        bar = (long long)sc.cand2.size();
      }
    }
  }
  if (best != nullptr) {
    out[0] = best_tag;
    memcpy(out + 1, best->data(), best->size());
    return 1 + (long long)best->size();
  }
  if (r0 < (long long)zn) {
    if (!rans_encode_stream(s, n, hist, sc, sc.cand)) return -12;
    if (sc.cand.size() < zn) {
      out[0] = TAG_RANS;
      memcpy(out + 1, sc.cand.data(), sc.cand.size());
      return 1 + (long long)sc.cand.size();
    }
  }
  return 1 + (long long)zn;
}

// native.py _encode_tagged_qual: the quality-slot pick (default pipeline;
// --max-ratio stays on the Python path).
inline long long encode_qual_stream(const uint8_t* s, long long n,
                                    const long long* lens, long long nrec,
                                    ZstdWorker& w, Scratch& sc, uint8_t* out,
                                    long long cap) {
  out[0] = TAG_ZSTD;
  const size_t zn =
      fq_zstd_adaptive(w, s, (size_t)n, out + 1, (size_t)(cap - 1));
  if (ZSTD_isError(zn)) return -4;
  if (n < kRansMin) return 1 + (long long)zn;
  long long hist[256];
  fq_hist256(s, n, hist);
  const long long r0 = rans_size_estimate(hist, n);
  const long long bar = std::min((long long)zn, r0);
  bool try_qctx = r0 < (long long)zn;
  if (!try_qctx) {
    const long long proj = qctx_sample_estimate(s, lens, nrec, n);
    try_qctx = proj < 0 || (double)proj < (double)bar * kCtxMargin;
  }
  if (try_qctx) {
    if (!sc.bases.ensure((size_t)(n > 0 ? n : 1)) ||
        !sc.hist.ensure((size_t)QCTX_NCTX2 * 256 * 8))
      return -12;
    long long est1 = -1;
    const long long* hist2 = (const long long*)sc.hist.data();
    const long long* model_hist = nullptr;
    if (fq_qctx_prepare(s, n, lens, nrec, (uint8_t*)sc.bases.data(),
                        (long long*)sc.hist.data()) == 0) {
      if (qctx_pick_model(hist2, sc, &est1, &model_hist) < 0) return -12;
    }
    const double margin = r0 < (long long)zn ? 1.0 : kCtxMargin;
    if (est1 >= 0 && (double)est1 < (double)bar * margin) {
      if (!qctx_encode_stream(sc.bases.data(), n, lens, nrec, hist2, w, sc,
                              sc.cand))
        return -12;
      if ((long long)sc.cand.size() < bar) {
        out[0] = TAG_QCTX;
        memcpy(out + 1, sc.cand.data(), sc.cand.size());
        return 1 + (long long)sc.cand.size();
      }
    }
  }
  if (r0 < (long long)zn) {
    if (!rans_encode_stream(s, n, hist, sc, sc.cand)) return -12;
    if (sc.cand.size() < zn) {
      out[0] = TAG_RANS;
      memcpy(out + 1, sc.cand.data(), sc.cand.size());
      return 1 + (long long)sc.cand.size();
    }
  }
  return 1 + (long long)zn;
}

// native.py _encode_tagged_headers: token-delta vs plain, cost-gated.
inline long long encode_headers_stream(const uint8_t* s, long long n,
                                       long long nrec, long long cost_gate,
                                       ZstdWorker& w, Scratch& sc,
                                       uint8_t* out, long long cap) {
  out[0] = TAG_ZSTD;
  const size_t zn =
      fq_zstd_adaptive(w, s, (size_t)n, out + 1, (size_t)(cap - 1));
  if (ZSTD_isError(zn)) return -4;
  if (cost_gate > 0 && (long long)zn <= cost_gate && n > (256LL << 10))
    return 1 + (long long)zn;
  // grow-only arenas, no zero-fill (streams 0/1 are done with them)
  const long long tok_cap = 10 + 3 * n + nrec + 16;  // tokenize.encode_bound
  if (!sc.words.ensure((size_t)tok_cap)) return -12;
  uint8_t* tokbuf = sc.words.data();
  const long long tn = fq_tok_encode(s, n, nrec, tokbuf, tok_cap);
  if (tn < 0) return 1 + (long long)zn;
  const size_t bound = ZSTD_compressBound((size_t)tn);
  if (!sc.bases.ensure(bound)) return -12;
  const size_t ztn =
      fq_zstd_adaptive(w, tokbuf, (size_t)tn, sc.bases.data(), bound);
  if (ZSTD_isError(ztn)) return -4;
  if (ztn < zn) {
    out[0] = TAG_TOK;
    memcpy(out + 1, sc.bases.data(), ztn);
    return 1 + (long long)ztn;
  }
  return 1 + (long long)zn;
}

// One v3 block: streams are the wide-layout raw streams of the fused
// scan AFTER the quality offset patch. Writes the 40-byte v3 block
// header + tagged streams to out; returns total bytes or a negative
// error (-3 cap, -4 zstd, -12 alloc/internal).
inline long long encode_block(const uint8_t* const st[6],
                              const long long sizes[6], long long nrec,
                              long long total_len, Memo* memo, ZstdWorker& w,
                              Scratch& sc, uint8_t* out, long long out_cap,
                              const uint8_t* dict = nullptr,
                              long long dict_len = 0) {
  // CRC32 over the uncompressed streams in wire order (native.py
  // _crc_streams; an explicit integrity field replacing v1/v2's zstd
  // frame checksums, PERFORMANCE.md E033)
  uint32_t crc = 0;
  for (int i = 0; i < 6; i++) crc = fq_crc32(crc, st[i], sizes[i]);
  // record lengths as int64 for the context coders
  if (!sc.lens.ensure((size_t)(nrec > 0 ? nrec : 1) * 8)) return -12;
  long long* lens = (long long*)sc.lens.data();
  for (long long i = 0; i < nrec; i++) {
    uint32_t l;
    memcpy(&l, st[5] + 4 * i, 4);
    lens[i] = (long long)l;
  }
  long long pos = 40;
  long long comp[6];
  for (int i = 0; i < 6; i++) {
    const long long bound =
        (long long)ZSTD_compressBound((size_t)sizes[i]) + 1;
    if (pos + bound > out_cap) return -3;
    long long cn;
    switch (i) {
      case 0:
        cn = encode_seq_stream(st[0], sizes[0], lens, nrec, total_len, memo,
                               w, sc, out + pos, out_cap - pos, dict,
                               dict_len);
        break;
      case 1:
        cn = encode_qual_stream(st[1], sizes[1], lens, nrec, w, sc,
                                out + pos, out_cap - pos);
        break;
      case 2: {
        // tokenizing is only worth its CPU when the plain-zstd header
        // stream is a visible fraction of the block's output (E042)
        long long gate = (comp[0] + comp[1]) >> 7;
        if (gate < 4096) gate = 4096;
        cn = encode_headers_stream(st[2], sizes[2], nrec, gate, w, sc,
                                   out + pos, out_cap - pos);
        break;
      }
      default: {
        const size_t zn = fq_zstd_adaptive(w, st[i], (size_t)sizes[i],
                                           out + pos, (size_t)(out_cap - pos));
        cn = ZSTD_isError(zn) ? -4 : (long long)zn;
        break;
      }
    }
    if (cn < 0) return cn;
    comp[i] = cn;
    pos += cn;
  }
  // v3 block header (format/container.py BlockHeader.to_bytes)
  put_u32_le(out + 0, (uint32_t)nrec);
  for (int i = 0; i < 6; i++) put_u32_le(out + 4 + 4 * i, (uint32_t)comp[i]);
  put_u32_le(out + 28, (uint32_t)total_len);
  put_u32_le(out + 32, (uint32_t)total_len);
  put_u32_le(out + 36, crc);
  return pos;
}

}  // namespace fqv3

// ---------------------------------------------------------------------------
// Fused v1/v2 block decode: entropy-coded block payload -> FASTQ text in one
// GIL-released call (inverse of fq_encode_block_v2; reference analog:
// decompressJobToPooledBuffer + blockReader as one unit,
// internal/compress/compress.go:780-835,944-1078). The Python pipeline
// previously sliced and zstd-decoded six streams per block in ctypes glue
// before the native assembly call; this leaves it one exact-capacity
// computation and one call per block.
// ---------------------------------------------------------------------------

namespace {

struct ZstdDecodeWorker {
  ZSTD_DCtx* dctx = nullptr;
  std::vector<uint8_t> scratch;  // decompressed-stream arena (grow-only)
  ~ZstdDecodeWorker() {
    if (dctx) ZSTD_freeDCtx(dctx);
  }
  ZSTD_DCtx* ctx() {
    if (!dctx) dctx = ZSTD_createDCtx();
    return dctx;
  }
};

thread_local ZstdDecodeWorker g_zstd_dworker;

}  // namespace

extern "C" {

// Decompressed (frame content) sizes of `count` concatenated zstd frames.
// Returns 0, or -1 when a frame does not declare its content size (foreign
// encoders; the caller falls back to the per-stream path).
int fq_zstd_content_sizes(const uint8_t* payload, const long long* comp_sizes,
                          int count, long long* out_sizes) {
  long long off = 0;
  for (int i = 0; i < count; i++) {
    if (comp_sizes[i] == 0) {
      out_sizes[i] = 0;
    } else {
      const unsigned long long s =
          ZSTD_getFrameContentSize(payload + off, (size_t)comp_sizes[i]);
      if (s == ZSTD_CONTENTSIZE_UNKNOWN || s == ZSTD_CONTENTSIZE_ERROR)
        return -1;
      out_sizes[i] = (long long)s;
    }
    off += comp_sizes[i];
  }
  return 0;
}

// comp_sizes/raw_sizes are 6-slot in wire order (v1 carries 5 frames on the
// wire; its plus slot must be zero). Returns FASTQ bytes written, or the
// fq_decode_block_full negative stream codes, -7 on a zstd decode/size
// error, -8 when out_cap is too small.
long long fq_decode_block_v2(const uint8_t* payload, long long payload_n,
                             const long long* comp_sizes,
                             const long long* raw_sizes, long long n,
                             uint8_t qoffset, int version, uint8_t* out,
                             long long out_cap) {
  // Declared frame content sizes are attacker-controlled: bound each one
  // before summing (overflow) or allocating (a std::bad_alloc escaping
  // through the C ABI would abort the process). 2^34 per stream is far
  // beyond any real block while keeping total_raw overflow-free.
  constexpr long long kMaxStreamRaw = 1LL << 34;
  long long total_raw = 0, total_comp = 0;
  for (int i = 0; i < 6; i++) {
    if (comp_sizes[i] < 0 || raw_sizes[i] < 0) return -7;
    if (raw_sizes[i] > kMaxStreamRaw || comp_sizes[i] > payload_n)
      return -7;
    total_raw += raw_sizes[i];
    total_comp += comp_sizes[i];
  }
  if (total_comp > payload_n) return -7;
  if (raw_sizes[5] != 4 * n) return -6;  // reject before any allocation

  ZstdDecodeWorker& w = g_zstd_dworker;
  if ((long long)w.scratch.size() < total_raw) {
    try {
      w.scratch.resize((size_t)total_raw);
    } catch (const std::bad_alloc&) {
      return -7;
    }
  }
  const uint8_t* ptr[6];
  long long roff = 0, coff = 0;
  for (int i = 0; i < 6; i++) {
    uint8_t* dst = w.scratch.data() + roff;
    ptr[i] = dst;
    if (comp_sizes[i] > 0) {
      ZSTD_DCtx* d = w.ctx();
      if (!d) return -7;
      const size_t rc = ZSTD_decompressDCtx(d, dst, (size_t)raw_sizes[i],
                                            payload + coff,
                                            (size_t)comp_sizes[i]);
      if (ZSTD_isError(rc) || (long long)rc != raw_sizes[i]) return -7;
    }
    roff += raw_sizes[i];
    coff += comp_sizes[i];
  }

  // Upfront bounds: the assembly unpacks sequence text before its quality
  // bound check could catch an oversized length stream, so validate the
  // total here and size the output exactly.
  long long sum_len = 0;
  for (long long i = 0; i < n; i++) {
    uint32_t l;
    memcpy(&l, ptr[5] + 4 * i, 4);
    sum_len += (long long)l;
  }
  if (sum_len > raw_sizes[1]) return -2;
  const long long out_need = raw_sizes[2] + raw_sizes[3] + 2 * sum_len +
                             (version == 1 ? 4 : 2) * n;
  if (out_need > out_cap) return -8;

  return fq_decode_block_full(ptr[0], raw_sizes[0], ptr[1], raw_sizes[1],
                              ptr[2], raw_sizes[2], ptr[3], raw_sizes[3],
                              ptr[4], raw_sizes[4], ptr[5], raw_sizes[5], n,
                              qoffset, /*wide=*/0,
                              /*has_plus=*/raw_sizes[3] > 0 ? 1 : 0, out);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Whole-file multithreaded pipeline: one GIL-released call per FILE.
//
// The Python pipeline runs one native call per block on a ThreadPoolExecutor;
// at 2000+ MB/s the interpreter-side producer iteration, future scheduling,
// and ordered writes still serialize ~15-20% of the wall time on small-core
// hosts. This section is the reference's whole pipeline
// (internal/compress/compress.go:240-443: produceCompressJobs + N workers +
// collectAndWriteResults) as native threads: a scanner thread walks the
// mmap'd input with fq_scan_records, worker threads run fq_encode_block_v2
// (or fq_decode_block_v2), and the calling thread collects results in block
// order into an fd (direct write()) or an owned buffer handed back to
// Python. Python's role shrinks to argument marshalling and error mapping.
// ---------------------------------------------------------------------------

#include <atomic>
#include <cerrno>
#include <cstdlib>
#include <condition_variable>
#include <deque>
#include <map>
#include <mutex>
#include <thread>

#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

namespace fqmt {

// Error codes surfaced to bindings.py (keep in sync with MT_ERRORS there).
enum {
  MT_ERR_FIELD_LEN = -1,    // header/plus field > 65535 bytes
  MT_ERR_ZSTD = -4,         // zstd compress failure
  MT_ERR_AMBIG = -6,        // ambiguous bases beyond the u16 npos cap
  MT_ERR_SCAN = -10,        // FASTQ parse error (err_info[0] = FQ_ERR_*)
  MT_ERR_WRITE = -11,       // write() failed (err_info[0] = errno)
  MT_ERR_FALLBACK = -20,    // decode: frame without content size etc.
  MT_ERR_TRUNC_HDR = -21,   // decode: truncated block header
  MT_ERR_TRUNC_PAYLOAD = -22,  // decode: truncated block payload
};

struct Sink {
  int fd = -1;
  std::vector<uint8_t>* buf = nullptr;
  int err_no = 0;
  bool write(const uint8_t* p, size_t n) {
    if (fd >= 0) {
      while (n) {
        const ssize_t w = ::write(fd, p, n);
        if (w < 0) {
          if (errno == EINTR) continue;
          err_no = errno;
          return false;
        }
        p += w;
        n -= (size_t)w;
      }
      return true;
    }
    try {
      buf->insert(buf->end(), p, p + n);
    } catch (const std::bad_alloc&) {
      err_no = ENOMEM;
      return false;
    }
    return true;
  }
};

// One block's outcome: encoded/decoded bytes, or an error triple.
// Uninitialized, grow-only, recyclable byte buffer. std::vector is wrong
// here twice over: resize() zero-fills (~20 MB/job memset at >2 GB/s
// dwarfs the encode itself) and fresh allocations pay this host's
// first-touch page-fault tax (E001) — so buffers malloc lazily, never
// initialize, and cycle worker -> collector -> pool (the reference's
// sync.Pool block buffers, compress.go:42-52).
struct Buf {
  uint8_t* p = nullptr;
  size_t cap = 0;
  size_t len = 0;
  Buf() = default;
  Buf(Buf&& o) noexcept : p(o.p), cap(o.cap), len(o.len) {
    o.p = nullptr;
    o.cap = o.len = 0;
  }
  Buf& operator=(Buf&& o) noexcept {
    if (this != &o) {
      free(p);
      p = o.p;
      cap = o.cap;
      len = o.len;
      o.p = nullptr;
      o.cap = o.len = 0;
    }
    return *this;
  }
  Buf(const Buf&) = delete;
  Buf& operator=(const Buf&) = delete;
  ~Buf() { free(p); }
  bool ensure(size_t n) {
    if (cap >= n) return true;
    uint8_t* q = (uint8_t*)realloc(p, n);
    if (!q) return false;
    p = q;
    cap = n;
    return true;
  }
};

struct BufPool {
  std::mutex mu;
  std::vector<Buf> free_list;
  void get(Buf& b) {
    std::lock_guard<std::mutex> lk(mu);
    if (!free_list.empty()) {
      b = std::move(free_list.back());
      free_list.pop_back();
    }
  }
  void put(Buf&& b) {
    if (!b.p) return;
    std::lock_guard<std::mutex> lk(mu);
    free_list.push_back(std::move(b));
  }
};

struct Res {
  Buf out;
  long long err = 0;
  long long e0 = 0, e1 = 0;
  long long start = 0;     // compress: slice offset (repair anchor)
  long long consumed = 0;  // compress: bytes of complete records in slice
  long long slice = 0;     // compress: the slice the job covered
  bool fallback = false;   // v3 compress: block-0 dict probe fired -> the
                           // caller reruns the Python path (FLAG_SEQ_DICT
                           // containers stay outside the native envelope)
};

// Ordered result collection: workers deposit by block index, the calling
// thread drains the contiguous prefix (the reference's pending-map
// collector, compress.go:365-403).
struct Collector {
  std::mutex mu;
  std::condition_variable cv;
  std::map<long long, Res> pending;
  std::atomic<long long> next{0};          // next index to write
  std::atomic<long long> total{-1};        // block count once known
  std::atomic<bool> failed{false};

  void deposit(long long idx, Res&& r) {
    {
      std::lock_guard<std::mutex> lk(mu);
      pending.emplace(idx, std::move(r));
    }
    cv.notify_all();
  }
  // Caps reorder-buffer growth: workers stall while more than `cap`
  // results sit ahead of the write cursor.
  void wait_credit(long long idx, long long cap) {
    std::unique_lock<std::mutex> lk(mu);
    cv.wait(lk, [&] {
      return failed.load() || idx < next.load() + cap;
    });
  }
};

// Bounded job queue (compress scanner -> workers).
template <typename T>
struct Queue {
  std::mutex mu;
  std::condition_variable cv_push, cv_pop;
  std::deque<T> q;
  size_t cap;
  bool closed = false;
  explicit Queue(size_t c) : cap(c) {}
  bool push(T&& v) {
    std::unique_lock<std::mutex> lk(mu);
    cv_push.wait(lk, [&] { return q.size() < cap || closed; });
    if (closed) return false;
    q.push_back(std::move(v));
    cv_pop.notify_one();
    return true;
  }
  bool pop(T& v) {
    std::unique_lock<std::mutex> lk(mu);
    cv_pop.wait(lk, [&] { return !q.empty() || closed; });
    if (q.empty()) return false;
    v = std::move(q.front());
    q.pop_front();
    cv_push.notify_one();
    return true;
  }
  void close() {
    std::lock_guard<std::mutex> lk(mu);
    closed = true;
    cv_push.notify_all();
    cv_pop.notify_all();
  }
};

struct CJob {
  long long idx = 0;
  const uint8_t* data = nullptr;
  long long start = 0;  // offset of data in the file text
  long long slice = 0;  // fused scan+encode over data[0:slice)
  bool final_slice = false;  // ends at EOF (partial tails allowed)
};

// FQZ_MT_STATS=1: per-stage busy-time accounting printed to stderr —
// the measurement tool behind the E043 overhead hunt.
inline bool mt_stats_on() {
  static const bool on = [] {
    const char* v = getenv("FQZ_MT_STATS");
    return v && v[0] == '1';
  }();
  return on;
}
inline double mt_now() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}
struct MtStats {
  std::atomic<long long> scan_us{0}, encode_us{0}, credit_us{0},
      pop_us{0}, write_us{0}, order_wait_us{0}, prelude_us{0};
  void dump(const char* what, double wall_s, long long bytes) {
    if (!mt_stats_on()) return;
    fprintf(stderr,
            "[mt:%s] wall=%.1fms bytes=%.1fMB prelude=%.1fms scan=%.1fms "
            "work=%.1fms "
            "(transform=%.1fms zstd=%.1fms) "
            "credit=%.1fms pop=%.1fms write=%.1fms order_wait=%.1fms\n",
            what, wall_s * 1e3, (double)bytes / 1e6,
            (double)prelude_us.load() / 1e3,
            (double)scan_us.load() / 1e3, (double)encode_us.load() / 1e3,
            (double)g_fused_transform_us.exchange(0) / 1e3,
            (double)g_fused_zstd_us.exchange(0) / 1e3,
            (double)credit_us.load() / 1e3, (double)pop_us.load() / 1e3,
            (double)write_us.load() / 1e3,
            (double)order_wait_us.load() / 1e3);
  }
};
#define FQ_MT_TIME(acc, expr)                                   \
  do {                                                          \
    if (mt_stats_on()) {                                        \
      const double t0_ = mt_now();                              \
      expr;                                                     \
      acc.fetch_add((long long)((mt_now() - t0_) * 1e6));       \
    } else {                                                    \
      expr;                                                     \
    }                                                           \
  } while (0)

inline void put_u32(uint8_t* p, uint32_t v) { memcpy(p, &v, 4); }

// Serialize a v1/v2 block header (fqformat/container.go:83-113 layouts)
// from the compacted comp_sizes fq_encode_block_v2 produced.
inline void write_block_header(uint8_t* dst, int version, long long nrec,
                               const long long* comp, long long total_len) {
  uint32_t* nop = nullptr;
  (void)nop;
  if (version == 1) {
    put_u32(dst + 0, (uint32_t)nrec);
    for (int i = 0; i < 5; i++) put_u32(dst + 4 + 4 * i, (uint32_t)comp[i]);
    put_u32(dst + 24, (uint32_t)total_len);
    put_u32(dst + 28, (uint32_t)total_len);
  } else {
    put_u32(dst + 0, (uint32_t)nrec);
    for (int i = 0; i < 6; i++) put_u32(dst + 4 + 4 * i, (uint32_t)comp[i]);
    put_u32(dst + 28, (uint32_t)total_len);
    put_u32(dst + 32, (uint32_t)total_len);
  }
}

// Resync framing probe (r3): the first structurally plausible record
// start at or after byte `t` — a line start whose line begins with '@',
// whose third line begins with '+', and whose 2nd/4th lines have equal
// byte lengths. Best-effort by design: the consumed-chain verification
// in fq_compress_mt makes framing exact regardless of what this locks
// onto (a wrong lock can only cost a repair pass, never correctness).
// Returns the offset, n for end-of-file, or -1 when no candidate is
// found within the probe budget.
inline long long fq_resync_record_start(const uint8_t* text, long long n,
                                        long long t) {
  long long pos = t;
  for (int tries = 0; tries < 4096 && pos < n; tries++) {
    const void* nl = memchr(text + pos, '\n', (size_t)(n - pos));
    if (!nl) return n;
    const long long c = (const uint8_t*)nl - text + 1;
    if (c >= n) return n;
    if (text[c] == '@') {
      long long ls[5];
      ls[0] = c;
      int complete = 1;
      for (int li = 1; li <= 4; li++) {
        const void* e =
            memchr(text + ls[li - 1], '\n', (size_t)(n - ls[li - 1]));
        if (!e) {
          complete = 0;
          break;
        }
        ls[li] = (const uint8_t*)e - text + 1;
      }
      if (!complete) return c;  // near EOF: the chain check verifies
      if (text[ls[2]] == '+' && ls[2] - ls[1] == ls[4] - ls[3]) return c;
    }
    pos = c;
  }
  return -1;
}

// Buffer-mode ownership handle (Python frees via fq_buf_free).
struct OwnedBuf {
  std::vector<uint8_t> v;
};

}  // namespace fqmt

extern "C" {

void fq_buf_free(void* h) { delete (fqmt::OwnedBuf*)h; }

// Compress a whole in-memory FASTQ buffer into a complete FQZ v1/v2
// container. out_fd >= 0: write() directly (streamed, ordered); else the
// container lands in an owned buffer (*out_handle/*out_ptr, free with
// fq_buf_free). Returns total container bytes, or a fqmt error code with
// details in err_info: MT_ERR_SCAN -> err_info[0] = FQ_ERR_*;
// MT_ERR_AMBIG -> err_info[0] = record row (block-relative),
// err_info[1] = its length; MT_ERR_WRITE -> err_info[0] = errno.
// `dict_codes`/`dict_len`: the FLAG_SEQ_DICT container dictionary
// (decoded unpacked codes) referenced as the TAG_SLDM prefix in every
// block; `dict_comp`/`dict_comp_len`: the section payload written
// verbatim after the file header (the caller compresses it, so the
// wire bytes match the Python path exactly). Dict mode implies v3 and
// forces exact record-count framing (Python framing parity — the dict
// is defined over the 100k-record block 0, not resync byte-capped
// blocks). E087.
static long long fq_compress_mt_impl(
    const uint8_t* text, long long n, long long block_records, int version,
    uint8_t extra_flags, int workers, const uint8_t* dict_codes,
    long long dict_len, const uint8_t* dict_comp, long long dict_comp_len,
    int force_exact, int out_fd, void** out_handle, uint8_t** out_ptr,
    long long* err_info) {
  using namespace fqmt;
  err_info[0] = err_info[1] = 0;
  if (block_records <= 0 || (version != 1 && version != 2 && version != 3))
    return -12;
  if (dict_len > 0 && version != 3) return -12;
  if (workers < 1) workers = 1;
  const long long hdr_size = version == 1 ? 32 : 36;  // v1/v2 finish only
  // v3 (E080): cross-block probe memoization shared by the worker pool
  // (PickMemo twin; racy counters only shift WHICH block re-probes).
  fqv3::Memo v3memo;

  OwnedBuf* owned = nullptr;
  Sink sink;
  auto fail = [&](long long code) {
    delete owned;
    return code;
  };
  // Allocations sized by caller-controlled values must not let
  // std::bad_alloc cross the C ABI (process abort; the E038 lesson).
  try {
    if (out_fd >= 0) {
      sink.fd = out_fd;
    } else {
      owned = new OwnedBuf();
      owned->v.reserve((size_t)(n / 4 + 4096));
      sink.buf = &owned->v;
    }
  } catch (const std::bad_alloc&) {
    return fail(-12);
  }
  // Pipeline state must exist before any helper thread launches.
  Collector col;
  BufPool rpool;
  std::unique_ptr<Queue<CJob>> jobs_p(
      new Queue<CJob>((size_t)workers * 2));
  std::atomic<bool> stop{false};
  MtStats stats;
  const double t_start = mt_now();

  // Deferred Phred detection (r3): no serial whole-window prelude walk.
  // The detection window is EXACTLY the reference's — the first
  // min(100000, file) records regardless of -b (the Go detection batch
  // is fixed at NewRecordBatch(DefaultBlockSize), compress.go:48-52,
  // 137-154). In sequential framing with the window inside block 0 the
  // block-0 worker folds the quality minimum during its fused transform
  // (fq_encode_block_fused_scan qmin_io) and resolves detection for
  // everyone; otherwise a detection THREAD runs the light framing+qmin
  // walk concurrently with worker phase-1 transforms. Entropy coding —
  // which needs the offset only for each record's first quality byte —
  // waits for resolution. The 10-byte file header is written lazily by
  // the collector before the first block, so a malformed first block
  // still produces no output at all (compress.go:137-168 ordering).
  // State is guarded by col.mu; resolution piggybacks on the
  // collector's cv.
  const long long kDetectRecords = 100000;
  const long long det_window_blocks =
      (kDetectRecords + block_records - 1) / block_records;
  long long det_contrib = 0;
  uint8_t det_min = 0xFF;
  bool det_any = false;
  bool det_resolved = false;
  uint8_t det_qoffset = 33;
  auto det_try_resolve_locked = [&] {
    if (det_resolved) return;
    const long long total = col.total.load();
    const long long need =
        total >= 0 ? std::min<long long>(1, total) : 1;
    if (det_contrib < need) return;
    det_qoffset =
        det_any ? (det_min < 59 ? 33 : (det_min >= 64 ? 64 : 33)) : 33;
    det_resolved = true;
  };

  // Phred-offset sniff (r4): one quality byte < 64 among the first few
  // complete records PROVES offset 33 — the sniffed records are a subset
  // of the detection window, so window_min <= sniffed byte < 64, and the
  // resolution rule maps every window minimum < 64 to 33 (quality.go
  // semantics: 64 only when the whole window sits at >= 64). Practically
  // every Phred+33 file resolves here in the first record, before any
  // thread spawns: the detection thread never launches (its ~10 ms
  // window re-walk was ~12% of total busy on a 2-vCPU host) and no
  // worker ever parks between transform and entropy coding. Files whose
  // leading records are all >= 64 (true Phred+64, or pristine-quality
  // Phred+33) fall through to the exact detection thread unchanged.
  // Main-thread-only state: no lock needed before the spawns below.
  {
    long long sniff_pos = 0;
    int line_in_rec = 0;
    long long sniff_recs = 0;
    while (sniff_recs < 64 && sniff_pos < n && !det_resolved) {
      const void* pnl =
          memchr(text + sniff_pos, '\n', (size_t)(n - sniff_pos));
      if (!pnl) break;  // partial record at EOF never participates
      const long long line_end = (long long)((const uint8_t*)pnl - text);
      if (line_in_rec == 3) {
        long long len = line_end - sniff_pos;
        if (len > 0 && text[line_end - 1] == '\r') len--;
        for (long long j2 = 0; j2 < len; j2++) {
          if (text[sniff_pos + j2] < 64) {
            det_qoffset = 33;
            det_resolved = true;
            break;
          }
        }
        sniff_recs++;
      }
      line_in_rec = (line_in_rec + 1) & 3;
      sniff_pos = line_end + 1;
    }
  }
  const bool det_pre_resolved = det_resolved;

  // Parallel resync framing (r3): block boundaries are GUESSED at
  // ~block_records-sized byte offsets and realigned to a structurally
  // plausible record start (fq_resync_record_start), so no thread ever
  // walks the whole file counting newlines — the last full serial pass
  // over the text is gone. Exactness does NOT rest on the resync
  // heuristic: the collector verifies the consumed chain (block k's
  // fused parse must consume its whole slice as complete records, which
  // proves — by induction from offset 0 — that block k+1's start is a
  // true record boundary of the global sequential parse). Any shortfall
  // or parse error triggers the repair path below, which re-frames the
  // remainder of the file with the exact newline-count scanner; real
  // input errors then reappear at their exact Go-parity position.
  bool resync = workers > 1 && n >= (4LL << 20);
  {
    const char* e = getenv("FQZ_MT_SEQ_FRAMING");
    if (e && e[0] == '1') resync = false;
  }
  // Python framing parity (E087/E088): dict containers and the auto
  // path's no-dict re-run both frame by record count
  if (dict_len > 0 || force_exact) resync = false;
  std::vector<long long> bnds;  // resync boundaries, incl. 0 and n
  if (resync) {
    // average record size from the leading sample (newline walk only)
    long long pos = 0, recs = 0, last_end = 0;
    int line = 0;
    const long long cap = n < (256LL << 10) ? n : (256LL << 10);
    while (pos < cap) {
      const void* nl = memchr(text + pos, '\n', (size_t)(n - pos));
      if (!nl) break;
      pos = (const uint8_t*)nl - text + 1;
      if (++line == 4) {
        line = 0;
        recs++;
        last_end = pos;
      }
    }
    if (recs < 8) {
      resync = false;
    } else {
      const double avg = (double)last_end / (double)recs;
      // Long-read files: record-count framing alone makes gigantic
      // blocks (146k ONT-length reads x ~7 KB = one 1 GB block),
      // serializing the whole MT pipeline onto one worker (E075: the
      // binary-longread corpus compressed at 527 MB/s with wall ==
      // single-worker busy). Cap block bytes at 16 MB: the short-read
      // default (37.5k x ~300 B ~= 11 MB) stays under the cap, so
      // framing is byte-identical for every existing fixture, and the
      // v1/v2 wire carries per-block record counts, so readers are
      // indifferent to the count actually framed.
      long long blk = (long long)(avg * (double)block_records);
      const long long kBlockByteCap = 16LL << 20;
      if (blk > kBlockByteCap) blk = kBlockByteCap;
      // small -b stays on the exact scanner: resync framing approximates
      // records-per-block, and a user-chosen small block size should be
      // honored exactly (the scan cost is minor next to many-small-block
      // encode overhead anyway)
      if (blk < (1LL << 20)) resync = false;
      if (resync) try {
        bnds.push_back(0);
        long long t = blk;
        while (t < n) {
          const long long b = fq_resync_record_start(text, n, t);
          if (b < 0 || b <= bnds.back()) {
            resync = false;
            break;
          }
          if (b >= n) break;
          bnds.push_back(b);
          t = b + blk;
        }
        if (resync) bnds.push_back(n);
      } catch (const std::bad_alloc&) {
        return fail(-12);
      }
    }
  }

  // Sequential newline-count framing (the exact scanner): initial mode
  // when resync is off, and the repair mode after a resync mismatch.
  // Framing by line count is exact: the parser consumes exactly 4 lines
  // per record with no resynchronization, so the records of block k are
  // the same under sliced and sequential parsing (E056).
  auto seq_scanner_body = [&](long long scan_start, long long idx0) {
    const double ts0 = mt_stats_on() ? mt_now() : 0.0;
    const long long lines_per_block = 4 * block_records;
    long long remaining = lines_per_block;
    long long start = scan_start;
    long long idx = idx0;
    long long pos = scan_start;
    bool ok = true;
    double push_s = 0.0;  // queue backpressure, excluded from scan_us
    auto emit = [&](long long end_off) -> bool {
      CJob j;
      j.idx = idx;
      j.start = start;
      j.data = text + start;
      j.slice = end_off - start;
      j.final_slice = end_off >= n;
      bool pushed;
      if (mt_stats_on()) {
        const double tp0 = mt_now();
        pushed = jobs_p->push(std::move(j));
        push_s += mt_now() - tp0;
      } else {
        pushed = jobs_p->push(std::move(j));
      }
      if (!pushed) return false;
      start = end_off;
      idx++;
      return true;
    };
    while (pos < n && ok && !stop.load()) {
      long long chunk_end = pos + (1 << 20);  // stop-check granularity
      if (chunk_end > n) chunk_end = n;
#ifdef FQ_AVX2
      const __m256i nlv = _mm256_set1_epi8('\n');
      while (pos + 64 <= chunk_end && ok) {
        // 64 B/iteration: two movemasks merged into one u64 popcount —
        // the loop is memory-bound under worker contention, so fewer
        // issue slots per byte is the only lever left.
        const uint32_t m0 = (uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi8(
            _mm256_loadu_si256((const __m256i*)(text + pos)), nlv));
        const uint32_t m1 = (uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi8(
            _mm256_loadu_si256((const __m256i*)(text + pos + 32)), nlv));
        uint64_t m = (uint64_t)m0 | ((uint64_t)m1 << 32);
        long long c = __builtin_popcountll(m);
        while (c >= remaining && ok) {  // rare: boundary in this chunk
          uint64_t mm = m;
          for (long long k = 1; k < remaining; k++) mm &= mm - 1;
          const int bit = __builtin_ctzll(mm);
          ok = emit(pos + bit + 1);
          m = (bit >= 63) ? 0ull : (m & ~((2ull << bit) - 1ull));
          c = __builtin_popcountll(m);
          remaining = lines_per_block;
        }
        remaining -= c;
        pos += 64;
      }
      while (pos + 32 <= chunk_end && ok) {
        uint32_t m = (uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi8(
            _mm256_loadu_si256((const __m256i*)(text + pos)), nlv));
        long long c = __builtin_popcount(m);
        while (c >= remaining && ok) {
          uint32_t mm = m;
          for (long long k = 1; k < remaining; k++) mm &= mm - 1;
          const int bit = __builtin_ctz(mm);
          ok = emit(pos + bit + 1);
          m = (bit >= 31) ? 0u : (m & ~((2u << bit) - 1u));
          c = __builtin_popcount(m);
          remaining = lines_per_block;
        }
        remaining -= c;
        pos += 32;
      }
      if (chunk_end < n) continue;  // next chunk picks up the <32 B seam
#endif
      while (pos < chunk_end && ok) {
        if (text[pos++] == '\n' && --remaining == 0) {
          ok = emit(pos);
          remaining = lines_per_block;
        }
      }
    }
    // Trailing slice: a short final block and/or a partial record whose
    // complete lines still need validation (scan-path semantics).
    if (ok && !stop.load() && start < n) emit(n);
    if (mt_stats_on())
      stats.scan_us.fetch_add(
          (long long)((mt_now() - ts0 - push_s) * 1e6));
    {
      // total must land under the collector's lock + notify: a bare store
      // after the last deposit was consumed would leave the collector
      // asleep with a stale "total unknown" predicate.
      std::lock_guard<std::mutex> lk(col.mu);
      col.total.store(idx);
      // A file with no blocks can only resolve detection once the block
      // count is known (need = min(1, total)).
      det_try_resolve_locked();
    }
    col.cv.notify_all();
    jobs_p->close();
  };

  // Resync framer: boundaries are precomputed, so this thread only
  // feeds the queue (backpressure) — no text walk at all.
  auto framer_body = [&] {
    {
      std::lock_guard<std::mutex> lk(col.mu);
      col.total.store((long long)bnds.size() - 1);
      det_try_resolve_locked();
    }
    col.cv.notify_all();
    for (size_t k = 0; k + 1 < bnds.size() && !stop.load(); k++) {
      CJob j;
      j.idx = (long long)k;
      j.start = bnds[k];
      j.data = text + bnds[k];
      j.slice = bnds[k + 1] - bnds[k];
      j.final_slice = bnds[k + 1] >= n;
      if (!jobs_p->push(std::move(j))) break;
    }
    jobs_p->close();
  };

  std::thread scanner;
  if (resync)
    scanner = std::thread(framer_body);
  else
    scanner = std::thread(seq_scanner_body, 0LL, 0LL);

  // Detection thread: owns resolution whenever the block-0 worker
  // cannot (resync framing makes block extents independent of the
  // window; small -b puts the window past block 0 — and a worker parked
  // on resolution while window blocks sat queued would deadlock a pure
  // contribution scheme there). Light framing + AVX2 qual-min walk over
  // the first min(100000, file) records; structural validation still
  // belongs to the workers. An unterminated final line is a dropped
  // partial record (parser.go readLine: io.EOF mid-record discards the
  // record), so it never participates.
  const bool contribution_mode =
      !resync && det_window_blocks == 1 && !det_pre_resolved;
  std::thread det_thread;
  if (!contribution_mode && !det_pre_resolved) det_thread = std::thread([&] {
    const double t0p = mt_stats_on() ? mt_now() : 0.0;
    long long remaining = kDetectRecords;
    long long line_start = 0;
    int line_in_rec = 0;
    uint8_t mn = 0xFF;
    bool any = false;
#ifdef FQ_AVX2
    __m256i vmin = _mm256_set1_epi8((char)0xFF);
    FqNlIter nl(text, n);
#endif
    while (remaining > 0 && line_start < n) {
#ifdef FQ_AVX2
      const long long line_end = nl.next();
      if (line_end < 0) break;
#else
      const void* pnl =
          memchr(text + line_start, '\n', (size_t)(n - line_start));
      if (!pnl) break;
      const long long line_end = (long long)((const uint8_t*)pnl - text);
#endif
      long long len = line_end - line_start;
      if (len > 0 && text[line_end - 1] == '\r') len--;
      if (line_in_rec == 3) {  // quality line
        if (len > 0) any = true;
        long long j = 0;
#ifdef FQ_AVX2
        for (; j + 32 <= len; j += 32)
          vmin = _mm256_min_epu8(
              vmin,
              _mm256_loadu_si256((const __m256i*)(text + line_start + j)));
#endif
        for (; j < len; j++)
          if (text[line_start + j] < mn) mn = text[line_start + j];
        remaining--;
      }
      line_in_rec = (line_in_rec + 1) & 3;
      line_start = line_end + 1;
    }
#ifdef FQ_AVX2
    {
      uint8_t tmp[32];
      _mm256_storeu_si256((__m256i*)tmp, vmin);
      for (int k = 0; k < 32; k++)
        if (tmp[k] < mn) mn = tmp[k];
    }
#endif
    {
      std::lock_guard<std::mutex> lk(col.mu);
      if (!det_resolved) {
        det_any |= any;
        if (mn < det_min) det_min = mn;
        det_qoffset = det_any
                          ? (det_min < 59 ? 33 : (det_min >= 64 ? 64 : 33))
                          : 33;
        det_resolved = true;
      }
    }
    col.cv.notify_all();
    if (mt_stats_on())
      stats.prelude_us.fetch_add((long long)((mt_now() - t0p) * 1e6));
  });

  auto encode_one = [&](const CJob& j, Res& r, fqv3::Scratch* v3sc) {
    r.out.len = 0;
    r.consumed = 0;
    r.slice = j.slice;
    r.start = j.start;
    // Phase 1: fused parse+validate+transform (no entropy coding yet).
    // v3 uses the wide (u32, uncapped) npos layout.
    FqFusedBlock fb;
    long long detail[2] = {0, 0};
    uint8_t qmin_io[2] = {0xFF, 0};
    const bool in_window = contribution_mode && j.idx == 0;
    const long long qmin_cap = in_window ? kDetectRecords : 0;
    const long long rc =
        version == 3
            ? fq_encode_block_fused_scan_wide(j.data, j.slice, &fb, detail,
                                              in_window ? qmin_io : nullptr,
                                              qmin_cap)
            : fq_encode_block_fused_scan(j.data, j.slice, &fb, detail,
                                         in_window ? qmin_io : nullptr,
                                         qmin_cap);
    r.consumed = fb.consumed;
    if (rc < 0) {
      switch (rc) {
        case -1: r.err = MT_ERR_FIELD_LEN; break;
        case -6:
          r.err = MT_ERR_AMBIG;
          r.e0 = detail[0];
          r.e1 = detail[1];
          break;
        case -10:
          r.err = MT_ERR_SCAN;
          r.e0 = detail[0];
          break;
        default: r.err = -12; break;
      }
    }
    // Contribute the window minimum (ALWAYS for block 0 in contribution
    // mode, errors included — a missing contribution would park every
    // other worker forever), then wait for resolution before entropy
    // coding.
    uint8_t qoffset = 33;
    {
      std::unique_lock<std::mutex> lk(col.mu);
      if (in_window) {
        if (rc == 0 && qmin_io[1]) {
          det_any = true;
          if (qmin_io[0] < det_min) det_min = qmin_io[0];
        }
        det_contrib++;
        det_try_resolve_locked();
        if (det_resolved) col.cv.notify_all();
      }
      if (r.err) return;  // the error deposit does not need the offset
      col.cv.wait(lk, [&] { return det_resolved || col.failed.load(); });
      if (col.failed.load()) return;  // drained by the caller
      qoffset = det_qoffset;
    }
    if (fb.nrec == 0) return;  // validated partial tail at EOF: no block
    if (version == 3) {
      if (v3sc == nullptr) {  // scratch allocation failed at spawn
        r.err = -12;
        return;
      }
      // Cross-block dictionary envelope gate: when block 0's coverage
      // probe fires, a MULTI-block file would build a FLAG_SEQ_DICT
      // container on the Python path (native.py compress_native) —
      // outside this envelope. Flag it but keep encoding: the collector
      // accepts the block when the scanner proves the file is
      // single-block, where no dict is ever built (E086 — coverage-
      // heavy single-block files otherwise paid an exec-to-Python
      // round trip plus the per-block Python encode).
      if (dict_len == 0 && j.idx == 0 &&
          fqv3::coverage_probe(fb.streams[0], fb.sizes[0]) >= 0.002)
        r.fallback = true;
      // offset patch (fused_finish semantics): record starts in the
      // quality stream are the prefix sums of the lengths stream
      if (qoffset != 0) {
        uint8_t* q = fb.qual_mut;
        const uint8_t* lens = fb.streams[5];
        long long off = 0;
        for (long long i = 0; i < fb.nrec; i++) {
          uint32_t l;
          memcpy(&l, lens + 4 * i, 4);
          if (l > 0) {
            q[off] = (uint8_t)(q[off] - qoffset);
            off += l;
          }
        }
      }
      long long cap = 40 + 64;
      for (int i = 0; i < 6; i++)
        cap += (long long)ZSTD_compressBound((size_t)fb.sizes[i]) + 1;
      if (!r.out.ensure((size_t)cap)) {
        r.err = -12;
        return;
      }
      const long long total = fqv3::encode_block(
          fb.streams, fb.sizes, fb.nrec, fb.total_len, &v3memo,
          current_zstd_worker(), *v3sc, r.out.p, cap, dict_codes,
          dict_len);
      if (total < 0) {
        r.out.len = 0;
        r.err = total == -4 ? MT_ERR_ZSTD : -12;
        return;
      }
      r.out.len = (size_t)total;
      return;
    }
    // Phase 2: offset patch + per-stream entropy coding, exact capacity.
    long long cap = hdr_size + 8192;
    for (int i = 0; i < 6; i++)
      cap += (long long)ZSTD_compressBound((size_t)fb.sizes[i]);
    if (!r.out.ensure((size_t)cap)) {
      r.err = -12;
      return;
    }
    long long comp[6];
    const long long payload = fq_encode_block_fused_finish(
        &fb, qoffset, version, hdr_size, r.out.p, cap, comp);
    if (payload < 0) {
      r.out.len = 0;
      r.err = payload == -3 ? -12 : MT_ERR_ZSTD;
      return;
    }
    write_block_header(r.out.p, version, fb.nrec, comp, fb.total_len);
    r.out.len = (size_t)(hdr_size + payload);
  };

  std::vector<std::thread> ws;
  auto spawn_workers = [&] {
    ws.reserve((size_t)workers);
    for (int t = 0; t < workers; t++) {
      ws.emplace_back([&] {
        // Borrow a pooled zstd worker: these threads live for one call,
        // so a thread_local would re-fault its contexts and arena every
        // run. v3 additionally borrows a pick-path scratch.
        ZstdWorker* zw = zw_acquire();
        g_zw_override = zw;
        fqv3::Scratch* v3sc =
            version == 3 ? fqv3::scratch_acquire() : nullptr;
        for (;;) {
          CJob j;
          bool got = false;
          FQ_MT_TIME(stats.pop_us, got = jobs_p->pop(j));
          if (!got) break;
          FQ_MT_TIME(stats.credit_us,
                     col.wait_credit(j.idx, (long long)workers * 2 + 2));
          Res r;
          r.start = j.start;
          r.slice = j.slice;
          if (!col.failed.load()) {
            rpool.get(r.out);
            FQ_MT_TIME(stats.encode_us, encode_one(j, r, v3sc));
            if (r.err || r.fallback) stop.store(true);
          }
          col.deposit(j.idx, std::move(r));
        }
        g_zw_override = nullptr;
        zw_release(zw);
        fqv3::scratch_release(v3sc);
      });
    }
  };
  spawn_workers();

  // The 10-byte file header is deferred until the first block result (or
  // end-of-stream for block-less files): detection resolves before any
  // phase-2 deposit, and a first-block error this way produces no output
  // at all — Go's all-or-nothing first ReadBatch.
  long long ret = 0;
  bool header_written = false;
  auto write_file_header = [&]() -> bool {
    uint8_t fhdr[10] = {'F', 'Q', 'Z', 0};
    fhdr[4] = (uint8_t)version;
    put_u32(fhdr + 5, (uint32_t)block_records);
    uint8_t flags = extra_flags;
    {
      std::lock_guard<std::mutex> lk(col.mu);
      if (det_resolved && det_qoffset == 64) flags |= 2;
    }
    fhdr[9] = flags;
    if (!sink.write(fhdr, 10)) return false;
    header_written = true;
    ret += 10;
    if (dict_comp_len > 0) {
      // v3 sequence-dictionary section (container.py
      // write_seq_dict_section): u32le raw size, u32le comp size,
      // caller-compressed payload verbatim
      uint8_t shdr[8];
      put_u32(shdr, (uint32_t)dict_len);
      put_u32(shdr + 4, (uint32_t)dict_comp_len);
      if (!sink.write(shdr, 8)) return false;
      if (!sink.write(dict_comp, (size_t)dict_comp_len)) return false;
      ret += 8 + dict_comp_len;
    }
    return true;
  };

  // Repair: a resync boundary was wrong (consumed chain broke at block
  // `idx`, or a parse error that may be a framing artifact). Blocks
  // written so far are PROVEN correct (their slices fully consumed from
  // verified starts), and `idx`'s own complete-record prefix is valid
  // and already written by the caller when err-free. Drain the stale
  // speculative jobs, then re-frame the remainder of the file with the
  // exact scanner — real input errors reappear at their exact position.
  auto repair_from = [&](long long resume_off, long long resume_idx) {
    stop.store(true);
    {
      std::lock_guard<std::mutex> lk(col.mu);
      col.failed.store(true);  // drain parked/queued workers fast
    }
    col.cv.notify_all();
    jobs_p->close();
    scanner.join();
    for (auto& t : ws) t.join();
    ws.clear();
    {
      std::lock_guard<std::mutex> lk(col.mu);
      col.pending.clear();
      col.failed.store(false);
      col.next.store(resume_idx);
      col.total.store(-1);
    }
    stop.store(false);
    jobs_p.reset(new Queue<CJob>((size_t)workers * 2));
    scanner = std::thread(seq_scanner_body, resume_off, resume_idx);
    spawn_workers();
  };

  bool verify_chain = resync;
  long long next = 0;
  for (;;) {
    Res r;
    {
      const double tw0 = mt_stats_on() ? mt_now() : 0.0;
      std::unique_lock<std::mutex> lk(col.mu);
      col.cv.wait(lk, [&] {
        return col.pending.count(next) ||
               (col.total.load() >= 0 && next >= col.total.load());
      });
      if (mt_stats_on())
        stats.order_wait_us.fetch_add(
            (long long)((mt_now() - tw0) * 1e6));
      if (col.total.load() >= 0 && next >= col.total.load()) break;
      auto it = col.pending.find(next);
      r = std::move(it->second);
      col.pending.erase(it);
      col.next.store(next + 1);
    }
    col.cv.notify_all();
    if (verify_chain && (r.err || r.consumed < r.slice)) {
      const bool final_ok = !r.err && next + 1 == col.total.load();
      if (!final_ok) {
        // Write the verified complete-record prefix of this block, then
        // re-frame the rest exactly. An errored block contributes
        // nothing (the sequential rescan of its slice re-finds a real
        // error with exact semantics, or proves it was a framing
        // artifact).
        long long resume_off, resume_idx;
        // a fallback-flagged block-0 must not write its prefix: whether
        // the bytes land is decided only after the block count is known
        // (E086) — re-frame it from scratch instead
        if (!r.err && !r.fallback && r.consumed > 0 && r.out.len > 0) {
          bool wok = header_written || write_file_header();
          if (wok)
            FQ_MT_TIME(stats.write_us,
                       wok = sink.write(r.out.p, r.out.len));
          if (!wok) {
            ret = MT_ERR_WRITE;
            err_info[0] = sink.err_no;
            repair_from(n, next + 1);  // unblock + drain, then abort
            break;
          }
          ret += (long long)r.out.len;
          resume_off = r.start + r.consumed;
          resume_idx = next + 1;
        } else {
          resume_off =
              r.start + ((r.err || r.fallback) ? 0 : r.consumed);
          resume_idx = next;
        }
        rpool.put(std::move(r.out));
        verify_chain = false;  // one repair: exact framing from here on
        repair_from(resume_off, resume_idx);
        next = resume_idx;
        continue;
      }
    }
    if (r.fallback && !r.err) {
      // block-0 coverage probe fired: only a MULTI-block file builds a
      // FLAG_SEQ_DICT container on the Python path. Wait for the
      // scanner's block count (always set under the collector lock,
      // even on abort) and accept the already-encoded block when it is
      // the only one (E086).
      std::unique_lock<std::mutex> lk(col.mu);
      col.cv.wait(lk, [&] { return col.total.load() >= 0; });
      if (col.total.load() == 1) r.fallback = false;
    }
    if (r.err || r.fallback) {
      // fallback (v3 block-0 dict probe, multi-block): nothing was
      // written — the header is deferred until the first block result —
      // so the caller can rerun the Python dict path on a clean sink.
      ret = r.fallback ? MT_ERR_FALLBACK : r.err;
      err_info[0] = r.e0;
      err_info[1] = r.e1;
      {
        // failed must land under the collector's lock: a bare store can
        // slot between a worker's predicate check and its park, and the
        // notify is then missed forever (same invariant as total)
        std::lock_guard<std::mutex> lk(col.mu);
        col.failed.store(true);
      }
      stop.store(true);
      jobs_p->close();
      col.cv.notify_all();
      break;
    }
    bool wok = true;
    if (!header_written && r.out.len > 0) wok = write_file_header();
    if (wok && r.out.len > 0)
      FQ_MT_TIME(stats.write_us, wok = sink.write(r.out.p, r.out.len));
    if (!wok) {
      ret = MT_ERR_WRITE;
      err_info[0] = sink.err_no;
      {
        std::lock_guard<std::mutex> lk(col.mu);
        col.failed.store(true);
      }
      stop.store(true);
      jobs_p->close();
      col.cv.notify_all();
      break;
    }
    ret += (long long)r.out.len;
    rpool.put(std::move(r.out));
    next++;
  }
  // Empty input / partial-tail-only files: header-only output.
  if (ret >= 0 && !header_written && !write_file_header()) {
    ret = MT_ERR_WRITE;
    err_info[0] = sink.err_no;
  }

  if (det_thread.joinable()) det_thread.join();
  scanner.join();
  for (auto& t : ws) t.join();
  stats.dump("compress", mt_now() - t_start, n);
  if (ret < 0) return fail(ret);
  if (out_fd < 0) {
    *out_handle = owned;
    *out_ptr = owned->v.data();
  }
  return ret;
}

long long fq_compress_mt(const uint8_t* text, long long n,
                         long long block_records, int version,
                         uint8_t extra_flags, int workers, int out_fd,
                         void** out_handle, uint8_t** out_ptr,
                         long long* err_info) {
  return fq_compress_mt_impl(text, n, block_records, version, extra_flags,
                             workers, nullptr, 0, nullptr, 0, 0, out_fd,
                             out_handle, out_ptr, err_info);
}

// FLAG_SEQ_DICT whole-file v3 compress (E087): the caller (Python
// compress_native) makes the dict decision and compresses the section;
// this entry runs the parallel per-block encode with the prefix under
// exact Python-framing parity. extra_flags must include FLAG_SEQ_DICT.
long long fq_compress_mt_dict(const uint8_t* text, long long n,
                              long long block_records, uint8_t extra_flags,
                              int workers, const uint8_t* dict_codes,
                              long long dict_len, const uint8_t* dict_comp,
                              long long dict_comp_len, int out_fd,
                              void** out_handle, uint8_t** out_ptr,
                              long long* err_info) {
  if (dict_len <= 0 || dict_comp_len <= 0) return -12;
  return fq_compress_mt_impl(text, n, block_records, 3, extra_flags,
                             workers, dict_codes, dict_len, dict_comp,
                             dict_comp_len, 0, out_fd, out_handle, out_ptr,
                             err_info);
}

// E088: `--format native` without the interpreter — the dict DECISION
// in native code, mirroring native.py compress_native. Runs the plain
// whole-file v3 compress; on the coverage fallback, frames the Python
// block 0 (4*block_records lines), probes it, and either re-runs under
// exact framing (single Python block: no dict is ever built — the E086
// gate then accepts) or builds the dictionary exactly like the Python
// path (block 0's first DICT_BYTES unpacked codes, one zstd-LDM
// section frame) and runs dict mode. Returns MT_ERR_FALLBACK only when
// the block-0 scan fails, so the exec'd Python CLI surfaces the exact
// parse error.
long long fq_compress_mt_v3_auto(const uint8_t* text, long long n,
                                 long long block_records,
                                 uint8_t extra_flags, int workers,
                                 int out_fd, void** out_handle,
                                 uint8_t** out_ptr, long long* err_info) {
  const long long first = fq_compress_mt_impl(
      text, n, block_records, 3, extra_flags, workers, nullptr, 0,
      nullptr, 0, 0, out_fd, out_handle, out_ptr, err_info);
  if (first != fqmt::MT_ERR_FALLBACK) return first;
  // end of Python block 0: exact record-count framing
  long long lines = 4 * block_records;
  long long pos = 0;
  while (lines > 0 && pos < n) {
    const void* nl = memchr(text + pos, '\n', (size_t)(n - pos));
    if (nl == nullptr) {
      pos = n;
      break;
    }
    pos = (long long)((const uint8_t*)nl - text) + 1;
    lines--;
  }
  if (lines > 0 || pos >= n) {
    // single Python block: no dict on any path
    return fq_compress_mt_impl(text, n, block_records, 3, extra_flags,
                               workers, nullptr, 0, nullptr, 0, 1, out_fd,
                               out_handle, out_ptr, err_info);
  }
  FqFusedBlock fb;
  long long detail[2] = {0, 0};
  const long long rc =
      fq_encode_block_fused_scan_wide(text, pos, &fb, detail, nullptr, 0);
  if (rc < 0) return fqmt::MT_ERR_FALLBACK;
  if (fqv3::coverage_probe(fb.streams[0], fb.sizes[0]) < 0.002)
    return fq_compress_mt_impl(text, n, block_records, 3, extra_flags,
                               workers, nullptr, 0, nullptr, 0, 1, out_fd,
                               out_handle, out_ptr, err_info);
  // sldm.build_dict + compress_dict parity (ops/sldm.py:54-163)
  constexpr long long kDictBytes = 8LL << 20;  // sldm.DICT_BYTES
  std::vector<uint8_t> codes;
  std::vector<long long> lens64;
  std::vector<uint8_t> comp;
  try {
    lens64.resize((size_t)(fb.nrec > 0 ? fb.nrec : 1));
    for (long long i = 0; i < fb.nrec; i++) {
      uint32_t l;
      memcpy(&l, fb.streams[5] + 4 * i, 4);
      lens64[(size_t)i] = (long long)l;
    }
    codes.resize((size_t)(fb.total_len > 0 ? fb.total_len : 1));
  } catch (...) {
    return -12;
  }
  if (fq_sldm_unpack(fb.streams[0], fb.sizes[0], lens64.data(), fb.nrec,
                     codes.data()) != 0)
    return fqmt::MT_ERR_FALLBACK;
  const long long dict_len =
      fb.total_len < kDictBytes ? fb.total_len : kDictBytes;
  if (dict_len <= 0) return fqmt::MT_ERR_FALLBACK;
  if (!fqv3::sldm_encode(codes.data(), dict_len, current_zstd_worker(),
                         comp))
    return -4;
  return fq_compress_mt_impl(
      text, n, block_records, 3,
      (uint8_t)(extra_flags | (1 << 2)),  // container.py FLAG_SEQ_DICT
      workers, codes.data(), dict_len, comp.data(),
      (long long)comp.size(), 0, out_fd, out_handle, out_ptr, err_info);
}

// Decompress a whole in-memory FQZ v1/v2 container body (file header
// already consumed by the caller) into FASTQ text. Same sink contract as
// fq_compress_mt. Returns FASTQ bytes, MT_ERR_FALLBACK when any frame
// lacks a declared content size (caller reruns the per-block path), or an
// error code (stream errors -1..-6 from fq_decode_block_full, -7 zstd).
long long fq_decompress_mt(const uint8_t* data, long long n, int version,
                           uint8_t qoffset, int workers, int out_fd,
                           void** out_handle, uint8_t** out_ptr,
                           long long* err_info) {
  using namespace fqmt;
  err_info[0] = err_info[1] = 0;
  if (version != 1 && version != 2) return -12;
  if (workers < 1) workers = 1;
  const long long hdr_size = version == 1 ? 32 : 36;
  constexpr long long kMaxStreamRaw = 1LL << 34;

  struct DJob {
    const uint8_t* payload;
    long long payload_n;
    long long comp[6];
    long long raw[6];
    long long nrec;
    long long bound;
  };
  std::vector<DJob> djobs;
  long long total_bound = 0;
  {
    long long pos = 0;
    while (pos < n) {
      if (n - pos < hdr_size) return MT_ERR_TRUNC_HDR;
      uint32_t f[9];
      memcpy(f, data + pos, (size_t)hdr_size);
      DJob d{};
      d.nrec = f[0];
      if (version == 1) {
        const long long order[5] = {0, 1, 2, 4, 5};
        for (int i = 0; i < 5; i++) d.comp[order[i]] = f[1 + i];
      } else {
        for (int i = 0; i < 6; i++) d.comp[i] = f[1 + i];
      }
      long long payload_n = 0;
      for (int i = 0; i < 6; i++) payload_n += d.comp[i];
      pos += hdr_size;
      if (payload_n > n - pos) return MT_ERR_TRUNC_PAYLOAD;
      d.payload = data + pos;
      d.payload_n = payload_n;
      pos += payload_n;
      long long off = 0;
      for (int i = 0; i < 6; i++) {
        if (d.comp[i] == 0) {
          d.raw[i] = 0;
          continue;
        }
        const unsigned long long s = ZSTD_getFrameContentSize(
            d.payload + off, (size_t)d.comp[i]);
        if (s == ZSTD_CONTENTSIZE_UNKNOWN || s == ZSTD_CONTENTSIZE_ERROR ||
            (long long)s > kMaxStreamRaw)
          return MT_ERR_FALLBACK;
        d.raw[i] = (long long)s;
        off += d.comp[i];
      }
      d.bound = d.raw[2] + d.raw[3] + 2 * d.raw[1] +
                (version == 1 ? 4 : 2) * d.nrec;
      total_bound += d.bound;
      djobs.push_back(d);
    }
  }
  // Attacker-declared sizes can demand absurd output (headers/frames are
  // untrusted): anything far beyond a plausible FASTQ expansion falls
  // back to the per-block Python path, whose allocations fail with
  // catchable errors (E038's bad_alloc-across-the-ABI lesson).
  if (total_bound > 64 * n + (1LL << 30)) return MT_ERR_FALLBACK;

  OwnedBuf* owned = nullptr;
  Sink sink;
  if (out_fd >= 0) {
    sink.fd = out_fd;
  } else {
    owned = new OwnedBuf();
    try {
      owned->v.reserve((size_t)total_bound);
    } catch (const std::bad_alloc&) {
      delete owned;
      return MT_ERR_FALLBACK;
    }
    sink.buf = &owned->v;
  }

  // pwrite scatter (ROADMAP host item): d.bound is EXACT for well-formed
  // blocks — v2 output per record is hdr+plus+2*len+6 bytes, so a block's
  // text is raw[2]+raw[3]+2*raw[1]+2n (v1: raw[2]+2*raw[1]+4n) — so for a
  // regular-file sink every block's byte range is known up front and
  // workers write their own blocks in place, in parallel, with no
  // ordered-collector serialization. A decoded size that misses the
  // bound (streams individually valid but mutually inconsistent — only
  // foreign/hostile containers) truncates back to the base offset and
  // falls back to the per-block path, which accepts such containers.
  bool scatter = false;
  long long scatter_base = 0;
  if (out_fd >= 0) {
    struct stat st;
    const int fl = fcntl(out_fd, F_GETFL);
    if (fstat(out_fd, &st) == 0 && S_ISREG(st.st_mode) && fl >= 0 &&
        !(fl & O_APPEND)) {
      const off_t cur = lseek(out_fd, 0, SEEK_CUR);
      if (cur >= 0) {
        scatter = true;
        scatter_base = (long long)cur;
      }
    }
  }
  std::vector<long long> scatter_off;  // prefix sums of exact block sizes
  if (scatter) {
    scatter_off.resize(djobs.size() + 1);
    scatter_off[0] = 0;
    for (size_t i = 0; i < djobs.size(); i++)
      scatter_off[i + 1] = scatter_off[i] + djobs[i].bound;
  }

  Collector col;
  BufPool rpool;
  col.total.store((long long)djobs.size());
  std::atomic<long long> next_job{0};
  MtStats stats;
  const double t_start = mt_now();

  const int nw = (int)std::min<long long>(workers, (long long)djobs.size());
  std::vector<std::thread> ws;
  for (int t = 0; t < nw; t++) {
    ws.emplace_back([&] {
      for (;;) {
        const long long i = next_job.fetch_add(1);
        // Never skip a fetched index on `stop`: the collector still needs
        // every deposit below the errored block to reach it in order.
        if (i >= (long long)djobs.size()) return;
        FQ_MT_TIME(stats.credit_us,
                   col.wait_credit(i, (long long)workers * 2 + 2));
        if (col.failed.load()) return;
        const DJob& d = djobs[(size_t)i];
        Res r;
        rpool.get(r.out);
        if (!r.out.ensure((size_t)std::max<long long>(d.bound, 1))) {
          r.err = -12;
        } else {
          long long w = 0;
          FQ_MT_TIME(stats.encode_us,
                     w = fq_decode_block_v2(d.payload, d.payload_n, d.comp,
                                            d.raw, d.nrec, qoffset, version,
                                            r.out.p, d.bound));
          if (w < 0) {
            r.out.len = 0;
            r.err = w;
          } else if (scatter) {
            if (w != d.bound) {
              r.err = MT_ERR_FALLBACK;  // inconsistent streams: rewrite
            } else {
              const uint8_t* p = r.out.p;
              long long nleft = w;
              long long off = scatter_base + scatter_off[(size_t)i];
              bool wok = true;
              const double tw0 = mt_stats_on() ? mt_now() : 0.0;
              while (nleft) {
                const ssize_t ww =
                    pwrite(out_fd, p, (size_t)nleft, (off_t)off);
                if (ww < 0) {
                  if (errno == EINTR) continue;
                  r.err = MT_ERR_WRITE;
                  r.e0 = errno;
                  wok = false;
                  break;
                }
                p += ww;
                off += ww;
                nleft -= (long long)ww;
              }
              if (mt_stats_on())
                stats.write_us.fetch_add(
                    (long long)((mt_now() - tw0) * 1e6));
              if (wok) r.e1 = w;  // written byte count for the collector
            }
            r.out.len = 0;  // nothing for the collector to write
          } else {
            r.out.len = (size_t)w;
          }
        }
        col.deposit(i, std::move(r));
      }
    });
  }

  long long ret = 0;
  long long next = 0;
  const long long total = (long long)djobs.size();
  while (next < total) {
    Res r;
    {
      std::unique_lock<std::mutex> lk(col.mu);
      col.cv.wait(lk, [&] { return col.pending.count(next) > 0; });
      auto it = col.pending.find(next);
      r = std::move(it->second);
      col.pending.erase(it);
      col.next.store(next + 1);
    }
    col.cv.notify_all();
    if (r.err) {
      ret = r.err;
      if (r.err == MT_ERR_WRITE) err_info[0] = r.e0;
      {
        std::lock_guard<std::mutex> lk(col.mu);
        col.failed.store(true);
      }
      col.cv.notify_all();
      break;
    }
    if (scatter) {
      ret += r.e1;
      rpool.put(std::move(r.out));
      next++;
      continue;
    }
    bool wok = true;
    FQ_MT_TIME(stats.write_us, wok = sink.write(r.out.p, r.out.len));
    if (!wok) {
      ret = MT_ERR_WRITE;
      err_info[0] = sink.err_no;
      {
        std::lock_guard<std::mutex> lk(col.mu);
        col.failed.store(true);
      }
      col.cv.notify_all();
      break;
    }
    ret += (long long)r.out.len;
    rpool.put(std::move(r.out));
    next++;
  }

  for (auto& t : ws) t.join();
  if (scatter) {
    if (ret >= 0) {
      // Leave the fd exactly as the ordered-write path would: length
      // covered through the last block, offset at the end of the text.
      (void)!ftruncate(out_fd, (off_t)(scatter_base + ret));
      (void)lseek(out_fd, (off_t)(scatter_base + ret), SEEK_SET);
    } else {
      // Error/fallback cleanup: out-of-order pwrites beyond the failed
      // block must not survive. `next` is the first block that did not
      // complete in order, so the surviving prefix mirrors the ordered
      // path's partial output (fallback truncates to base: the per-block
      // rerun rewrites everything from the original offset).
      const long long keep =
          ret == MT_ERR_FALLBACK ? 0 : scatter_off[(size_t)next];
      (void)!ftruncate(out_fd, (off_t)(scatter_base + keep));
      (void)lseek(out_fd, (off_t)(scatter_base + keep), SEEK_SET);
    }
  }
  stats.dump("decompress", mt_now() - t_start, ret > 0 ? ret : 0);
  if (ret < 0) {
    delete owned;
    return ret;
  }
  if (out_fd < 0) {
    *out_handle = owned;
    *out_ptr = owned->v.data();
  }
  return ret;
}

// ---------------------------------------------------------------------------
// Whole-file v3 (native format) MT decode (E078). The v3 container's
// per-stream codecs all have C implementations (zstd frames, the
// interleaved-lane rANS wire of ops/rans.py encode_stream, and the
// fq_tok_* header tokenizer); this orchestrates them like
// fq_decompress_mt does for v2: serial header walk -> parallel workers
// (entropy decode + CRC32 verify + fused assembly) -> ordered collector.
// Containers outside the supported envelope — FLAG_SEQ_DICT/LOSSLESS
// (checked by the caller from the file header), context-coded streams
// Foreign zstd frames without declared content sizes return
// MT_ERR_FALLBACK and the Python per-block path handles them
// (pipeline/native.py decode_block_payload defines the semantics;
// equivalence pinned by tests/test_native_format.py). All seven v3
// stream codecs decode natively (E078: zstd/rANS/tok/qctx; E081:
// sctx/sldm/wctx + the FLAG_SEQ_DICT prefix).
// Error codes extend the v2 set: -8 corrupt rANS stream, -9 corrupt
// tokenized header stream, -13 block CRC32 mismatch, -14..-18 corrupt
// qctx/sctx/sldm/dict/wctx data.
// ---------------------------------------------------------------------------

int fq_wctx_decode(const uint16_t* words, long long nwords,
                   const uint32_t* states, long long n_lanes,
                   const long long* lengths, long long nrec, int model,
                   int order, const uint8_t* present, int npres,
                   const uint16_t* freq, long long C, uint8_t* out,
                   long long total);

static long long fq_decompress_mt_v3_impl(
    const uint8_t* data, long long n, uint8_t qoffset,
    const uint8_t* dict_codes, long long dict_len, int workers, int out_fd,
    void** out_handle, uint8_t** out_ptr, long long* err_info) {
  using namespace fqmt;
  err_info[0] = err_info[1] = 0;
  if (workers < 1) workers = 1;
  constexpr long long kHdr = 40;  // v3: 9 u32 (v2 fields) + u32 crc32
  constexpr long long kMaxStreamRaw = 1LL << 34;
  constexpr uint8_t kTagRans = 0, kTagZstd = 1, kTagTok = 2, kTagQctx = 3,
                    kTagSctx = 4, kTagSldm = 5, kTagWctx = 6;

  struct VJob {
    const uint8_t* payload;
    long long comp[6];
    uint8_t tag[6];       // slots 0-2; 0xFF for untagged slots
    long long raw[6];     // decoded sizes (slot 2 TAG_TOK: zstd size,
                          // final size resolved in-worker)
    long long nrec;
    uint32_t crc;
    long long bound;      // 0 for TAG_TOK blocks: computed in-worker
  };
  std::vector<VJob> djobs;
  long long total_bound = 0;
  try {
    long long pos = 0;
    while (pos < n) {
      if (n - pos < kHdr) return MT_ERR_TRUNC_HDR;
      uint32_t f[10];
      memcpy(f, data + pos, (size_t)kHdr);
      VJob d{};
      d.nrec = f[0];
      for (int i = 0; i < 6; i++) d.comp[i] = f[1 + i];
      d.crc = f[9];
      long long payload_n = 0;
      for (int i = 0; i < 6; i++) payload_n += d.comp[i];
      pos += kHdr;
      if (payload_n > n - pos) return MT_ERR_TRUNC_PAYLOAD;
      d.payload = data + pos;
      pos += payload_n;
      long long off = 0;
      bool tok = false;
      for (int i = 0; i < 6; i++) {
        d.tag[i] = 0xFF;
        if (d.comp[i] == 0) {
          d.raw[i] = 0;
          continue;
        }
        const uint8_t* s = d.payload + off;
        long long sn = d.comp[i];
        if (i <= 2) {  // tagged slots (STREAM_CODECS seq/rans/tok)
          d.tag[i] = s[0];
          s++;
          sn--;
          const bool ok =
              i == 2 ? (d.tag[i] == kTagZstd || d.tag[i] == kTagTok)
              : i == 1 ? (d.tag[i] == kTagZstd || d.tag[i] == kTagRans ||
                          d.tag[i] == kTagQctx || d.tag[i] == kTagWctx)
                       : (d.tag[i] == kTagZstd || d.tag[i] == kTagRans ||
                          d.tag[i] == kTagSctx || d.tag[i] == kTagSldm ||
                          d.tag[i] == kTagWctx);
          if (!ok) return MT_ERR_FALLBACK;
        }
        if (d.tag[i] == kTagQctx) {
          // ops/qualctx.py wire: u32 total, u8 nchunks, u8 model, 2 pad
          if (sn < 12) return -14;
          uint32_t total32;
          memcpy(&total32, s, 4);
          if (s[4] != QCTX_CHUNKS || s[5] > 1) return -14;
          d.raw[i] = (long long)total32;  // decoded = raw qual bytes
        } else if (d.tag[i] == kTagSctx) {
          // ops/seqctx.py wire: u32 total_bases, u8 order, u8 nchunks
          // — raw here is only an arena bound; the exact packed size
          // needs the record lengths, known in-worker
          if (sn < 12) return -15;
          uint32_t total32;
          memcpy(&total32, s, 4);
          d.raw[i] = (long long)(total32 / 4) + d.nrec;
        } else if (d.tag[i] == kTagSldm) {
          // ops/sldm.py wire: one zstd-LDM frame over the unpacked base
          // codes; arena holds codes (content size) + the packed rows
          const unsigned long long z = ZSTD_getFrameContentSize(s, (size_t)sn);
          if (z == ZSTD_CONTENTSIZE_UNKNOWN || z == ZSTD_CONTENTSIZE_ERROR)
            return MT_ERR_FALLBACK;
          d.raw[i] = (long long)z + (long long)(z / 4) + d.nrec;
        } else if (d.tag[i] == kTagWctx) {
          // ops/wctx.py wire: u8 model | u8 order | u8 lanes_log2 | pad
          // | u32 total_syms ... — arena holds the flat symbols plus
          // the converted wire stream (packed rows / delta bytes)
          if (sn < 8) return -18;
          uint32_t total32;
          memcpy(&total32, s + 4, 4);
          d.raw[i] = i == 0 ? (long long)total32 + (long long)(total32 / 4) +
                                  d.nrec
                            : 2LL * total32;
        } else if (d.tag[i] == kTagRans) {
          // ops/rans.py wire: u32 raw_len, u8 lanes_log2, 3 pad
          if (sn < 8) return -8;
          uint32_t raw_len;
          memcpy(&raw_len, s, 4);
          d.raw[i] = (long long)raw_len;
        } else if (d.tag[i] == kTagTok) {
          const unsigned long long z = ZSTD_getFrameContentSize(s, (size_t)sn);
          if (z == ZSTD_CONTENTSIZE_UNKNOWN || z == ZSTD_CONTENTSIZE_ERROR)
            return MT_ERR_FALLBACK;
          d.raw[i] = (long long)z;  // tokenized size; final known in-worker
          tok = true;
        } else {  // zstd frame (tagged or plain)
          const unsigned long long z = ZSTD_getFrameContentSize(s, (size_t)sn);
          if (z == ZSTD_CONTENTSIZE_UNKNOWN || z == ZSTD_CONTENTSIZE_ERROR)
            return MT_ERR_FALLBACK;
          d.raw[i] = (long long)z;
        }
        if (d.raw[i] > kMaxStreamRaw) return MT_ERR_FALLBACK;
        off += d.comp[i];
      }
      // text bound: per record '@h\ns\n+p\nq\n' = h+p+s+q+6 bytes and the
      // header/plus raws carry 2-byte length prefixes each
      d.bound = tok ? 0
                    : d.raw[2] + d.raw[3] + 2 * d.raw[1] + 2 * d.nrec;
      total_bound += tok ? d.raw[2] * 8 + d.raw[3] + 2 * d.raw[1] +
                               2 * d.nrec
                         : d.bound;
      djobs.push_back(d);
    }
  } catch (...) {
    // allocation failure on hostile block counts must not cross the ABI
    return -12;
  }
  if (total_bound > 64 * n + (1LL << 30)) return MT_ERR_FALLBACK;

  OwnedBuf* owned = nullptr;
  Sink sink;
  if (out_fd >= 0) {
    sink.fd = out_fd;
  } else {
    owned = new OwnedBuf();
    try {
      owned->v.reserve((size_t)total_bound);
    } catch (...) {
      delete owned;
      return MT_ERR_FALLBACK;
    }
    sink.buf = &owned->v;
  }

  Collector col;
  BufPool rpool;
  col.total.store((long long)djobs.size());
  std::atomic<long long> next_job{0};
  MtStats stats;
  const double t_start = mt_now();

  auto decode_one = [&](const VJob& d, Res& r) {
    ZstdDecodeWorker& zw = g_zstd_dworker;
    // scratch layout: six decoded streams back to back. EVERYTHING is
    // reserved up front — a mid-loop reallocation would dangle the
    // parts[] pointers of already-decoded streams. The one size not
    // known before decoding (the detokenized header stream) gets a
    // generous factor and a checked bail-to-fallback if exceeded.
    long long need = 256;
    for (int i = 0; i < 6; i++) need += d.raw[i] + 16;
    long long tok_extra =
        d.tag[2] == kTagTok ? d.raw[2] * 8 + 4096 : 0;
    if (d.tag[1] == kTagQctx) {
      // table blob (<= 8 MB cap) + dense freq tables + aligned word
      // copy + i64 record lengths
      tok_extra += (1LL << 23) + (long long)QCTX_NCTX2 * 512 +
                   2 * d.comp[1] + 8 * d.nrec + 64;
    }
    if (d.tag[0] == kTagSctx) {
      // dense freq tables (order <= 6: 4096 ctx x 4 x u16) + aligned
      // word copy
      tok_extra += (1LL << 16) + 2 * d.comp[0] + 64;
    }
    for (int i = 0; i < 2; i++) {
      if (d.tag[i] == kTagWctx) {
        // aligned words + states copies, dense freq tables (<= 3072 ctx
        // x 256 syms x u16 = 1.5 MB), per-lane state array (lanes_log2
        // capped at 20 in-branch)
        tok_extra += 2 * d.comp[i] + (1LL << 21) + (4LL << 20) + 64;
      }
    }
    // the sctx/sldm/qctx/wctx coders all need i64 record lengths
    const bool need_lens = d.tag[1] == kTagQctx || d.tag[0] == kTagSctx ||
                           d.tag[0] == kTagSldm || d.tag[0] == kTagWctx ||
                           d.tag[1] == kTagWctx;
    if (need_lens) tok_extra += 8 * d.nrec + 64;
    try {
      zw.scratch.clear();
      zw.scratch.reserve((size_t)(need + tok_extra));
    } catch (...) {  // bad_alloc OR length_error from hostile sizes
      r.err = -12;
      return;
    }
    std::vector<uint8_t>& arena = zw.scratch;
    auto arena_take = [&](long long sz) -> uint8_t* {
      const size_t aligned = (arena.size() + 7) & ~(size_t)7;
      if (aligned + (size_t)sz > arena.capacity()) return nullptr;
      arena.resize(aligned + (size_t)sz);
      return arena.data() + aligned;
    };
    const uint8_t* parts[6];
    long long psz[6];
    long long offs[7];
    offs[0] = 0;
    for (int i = 0; i < 6; i++) offs[i + 1] = offs[i] + d.comp[i];
    // the qctx qual coder needs record lengths, so slot 5 (plain zstd)
    // decodes first; wire/CRC order is restored via parts[] indices
    long long* lens64 = nullptr;
    const int slot_order[6] = {5, 0, 1, 2, 3, 4};
    for (int oi = 0; oi < 6; oi++) {
      const int i = slot_order[oi];
      const uint8_t* s = d.payload + offs[i];
      long long sn = d.comp[i];
      if (i <= 2 && sn > 0) {
        s++;
        sn--;
      }
      if (sn == 0 || (d.raw[i] == 0 && d.tag[i] != kTagTok)) {
        // an empty stream may still be a zstd frame of b""
        parts[i] = arena.data();
        psz[i] = 0;
        continue;
      }
      if (d.tag[i] == kTagQctx) {
        // ops/qualctx.py wire: u32 total | u8 nchunks | u8 model | 2 pad
        // | u32 blob_size | zstd blob (sparse tables: per context u16
        // nsyms + nsyms x (u8 sym, u16 freq)) | 4 x (4 u32 states +
        // u32 nwords) | words. fq_qctx_decode emits the DELTA stream.
        if (lens64 == nullptr || sn < 12) {
          r.err = -14;
          return;
        }
        uint32_t total32, blob_size;
        memcpy(&total32, s, 4);
        const int model = s[5];
        memcpy(&blob_size, s + 8, 4);
        long long p2 = 12;
        if (sn < p2 + (long long)blob_size) {
          r.err = -14;
          return;
        }
        long long lens_sum = 0;
        for (long long k = 0; k < d.nrec; k++) lens_sum += lens64[k];
        if (lens_sum != (long long)total32) {
          r.err = -14;
          return;
        }
        const unsigned long long braw =
            ZSTD_getFrameContentSize(s + p2, (size_t)blob_size);
        if (braw == ZSTD_CONTENTSIZE_UNKNOWN ||
            braw == ZSTD_CONTENTSIZE_ERROR || braw > (1ULL << 23)) {
          r.err = -14;
          return;
        }
        uint8_t* blob = arena_take((long long)braw);
        if (!blob) {
          r.err = -12;
          return;
        }
        ZSTD_DCtx* bctx = zw.ctx();
        if (!bctx) {
          r.err = -12;
          return;
        }
        const size_t br = ZSTD_decompressDCtx(
            bctx, blob, (size_t)braw, s + p2, (size_t)blob_size);
        if (ZSTD_isError(br) || br != braw) {
          r.err = -14;
          return;
        }
        p2 += blob_size;
        const int nctx = model ? QCTX_NCTX2 : QCTX_NCTX;
        uint16_t* freq = (uint16_t*)arena_take((long long)nctx * 512);
        if (!freq) {
          r.err = -12;
          return;
        }
        memset(freq, 0, (size_t)nctx * 512);
        {
          long long bo = 0;
          const long long bn = (long long)braw;
          for (int c = 0; c < nctx; c++) {
            if (bo + 2 > bn) {
              r.err = -14;
              return;
            }
            uint16_t nsyms;
            memcpy(&nsyms, blob + bo, 2);
            bo += 2;
            if (nsyms > 256 || bo + 3LL * nsyms > bn) {
              r.err = -14;
              return;
            }
            uint32_t sum = 0;
            for (int t2 = 0; t2 < nsyms; t2++) {
              const uint8_t sym = blob[bo];
              uint16_t fv;
              memcpy(&fv, blob + bo + 1, 2);
              bo += 3;
              freq[(size_t)c * 256 + sym] = fv;
              sum += fv;
            }
            if (nsyms && sum != QCTX_SCALE) {
              r.err = -14;
              return;
            }
          }
          if (bo != bn) {
            r.err = -14;
            return;
          }
        }
        // per-chunk interleaved states + word counts, then the words
        const long long step = 4LL * 4 + 4;
        if (sn < p2 + QCTX_CHUNKS * step) {
          r.err = -14;
          return;
        }
        alignas(8) uint32_t states[QCTX_CHUNKS * 4];
        long long wcounts[QCTX_CHUNKS];
        long long wstarts[QCTX_CHUNKS];
        long long total_words = 0;
        for (int k = 0; k < QCTX_CHUNKS; k++) {
          memcpy(states + k * 4, s + p2, 16);
          uint32_t nw;
          memcpy(&nw, s + p2 + 16, 4);
          wstarts[k] = total_words;
          wcounts[k] = (long long)nw;
          total_words += (long long)nw;
          p2 += step;
        }
        if (sn < p2 + 2 * total_words) {
          r.err = -14;
          return;
        }
        uint16_t* words = (uint16_t*)arena_take(2 * total_words + 2);
        if (!words) {
          r.err = -12;
          return;
        }
        memcpy(words, s + p2, (size_t)(2 * total_words));
        uint8_t* dst = arena_take((long long)total32);
        if (!dst) {
          r.err = -12;
          return;
        }
        const int rc = fq_qctx_decode(words, wstarts, wcounts, states,
                                      (long long)total32, lens64, d.nrec,
                                      freq, dst, model);
        if (rc != 0) {
          r.err = -14;
          return;
        }
        parts[i] = dst;
        psz[i] = (long long)total32;
        continue;
      }
      if (d.tag[i] == kTagSctx) {
        // ops/seqctx.py wire: u32 total | u8 order | u8 nchunks | 2 pad
        // | u32 blob_size | zstd blob (dense <u2 freq tables, nctx x 4)
        // | nchunks x (4 u32 states + u32 nwords) | words (<u2).
        // fq_sctx_decode emits the packed-row seq stream (wire layout,
        // what the CRC covers).
        if (lens64 == nullptr || sn < 12) {
          r.err = -15;
          return;
        }
        uint32_t total32, blob_size;
        memcpy(&total32, s, 4);
        const int order = s[4];
        const int nchunks = s[5];
        memcpy(&blob_size, s + 8, 4);
        if ((order != 2 && order != 4 && order != 6) ||
            nchunks != SCTX_CHUNKS) {
          r.err = -15;
          return;
        }
        long long lens_sum = 0, packed_sz = 0;
        for (long long k = 0; k < d.nrec; k++) {
          lens_sum += lens64[k];
          packed_sz += (lens64[k] + 3) >> 2;
        }
        if (lens_sum != (long long)total32) {
          r.err = -15;
          return;
        }
        long long p2 = 12;
        if (sn < p2 + (long long)blob_size) {
          r.err = -15;
          return;
        }
        const int nctx = 1 << (2 * order);
        const long long blob_raw = (long long)nctx * 4 * 2;
        const unsigned long long braw =
            ZSTD_getFrameContentSize(s + p2, (size_t)blob_size);
        if (braw == ZSTD_CONTENTSIZE_UNKNOWN ||
            braw == ZSTD_CONTENTSIZE_ERROR ||
            (long long)braw != blob_raw) {
          r.err = -15;
          return;
        }
        uint8_t* blob = arena_take(blob_raw);
        if (!blob) {
          r.err = -12;
          return;
        }
        ZSTD_DCtx* bctx = zw.ctx();
        if (!bctx) {
          r.err = -12;
          return;
        }
        const size_t br = ZSTD_decompressDCtx(
            bctx, blob, (size_t)blob_raw, s + p2, (size_t)blob_size);
        if (ZSTD_isError(br) || (long long)br != blob_raw) {
          r.err = -15;
          return;
        }
        // deserialize_tables parity: each context row sums to 0 or
        // PROB_SCALE (a corrupt table must fail typed, not via CRC)
        {
          const uint16_t* fr = (const uint16_t*)blob;
          for (int c = 0; c < nctx; c++) {
            const uint32_t ssum = (uint32_t)fr[4 * c] + fr[4 * c + 1] +
                                  fr[4 * c + 2] + fr[4 * c + 3];
            if (ssum != 0 && ssum != SCTX_SCALE) {
              r.err = -15;
              return;
            }
          }
        }
        p2 += blob_size;
        const long long step = 4LL * 4 + 4;
        if (sn < p2 + SCTX_CHUNKS * step) {
          r.err = -15;
          return;
        }
        alignas(8) uint32_t states[SCTX_CHUNKS * 4];
        long long wcounts[SCTX_CHUNKS];
        long long wstarts[SCTX_CHUNKS];
        long long total_words = 0;
        for (int k = 0; k < SCTX_CHUNKS; k++) {
          memcpy(states + k * 4, s + p2, 16);
          uint32_t nw;
          memcpy(&nw, s + p2 + 16, 4);
          wstarts[k] = total_words;
          wcounts[k] = (long long)nw;
          total_words += (long long)nw;
          p2 += step;
        }
        if (sn < p2 + 2 * total_words) {
          r.err = -15;
          return;
        }
        uint16_t* words = (uint16_t*)arena_take(2 * total_words + 2);
        if (!words) {
          r.err = -12;
          return;
        }
        memcpy(words, s + p2, (size_t)(2 * total_words));
        uint8_t* dst = arena_take(packed_sz);
        if (!dst) {
          r.err = -12;
          return;
        }
        const int rc = fq_sctx_decode(
            words, wstarts, wcounts, states, (long long)total32, lens64,
            d.nrec, order, (const uint16_t*)blob, dst, packed_sz);
        if (rc != 0) {
          r.err = -15;
          return;
        }
        parts[i] = dst;
        psz[i] = packed_sz;
        continue;
      }
      if (d.tag[i] == kTagSldm) {
        // ops/sldm.py wire: one zstd-LDM frame over the unpacked base
        // codes, optionally matched against the container dictionary
        // (ZSTD_DCtx_refPrefix, one-shot); re-pack to the wire's
        // packed-row layout
        if (lens64 == nullptr) {
          r.err = -16;
          return;
        }
        long long lens_sum = 0, packed_sz = 0;
        for (long long k = 0; k < d.nrec; k++) {
          lens_sum += lens64[k];
          packed_sz += (lens64[k] + 3) >> 2;
        }
        const unsigned long long z =
            ZSTD_getFrameContentSize(s, (size_t)sn);
        if (z == ZSTD_CONTENTSIZE_UNKNOWN || z == ZSTD_CONTENTSIZE_ERROR ||
            (long long)z != lens_sum) {
          r.err = -16;
          return;
        }
        uint8_t* codes = arena_take(lens_sum);
        if (!codes) {
          r.err = -12;
          return;
        }
        ZSTD_DCtx* ctx = zw.ctx();
        if (!ctx) {
          r.err = -12;
          return;
        }
        if (dict_len > 0 &&
            ZSTD_isError(ZSTD_DCtx_refPrefix(ctx, dict_codes,
                                             (size_t)dict_len))) {
          r.err = -12;
          return;
        }
        const size_t zr = ZSTD_decompressDCtx(ctx, codes, (size_t)lens_sum,
                                              s, (size_t)sn);
        if (ZSTD_isError(zr) || (long long)zr != lens_sum) {
          r.err = -16;
          return;
        }
        uint8_t* dst = arena_take(packed_sz);
        if (!dst) {
          r.err = -12;
          return;
        }
        if (fq_sldm_pack(codes, lens_sum, lens64, d.nrec, dst) != 0) {
          r.err = -16;
          return;
        }
        parts[i] = dst;
        psz[i] = packed_sz;
        continue;
      }
      if (d.tag[i] == kTagWctx) {
        // ops/wctx.py wire: u8 model | u8 order | u8 lanes_log2 | pad |
        // u32 total | u16 npres | present[npres] | u32 blob_len |
        // zstd blob (dense (C, npres) u16 freq) | u32 nwords |
        // u32 states[N] | u16 words[nwords]. fq_wctx_decode emits flat
        // unpacked symbols; convert to the wire stream (packed rows for
        // the seq slot, per-record deltas for the qual slot) — what the
        // CRC covers.
        if (lens64 == nullptr || sn < 16) {
          r.err = -18;
          return;
        }
        const int model = s[0];
        const int worder = s[1];
        const int lanes_log2 = s[2];
        uint32_t total32;
        memcpy(&total32, s + 4, 4);
        uint16_t npres;
        memcpy(&npres, s + 8, 2);
        long long C;
        if (model == 0 && (worder == 2 || worder == 4 || worder == 6))
          C = 1LL << (2 * worder);
        else if (model == 1 && (worder == 0 || worder == 1))
          C = worder ? 3072 : 384;
        else {
          r.err = -18;
          return;
        }
        if (lanes_log2 > 20 || npres == 0 || npres > 256) {
          r.err = -18;
          return;
        }
        const long long N = 1LL << lanes_log2;
        long long lens_sum = 0, packed_sz = 0;
        for (long long k = 0; k < d.nrec; k++) {
          lens_sum += lens64[k];
          packed_sz += (lens64[k] + 3) >> 2;
        }
        if (lens_sum != (long long)total32) {
          r.err = -18;
          return;
        }
        long long p2 = 10;
        if (sn < p2 + npres + 4) {
          r.err = -18;
          return;
        }
        const uint8_t* present = s + p2;
        p2 += npres;
        uint32_t blob_size;
        memcpy(&blob_size, s + p2, 4);
        p2 += 4;
        if (sn < p2 + (long long)blob_size) {
          r.err = -18;
          return;
        }
        const long long blob_raw = C * npres * 2;
        const unsigned long long braw =
            ZSTD_getFrameContentSize(s + p2, (size_t)blob_size);
        if (braw == ZSTD_CONTENTSIZE_UNKNOWN ||
            braw == ZSTD_CONTENTSIZE_ERROR ||
            (long long)braw != blob_raw) {
          r.err = -18;
          return;
        }
        uint8_t* blob = arena_take(blob_raw);
        if (!blob) {
          r.err = -12;
          return;
        }
        ZSTD_DCtx* bctx = zw.ctx();
        if (!bctx) {
          r.err = -12;
          return;
        }
        const size_t br = ZSTD_decompressDCtx(
            bctx, blob, (size_t)blob_raw, s + p2, (size_t)blob_size);
        if (ZSTD_isError(br) || (long long)br != blob_raw) {
          r.err = -18;
          return;
        }
        p2 += blob_size;
        if (sn < p2 + 4 + 4 * N) {
          r.err = -18;
          return;
        }
        uint32_t nwords;
        memcpy(&nwords, s + p2, 4);
        p2 += 4;
        uint32_t* wstates = (uint32_t*)arena_take(4 * N);
        if (!wstates) {
          r.err = -12;
          return;
        }
        memcpy(wstates, s + p2, (size_t)(4 * N));
        p2 += 4 * N;
        if (sn < p2 + 2LL * nwords) {
          r.err = -18;
          return;
        }
        uint16_t* wwords = (uint16_t*)arena_take(2LL * nwords + 2);
        if (!wwords) {
          r.err = -12;
          return;
        }
        memcpy(wwords, s + p2, (size_t)(2LL * nwords));
        uint8_t* flat = arena_take(lens_sum);
        if (!flat) {
          r.err = -12;
          return;
        }
        const int rc = fq_wctx_decode(
            wwords, (long long)nwords, wstates, N, lens64, d.nrec, model,
            worder, present, (int)npres, (const uint16_t*)blob, C, flat,
            lens_sum);
        if (rc == -12) {
          r.err = -12;
          return;
        }
        if (rc != 0) {
          r.err = -18;
          return;
        }
        if (i == 0) {
          // seq slot: flat base codes -> packed wire rows
          uint8_t* dst = arena_take(packed_sz);
          if (!dst) {
            r.err = -12;
            return;
          }
          if (fq_sldm_pack(flat, lens_sum, lens64, d.nrec, dst) != 0) {
            r.err = -18;
            return;
          }
          parts[i] = dst;
          psz[i] = packed_sz;
        } else {
          // qual slot: integrated qualities -> per-record delta stream
          uint8_t* dst = arena_take(lens_sum);
          if (!dst) {
            r.err = -12;
            return;
          }
          long long j = 0;
          for (long long k = 0; k < d.nrec; k++) {
            const long long L = lens64[k];
            if (!L) continue;
            dst[j] = flat[j];
            for (long long p = 1; p < L; p++)
              dst[j + p] = (uint8_t)(flat[j + p] - flat[j + p - 1]);
            j += L;
          }
          parts[i] = dst;
          psz[i] = lens_sum;
        }
        continue;
      }
      if (d.tag[i] == kTagRans) {
        // ops/rans.py wire: hdr(8: u32 raw_len, u8 lanes_log2, 3 pad) +
        // freq(512) + states(4N) + total_words(4) + words(2W). The
        // payload sits at arbitrary mmap offsets, so tables are copied
        // into aligned scratch before the kernel touches them.
        if (sn < 8 + 512 + 4) {
          r.err = -8;
          return;
        }
        uint32_t raw_len;
        memcpy(&raw_len, s, 4);
        const int lanes_log2 = s[4];
        if (lanes_log2 > 20 || (long long)raw_len != d.raw[i]) {
          r.err = -8;
          return;
        }
        const long long N = 1LL << lanes_log2;
        long long p2 = 8;
        alignas(8) uint16_t freq[256];
        memcpy(freq, s + p2, 512);
        p2 += 512;
        if (sn < p2 + 4 * N + 4) {
          r.err = -8;
          return;
        }
        uint32_t* states = (uint32_t*)arena_take(4 * N);
        if (!states) {
          r.err = -12;
          return;
        }
        memcpy(states, s + p2, (size_t)(4 * N));
        p2 += 4 * N;
        uint32_t total_words;
        memcpy(&total_words, s + p2, 4);
        p2 += 4;
        if (sn < p2 + 2 * (long long)total_words) {
          r.err = -8;
          return;
        }
        uint16_t* words = (uint16_t*)arena_take(2LL * total_words + 2);
        if (!words) {
          r.err = -12;
          return;
        }
        memcpy(words, s + p2, (size_t)(2LL * total_words));
        uint8_t* dst = arena_take((long long)raw_len);
        if (!dst) {
          r.err = -12;
          return;
        }
        const int rc = fq_rans_decode(words, (long long)total_words,
                                      states, (int)N, freq,
                                      (long long)raw_len, dst);
        if (rc != 0) {
          r.err = -8;
          return;
        }
        parts[i] = dst;
        psz[i] = (long long)raw_len;
      } else {
        // zstd frame (plain slot, TAG_ZSTD, or the TAG_TOK payload)
        uint8_t* dst = arena_take(d.raw[i]);
        if (!dst) {
          r.err = -12;
          return;
        }
        ZSTD_DCtx* ctx = zw.ctx();
        if (!ctx) {
          r.err = -12;
          return;
        }
        const size_t zr = ZSTD_decompressDCtx(ctx, dst, (size_t)d.raw[i],
                                              s, (size_t)sn);
        if (ZSTD_isError(zr) || (long long)zr != d.raw[i]) {
          r.err = -7;
          return;
        }
        if (d.tag[i] == kTagTok) {
          const long long fin = fq_tok_decoded_size(dst, d.raw[i]);
          if (fin < 0 || fin > kMaxStreamRaw) {
            r.err = -9;
            return;
          }
          uint8_t* dst2 = arena_take(fin);
          if (!dst2) {
            // detokenized stream outgrew the reserve factor: hand the
            // container to the Python per-block path
            r.err = MT_ERR_FALLBACK;
            return;
          }
          const long long w = fq_tok_decode(dst, d.raw[i], d.nrec, dst2,
                                            fin);
          if (w != fin) {
            r.err = -9;
            return;
          }
          parts[i] = dst2;
          psz[i] = fin;
          continue;
        }
        parts[i] = dst;
        psz[i] = d.raw[i];
      }
      if (i == 5 && need_lens) {
        // the sctx/sldm/qctx decodes (later iterations) need i64 lengths
        if (psz[5] != 4 * d.nrec) {
          r.err = -6;  // truncated length data
          return;
        }
        lens64 = (long long*)arena_take(8 * d.nrec + 8);
        if (!lens64) {
          r.err = -12;
          return;
        }
        for (long long k = 0; k < d.nrec; k++) {
          uint32_t l32;
          memcpy(&l32, parts[5] + 4 * k, 4);
          lens64[k] = (long long)l32;
        }
      }
    }
    // CRC32 over the decoded streams in wire order (native.py
    // _crc_streams; chained fq_crc32 == zlib.crc32 of the concatenation)
    uint32_t crc = 0;
    for (int i = 0; i < 6; i++) crc = fq_crc32(crc, parts[i], psz[i]);
    if (crc != d.crc) {
      r.err = -13;
      return;
    }
    const long long bound =
        psz[2] + psz[3] + 2 * psz[1] + 2 * d.nrec + 64;
    if (!r.out.ensure((size_t)bound)) {
      r.err = -12;
      return;
    }
    const long long w = fq_decode_block_full(
        parts[0], psz[0], parts[1], psz[1], parts[2], psz[2], parts[3],
        psz[3], parts[4], psz[4], parts[5], psz[5], d.nrec, qoffset,
        /*wide=*/1, /*has_plus=*/1, r.out.p);
    if (w < 0) {
      r.out.len = 0;
      r.err = w;  // -1..-6 stream truncation codes
      return;
    }
    r.out.len = (size_t)w;
  };

  const int nw = (int)std::min<long long>(workers, (long long)djobs.size());
  std::vector<std::thread> ws;
  for (int t = 0; t < nw; t++) {
    ws.emplace_back([&] {
      for (;;) {
        const long long i = next_job.fetch_add(1);
        if (i >= (long long)djobs.size()) return;
        FQ_MT_TIME(stats.credit_us,
                   col.wait_credit(i, (long long)workers * 2 + 2));
        if (col.failed.load()) return;
        Res r;
        rpool.get(r.out);
        FQ_MT_TIME(stats.encode_us, decode_one(djobs[(size_t)i], r));
        col.deposit(i, std::move(r));
      }
    });
  }

  long long ret = 0;
  long long next = 0;
  const long long total = (long long)djobs.size();
  while (next < total) {
    Res r;
    {
      std::unique_lock<std::mutex> lk(col.mu);
      col.cv.wait(lk, [&] { return col.pending.count(next) > 0; });
      auto it = col.pending.find(next);
      r = std::move(it->second);
      col.pending.erase(it);
      col.next.store(next + 1);
    }
    col.cv.notify_all();
    if (r.err) {
      ret = r.err;
      if (r.err == MT_ERR_WRITE) err_info[0] = r.e0;
      {
        std::lock_guard<std::mutex> lk(col.mu);
        col.failed.store(true);
      }
      col.cv.notify_all();
      break;
    }
    bool wok = true;
    FQ_MT_TIME(stats.write_us, wok = sink.write(r.out.p, r.out.len));
    if (!wok) {
      ret = MT_ERR_WRITE;
      err_info[0] = sink.err_no;
      {
        std::lock_guard<std::mutex> lk(col.mu);
        col.failed.store(true);
      }
      col.cv.notify_all();
      break;
    }
    ret += (long long)r.out.len;
    rpool.put(std::move(r.out));
    next++;
  }

  for (auto& t : ws) t.join();
  stats.dump("decompress-v3", mt_now() - t_start, ret > 0 ? ret : 0);
  if (ret < 0) {
    delete owned;
    return ret;
  }
  if (out_fd < 0) {
    *out_handle = owned;
    *out_ptr = owned->v.data();
  }
  return ret;
}

long long fq_decompress_mt_v3(const uint8_t* data, long long n,
                              uint8_t qoffset, int workers, int out_fd,
                              void** out_handle, uint8_t** out_ptr,
                              long long* err_info) {
  return fq_decompress_mt_v3_impl(data, n, qoffset, nullptr, 0, workers,
                                  out_fd, out_handle, out_ptr, err_info);
}

// FLAG_SEQ_DICT-aware entry (E081). `has_dict_section`: `data` starts at
// the v3 sequence-dictionary section (container.py read_seq_dict_section:
// u32le raw size, u32le comp size, zstd frame of block 0's leading
// unpacked codes) — parse and decompress it here, then decode the blocks
// that follow. Otherwise `dict_codes` (already decoded by the caller,
// may be null) is referenced as the TAG_SLDM match prefix.
long long fq_decompress_mt_v3_ex(const uint8_t* data, long long n,
                                 uint8_t qoffset, int has_dict_section,
                                 const uint8_t* dict_codes,
                                 long long dict_len, int workers,
                                 int out_fd, void** out_handle,
                                 uint8_t** out_ptr, long long* err_info) {
  std::vector<uint8_t> dict_buf;
  if (has_dict_section) {
    constexpr long long kDictMax = 64LL << 20;  // SEQ_DICT_MAX_RAW
    err_info[0] = err_info[1] = 0;
    if (n < 8) return -17;
    uint32_t raw32, comp32;
    memcpy(&raw32, data, 4);
    memcpy(&comp32, data + 4, 4);
    if ((long long)raw32 > kDictMax || (long long)comp32 > kDictMax ||
        8 + (long long)comp32 > n)
      return -17;
    try {
      dict_buf.resize((size_t)raw32);
    } catch (...) {
      return -12;
    }
    ZSTD_DCtx* ctx = ZSTD_createDCtx();
    if (!ctx) return -12;
    const size_t zr = ZSTD_decompressDCtx(ctx, dict_buf.data(),
                                          (size_t)raw32, data + 8,
                                          (size_t)comp32);
    ZSTD_freeDCtx(ctx);
    if (ZSTD_isError(zr) || zr != (size_t)raw32) return -17;
    dict_codes = dict_buf.data();
    dict_len = (long long)raw32;
    data += 8 + comp32;
    n -= 8 + (long long)comp32;
  }
  return fq_decompress_mt_v3_impl(data, n, qoffset, dict_codes, dict_len,
                                  workers, out_fd, out_handle, out_ptr,
                                  err_info);
}

}  // extern "C"

// ---------------------------------------------------------------------------
// fqscramble: byte-exact Go math/rand/v2 PCG scramble (cmd/fqscramble/
// main.go:72,111-158). C++ twin of fastqpacker_tpu/utils/gopcg.py — the
// Python module defines the semantics; this is the multi-GB fast path.
// ---------------------------------------------------------------------------

namespace gopcg {

struct PCG {
  // Go math/rand/v2 pcg.go: 128-bit LCG state, DXSM output.
  unsigned __int128 state;
  PCG(uint64_t seed1, uint64_t seed2) {
    state = ((unsigned __int128)seed1 << 64) | seed2;
  }
  uint64_t next64() {
    static const unsigned __int128 mul =
        ((unsigned __int128)2549297995355413924ULL << 64) |
        4865540595714422341ULL;
    static const unsigned __int128 inc =
        ((unsigned __int128)6364136223846793005ULL << 64) |
        1442695040888963407ULL;
    state = state * mul + inc;
    uint64_t hi = (uint64_t)(state >> 64);
    const uint64_t lo = (uint64_t)state;
    hi ^= hi >> 32;
    hi *= 0xda942042e4dd58b5ULL;
    hi ^= hi >> 48;
    hi *= (lo | 1);
    return hi;
  }
  uint64_t uint64n(uint64_t n) {
    // rand.go uint64n: pow2 mask, else Lemire multiply-shift with the
    // -n % n threshold rejection loop (64-bit platform path).
    if ((n & (n - 1)) == 0) return next64() & (n - 1);
    unsigned __int128 prod = (unsigned __int128)next64() * n;
    uint64_t lo = (uint64_t)prod;
    if (lo < n) {
      const uint64_t thresh = (0 - n) % n;
      while (lo < thresh) {
        prod = (unsigned __int128)next64() * n;
        lo = (uint64_t)prod;
      }
    }
    return (uint64_t)(prod >> 64);
  }
  template <typename T>
  void shuffle(T* a, long long n) {
    for (long long i = n - 1; i > 0; i--) {
      const long long j = (long long)uint64n((uint64_t)(i + 1));
      T t = a[i];
      a[i] = a[j];
      a[j] = t;
    }
  }
};

// Go []rune(string): one rune per valid UTF-8 sequence, U+FFFD per
// invalid byte (utf8.DecodeRune advances 1 on error).
inline void line_to_runes(const uint8_t* s, long long n,
                          std::vector<uint32_t>& out) {
  out.clear();
  long long i = 0;
  while (i < n) {
    const uint8_t b0 = s[i];
    if (b0 < 0x80) {
      out.push_back(b0);
      i++;
      continue;
    }
    int need;
    uint8_t lo, hi;
    if (b0 >= 0xC2 && b0 <= 0xDF) {
      need = 1; lo = 0x80; hi = 0xBF;
    } else if (b0 >= 0xE0 && b0 <= 0xEF) {
      need = 2;
      lo = (b0 == 0xE0) ? 0xA0 : 0x80;
      hi = (b0 == 0xED) ? 0x9F : 0xBF;
    } else if (b0 >= 0xF0 && b0 <= 0xF4) {
      need = 3;
      lo = (b0 == 0xF0) ? 0x90 : 0x80;
      hi = (b0 == 0xF4) ? 0x8F : 0xBF;
    } else {
      out.push_back(0xFFFD);
      i++;
      continue;
    }
    if (i + need >= n || s[i + 1] < lo || s[i + 1] > hi) {
      out.push_back(0xFFFD);
      i++;
      continue;
    }
    bool ok = true;
    for (int k = 2; k <= need; k++)
      if (s[i + k] < 0x80 || s[i + k] > 0xBF) { ok = false; break; }
    if (!ok) {
      out.push_back(0xFFFD);
      i++;
      continue;
    }
    uint32_t v = b0 & (0x3F >> need);
    for (int k = 1; k <= need; k++) v = (v << 6) | (s[i + k] & 0x3F);
    out.push_back(v);
    i += 1 + need;
  }
}

inline void append_rune(std::vector<uint8_t>& out, uint32_t r) {
  if (r < 0x80) {
    out.push_back((uint8_t)r);
  } else if (r < 0x800) {
    out.push_back((uint8_t)(0xC0 | (r >> 6)));
    out.push_back((uint8_t)(0x80 | (r & 0x3F)));
  } else if (r < 0x10000) {
    out.push_back((uint8_t)(0xE0 | (r >> 12)));
    out.push_back((uint8_t)(0x80 | ((r >> 6) & 0x3F)));
    out.push_back((uint8_t)(0x80 | (r & 0x3F)));
  } else {
    out.push_back((uint8_t)(0xF0 | (r >> 18)));
    out.push_back((uint8_t)(0x80 | ((r >> 12) & 0x3F)));
    out.push_back((uint8_t)(0x80 | ((r >> 6) & 0x3F)));
    out.push_back((uint8_t)(0x80 | (r & 0x3F)));
  }
}

}  // namespace gopcg

extern "C" {

// Scramble a FASTQ text buffer exactly like the Go fqscramble tool
// (4-line state machine, per-read rune shuffle with the shared PCG
// stream, trailing-\r strip, \n line endings, incomplete final group
// dropped). ``state_io`` carries the 128-bit PCG state {hi, lo} across
// calls so multi-GB inputs can stream in chunks cut at 4-line-group
// boundaries (initialize to {seed, seed} = Go NewPCG(seed, seed)).
// Output lands in an owned buffer (*out_handle/*out_ptr, free with
// fq_buf_free). Returns output length, or -12 on allocation failure.
long long fq_scramble_pcg(const uint8_t* text, long long n,
                          unsigned long long* state_io, void** out_handle,
                          uint8_t** out_ptr) {
  gopcg::PCG rng((uint64_t)state_io[0], (uint64_t)state_io[1]);
  auto* owned = new (std::nothrow) fqmt::OwnedBuf();
  if (!owned) return -12;
  try {
    owned->v.reserve((size_t)n + 64);
    std::vector<uint8_t> seq;
    std::vector<uint32_t> runes;
    const uint8_t* lines[4];
    long long lens[4];
    int li = 0;
    long long i = 0;
    while (i < n) {
      const void* nl = memchr(text + i, '\n', (size_t)(n - i));
      long long end = nl ? (long long)((const uint8_t*)nl - text) : n;
      long long len = end - i;
      if (len > 0 && text[i + len - 1] == '\r')
        len--;  // strip trailing \r (bufio.ScanLines dropCR)
      lines[li] = text + i;
      lens[li] = len;
      li++;
      i = nl ? end + 1 : n;
      if (li == 4) {
        li = 0;
        auto& out = owned->v;
        out.insert(out.end(), lines[0], lines[0] + lens[0]);
        out.push_back('\n');
        // shuffle the sequence line (ASCII fast path: bytes == runes)
        bool ascii = true;
        for (long long k = 0; k < lens[1]; k++)
          if (lines[1][k] >= 0x80) { ascii = false; break; }
        if (ascii) {
          seq.assign(lines[1], lines[1] + lens[1]);
          rng.shuffle(seq.data(), (long long)seq.size());
          out.insert(out.end(), seq.begin(), seq.end());
        } else {
          gopcg::line_to_runes(lines[1], lens[1], runes);
          rng.shuffle(runes.data(), (long long)runes.size());
          for (uint32_t r : runes) gopcg::append_rune(out, r);
        }
        out.push_back('\n');
        out.insert(out.end(), lines[2], lines[2] + lens[2]);
        out.push_back('\n');
        out.insert(out.end(), lines[3], lines[3] + lens[3]);
        out.push_back('\n');
      }
    }
  } catch (const std::bad_alloc&) {
    delete owned;
    return -12;
  }
  state_io[0] = (unsigned long long)(uint64_t)(rng.state >> 64);
  state_io[1] = (unsigned long long)(uint64_t)rng.state;
  *out_handle = owned;
  *out_ptr = owned->v.data();
  return (long long)owned->v.size();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// TAG_WCTX decode: sequential lockstep twin of ops/wctx.py (the
// wide-interleaved context-modeled rANS coder the device mesh writes).
// Walks all N lanes per step in lane order — exactly the device scan's
// word-consumption order — with the per-model context recurrence
// (seq order-k shift / qual position-bucket x prev-bin) carried per lane.
// ---------------------------------------------------------------------------

namespace wctx {

constexpr int kProbBits = 12;
constexpr uint32_t kProbScale = 1u << kProbBits;
constexpr uint32_t kRansL = 1u << 16;

// qualctx.chunk_bounds twin: record-aligned, symbol-balanced lane
// bounds. rb[k] = searchsorted_left(csum, total*k/N) + 1, clamped.
inline void lane_bounds(const long long* lengths, long long nrec,
                        long long n_lanes, std::vector<long long>& rb,
                        std::vector<long long>& sb) {
  std::vector<long long> csum((size_t)nrec);
  long long acc = 0;
  for (long long i = 0; i < nrec; i++) {
    acc += lengths[i];
    csum[(size_t)i] = acc;
  }
  const long long total = nrec ? acc : 0;
  rb.assign((size_t)n_lanes + 1, 0);
  for (long long k = 1; k < n_lanes; k++) {
    long long b = 0;
    if (total) {
      const long long target = total * k / n_lanes;
      // searchsorted left
      long long lo = 0, hi = nrec;
      while (lo < hi) {
        const long long mid = (lo + hi) >> 1;
        if (csum[(size_t)mid] < target)
          lo = mid + 1;
        else
          hi = mid;
      }
      b = lo + 1;
    }
    if (b < rb[(size_t)k - 1]) b = rb[(size_t)k - 1];
    if (b > nrec) b = nrec;
    rb[(size_t)k] = b;
  }
  rb[(size_t)n_lanes] = nrec;
  sb.assign((size_t)n_lanes + 1, 0);
  for (long long k = 0; k <= n_lanes; k++)
    sb[(size_t)k] = rb[(size_t)k] == 0 ? 0 : csum[(size_t)rb[(size_t)k] - 1];
}

}  // namespace wctx

extern "C" {

// Decode a TAG_WCTX word stream to flat unpacked symbols.
//   words/nwords, states (N), lengths (nrec) — already wire-parsed;
//   model 0 = seq order-k (order in [2,6]); model 1 = qual, order 0 =
//   order-1 contexts (384), order 1 = order-2 contexts (x prev2, 3072);
//   present (npres ascending u8 values), freq (C, npres) u16 rows
//   summing to 0 or 4096; out must hold total = sum(lengths) bytes.
// Returns 0, or a negative typed error (-1 corrupt stream, -2 truncated
// words, -3 trailing words, -4 bad table, -12 alloc).
int fq_wctx_decode(const uint16_t* words, long long nwords,
                   const uint32_t* states, long long n_lanes,
                   const long long* lengths, long long nrec, int model,
                   int order, const uint8_t* present, int npres,
                   const uint16_t* freq, long long C, uint8_t* out,
                   long long total) {
  using namespace wctx;
  if (n_lanes <= 0 || npres <= 0 || C <= 0) return -4;
  std::vector<long long> rb, sb;
  std::vector<int32_t> pcum;
  std::vector<uint64_t> x;
  std::vector<int32_t> ctx, p, prev, prev2, nxt, ri;
  std::vector<long long> seg;
  try {
    lane_bounds(lengths, nrec, n_lanes, rb, sb);
    // exclusive cumulative per context + row validity
    pcum.resize((size_t)(C * npres));
    for (long long c = 0; c < C; c++) {
      int32_t accu = 0;
      const uint16_t* row = freq + c * npres;
      int32_t* prow = pcum.data() + c * npres;
      for (int j = 0; j < npres; j++) {
        prow[j] = accu;
        accu += row[j];
      }
      if (accu != 0 && accu != (int32_t)kProbScale) return -4;
    }
    x.resize((size_t)n_lanes);
    ctx.assign((size_t)n_lanes, 0);
    p.assign((size_t)n_lanes, -1);
    prev.assign((size_t)n_lanes, 0);
    prev2.assign((size_t)n_lanes, 0);
    nxt.assign((size_t)n_lanes, 0);
    ri.assign((size_t)n_lanes, 0);
    seg.resize((size_t)n_lanes);
  } catch (const std::bad_alloc&) {
    return -12;
  }
  long long S = 0;
  for (long long l = 0; l < n_lanes; l++) {
    x[(size_t)l] = states[l];
    seg[(size_t)l] = sb[(size_t)l + 1] - sb[(size_t)l];
    if (seg[(size_t)l] > S) S = seg[(size_t)l];
  }
  // Per-(ctx, slot) lookup table replacing the binary search:
  // u32 = sym_idx<<24 | (f-1)<<12 | c0. Lives in a thread-local
  // grow-only arena so repeated decodes reuse warm pages (first-touch
  // faults cost ~100 us/page on this host — a fresh 64 MB vector per
  // stream would dwarf the decode). Budget covers every model we ship
  // (seq k=6: 64 MB; qual model 1: 48 MB); the fill is gated on the
  // stream being big enough to amortize it.
  static thread_local std::vector<uint32_t> g_slot_tab_arena;
  uint32_t* slot_tab = nullptr;
  const long long tab_cells = C * kProbScale;
  if (npres > 4 && tab_cells * 4 <= (1LL << 27) &&
      (tab_cells <= (1LL << 22) || total >= C * 64)) {
    try {
      if ((long long)g_slot_tab_arena.size() < tab_cells)
        g_slot_tab_arena.resize((size_t)tab_cells);
    } catch (const std::bad_alloc&) {
      return -12;
    }
    slot_tab = g_slot_tab_arena.data();
    memset(slot_tab, 0, (size_t)tab_cells * 4);
    for (long long c = 0; c < C; c++) {
      const uint16_t* row = freq + c * npres;
      uint32_t* trow = slot_tab + (size_t)(c * kProbScale);
      uint32_t acc = 0;
      for (int j = 0; j < npres; j++) {
        const uint32_t f = row[j];
        if (!f) continue;
        const uint32_t e =
            ((uint32_t)j << 24) | ((f - 1) << 12) | acc;
        for (uint32_t sl = acc; sl < acc + f && sl < kProbScale; sl++)
          trow[sl] = e;
        acc += f;
      }
    }
  }
  const int32_t cmask =
      model == 0 ? ((1 << (2 * order)) - 1) : 0;
  long long wi = 0;
#ifdef FQ_AVX2
  // Lane-vectorized decode (r3): 8 independent lanes per step in one
  // AVX2 group — gathered slot-table entries, vector context carry,
  // vector renorm with an in-group rank for the (lane-ordered) word
  // pulls. Record starts and the strided output stores stay scalar
  // (starts touch ~1/read_len of cells; stores scatter to per-lane
  // bases). Requires the slot table and a multiple-of-8 lane count
  // (every shipped lane tier is a power of two >= 256).
  // Tiny alphabets (every seq model: npres <= 4) skip the slot table
  // entirely: the symbol is resolved from <= 5 boundary PLANES (plane j
  // holds pcum[ctx][j] for all contexts), gathered from L1/L2-resident
  // arrays — the k=6 slot table is 64 MB and its gathers were
  // DRAM-latency-bound.
  const bool planes_ok = npres <= 4;
  std::vector<int32_t> bplanes;
  if (planes_ok && (n_lanes % 8) == 0) {
    try {
      bplanes.resize((size_t)(5 * C));
    } catch (const std::bad_alloc&) {
      return -12;
    }
    for (long long c = 0; c < C; c++) {
      const int32_t* prow = pcum.data() + (size_t)c * npres;
      int32_t total_row = 0;
      for (int j = 0; j < npres; j++)
        total_row += freq[(size_t)c * npres + j];
      for (int j = 0; j < 5; j++)
        bplanes[(size_t)(j * C + c)] =
            j < npres ? prow[j] : total_row;
    }
  }
  if ((slot_tab || planes_ok) && (n_lanes % 8) == 0) {
    static thread_local std::vector<uint16_t> g_wpad_arena;
    try {
      if ((long long)g_wpad_arena.size() < nwords + 2)
        g_wpad_arena.resize((size_t)nwords + 2);
    } catch (const std::bad_alloc&) {
      return -12;
    }
    if (nwords) memcpy(g_wpad_arena.data(), words, (size_t)nwords * 2);
    g_wpad_arena[(size_t)nwords] = 0;
    g_wpad_arena[(size_t)nwords + 1] = 0;
    const uint16_t* wpad = g_wpad_arena.data();
    std::vector<int32_t> seg32((size_t)n_lanes), x32((size_t)n_lanes);
    std::vector<int32_t> pres32(256, 0);
    for (int j = 0; j < npres; j++) pres32[(size_t)j] = present[j];
    for (long long l = 0; l < n_lanes; l++) {
      seg32[(size_t)l] =
          (int32_t)(seg[(size_t)l] > 0x7FFFFFFF ? 0x7FFFFFFF
                                                : seg[(size_t)l]);
      x32[(size_t)l] = (int32_t)(uint32_t)x[(size_t)l];
    }
    const __m256i vProbMask = _mm256_set1_epi32((int)(kProbScale - 1));
    const __m256i vScale = _mm256_set1_epi32((int)kProbScale);
    const __m256i vFFF = _mm256_set1_epi32(0xFFF);
    const __m256i vOne = _mm256_set1_epi32(1);
    const __m256i vOnes = _mm256_set1_epi32(-1);
    const __m256i vBias = _mm256_set1_epi32((int)0x80000000);
    const __m256i vRansLb =
        _mm256_set1_epi32((int)(kRansL ^ 0x80000000u));
    const __m256i v46 = _mm256_set1_epi32(46);
    const __m256i v47 = _mm256_set1_epi32(47);
    const __m256i v7 = _mm256_set1_epi32(7);
    const __m256i v48 = _mm256_set1_epi32(48);
    const __m256i vCmask = _mm256_set1_epi32(cmask);
    const __m256i vW16 = _mm256_set1_epi32(0xFFFF);
    for (long long t = 0; t < S; t++) {
      const __m256i vt = _mm256_set1_epi32((int)t);
      for (long long l = 0; l < n_lanes; l += 8) {
        const __m256i vseg =
            _mm256_loadu_si256((const __m256i*)(seg32.data() + l));
        const __m256i live = _mm256_cmpgt_epi32(vseg, vt);
        if (_mm256_testz_si256(live, live)) continue;
        // record starts: scalar per affected lane (rare), vector flag
        __m256i vnxt =
            _mm256_loadu_si256((const __m256i*)(nxt.data() + l));
        __m256i isStart = _mm256_cmpeq_epi32(vnxt, vt);
        if (t == 0) isStart = vOnes;
        isStart = _mm256_and_si256(isStart, live);
        int startMask =
            _mm256_movemask_ps(_mm256_castsi256_ps(isStart));
        if (startMask) {
          for (int k = 0; k < 8; k++) {
            if (!((startMask >> k) & 1)) continue;
            const long long ll = l + k;
            const long long r0 = rb[(size_t)ll], r1 = rb[(size_t)ll + 1];
            long long r = r0 + ri[(size_t)ll];
            while (r < r1 && lengths[r] == 0) r++;
            if (r < r1) {
              nxt[(size_t)ll] = (int32_t)(t + lengths[r]);
              ri[(size_t)ll] = (int32_t)(r - r0 + 1);
            } else {
              nxt[(size_t)ll] = -1;
            }
          }
        }
        // context carry (vector, start-blended)
        __m256i vctx =
            _mm256_loadu_si256((const __m256i*)(ctx.data() + l));
        __m256i vprev =
            _mm256_loadu_si256((const __m256i*)(prev.data() + l));
        if (model == 0) {
          __m256i c1 = _mm256_and_si256(
              _mm256_or_si256(_mm256_slli_epi32(vctx, 2), vprev),
              vCmask);
          vctx = _mm256_andnot_si256(isStart, c1);
        } else {
          __m256i vp =
              _mm256_loadu_si256((const __m256i*)(p.data() + l));
          __m256i p1 = _mm256_add_epi32(vp, vOne);
          p1 = _mm256_andnot_si256(isStart, p1);
          _mm256_storeu_si256((__m256i*)(p.data() + l), p1);
          __m256i qbin = _mm256_min_epi32(vprev, v46);
          qbin = _mm256_blendv_epi8(qbin, v47, isStart);
          __m256i pb =
              _mm256_min_epi32(_mm256_srli_epi32(p1, 4), v7);
          vctx = _mm256_add_epi32(_mm256_mullo_epi32(pb, v48), qbin);
          if (order == 1) {
            __m256i vprev2 =
                _mm256_loadu_si256((const __m256i*)(prev2.data() + l));
            __m256i q2b = _mm256_srli_epi32(
                _mm256_min_epi32(vprev2, v46), 3);
            // sentinel 7 when p < 2
            __m256i ge2 = _mm256_cmpgt_epi32(p1, vOne);
            q2b = _mm256_blendv_epi8(v7, q2b, ge2);
            vctx = _mm256_add_epi32(_mm256_slli_epi32(vctx, 3), q2b);
          }
        }
        _mm256_storeu_si256((__m256i*)(ctx.data() + l), vctx);
        __m256i vx = _mm256_loadu_si256((const __m256i*)(x32.data() + l));
        __m256i slot = _mm256_and_si256(vx, vProbMask);
        __m256i j8, f8, c0;
        if (planes_ok) {
          // boundary-plane resolve: j = #boundaries <= slot (minus the
          // always-true j=0), c0/f from blended plane values
          const int32_t* bp = bplanes.data();
          __m256i slotP1 = _mm256_add_epi32(slot, vOne);
          __m256i b1 = _mm256_mask_i32gather_epi32(
              _mm256_setzero_si256(), (const int*)(bp + C), vctx, live,
              4);
          __m256i b2 = _mm256_mask_i32gather_epi32(
              _mm256_setzero_si256(), (const int*)(bp + 2 * C), vctx,
              live, 4);
          __m256i b3 = _mm256_mask_i32gather_epi32(
              _mm256_setzero_si256(), (const int*)(bp + 3 * C), vctx,
              live, 4);
          __m256i b4 = _mm256_mask_i32gather_epi32(
              _mm256_setzero_si256(), (const int*)(bp + 4 * C), vctx,
              live, 4);
          __m256i ge1 = _mm256_cmpgt_epi32(slotP1, b1);
          __m256i ge2 = _mm256_cmpgt_epi32(slotP1, b2);
          __m256i ge3 = _mm256_cmpgt_epi32(slotP1, b3);
          j8 = _mm256_add_epi32(
              _mm256_add_epi32(_mm256_and_si256(ge1, vOne),
                               _mm256_and_si256(ge2, vOne)),
              _mm256_and_si256(ge3, vOne));
          c0 = _mm256_setzero_si256();
          c0 = _mm256_blendv_epi8(c0, b1, ge1);
          c0 = _mm256_blendv_epi8(c0, b2, ge2);
          c0 = _mm256_blendv_epi8(c0, b3, ge3);
          __m256i nx = b1;
          nx = _mm256_blendv_epi8(nx, b2, ge1);
          nx = _mm256_blendv_epi8(nx, b3, ge2);
          nx = _mm256_blendv_epi8(nx, b4, ge3);
          f8 = _mm256_sub_epi32(nx, c0);
          __m256i bad = _mm256_and_si256(
              _mm256_cmpeq_epi32(f8, _mm256_setzero_si256()), live);
          if (!_mm256_testz_si256(bad, bad)) return -1;
        } else {
          // slot-table gather + bounds
          __m256i idx = _mm256_add_epi32(
              _mm256_mullo_epi32(vctx, vScale), slot);
          __m256i e = _mm256_mask_i32gather_epi32(
              _mm256_setzero_si256(), (const int*)slot_tab, idx, live,
              4);
          j8 = _mm256_srli_epi32(e, 24);
          f8 = _mm256_add_epi32(
              _mm256_and_si256(_mm256_srli_epi32(e, 12), vFFF), vOne);
          c0 = _mm256_and_si256(e, vFFF);
          __m256i ge =
              _mm256_cmpgt_epi32(_mm256_add_epi32(c0, f8), slot);
          __m256i bad = _mm256_or_si256(
              _mm256_cmpgt_epi32(c0, slot), _mm256_xor_si256(ge, vOnes));
          bad = _mm256_and_si256(bad, live);
          if (!_mm256_testz_si256(bad, bad)) return -1;
        }
        // x' = f*(x>>12) + slot - c0  (fits u32 by the coder invariant)
        __m256i x1 = _mm256_add_epi32(
            _mm256_mullo_epi32(f8, _mm256_srli_epi32(vx, 12)),
            _mm256_sub_epi32(slot, c0));
        // renorm: need = x' <u 2^16, words pulled in lane order
        __m256i need = _mm256_cmpgt_epi32(
            vRansLb, _mm256_xor_si256(x1, vBias));
        need = _mm256_and_si256(need, live);
        const int nm =
            _mm256_movemask_ps(_mm256_castsi256_ps(need));
        if (nm) {
          const int cnt = __builtin_popcount((unsigned)nm);
          if (wi + cnt > nwords) return -2;
          alignas(32) int32_t rk[8];
          int racc = 0;
          for (int k = 0; k < 8; k++) {
            rk[k] = racc;
            racc += (nm >> k) & 1;
          }
          __m256i woff = _mm256_add_epi32(
              _mm256_set1_epi32((int)wi),
              _mm256_load_si256((const __m256i*)rk));
          __m256i w32 = _mm256_mask_i32gather_epi32(
              _mm256_setzero_si256(), (const int*)wpad, woff, need, 2);
          w32 = _mm256_and_si256(w32, vW16);
          __m256i xren =
              _mm256_or_si256(_mm256_slli_epi32(x1, 16), w32);
          x1 = _mm256_blendv_epi8(x1, xren, need);
          wi += cnt;
        }
        vx = _mm256_blendv_epi8(vx, x1, live);
        _mm256_storeu_si256((__m256i*)(x32.data() + l), vx);
        // raw symbols + carries + strided output stores
        __m256i rawv = _mm256_mask_i32gather_epi32(
            _mm256_setzero_si256(), (const int*)pres32.data(), j8, live,
            4);
        __m256i vprev2n = _mm256_blendv_epi8(
            _mm256_loadu_si256((const __m256i*)(prev2.data() + l)),
            vprev, live);
        _mm256_storeu_si256((__m256i*)(prev2.data() + l), vprev2n);
        __m256i vprevn = _mm256_blendv_epi8(vprev, rawv, live);
        _mm256_storeu_si256((__m256i*)(prev.data() + l), vprevn);
        alignas(32) int32_t rawArr[8];
        _mm256_store_si256((__m256i*)rawArr, rawv);
        int lm = _mm256_movemask_ps(_mm256_castsi256_ps(live));
        while (lm) {
          const int k = __builtin_ctz((unsigned)lm);
          lm &= lm - 1;
          out[sb[(size_t)(l + k)] + t] = (uint8_t)rawArr[k];
        }
      }
    }
    if (wi != nwords) return -3;
    (void)total;
    return 0;
  }
#endif
  for (long long t = 0; t < S; t++) {
    for (long long l = 0; l < n_lanes; l++) {
      // pad cells (trailing, t >= seg) are SKIPPED: they cost no bits
      // and the encoder never touched the state for them (r3)
      if (t >= seg[(size_t)l]) continue;
      // record-start mask (start_matrix semantics: row 0 forced True)
      bool start = (t == 0);
      const long long r0 = rb[(size_t)l], r1 = rb[(size_t)l + 1];
      if (t == (long long)nxt[(size_t)l]) start = true;
      if (start) {
        // advance nxt past this start's (nonzero) record
        long long r = r0 + ri[(size_t)l];
        while (r < r1 && lengths[r] == 0) r++;
        if (r < r1) {
          nxt[(size_t)l] = (int32_t)(t + lengths[r]);
          ri[(size_t)l] = (int32_t)(r - r0 + 1);
        } else {
          nxt[(size_t)l] = -1;
        }
      }
      // context recurrence (identical to the device scan carry)
      if (model == 0) {
        ctx[(size_t)l] =
            start ? 0 : (((ctx[(size_t)l] << 2) | prev[(size_t)l]) & cmask);
        p[(size_t)l] = start ? 0 : p[(size_t)l] + 1;
      } else {
        p[(size_t)l] = start ? 0 : p[(size_t)l] + 1;
        const int32_t qbin =
            start ? 47
                  : (prev[(size_t)l] < 46 ? prev[(size_t)l] : 46);
        int32_t pb = p[(size_t)l] >> 4;
        if (pb > 7) pb = 7;
        int32_t c = pb * 48 + qbin;
        if (order == 1) {  // qualctx model 1: x prev2 bucket
          const int32_t pv2 =
              prev2[(size_t)l] < 46 ? prev2[(size_t)l] : 46;
          const int32_t q2b = p[(size_t)l] >= 2 ? (pv2 >> 3) : 7;
          c = c * 8 + q2b;
        }
        ctx[(size_t)l] = c;
      }
      if (ctx[(size_t)l] >= C) return -1;
      // symbol: rightmost j with pcum[j] <= slot (guaranteed f > 0)
      uint64_t xv = x[(size_t)l];
      const int32_t slot = (int32_t)(xv & (kProbScale - 1));
      int j;
      int32_t c0, f;
      if (slot_tab) {
        const uint32_t e =
            slot_tab[(size_t)(ctx[(size_t)l] * kProbScale + slot)];
        j = (int)(e >> 24);
        f = (int32_t)((e >> 12) & 0xFFF) + 1;
        c0 = (int32_t)(e & 0xFFF);
        if (slot < c0 || slot >= c0 + f) return -1;  // unused ctx/slot
      } else {
        const int32_t* prow =
            pcum.data() + (size_t)ctx[(size_t)l] * npres;
        int lo = 0, hi = npres - 1;
        while (lo < hi) {
          const int mid = (lo + hi + 1) >> 1;
          if (prow[mid] <= slot)
            lo = mid;
          else
            hi = mid - 1;
        }
        j = lo;
        c0 = prow[j];
        f = freq[(size_t)ctx[(size_t)l] * npres + j];
        if (f == 0) return -1;
      }
      xv = (uint64_t)f * (xv >> kProbBits) + (uint64_t)(slot - c0);
      if (xv < kRansL) {
        if (wi >= nwords) return -2;
        xv = (xv << 16) | words[wi++];
      }
      x[(size_t)l] = xv;
      const uint8_t raw = present[j];
      prev2[(size_t)l] = prev[(size_t)l];
      prev[(size_t)l] = raw;
      out[sb[(size_t)l] + t] = raw;
    }
  }
  if (wi != nwords) return -3;
  (void)total;
  return 0;
}

}  // extern "C"

extern "C" {

// Order-1 Markov base-code generator for the synthetic context-model
// corpus (bench.py synth_fastq markov=True). General transition rows
// (prob16: (4,4) row-stochastic in 1/65536 units) — deliberately NOT a
// circulant/additive chain, so the structure is invisible to LZ but
// captured by order-k context models. splitmix64 RNG (seeded,
// reproducible; parity with numpy is not required — the corpus is
// defined by this function).
void fq_markov_gen(uint8_t* out, long long n, const uint16_t* prob16,
                   unsigned long long seed) {
  uint64_t s = seed;
  auto next = [&s]() {
    s += 0x9E3779B97F4A7C15ULL;
    uint64_t z = s;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
  };
  uint32_t cum[4][4];
  for (int r = 0; r < 4; r++) {
    uint32_t acc = 0;
    for (int c = 0; c < 4; c++) {
      acc += prob16[r * 4 + c];
      cum[r][c] = acc;
    }
    cum[r][3] = 65536;  // guard against rounding shortfalls
  }
  uint8_t prev = 0;
  for (long long i = 0; i < n; i++) {
    const uint32_t u = (uint32_t)(next() & 0xFFFF);
    const uint32_t* row = cum[prev];
    uint8_t b = u < row[0] ? 0 : (u < row[1] ? 1 : (u < row[2] ? 2 : 3));
    out[i] = b;
    prev = b;
  }
}

}  // extern "C"

// Native data-loader core: MT19937 row permutation bit-compatible with
// numpy.random.RandomState, used by ChunkedPairSampler as a fast host path
// for the per-epoch chunk-descriptor shuffle.
//
// Compatibility contract (verified by tests/test_native_sampler.py):
//   * the generator is the classic MT19937 with numpy's legacy seeding and
//     tempering (numpy/random/src/legacy mtrand);
//   * bounded draws use the mask-and-reject scheme of rk_interval;
//   * row shuffling is the legacy Fisher-Yates order (i = n-1 .. 1,
//     j = interval(i), swap rows i and j);
// so for equal (key, pos) state the permutation — and the post-call state —
// are bit-identical to numpy's, which keeps checkpoint RNG-state resume parity
// (SURVEY.md C11: generators.py:80-97) intact when the native path is enabled.
//
// Build:  g++ -O3 -shared -fPIC -o libsampler.so sampler.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kN = 624;
constexpr int kM = 397;
constexpr uint32_t kMatrixA = 0x9908b0dfUL;
constexpr uint32_t kUpperMask = 0x80000000UL;
constexpr uint32_t kLowerMask = 0x7fffffffUL;

struct MT19937 {
  uint32_t key[kN];
  int pos;

  void seed(uint32_t s) {
    key[0] = s;
    for (int i = 1; i < kN; i++) {
      key[i] = 1812433253UL * (key[i - 1] ^ (key[i - 1] >> 30)) + i;
    }
    pos = kN;
  }

  uint32_t next() {
    if (pos >= kN) {
      // Regenerate the block (same two-phase loop as the reference MT19937).
      for (int i = 0; i < kN - kM; i++) {
        uint32_t y = (key[i] & kUpperMask) | (key[i + 1] & kLowerMask);
        key[i] = key[i + kM] ^ (y >> 1) ^ ((y & 1) ? kMatrixA : 0);
      }
      for (int i = kN - kM; i < kN - 1; i++) {
        uint32_t y = (key[i] & kUpperMask) | (key[i + 1] & kLowerMask);
        key[i] = key[i + (kM - kN)] ^ (y >> 1) ^ ((y & 1) ? kMatrixA : 0);
      }
      uint32_t y = (key[kN - 1] & kUpperMask) | (key[0] & kLowerMask);
      key[kN - 1] = key[kM - 1] ^ (y >> 1) ^ ((y & 1) ? kMatrixA : 0);
      pos = 0;
    }
    uint32_t y = key[pos++];
    // Tempering.
    y ^= (y >> 11);
    y ^= (y << 7) & 0x9d2c5680UL;
    y ^= (y << 15) & 0xefc60000UL;
    y ^= (y >> 18);
    return y;
  }

  // numpy rk_interval: uniform draw in [0, max] via mask-and-reject.
  uint64_t interval(uint64_t max) {
    if (max == 0) return 0;
    uint64_t mask = max;
    mask |= mask >> 1;
    mask |= mask >> 2;
    mask |= mask >> 4;
    mask |= mask >> 8;
    mask |= mask >> 16;
    mask |= mask >> 32;
    uint64_t value;
    if (max <= 0xffffffffULL) {
      while ((value = (next() & mask)) > max) {
      }
    } else {
      // Two sequenced draws: numpy's rk_ulong takes the HIGH word first, and
      // operand evaluation order of `|` is unspecified in C++ — a single
      // expression with two next() calls could swap the words on some
      // compilers, silently breaking MT19937 bit-compatibility.
      for (;;) {
        uint64_t hi = next();
        uint64_t lo = next();
        value = (((hi << 32) | lo) & mask);
        if (value <= max) break;
      }
    }
    return value;
  }
};

}  // namespace

extern "C" {

// Shuffle rows of `data` (n_rows x row_len int64) in place with the legacy
// numpy Fisher-Yates, reading/writing the MT19937 state through key[624]/pos.
void sampler_permute_rows(uint32_t* key, int32_t* pos, int64_t* data,
                          int64_t n_rows, int64_t row_len) {
  MT19937 rng;
  std::memcpy(rng.key, key, sizeof(rng.key));
  rng.pos = *pos;

  std::vector<int64_t> buf(row_len);
  const size_t row_bytes = static_cast<size_t>(row_len) * sizeof(int64_t);
  for (int64_t i = n_rows - 1; i > 0; i--) {
    int64_t j = static_cast<int64_t>(rng.interval(static_cast<uint64_t>(i)));
    if (j != i) {
      std::memcpy(buf.data(), data + i * row_len, row_bytes);
      std::memcpy(data + i * row_len, data + j * row_len, row_bytes);
      std::memcpy(data + j * row_len, buf.data(), row_bytes);
    }
  }

  std::memcpy(key, rng.key, sizeof(rng.key));
  *pos = rng.pos;
}

// Convenience: seeded draw for testing the generator core.
void sampler_seed(uint32_t seed, uint32_t* key, int32_t* pos) {
  MT19937 rng;
  rng.seed(seed);
  std::memcpy(key, rng.key, sizeof(rng.key));
  *pos = rng.pos;
}

void sampler_raw_draws(uint32_t* key, int32_t* pos, uint32_t* out, int64_t n) {
  MT19937 rng;
  std::memcpy(rng.key, key, sizeof(rng.key));
  rng.pos = *pos;
  for (int64_t i = 0; i < n; i++) out[i] = rng.next();
  std::memcpy(key, rng.key, sizeof(rng.key));
  *pos = rng.pos;
}

}  // extern "C"

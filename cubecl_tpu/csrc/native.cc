// Native runtime components for cubecl-tpu, bound via ctypes.
//
// The reference implements these in Rust inside cubecl-runtime /
// cubecl-common; on the TPU build they are the host-side hot paths that
// stay native while jax/XLA owns device execution:
//
//  - xxh64: stable 64-bit hashing for kernel ids and persistent cache keys
//    (reference cubecl-common/src/hash.rs).
//  - divmod_magic: magic-number computation for FastDivmod index math
//    (reference cubecl-std/src/fast_math.rs:13-43).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 native.cc -o libcubecl_native.so
// (done lazily by cubecl_tpu/utils/native.py).

#include <cstdint>
#include <cstddef>

extern "C" {

// --------------------------------------------------------------------------
// xxh64 (XXH64 algorithm, public domain reference implementation style)
// --------------------------------------------------------------------------

static const uint64_t P1 = 11400714785074694791ULL;
static const uint64_t P2 = 14029467366897019727ULL;
static const uint64_t P3 = 1609587929392839161ULL;
static const uint64_t P4 = 9650029242287828579ULL;
static const uint64_t P5 = 2870177450012600261ULL;

static inline uint64_t rotl(uint64_t x, int r) {
  return (x << r) | (x >> (64 - r));
}

static inline uint64_t read64(const uint8_t* p) {
  uint64_t v;
  __builtin_memcpy(&v, p, 8);
  return v;
}

static inline uint32_t read32(const uint8_t* p) {
  uint32_t v;
  __builtin_memcpy(&v, p, 4);
  return v;
}

uint64_t xxh64(const char* data, size_t len, uint64_t seed) {
  const uint8_t* p = reinterpret_cast<const uint8_t*>(data);
  const uint8_t* end = p + len;
  uint64_t h;
  if (len >= 32) {
    uint64_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const uint8_t* limit = end - 32;
    do {
      v1 = rotl(v1 + read64(p) * P2, 31) * P1; p += 8;
      v2 = rotl(v2 + read64(p) * P2, 31) * P1; p += 8;
      v3 = rotl(v3 + read64(p) * P2, 31) * P1; p += 8;
      v4 = rotl(v4 + read64(p) * P2, 31) * P1; p += 8;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
    for (uint64_t* v : {&v1, &v2, &v3, &v4}) {
      h ^= rotl(*v * P2, 31) * P1;
      h = h * P1 + P4;
    }
  } else {
    h = seed + P5;
  }
  h += (uint64_t)len;
  while (p + 8 <= end) {
    h ^= rotl(read64(p) * P2, 31) * P1;
    h = rotl(h, 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    h ^= (uint64_t)read32(p) * P1;
    h = rotl(h, 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h ^= (*p) * P5;
    h = rotl(h, 11) * P1;
    ++p;
  }
  h ^= h >> 33; h *= P2; h ^= h >> 29; h *= P3; h ^= h >> 32;
  return h;
}

// --------------------------------------------------------------------------
// FastDivmod magic numbers: returns (multiplier << 8) | shift packed, for
// unsigned 32-bit division by a constant (round-up method).
// --------------------------------------------------------------------------

uint64_t divmod_magic(uint32_t divisor) {
  if (divisor == 0) return 0;
  if ((divisor & (divisor - 1)) == 0) {
    // power of two: shift only, multiplier 1
    uint32_t shift = 0;
    while ((1u << shift) < divisor) ++shift;
    return ((uint64_t)1 << 8) | shift | (1ULL << 63);  // top bit: pow2 flag
  }
  uint32_t shift = 0;
  while ((1ULL << shift) < divisor) ++shift;
  shift += 31;
  uint64_t magic = ((1ULL << shift) + divisor - 1) / divisor;
  return (magic << 8) | (shift - 32);
}

}  // extern "C"

// Poseidon over the BN254 scalar field — bulk Merkle hashing for the
// identity_p254 (stark-to-snark) wrap.  Mirrors the semantics of
// risc0/zkp/src/core/hash/poseidon_254/mod.rs (t=3, alpha=8, 4+42+4
// rounds); the reference's CPU HAL does the same work via the ff crate.
//
// All field constants (modulus limbs, Montgomery n', R^2, round constants,
// MDS) are injected from Python via p254_init so this file carries no
// protocol data.  Values use 4x64-bit little-endian limbs, Montgomery form
// with R = 2^256.

#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

using u64 = uint64_t;
using u128 = __uint128_t;

struct Fr {
  u64 v[4];
};

static Fr MOD;       // field modulus
static u64 NPRIME;   // -MOD^{-1} mod 2^64
static Fr R2;        // 2^512 mod MOD (to-Montgomery factor)
static Fr ONE_M;     // Montgomery 1 (= 2^256 mod MOD)
static Fr PBB_M;     // BabyBear prime, Montgomery form (sponge radix)
static std::vector<Fr> RC;   // 150 round constants, Montgomery
static std::vector<Fr> MDS;  // 9 MDS entries, Montgomery

constexpr int CELLS = 3;
constexpr int ROUNDS_HALF_FULL = 4;
constexpr int ROUNDS_PARTIAL = 42;
constexpr int ROUNDS_TOT = 2 * ROUNDS_HALF_FULL + ROUNDS_PARTIAL;

inline bool geq_mod(const Fr &a) {
  for (int i = 3; i >= 0; --i) {
    if (a.v[i] != MOD.v[i]) return a.v[i] > MOD.v[i];
  }
  return true;  // equal
}

inline void sub_mod(Fr &a) {
  u128 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - MOD.v[i] - borrow;
    a.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

inline void fr_add(Fr &out, const Fr &a, const Fr &b) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + (u64)carry;
    out.v[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || geq_mod(out)) sub_mod(out);
}

// Montgomery multiplication (CIOS, 4 limbs).
inline void fr_mul(Fr &out, const Fr &a, const Fr &b) {
  u64 t[5] = {0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    // t += a.v[i] * b
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)a.v[i] * b.v[j] + t[j] + (u64)carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u64 t4 = t[4] + (u64)carry;
    // m = t[0] * NPRIME mod 2^64; t += m * MOD; t >>= 64
    u64 m = t[0] * NPRIME;
    u128 s = (u128)m * MOD.v[0] + t[0];
    carry = s >> 64;
    for (int j = 1; j < 4; ++j) {
      s = (u128)m * MOD.v[j] + t[j] + (u64)carry;
      t[j - 1] = (u64)s;
      carry = s >> 64;
    }
    s = (u128)t4 + (u64)carry;
    t[3] = (u64)s;
    t[4] = (u64)(s >> 64);
  }
  out.v[0] = t[0];
  out.v[1] = t[1];
  out.v[2] = t[2];
  out.v[3] = t[3];
  if (t[4] || geq_mod(out)) sub_mod(out);
}

inline Fr to_mont_u32(uint32_t x) {
  Fr a = {{x, 0, 0, 0}};
  Fr out;
  fr_mul(out, a, R2);
  return out;
}

inline void from_mont(Fr &out, const Fr &a) {
  Fr one = {{1, 0, 0, 0}};
  fr_mul(out, a, one);
}

inline void sbox(Fr &x) {
  Fr x2, x4;
  fr_mul(x2, x, x);
  fr_mul(x4, x2, x2);
  fr_mul(x, x4, x4);
}

void permute(Fr cells[CELLS]) {
  for (int r = 0; r < ROUNDS_TOT; ++r) {
    bool full = r < ROUNDS_HALF_FULL || r >= ROUNDS_HALF_FULL + ROUNDS_PARTIAL;
    for (int i = 0; i < CELLS; ++i)
      fr_add(cells[i], cells[i], RC[r * CELLS + i]);
    if (full) {
      for (int i = 0; i < CELLS; ++i) sbox(cells[i]);
    } else {
      sbox(cells[0]);
    }
    Fr old[CELLS] = {cells[0], cells[1], cells[2]};
    for (int i = 0; i < CELLS; ++i) {
      Fr tot = {{0, 0, 0, 0}};
      for (int j = 0; j < CELLS; ++j) {
        Fr t;
        fr_mul(t, MDS[i * CELLS + j], old[j]);
        fr_add(tot, tot, t);
      }
      cells[i] = tot;
    }
  }
}

// digest (8 LE u32 words) -> Montgomery Fr
inline Fr digest_to_fr(const uint32_t *d) {
  Fr a;
  for (int i = 0; i < 4; ++i)
    a.v[i] = (u64)d[2 * i] | ((u64)d[2 * i + 1] << 32);
  Fr out;
  fr_mul(out, a, R2);
  return out;
}

inline void fr_to_digest(uint32_t *out, const Fr &m) {
  Fr c;
  from_mont(c, m);
  for (int i = 0; i < 4; ++i) {
    out[2 * i] = (uint32_t)c.v[i];
    out[2 * i + 1] = (uint32_t)(c.v[i] >> 32);
  }
}

// Sponge over standard-form BabyBear u32s, 8 packed per Fr with radix P,
// 2 Fr per permute (mod.rs:109-138 unpadded_hash).
void hash_row(const uint32_t *vals, u64 n, u64 stride, uint32_t *out) {
  Fr cells[CELLS] = {{{0}}, {{0}}, {{0}}};
  Fr mul = ONE_M;
  int idx = 1, count = 0;
  for (u64 k = 0; k < n; ++k) {
    Fr term;
    fr_mul(term, mul, to_mont_u32(vals[k * stride]));
    fr_add(cells[idx], cells[idx], term);
    fr_mul(mul, mul, PBB_M);
    if (++count == 8) {
      mul = ONE_M;
      count = 0;
      ++idx;
    }
    if (idx == CELLS) {
      permute(cells);
      cells[1] = {{0, 0, 0, 0}};
      cells[2] = {{0, 0, 0, 0}};
      idx = 1;
    }
  }
  if (idx != 1 || count != 0) permute(cells);
  fr_to_digest(out, cells[0]);
}

void run_threads(u64 n, int n_threads, const std::function<void(u64, u64)> &fn) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if ((u64)n_threads > n) n_threads = (int)(n ? n : 1);
  std::vector<std::thread> ts;
  u64 chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    u64 lo = t * chunk, hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    ts.emplace_back(fn, lo, hi);
  }
  for (auto &t : ts) t.join();
}

}  // namespace

extern "C" {

// All limb arrays little-endian u64x4 per value, Montgomery form except mod.
void p254_init(const u64 *mod, u64 nprime, const u64 *r2, const u64 *one_m,
               const u64 *pbb_m, const u64 *rc_m /*150*4*/,
               const u64 *mds_m /*9*4*/) {
  memcpy(MOD.v, mod, 32);
  NPRIME = nprime;
  memcpy(R2.v, r2, 32);
  memcpy(ONE_M.v, one_m, 32);
  memcpy(PBB_M.v, pbb_m, 32);
  RC.resize(ROUNDS_TOT * CELLS);
  for (int i = 0; i < ROUNDS_TOT * CELLS; ++i) memcpy(RC[i].v, rc_m + 4 * i, 32);
  MDS.resize(CELLS * CELLS);
  for (int i = 0; i < CELLS * CELLS; ++i) memcpy(MDS[i].v, mds_m + 4 * i, 32);
}

// matrix: (cols, rows) row-major standard-form BabyBear u32; out: rows*8.
void p254_hash_rows(const uint32_t *matrix, u64 cols, u64 rows, uint32_t *out,
                    int n_threads) {
  run_threads(rows, n_threads, [&](u64 lo, u64 hi) {
    for (u64 r = lo; r < hi; ++r)
      hash_row(matrix + r, cols, rows, out + 8 * r);
  });
}

// l, r: (n, 8) digests; out: (n, 8).
void p254_hash_pairs(const uint32_t *l, const uint32_t *r, u64 n,
                     uint32_t *out, int n_threads) {
  run_threads(n, n_threads, [&](u64 lo, u64 hi) {
    for (u64 i = lo; i < hi; ++i) {
      Fr cells[CELLS] = {
          {{0, 0, 0, 0}}, digest_to_fr(l + 8 * i), digest_to_fr(r + 8 * i)};
      permute(cells);
      fr_to_digest(out + 8 * i, cells[0]);
    }
  });
}

}  // extern "C"

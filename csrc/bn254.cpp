// BN254 (alt_bn128) native core for the in-repo Groth16 prover.
//
// The reference proves its stark_verify circuit with rapidsnark/gnark inside
// a docker container (risc0/groth16/src/prove/docker.rs:34-75); here the
// Groth16 CRS generation and proving run in-process: this file provides the
// scalar/base field arithmetic, curve groups, MSMs and the Fr NTT, and
// risc0_tpu/groth16/{setup,prove}.py orchestrates the protocol.
//
// Conventions:
//   - Field elements are 4x64-bit little-endian limbs.
//   - "mont" values are in Montgomery form (R = 2^256); "std" are canonical.
//   - Scalars for MSMs are passed in STANDARD form (digit extraction).
//   - G1 affine points: 8 u64 (x, y) Montgomery Fq; x==0 && y==0 encodes
//     the point at infinity.  G2 affine: 16 u64 (x.c0, x.c1, y.c0, y.c1).
//   - Field constants (moduli, n', R^2) are injected from Python via
//     bn254_init so this file carries no protocol data.

#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace bn254 {

using u32 = uint32_t;
using u64 = uint64_t;
using u128 = __uint128_t;

struct Fe {
  u64 v[4];
};

struct Ctx {
  Fe mod;
  u64 nprime;
  Fe r2;
  Fe one;  // Montgomery 1
};

static Ctx FQ, FR;

inline bool fe_is_zero(const Fe &a) {
  return (a.v[0] | a.v[1] | a.v[2] | a.v[3]) == 0;
}

inline bool fe_eq(const Fe &a, const Fe &b) {
  return a.v[0] == b.v[0] && a.v[1] == b.v[1] && a.v[2] == b.v[2] &&
         a.v[3] == b.v[3];
}

inline bool geq(const Fe &a, const Fe &m) {
  for (int i = 3; i >= 0; --i)
    if (a.v[i] != m.v[i]) return a.v[i] > m.v[i];
  return true;
}

inline void sub_nored(Fe &out, const Fe &a, const Fe &b) {
  u64 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    out.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
}

inline void add(const Ctx &c, Fe &out, const Fe &a, const Fe &b) {
  u128 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.v[i] + b.v[i] + (u64)carry;
    out.v[i] = (u64)s;
    carry = s >> 64;
  }
  if (carry || geq(out, c.mod)) sub_nored(out, out, c.mod);
}

inline void sub(const Ctx &c, Fe &out, const Fe &a, const Fe &b) {
  u64 borrow = 0;
  Fe t;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.v[i] - b.v[i] - borrow;
    t.v[i] = (u64)d;
    borrow = (d >> 64) & 1;
  }
  if (borrow) {
    u128 carry = 0;
    for (int i = 0; i < 4; ++i) {
      u128 s = (u128)t.v[i] + c.mod.v[i] + (u64)carry;
      t.v[i] = (u64)s;
      carry = s >> 64;
    }
  }
  out = t;
}

inline void neg(const Ctx &c, Fe &out, const Fe &a) {
  if (fe_is_zero(a)) {
    out = a;
    return;
  }
  sub_nored(out, c.mod, a);
}

// Montgomery multiplication (CIOS, 4 limbs).
inline void mul(const Ctx &c, Fe &out, const Fe &a, const Fe &b) {
  u64 t[5] = {0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u128 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)a.v[i] * b.v[j] + t[j] + (u64)carry;
      t[j] = (u64)s;
      carry = s >> 64;
    }
    u64 t4 = t[4] + (u64)carry;
    u64 m = t[0] * c.nprime;
    u128 s = (u128)m * c.mod.v[0] + t[0];
    carry = s >> 64;
    for (int j = 1; j < 4; ++j) {
      s = (u128)m * c.mod.v[j] + t[j] + (u64)carry;
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
  if (t[4] || geq(out, c.mod)) sub_nored(out, out, c.mod);
}

inline void sqr(const Ctx &c, Fe &out, const Fe &a) { mul(c, out, a, a); }

inline void to_mont(const Ctx &c, Fe &out, const Fe &a) {
  mul(c, out, a, c.r2);
}

inline void from_mont(const Ctx &c, Fe &out, const Fe &a) {
  Fe one = {{1, 0, 0, 0}};
  mul(c, out, a, one);
}

// a^e (e standard-form 4 limbs), a Montgomery.
inline void pow(const Ctx &c, Fe &out, const Fe &a, const Fe &e) {
  Fe base = a, acc = c.one;
  for (int i = 0; i < 4; ++i) {
    u64 w = e.v[i];
    for (int b = 0; b < 64; ++b) {
      if (w & 1) mul(c, acc, acc, base);
      mul(c, base, base, base);
      w >>= 1;
    }
  }
  out = acc;
}

// Inverse via Fermat (a^(p-2)); fine for the few inverses we need per call.
inline void inv(const Ctx &c, Fe &out, const Fe &a) {
  Fe e = c.mod;
  u64 borrow = 2;
  for (int i = 0; i < 4 && borrow; ++i) {
    u128 d = (u128)e.v[i] - borrow;
    e.v[i] = (u64)d;
    borrow = (d >> 64) & 1 ? 1 : 0;
  }
  pow(c, out, a, e);
}

// ---------------------------------------------------------------------------
// Fq2 = Fq[u]/(u^2 + 1)
// ---------------------------------------------------------------------------

struct Fe2 {
  Fe c0, c1;
};

inline void f2_add(Fe2 &o, const Fe2 &a, const Fe2 &b) {
  add(FQ, o.c0, a.c0, b.c0);
  add(FQ, o.c1, a.c1, b.c1);
}

inline void f2_sub(Fe2 &o, const Fe2 &a, const Fe2 &b) {
  sub(FQ, o.c0, a.c0, b.c0);
  sub(FQ, o.c1, a.c1, b.c1);
}

inline void f2_neg(Fe2 &o, const Fe2 &a) {
  neg(FQ, o.c0, a.c0);
  neg(FQ, o.c1, a.c1);
}

inline void f2_mul(Fe2 &o, const Fe2 &a, const Fe2 &b) {
  Fe t0, t1, t2, t3;
  mul(FQ, t0, a.c0, b.c0);
  mul(FQ, t1, a.c1, b.c1);
  add(FQ, t2, a.c0, a.c1);
  add(FQ, t3, b.c0, b.c1);
  Fe t4;
  mul(FQ, t4, t2, t3);           // (a0+a1)(b0+b1)
  sub(FQ, o.c1, t4, t0);
  sub(FQ, o.c1, o.c1, t1);       // a0b1 + a1b0
  sub(FQ, o.c0, t0, t1);         // a0b0 - a1b1
}

inline void f2_sqr(Fe2 &o, const Fe2 &a) { f2_mul(o, a, a); }

inline bool f2_is_zero(const Fe2 &a) {
  return fe_is_zero(a.c0) && fe_is_zero(a.c1);
}

inline bool f2_eq(const Fe2 &a, const Fe2 &b) {
  return fe_eq(a.c0, b.c0) && fe_eq(a.c1, b.c1);
}

// ---------------------------------------------------------------------------
// Curve groups: generic Jacobian arithmetic over a field F with zero/one
// helpers, instantiated for Fq (G1) and Fq2 (G2).
// ---------------------------------------------------------------------------

template <typename F>
struct FieldOps;

template <>
struct FieldOps<Fe> {
  static void add(Fe &o, const Fe &a, const Fe &b) { bn254::add(FQ, o, a, b); }
  static void sub(Fe &o, const Fe &a, const Fe &b) { bn254::sub(FQ, o, a, b); }
  static void mul(Fe &o, const Fe &a, const Fe &b) { bn254::mul(FQ, o, a, b); }
  static void sqr(Fe &o, const Fe &a) { bn254::mul(FQ, o, a, a); }
  static void neg(Fe &o, const Fe &a) { bn254::neg(FQ, o, a); }
  static bool is_zero(const Fe &a) { return fe_is_zero(a); }
  static bool eq(const Fe &a, const Fe &b) { return fe_eq(a, b); }
  static Fe zero() { return Fe{{0, 0, 0, 0}}; }
  static Fe one() { return FQ.one; }
};

template <>
struct FieldOps<Fe2> {
  static void add(Fe2 &o, const Fe2 &a, const Fe2 &b) { f2_add(o, a, b); }
  static void sub(Fe2 &o, const Fe2 &a, const Fe2 &b) { f2_sub(o, a, b); }
  static void mul(Fe2 &o, const Fe2 &a, const Fe2 &b) { f2_mul(o, a, b); }
  static void sqr(Fe2 &o, const Fe2 &a) { f2_mul(o, a, a); }
  static void neg(Fe2 &o, const Fe2 &a) { f2_neg(o, a); }
  static bool is_zero(const Fe2 &a) { return f2_is_zero(a); }
  static bool eq(const Fe2 &a, const Fe2 &b) { return f2_eq(a, b); }
  static Fe2 zero() { return Fe2{Fe{{0, 0, 0, 0}}, Fe{{0, 0, 0, 0}}}; }
  static Fe2 one() { return Fe2{FQ.one, Fe{{0, 0, 0, 0}}}; }
};

// Jacobian point (X, Y, Z); Z == 0 encodes infinity.
template <typename F>
struct Jac {
  F x, y, z;
  bool is_inf() const { return FieldOps<F>::is_zero(z); }
};

template <typename F>
struct Aff {
  F x, y;
  bool inf;
};

template <typename F>
Jac<F> jac_identity() {
  return Jac<F>{FieldOps<F>::one(), FieldOps<F>::one(), FieldOps<F>::zero()};
}

template <typename F>
Jac<F> to_jac(const Aff<F> &a) {
  if (a.inf) return jac_identity<F>();
  return Jac<F>{a.x, a.y, FieldOps<F>::one()};
}

// dbl-2009-l
template <typename F>
void jac_dbl(Jac<F> &o, const Jac<F> &p) {
  using O = FieldOps<F>;
  if (p.is_inf() || O::is_zero(p.y)) {
    o = jac_identity<F>();
    return;
  }
  F a, b, c, d, e, f, t;
  O::sqr(a, p.x);                 // A = X^2
  O::sqr(b, p.y);                 // B = Y^2
  O::sqr(c, b);                   // C = B^2
  O::add(d, p.x, b);
  O::sqr(d, d);
  O::sub(d, d, a);
  O::sub(d, d, c);
  O::add(d, d, d);                // D = 2((X+B)^2 - A - C)
  O::add(e, a, a);
  O::add(e, e, a);                // E = 3A
  O::sqr(f, e);                   // F = E^2
  F x3, y3, z3;
  O::sub(x3, f, d);
  O::sub(x3, x3, d);              // X3 = F - 2D
  O::add(t, c, c);
  O::add(t, t, t);
  O::add(t, t, t);                // 8C
  O::sub(y3, d, x3);
  O::mul(y3, y3, e);
  O::sub(y3, y3, t);              // Y3 = E(D - X3) - 8C
  O::mul(z3, p.y, p.z);
  O::add(z3, z3, z3);             // Z3 = 2YZ
  o.x = x3;
  o.y = y3;
  o.z = z3;
}

// add-2007-bl (general Jacobian add)
template <typename F>
void jac_add(Jac<F> &o, const Jac<F> &p, const Jac<F> &q) {
  using O = FieldOps<F>;
  if (p.is_inf()) {
    o = q;
    return;
  }
  if (q.is_inf()) {
    o = p;
    return;
  }
  F z1z1, z2z2, u1, u2, s1, s2, t;
  O::sqr(z1z1, p.z);
  O::sqr(z2z2, q.z);
  O::mul(u1, p.x, z2z2);
  O::mul(u2, q.x, z1z1);
  O::mul(s1, p.y, q.z);
  O::mul(s1, s1, z2z2);
  O::mul(s2, q.y, p.z);
  O::mul(s2, s2, z1z1);
  if (O::eq(u1, u2)) {
    if (O::eq(s1, s2)) {
      jac_dbl(o, p);
      return;
    }
    o = jac_identity<F>();
    return;
  }
  F h, i, j, r, v;
  O::sub(h, u2, u1);
  O::add(i, h, h);
  O::sqr(i, i);                   // I = (2H)^2
  O::mul(j, h, i);                // J = H*I
  O::sub(r, s2, s1);
  O::add(r, r, r);                // r = 2(S2-S1)
  O::mul(v, u1, i);               // V = U1*I
  F x3, y3, z3;
  O::sqr(x3, r);
  O::sub(x3, x3, j);
  O::sub(x3, x3, v);
  O::sub(x3, x3, v);              // X3 = r^2 - J - 2V
  O::sub(y3, v, x3);
  O::mul(y3, y3, r);
  O::mul(t, s1, j);
  O::add(t, t, t);
  O::sub(y3, y3, t);              // Y3 = r(V - X3) - 2 S1 J
  O::add(z3, p.z, q.z);
  O::sqr(z3, z3);
  O::sub(z3, z3, z1z1);
  O::sub(z3, z3, z2z2);
  O::mul(z3, z3, h);              // Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) H
  o.x = x3;
  o.y = y3;
  o.z = z3;
}

// mixed add (q affine), madd-2007-bl
template <typename F>
void jac_madd(Jac<F> &o, const Jac<F> &p, const Aff<F> &q) {
  using O = FieldOps<F>;
  if (q.inf) {
    o = p;
    return;
  }
  if (p.is_inf()) {
    o = to_jac(q);
    return;
  }
  F z1z1, u2, s2, t;
  O::sqr(z1z1, p.z);
  O::mul(u2, q.x, z1z1);
  O::mul(s2, q.y, p.z);
  O::mul(s2, s2, z1z1);
  if (O::eq(p.x, u2)) {
    if (O::eq(p.y, s2)) {
      jac_dbl(o, p);
      return;
    }
    o = jac_identity<F>();
    return;
  }
  F h, hh, i, j, r, v;
  O::sub(h, u2, p.x);
  O::sqr(hh, h);
  O::add(i, hh, hh);
  O::add(i, i, i);                // I = 4 HH
  O::mul(j, h, i);
  O::sub(r, s2, p.y);
  O::add(r, r, r);                // r = 2(S2 - Y1)
  O::mul(v, p.x, i);
  F x3, y3, z3;
  O::sqr(x3, r);
  O::sub(x3, x3, j);
  O::sub(x3, x3, v);
  O::sub(x3, x3, v);
  O::sub(y3, v, x3);
  O::mul(y3, y3, r);
  O::mul(t, p.y, j);
  O::add(t, t, t);
  O::sub(y3, y3, t);
  O::add(z3, p.z, h);
  O::sqr(z3, z3);
  O::sub(z3, z3, z1z1);
  O::sub(z3, z3, hh);
  o.x = x3;
  o.y = y3;
  o.z = z3;
}

// Jacobian -> affine (one field inverse).
template <typename F>
Aff<F> to_aff(const Jac<F> &p);

template <>
Aff<Fe> to_aff(const Jac<Fe> &p) {
  if (p.is_inf()) return Aff<Fe>{FieldOps<Fe>::zero(), FieldOps<Fe>::zero(), true};
  Fe zi, zi2, zi3, x, y;
  inv(FQ, zi, p.z);
  mul(FQ, zi2, zi, zi);
  mul(FQ, zi3, zi2, zi);
  mul(FQ, x, p.x, zi2);
  mul(FQ, y, p.y, zi3);
  return Aff<Fe>{x, y, false};
}

inline void f2_inv(Fe2 &o, const Fe2 &a) {
  Fe t0, t1, d;
  mul(FQ, t0, a.c0, a.c0);
  mul(FQ, t1, a.c1, a.c1);
  add(FQ, d, t0, t1);             // a0^2 + a1^2 (since u^2 = -1)
  Fe di;
  inv(FQ, di, d);
  mul(FQ, o.c0, a.c0, di);
  Fe n1;
  neg(FQ, n1, a.c1);
  mul(FQ, o.c1, n1, di);
}

template <>
Aff<Fe2> to_aff(const Jac<Fe2> &p) {
  if (p.is_inf())
    return Aff<Fe2>{FieldOps<Fe2>::zero(), FieldOps<Fe2>::zero(), true};
  Fe2 zi, zi2, zi3, x, y;
  f2_inv(zi, p.z);
  f2_mul(zi2, zi, zi);
  f2_mul(zi3, zi2, zi);
  f2_mul(x, p.x, zi2);
  f2_mul(y, p.y, zi3);
  return Aff<Fe2>{x, y, false};
}

// ---------------------------------------------------------------------------
// Point (de)serialization: flat u64 arrays <-> Aff
// ---------------------------------------------------------------------------

inline Aff<Fe> load_g1(const u64 *p) {
  Aff<Fe> a;
  memcpy(a.x.v, p, 32);
  memcpy(a.y.v, p + 4, 32);
  a.inf = fe_is_zero(a.x) && fe_is_zero(a.y);
  return a;
}

inline void store_g1(u64 *p, const Aff<Fe> &a) {
  if (a.inf) {
    memset(p, 0, 64);
    return;
  }
  memcpy(p, a.x.v, 32);
  memcpy(p + 4, a.y.v, 32);
}

inline Aff<Fe2> load_g2(const u64 *p) {
  Aff<Fe2> a;
  memcpy(a.x.c0.v, p, 32);
  memcpy(a.x.c1.v, p + 4, 32);
  memcpy(a.y.c0.v, p + 8, 32);
  memcpy(a.y.c1.v, p + 12, 32);
  a.inf = f2_is_zero(a.x) && f2_is_zero(a.y);
  return a;
}

inline void store_g2(u64 *p, const Aff<Fe2> &a) {
  if (a.inf) {
    memset(p, 0, 128);
    return;
  }
  memcpy(p, a.x.c0.v, 32);
  memcpy(p + 4, a.x.c1.v, 32);
  memcpy(p + 8, a.y.c0.v, 32);
  memcpy(p + 12, a.y.c1.v, 32);
}

template <typename F>
Aff<F> load_point(const u64 *points, u64 i);

template <>
Aff<Fe> load_point(const u64 *points, u64 i) {
  return load_g1(points + 8 * i);
}

template <>
Aff<Fe2> load_point(const u64 *points, u64 i) {
  return load_g2(points + 16 * i);
}

template <typename F>
void store_point(u64 *out, u64 i, const Aff<F> &a);

template <>
void store_point(u64 *out, u64 i, const Aff<Fe> &a) {
  store_g1(out + 8 * i, a);
}

template <>
void store_point(u64 *out, u64 i, const Aff<Fe2> &a) {
  store_g2(out + 16 * i, a);
}

// ---------------------------------------------------------------------------
// Scalar multiplication / MSM
// ---------------------------------------------------------------------------

inline int scalar_bits(const Fe &s) {
  for (int i = 3; i >= 0; --i) {
    if (s.v[i]) {
      int b = 63;
      while (!(s.v[i] >> b)) --b;
      return 64 * i + b + 1;
    }
  }
  return 0;
}

inline u32 scalar_window(const Fe &s, int bit, int width) {
  // bits [bit, bit+width) of the 256-bit scalar
  int limb = bit >> 6, off = bit & 63;
  u64 lo = s.v[limb] >> off;
  if (off + width > 64 && limb < 3) lo |= s.v[limb + 1] << (64 - off);
  return (u32)(lo & ((1u << width) - 1));
}

// Simple double-and-add (used for single muls).
template <typename F>
Jac<F> point_mul(const Aff<F> &p, const Fe &s) {
  Jac<F> acc = jac_identity<F>();
  int nb = scalar_bits(s);
  for (int i = nb - 1; i >= 0; --i) {
    jac_dbl(acc, acc);
    if ((s.v[i >> 6] >> (i & 63)) & 1) jac_madd(acc, acc, p);
  }
  return acc;
}

void run_threads(u64 n, int n_threads,
                 const std::function<void(int, u64, u64)> &fn) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if ((u64)n_threads > n) n_threads = (int)(n ? n : 1);
  std::vector<std::thread> ts;
  u64 chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    u64 lo = t * chunk, hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    ts.emplace_back(fn, t, lo, hi);
  }
  for (auto &t : ts) t.join();
}

// Pippenger MSM: points affine array, scalars standard-form.
template <typename F>
Jac<F> msm(const u64 *points, const u64 *scalars, u64 n, int point_words,
           int n_threads) {
  if (n == 0) return jac_identity<F>();
  int c = 4;
  if (n >= 32) {
    u64 m = n;
    int lg = 0;
    while (m >>= 1) ++lg;
    c = lg - 3;
    if (c < 4) c = 4;
    if (c > 16) c = 16;
  }
  int windows = (254 + c - 1) / c;
  std::vector<Jac<F>> win_sums(windows);

  // Parallelize over windows (each window walks all points).
  run_threads(windows, n_threads, [&](int, u64 wlo, u64 whi) {
    std::vector<Jac<F>> buckets((size_t)1 << c);
    for (u64 w = wlo; w < whi; ++w) {
      for (auto &b : buckets) b = jac_identity<F>();
      int bit = (int)w * c;
      for (u64 i = 0; i < n; ++i) {
        Fe s;
        memcpy(s.v, scalars + 4 * i, 32);
        u32 d = scalar_window(s, bit, c);
        if (!d) continue;
        Aff<F> p = load_point<F>(points, i);
        jac_madd(buckets[d], buckets[d], p);
      }
      // running-sum bucket reduction
      Jac<F> run = jac_identity<F>(), tot = jac_identity<F>();
      for (u64 d = ((u64)1 << c) - 1; d >= 1; --d) {
        jac_add(run, run, buckets[d]);
        jac_add(tot, tot, run);
      }
      win_sums[w] = tot;
    }
  });

  Jac<F> acc = jac_identity<F>();
  for (int w = windows - 1; w >= 0; --w) {
    for (int k = 0; k < c; ++k) jac_dbl(acc, acc);
    jac_add(acc, acc, win_sums[w]);
  }
  return acc;
}

// Field-generic inverse dispatch (for batch normalization).
inline void f_inv(Fe &o, const Fe &a) { inv(FQ, o, a); }
inline void f_inv(Fe2 &o, const Fe2 &a) { f2_inv(o, a); }

// Batch Jacobian -> affine via Montgomery's trick; writes out[base_idx+i].
template <typename F>
void batch_to_aff(const Jac<F> *pts, u64 n, u64 *out, u64 base_idx) {
  using O = FieldOps<F>;
  std::vector<F> prefix(n);
  F acc = O::one();
  for (u64 i = 0; i < n; ++i) {
    prefix[i] = acc;
    if (!pts[i].is_inf()) O::mul(acc, acc, pts[i].z);
  }
  F inv_acc;
  f_inv(inv_acc, acc);
  for (u64 i = n; i-- > 0;) {
    Aff<F> a;
    if (pts[i].is_inf()) {
      a = Aff<F>{O::zero(), O::zero(), true};
    } else {
      F zi;
      O::mul(zi, inv_acc, prefix[i]);
      O::mul(inv_acc, inv_acc, pts[i].z);
      F zi2, zi3;
      O::sqr(zi2, zi);
      O::mul(zi3, zi2, zi);
      O::mul(a.x, pts[i].x, zi2);
      O::mul(a.y, pts[i].y, zi3);
      a.inf = false;
    }
    store_point<F>(out, base_idx + i, a);
  }
}

// Fixed-base multi-scalar: out[i] = scalars[i] * base, window tables.
template <typename F>
void fixed_msm(const Aff<F> &base, const u64 *scalars, u64 n, u64 *out,
               int point_words, int n_threads) {
  constexpr int W = 8;
  int windows = (254 + W - 1) / W;
  // table[w][d] = d * 2^(wW) * base, affine-normalized lazily (keep Jacobian)
  std::vector<std::vector<Jac<F>>> table(windows);
  Jac<F> cur = to_jac(base);
  for (int w = 0; w < windows; ++w) {
    table[w].resize(1 << W);
    table[w][0] = jac_identity<F>();
    for (int d = 1; d < (1 << W); ++d) jac_add(table[w][d], table[w][d - 1], cur);
    cur = table[w][(1 << W) - 1];
    Jac<F> base_next;
    jac_add(base_next, cur, table[w][1]);
    cur = base_next;  // 2^((w+1)W) * base
  }
  run_threads(n, n_threads, [&](int, u64 lo, u64 hi) {
    // accumulate Jacobian, then batch-normalize the chunk (Montgomery's
    // trick) — one field inversion per chunk instead of one per point
    std::vector<Jac<F>> accs(hi - lo);
    for (u64 i = lo; i < hi; ++i) {
      Fe s;
      memcpy(s.v, scalars + 4 * i, 32);
      Jac<F> acc = jac_identity<F>();
      for (int w = 0; w < windows; ++w) {
        u32 d = scalar_window(s, w * W, W);
        if (d) jac_add(acc, acc, table[w][d]);
      }
      accs[i - lo] = acc;
    }
    batch_to_aff<F>(accs.data(), hi - lo, out, lo);
  });
}

// ---------------------------------------------------------------------------
// Fr NTT (in-place, natural order in / natural order out)
// ---------------------------------------------------------------------------

static void fr_ntt(u64 *data, u64 n, const u64 *root_m) {
  // bit-reversal permutation
  for (u64 i = 1, j = 0; i < n; ++i) {
    u64 bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      Fe t;
      memcpy(t.v, data + 4 * i, 32);
      memcpy(data + 4 * i, data + 4 * j, 32);
      memcpy(data + 4 * j, t.v, 32);
    }
  }
  Fe root;
  memcpy(root.v, root_m, 32);
  // stage twiddle tables
  for (u64 len = 2; len <= n; len <<= 1) {
    // w = root^(n/len)
    Fe w = root;
    for (u64 m = n; m > len; m >>= 1) mul(FR, w, w, w);
    u64 half = len >> 1;
    std::vector<Fe> tw(half);
    tw[0] = FR.one;
    for (u64 k = 1; k < half; ++k) mul(FR, tw[k], tw[k - 1], w);
    for (u64 i = 0; i < n; i += len) {
      for (u64 k = 0; k < half; ++k) {
        Fe a, b, t;
        memcpy(a.v, data + 4 * (i + k), 32);
        memcpy(b.v, data + 4 * (i + k + half), 32);
        mul(FR, t, b, tw[k]);
        Fe s, d;
        add(FR, s, a, t);
        sub(FR, d, a, t);
        memcpy(data + 4 * (i + k), s.v, 32);
        memcpy(data + 4 * (i + k + half), d.v, 32);
      }
    }
  }
}

}  // namespace bn254

extern "C" {

using namespace bn254;

void bn254_init(const u64 *fq_mod, u64 fq_np, const u64 *fq_r2,
                const u64 *fq_one, const u64 *fr_mod, u64 fr_np,
                const u64 *fr_r2, const u64 *fr_one) {
  memcpy(FQ.mod.v, fq_mod, 32);
  FQ.nprime = fq_np;
  memcpy(FQ.r2.v, fq_r2, 32);
  memcpy(FQ.one.v, fq_one, 32);
  memcpy(FR.mod.v, fr_mod, 32);
  FR.nprime = fr_np;
  memcpy(FR.r2.v, fr_r2, 32);
  memcpy(FR.one.v, fr_one, 32);
}

// --- Fr batch helpers (all values Montgomery unless noted) ---

void bn254_fr_to_mont(const u64 *in, u64 *out, u64 n) {
  for (u64 i = 0; i < n; ++i) {
    Fe a, o;
    memcpy(a.v, in + 4 * i, 32);
    to_mont(FR, o, a);
    memcpy(out + 4 * i, o.v, 32);
  }
}

void bn254_fr_from_mont(const u64 *in, u64 *out, u64 n) {
  for (u64 i = 0; i < n; ++i) {
    Fe a, o;
    memcpy(a.v, in + 4 * i, 32);
    from_mont(FR, o, a);
    memcpy(out + 4 * i, o.v, 32);
  }
}

void bn254_fr_vec_mul(const u64 *a, const u64 *b, u64 *out, u64 n) {
  for (u64 i = 0; i < n; ++i) {
    Fe x, y, o;
    memcpy(x.v, a + 4 * i, 32);
    memcpy(y.v, b + 4 * i, 32);
    mul(FR, o, x, y);
    memcpy(out + 4 * i, o.v, 32);
  }
}

void bn254_fr_vec_sub(const u64 *a, const u64 *b, u64 *out, u64 n) {
  for (u64 i = 0; i < n; ++i) {
    Fe x, y, o;
    memcpy(x.v, a + 4 * i, 32);
    memcpy(y.v, b + 4 * i, 32);
    sub(FR, o, x, y);
    memcpy(out + 4 * i, o.v, 32);
  }
}

void bn254_fr_vec_scale(const u64 *a, const u64 *s, u64 *out, u64 n) {
  Fe k;
  memcpy(k.v, s, 32);
  for (u64 i = 0; i < n; ++i) {
    Fe x, o;
    memcpy(x.v, a + 4 * i, 32);
    mul(FR, o, x, k);
    memcpy(out + 4 * i, o.v, 32);
  }
}

// out[i] = base^i (Montgomery), i in [0, n)
void bn254_fr_powers(const u64 *base, u64 *out, u64 n) {
  Fe b, acc = FR.one;
  memcpy(b.v, base, 32);
  for (u64 i = 0; i < n; ++i) {
    memcpy(out + 4 * i, acc.v, 32);
    mul(FR, acc, acc, b);
  }
}

void bn254_fr_inv(const u64 *a, u64 *out) {
  Fe x, o;
  memcpy(x.v, a, 32);
  inv(FR, o, x);
  memcpy(out, o.v, 32);
}

// Batch inversion (Montgomery's trick); zeros stay zero.
void bn254_fr_batch_inv(u64 *a, u64 n) {
  std::vector<Fe> prefix(n);
  Fe acc = FR.one;
  for (u64 i = 0; i < n; ++i) {
    prefix[i] = acc;
    Fe x;
    memcpy(x.v, a + 4 * i, 32);
    if (!fe_is_zero(x)) mul(FR, acc, acc, x);
  }
  Fe inv_acc;
  inv(FR, inv_acc, acc);
  for (u64 i = n; i-- > 0;) {
    Fe x;
    memcpy(x.v, a + 4 * i, 32);
    if (fe_is_zero(x)) continue;
    Fe o;
    mul(FR, o, inv_acc, prefix[i]);
    mul(FR, inv_acc, inv_acc, x);
    memcpy(a + 4 * i, o.v, 32);
  }
}

void bn254_fr_ntt(u64 *data, u64 n, const u64 *root_m) {
  fr_ntt(data, n, root_m);
}

// Sparse matvec: out[row] += coeff * w[col].  Entries sorted or not; out
// must be zero-initialized by the caller.  coeffs and w Montgomery.
void bn254_fr_spmv(const u32 *rows, const u32 *cols, const u64 *coeffs,
                   u64 nnz, const u64 *w, u64 *out) {
  for (u64 k = 0; k < nnz; ++k) {
    Fe c, x, t, o;
    memcpy(c.v, coeffs + 4 * k, 32);
    memcpy(x.v, w + 4 * (u64)cols[k], 32);
    mul(FR, t, c, x);
    memcpy(o.v, out + 4 * (u64)rows[k], 32);
    add(FR, o, o, t);
    memcpy(out + 4 * (u64)rows[k], o.v, 32);
  }
}

// QAP eval accumulate: out[col] += coeff * L[row] (all Montgomery).
void bn254_fr_qap(const u32 *rows, const u32 *cols, const u64 *coeffs,
                  u64 nnz, const u64 *L, u64 *out) {
  for (u64 k = 0; k < nnz; ++k) {
    Fe c, l, t, o;
    memcpy(c.v, coeffs + 4 * k, 32);
    memcpy(l.v, L + 4 * (u64)rows[k], 32);
    mul(FR, t, c, l);
    memcpy(o.v, out + 4 * (u64)cols[k], 32);
    add(FR, o, o, t);
    memcpy(out + 4 * (u64)cols[k], o.v, 32);
  }
}

// --- Curve ops ---

// G1 variable-base MSM: points (n,8) mont affine, scalars (n,4) STANDARD.
void bn254_g1_msm(const u64 *points, const u64 *scalars, u64 n, u64 *out,
                  int n_threads) {
  Jac<Fe> r = msm<Fe>(points, scalars, n, 8, n_threads);
  Aff<Fe> a = to_aff(r);
  store_g1(out, a);
}

void bn254_g2_msm(const u64 *points, const u64 *scalars, u64 n, u64 *out,
                  int n_threads) {
  Jac<Fe2> r = msm<Fe2>(points, scalars, n, 16, n_threads);
  Aff<Fe2> a = to_aff(r);
  store_g2(out, a);
}

// Fixed-base: out[i] = scalars[i] * base.
void bn254_g1_fixed_msm(const u64 *base, const u64 *scalars, u64 n, u64 *out,
                        int n_threads) {
  fixed_msm<Fe>(load_g1(base), scalars, n, out, 8, n_threads);
}

void bn254_g2_fixed_msm(const u64 *base, const u64 *scalars, u64 n, u64 *out,
                        int n_threads) {
  fixed_msm<Fe2>(load_g2(base), scalars, n, out, 16, n_threads);
}

void bn254_g1_add(const u64 *p, const u64 *q, u64 *out) {
  Jac<Fe> r;
  jac_add(r, to_jac(load_g1(p)), to_jac(load_g1(q)));
  Aff<Fe> a = to_aff(r);
  store_g1(out, a);
}

void bn254_g2_add(const u64 *p, const u64 *q, u64 *out) {
  Jac<Fe2> r;
  jac_add(r, to_jac(load_g2(p)), to_jac(load_g2(q)));
  Aff<Fe2> a = to_aff(r);
  store_g2(out, a);
}

void bn254_g1_mul(const u64 *p, const u64 *s, u64 *out) {
  Fe k;
  memcpy(k.v, s, 32);
  Jac<Fe> r = point_mul(load_g1(p), k);
  Aff<Fe> a = to_aff(r);
  store_g1(out, a);
}

void bn254_g2_mul(const u64 *p, const u64 *s, u64 *out) {
  Fe k;
  memcpy(k.v, s, 32);
  Jac<Fe2> r = point_mul(load_g2(p), k);
  Aff<Fe2> a = to_aff(r);
  store_g2(out, a);
}

}  // extern "C"

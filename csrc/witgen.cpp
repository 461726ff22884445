// rv32im witness-generation bytecode interpreter.
//
// Executes the bytecode extracted by scripts/extract_witgen.py from the
// reference's generated witgen (risc0/circuit/rv32im-sys/kernels/cxx/
// steps.cpp).  Mirrors the reference driver semantics (kernels/cxx/ffi.cpp:
// risc0_circuit_rv32im_cpu_witgen / _accum): data buffers are column-major
// [col * rows + row], cells start INVALID, stores are write-once-consistent,
// rows run in parallel in two phases split at tableSplitCycle.
//
// Field arithmetic is plain BabyBear (standard form, not Montgomery): the
// generated code compares/bit-twiddles raw values (to_size_t, bitAnd,
// inRange), so standard form is the natural representation here.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <array>
#include <memory>
#include <cstring>
#include <stdexcept>
#include <string>
#include <thread>
#include <vector>

namespace r0wg {

constexpr uint32_t P = 15 * (1u << 27) + 1;  // 2013265921
constexpr uint32_t INVALID = 0xffffffffu;

inline uint32_t fp_add(uint32_t a, uint32_t b) {
  uint32_t r = a + b;
  return r >= P ? r - P : r;
}
inline uint32_t fp_sub(uint32_t a, uint32_t b) {
  return a >= b ? a - b : a + P - b;
}
inline uint32_t fp_mul(uint32_t a, uint32_t b) {
  return (uint32_t)((uint64_t)a * b % P);
}
inline uint32_t fp_pow(uint32_t a, uint32_t e) {
  uint32_t r = 1;
  while (e) {
    if (e & 1) r = fp_mul(r, a);
    a = fp_mul(a, a);
    e >>= 1;
  }
  return r;
}
inline uint32_t fp_inv(uint32_t a) { return fp_pow(a, P - 2); }

// BabyBear ext field x^4 + 11 (NBETA = P - 11), matching risc0 fpext.h
constexpr uint32_t BETA = 11;
constexpr uint32_t NBETA = P - 11;

inline void ext_mul(const uint32_t* a, const uint32_t* b, uint32_t* o) {
  // schoolbook with reduction by x^4 = NBETA (x^4 + 11 irreducible)
  uint32_t r0 = fp_add(fp_mul(a[0], b[0]),
                fp_mul(NBETA, fp_add(fp_add(fp_mul(a[1], b[3]),
                                            fp_mul(a[2], b[2])),
                                     fp_mul(a[3], b[1]))));
  uint32_t r1 = fp_add(fp_add(fp_mul(a[0], b[1]), fp_mul(a[1], b[0])),
                fp_mul(NBETA, fp_add(fp_mul(a[2], b[3]),
                                     fp_mul(a[3], b[2]))));
  uint32_t r2 = fp_add(fp_add(fp_mul(a[0], b[2]), fp_mul(a[1], b[1])),
                fp_add(fp_mul(a[2], b[0]),
                       fp_mul(NBETA, fp_mul(a[3], b[3]))));
  uint32_t r3 = fp_add(fp_add(fp_mul(a[0], b[3]), fp_mul(a[1], b[2])),
                fp_add(fp_mul(a[2], b[1]), fp_mul(a[3], b[0])));
  o[0] = r0; o[1] = r1; o[2] = r2; o[3] = r3;
}

inline void ext_inv(const uint32_t* a, uint32_t* o) {
  // composite-field inverse, matching risc0_tpu/field.py ext_inv_np
  // (reference baby_bear.rs:448-481)
  uint32_t b0 = fp_add(fp_mul(a[0], a[0]),
                       fp_mul(BETA, fp_sub(fp_mul(a[1], fp_add(a[3], a[3])),
                                           fp_mul(a[2], a[2]))));
  uint32_t b2 = fp_add(fp_sub(fp_mul(a[0], fp_add(a[2], a[2])),
                              fp_mul(a[1], a[1])),
                       fp_mul(BETA, fp_mul(a[3], a[3])));
  uint32_t c = fp_add(fp_mul(b0, b0), fp_mul(BETA, fp_mul(b2, b2)));
  uint32_t ic = fp_inv(c);
  b0 = fp_mul(b0, ic);
  b2 = fp_mul(b2, ic);
  o[0] = fp_add(fp_mul(a[0], b0), fp_mul(BETA, fp_mul(a[2], b2)));
  o[1] = fp_add(fp_mul(fp_sub(0, a[1]), b0), fp_mul(NBETA, fp_mul(a[3], b2)));
  o[2] = fp_add(fp_mul(fp_sub(0, a[0]), b2), fp_mul(a[2], b0));
  o[3] = fp_sub(fp_mul(a[1], b2), fp_mul(a[3], b0));
}

// Opcodes — must match scripts/extract_witgen.py OPS order.
enum Op : uint32_t {
  CONST, ADD, SUB, MUL, NEG, ISZ, INV, BITAND, MOD, INRANGE, LOAD, STORE,
  ELOAD, ESTORE, EADD, ESUB, EMUL, EINV, EMULS, EFROMVAL, ECONST, EEQZ,
  MOV, EMOV, EQZ, JZ, JMP, UNREACHABLE,
  X_GET_MAJOR_MINOR, X_GET_MEM_TXN, X_LOOKUP_DELTA, X_LOOKUP_CURRENT,
  X_MEMORY_DELTA, X_GET_DIFF_COUNT, X_IS_FIRST_CYCLE, X_DIVIDE,
  X_HOST_READ_PREPARE, X_HOST_WRITE, X_NEXT_PAGING_IDX, X_BIGINT_EXTERN,
  NOP, GET_CYCLE, K_GET_PREIMAGE, K_NEXT_PREIMAGE,
};

struct WitgenCtx {
  // preflight (flat arrays as produced by r0_preflight_segment)
  const uint32_t* cycles;  // n x 11: state,pc,major,minor,mm,uc,txn,pg,bi,d0,d1
  uint64_t num_cycles;
  const uint32_t* txns;    // m x 5: addr,cycle,word,prev_cycle,prev_word
  uint64_t num_txns;
  const uint32_t* bigint_bytes;
  uint64_t num_bigint_bytes;

  // keccak circuit preflight (reference keccak-sys kernels/cxx/witgen.h:39)
  const uint32_t* k_preimages = nullptr;  // (n, 100) 16-bit chunks
  const uint32_t* k_cur = nullptr;        // per-row preimage index
  uint32_t k_num = 0;

  // buffers, column-major [col * rows + row]
  uint32_t* data;
  uint32_t* global;
  uint32_t* accum;
  const uint32_t* mix;
  uint64_t rows;
  uint32_t user_accum_split;  // zeroBack for the accum buffer

  // lookup tables
  std::unique_ptr<std::atomic<uint32_t>[]> tab8 =
      std::make_unique<std::atomic<uint32_t>[]>(256);
  std::unique_ptr<std::atomic<uint32_t>[]> tab16 =
      std::make_unique<std::atomic<uint32_t>[]>(65536);
  WitgenCtx() {
    for (int i = 0; i < 256; i++) tab8[i] = 0;
    for (int i = 0; i < 65536; i++) tab16[i] = 0;
  }
};

struct RowError {
  std::string msg;
};

// reference kernels/cxx/ffi.cpp:33 divide_rv32im
inline void divide_rv32im(uint32_t numer, uint32_t denom, uint32_t sign_type,
                          uint32_t& quot, uint32_t& rem) {
  uint32_t ones_comp = (sign_type == 2);
  bool neg_numer = sign_type && (int32_t)numer < 0;
  bool neg_denom = sign_type == 1 && (int32_t)denom < 0;
  if (neg_numer) numer = -numer - ones_comp;
  if (neg_denom) denom = -denom - ones_comp;
  if (denom == 0) {
    quot = 0xffffffff;
    rem = numer;
  } else {
    quot = numer / denom;
    rem = numer % denom;
  }
  uint32_t quot_neg = (neg_numer ^ neg_denom) - ((denom == 0) && neg_numer);
  if (quot_neg) quot = -quot - ones_comp;
  if (neg_numer) rem = -rem - ones_comp;
}

class Interp {
 public:
  Interp(const uint32_t* ops, uint64_t n_ops, uint32_t n_slots,
         const uint32_t* extconsts, WitgenCtx& ctx)
      : ops_(ops), n_ops_(n_ops), ext_(extconsts), ctx_(ctx) {
    slots_.resize(n_slots);
  }

  uint32_t buf_load(uint32_t buf, uint32_t col, uint32_t back, uint64_t row) {
    uint64_t rows = ctx_.rows;
    uint32_t* b;
    switch (buf) {
      case 0: b = ctx_.data; break;
      case 1: return ctx_.global[col];
      case 2:
        if (ctx_.user_accum_split && col > ctx_.user_accum_split && back > 0)
          return 0;
        b = ctx_.accum;
        break;
      default: return ctx_.mix[col];
    }
    uint64_t r = (rows + row - back) % rows;
    uint32_t v = b[(uint64_t)col * rows + r];
    if (v == INVALID)
      throw std::runtime_error("witgen: read of unset value col " +
                               std::to_string(col) + " back " +
                               std::to_string(back) + " row " +
                               std::to_string(row));
    return v;
  }

  void buf_store(uint32_t buf, uint32_t col, uint32_t val, uint64_t row) {
    uint32_t* b;
    uint64_t idx;
    switch (buf) {
      case 0: b = ctx_.data; idx = (uint64_t)col * ctx_.rows + row; break;
      case 1: b = ctx_.global; idx = col; break;
      case 2: b = ctx_.accum; idx = (uint64_t)col * ctx_.rows + row; break;
      default: throw std::runtime_error("witgen: store to mix");
    }
    uint32_t cur = b[idx];
    if (cur != INVALID && cur != val)
      throw std::runtime_error("witgen: inconsistent set col " +
                               std::to_string(col) + " row " +
                               std::to_string(row) + " cur " +
                               std::to_string(cur) + " new " +
                               std::to_string(val));
    b[idx] = val;
  }

  void run_row(uint64_t row) {
    uint32_t* s = slots_.data();
    static const uint32_t kNoCyc[11] = {0};
    const uint32_t* cyc = ctx_.cycles ? ctx_.cycles + row * 11 : kNoCyc;
    uint32_t txn_cursor = cyc[6];
    uint64_t pc = 0;
    while (pc < n_ops_) {
      const uint32_t* o = ops_ + pc * 5;
      uint32_t op = o[0], dst = o[1], a = o[2], b = o[3], c = o[4];
      switch (op) {
        case CONST: s[dst] = a; break;
        case ADD: s[dst] = fp_add(s[a], s[b]); break;
        case SUB: s[dst] = fp_sub(s[a], s[b]); break;
        case MUL: s[dst] = fp_mul(s[a], s[b]); break;
        case NEG: s[dst] = s[a] == 0 ? 0 : P - s[a]; break;
        case ISZ: s[dst] = s[a] == 0; break;
        case INV: s[dst] = fp_inv(s[a]); break;
        case BITAND: s[dst] = s[a] & s[b]; break;
        case MOD: s[dst] = s[b] ? s[a] % s[b] : 0; break;
        case INRANGE: s[dst] = (s[a] <= s[b] && s[b] < s[c]); break;
        case LOAD: s[dst] = buf_load(c, a, b, row); break;
        case STORE: buf_store(c, a, s[b], row); break;
        case ELOAD:
          for (int i = 0; i < 4; i++)
            s[dst + i] = buf_load(c, a + i, b, row);
          break;
        case ESTORE:
          for (int i = 0; i < 4; i++)
            buf_store(c, a + i, s[b + i], row);
          break;
        case EADD:
          for (int i = 0; i < 4; i++) s[dst + i] = fp_add(s[a + i], s[b + i]);
          break;
        case ESUB:
          for (int i = 0; i < 4; i++) s[dst + i] = fp_sub(s[a + i], s[b + i]);
          break;
        case EMUL: ext_mul(s + a, s + b, s + dst); break;
        case EINV: ext_inv(s + a, s + dst); break;
        case EMULS:
          for (int i = 0; i < 4; i++) s[dst + i] = fp_mul(s[a + i], s[b]);
          break;
        case EFROMVAL:
          s[dst] = s[a];
          s[dst + 1] = s[dst + 2] = s[dst + 3] = 0;
          break;
        case ECONST:
          for (int i = 0; i < 4; i++) s[dst + i] = ext_[a * 4 + i];
          break;
        case EEQZ:
          for (int i = 0; i < 4; i++)
            if (s[a + i])
              throw std::runtime_error("witgen: eqz(ext) failed, loc " +
                                       std::to_string(b) + " row " +
                                       std::to_string(row));
          break;
        case MOV: s[dst] = s[a]; break;
        case EMOV:
          for (int i = 0; i < 4; i++) s[dst + i] = s[a + i];
          break;
        case EQZ:
          if (s[a])
            throw std::runtime_error("witgen: eqz failed, loc " +
                                     std::to_string(b) + " row " +
                                     std::to_string(row) + " val " +
                                     std::to_string(s[a]));
          break;
        case JZ:
          if (s[a] == 0) { pc = b; continue; }
          break;
        case JMP: pc = b; continue;
        case UNREACHABLE:
          throw std::runtime_error("witgen: unreachable mux arm, row " +
                                   std::to_string(row));
        case X_GET_MAJOR_MINOR:
          s[dst] = cyc[2];
          s[dst + 1] = cyc[3];
          break;
        case X_GET_MEM_TXN: {
          // reference ffi.cpp:62 extern_getMemoryTxn (cursor advances)
          uint32_t addr = s[a];
          if (txn_cursor >= ctx_.num_txns)
            throw std::runtime_error("witgen: txn cursor overflow row " +
                                     std::to_string(row));
          const uint32_t* t = ctx_.txns + (uint64_t)txn_cursor * 5;
          txn_cursor++;
          if (t[1] / 2 != row)
            throw std::runtime_error("witgen: txn cycle mismatch row " +
                                     std::to_string(row) + " txn cycle " +
                                     std::to_string(t[1]));
          if (t[0] != addr)
            throw std::runtime_error(
                "witgen: txn addr mismatch row " + std::to_string(row) +
                " expected " + std::to_string(t[0]) + " got " +
                std::to_string(addr));
          s[dst] = t[3];                 // prevCycle
          s[dst + 1] = t[4] & 0xffff;    // prevWord low
          s[dst + 2] = t[4] >> 16;
          s[dst + 3] = t[2] & 0xffff;    // word low
          s[dst + 4] = t[2] >> 16;
          break;
        }
        case X_LOOKUP_DELTA: {
          uint32_t table = s[a], index = s[b];
          if (table == 0) break;  // cycle table ignored (ffi tables.h:22)
          if (table != 8 && table != 16)
            throw std::runtime_error("witgen: invalid lookup table");
          if (index >= (1u << table))
            throw std::runtime_error("witgen: lookup index out of range: "
                                     "table " + std::to_string(table) +
                                     " index " + std::to_string(index) +
                                     " row " + std::to_string(row));
          if (table == 8) ctx_.tab8[index]++; else ctx_.tab16[index]++;
          break;
        }
        case X_LOOKUP_CURRENT: {
          uint32_t table = s[a], index = s[b];
          s[dst] = table == 8 ? ctx_.tab8[index].load()
                              : ctx_.tab16[index].load();
          break;
        }
        case X_MEMORY_DELTA: break;
        case X_GET_DIFF_COUNT: {
          uint32_t cu = s[a];
          s[dst] = ctx_.cycles[(uint64_t)(cu / 2) * 11 + 9 + cu % 2];
          break;
        }
        case X_IS_FIRST_CYCLE: s[dst] = row == 0; break;
        case X_DIVIDE: {
          uint32_t numer = s[a] | (s[b & 0xffff] << 16);
          uint32_t denom = s[b >> 16] | (s[c & 0xffff] << 16);
          uint32_t quot, rem;
          divide_rv32im(numer, denom, s[c >> 16], quot, rem);
          s[dst] = quot & 0xffff;
          s[dst + 1] = quot >> 16;
          s[dst + 2] = rem & 0xffff;
          s[dst + 3] = rem >> 16;
          break;
        }
        case X_HOST_READ_PREPARE: {
          // reference ffi.cpp:201 (does not advance the cursor)
          const uint32_t* t = ctx_.txns + (uint64_t)txn_cursor * 5;
          s[dst] = t[2];
          break;
        }
        case X_HOST_WRITE: {
          const uint32_t* t = ctx_.txns + (uint64_t)txn_cursor * 5;
          s[dst] = t[2];
          break;
        }
        case X_NEXT_PAGING_IDX:
          s[dst] = cyc[7];
          s[dst + 1] = cyc[4];
          break;
        case X_BIGINT_EXTERN: {
          uint32_t bi = cyc[8];
          for (int i = 0; i < 16; i++)
            s[dst + i] = ctx_.bigint_bytes[bi + i];
          break;
        }
        case NOP: break;
        case GET_CYCLE: s[dst] = (uint32_t)row; break;
        case K_GET_PREIMAGE: {
          // reference keccak ffi.cpp:62 (idx -> 16-bit chunk of state)
          uint32_t pi = ctx_.k_cur[row];
          s[dst] = ctx_.k_preimages[(uint64_t)pi * 100 + s[a]];
          break;
        }
        case K_NEXT_PREIMAGE:
          s[dst] = ctx_.k_cur[row] != ctx_.k_num;
          break;
        default:
          throw std::runtime_error("witgen: bad opcode " + std::to_string(op));
      }
      pc++;
    }
  }

 private:
  const uint32_t* ops_;
  uint64_t n_ops_;
  const uint32_t* ext_;
  WitgenCtx& ctx_;
  std::vector<uint32_t> slots_;
};

static void run_range(const uint32_t* ops, uint64_t n_ops, uint32_t n_slots,
                      const uint32_t* ext, WitgenCtx& ctx, uint64_t lo,
                      uint64_t hi, std::string* err) {
  try {
    Interp interp(ops, n_ops, n_slots, ext, ctx);
    for (uint64_t r = lo; r < hi; r++) interp.run_row(r);
  } catch (const std::exception& e) {
    *err = e.what();
  }
}

static void run_phase(const uint32_t* ops, uint64_t n_ops, uint32_t n_slots,
                      const uint32_t* ext, WitgenCtx& ctx, uint64_t lo,
                      uint64_t hi, unsigned n_threads) {
  if (hi <= lo) return;
  uint64_t total = hi - lo;
  unsigned nt = n_threads ? n_threads : 1;
  if (total < 256) nt = 1;
  std::vector<std::thread> threads;
  std::vector<std::string> errs(nt);
  uint64_t chunk = (total + nt - 1) / nt;
  for (unsigned t = 0; t < nt; t++) {
    uint64_t a = lo + t * chunk;
    uint64_t b = std::min(hi, a + chunk);
    if (a >= b) break;
    threads.emplace_back(run_range, ops, n_ops, n_slots, ext, std::ref(ctx),
                         a, b, &errs[t]);
  }
  for (auto& th : threads) th.join();
  for (auto& e : errs)
    if (!e.empty()) throw std::runtime_error(e);
}

}  // namespace r0wg

extern "C" {

extern thread_local std::string g_witgen_error_storage;
thread_local std::string g_witgen_error_storage;

const char* r0_witgen_error() { return g_witgen_error_storage.c_str(); }

// Run the exec program over all rows (two phases split at table_split),
// then optionally the accum program over all rows.
// program blobs: ops = n_ops x 5 u32, extconsts = n_ext x 4 u32.
int r0_witgen_run(
    const uint32_t* ops, uint64_t n_ops, uint32_t n_slots,
    const uint32_t* extconsts,
    const uint32_t* cycles, uint64_t num_cycles,
    const uint32_t* txns, uint64_t num_txns,
    const uint32_t* bigint_bytes, uint64_t num_bigint_bytes,
    uint32_t* data, uint32_t* global_buf, uint32_t* accum,
    const uint32_t* mix, uint32_t user_accum_split,
    uint32_t table_split, uint32_t* table_u8_out, uint32_t* table_u16_out,
    uint32_t n_threads,
    const uint32_t* k_preimages, const uint32_t* k_cur, uint32_t k_num) {
  try {
    r0wg::WitgenCtx ctx;
    ctx.cycles = cycles;
    ctx.num_cycles = num_cycles;
    ctx.txns = txns;
    ctx.num_txns = num_txns;
    ctx.bigint_bytes = bigint_bytes;
    ctx.num_bigint_bytes = num_bigint_bytes;
    ctx.data = data;
    ctx.global = global_buf;
    ctx.accum = accum;
    ctx.mix = mix;
    ctx.rows = num_cycles;
    ctx.user_accum_split = user_accum_split;
    ctx.k_preimages = k_preimages;
    ctx.k_cur = k_cur;
    ctx.k_num = k_num;
    unsigned nt = n_threads ? n_threads
                            : std::thread::hardware_concurrency();
    if (accum == nullptr) {
      // exec: two phases as in reference ffi.cpp kStepModeParallel
      r0wg::run_phase(ops, n_ops, n_slots, extconsts, ctx, 0, table_split,
                      nt);
      r0wg::run_phase(ops, n_ops, n_slots, extconsts, ctx, table_split,
                      num_cycles, nt);
      if (table_u8_out)
        for (int i = 0; i < 256; i++) table_u8_out[i] = ctx.tab8[i].load();
      if (table_u16_out)
        for (int i = 0; i < 65536; i++)
          table_u16_out[i] = ctx.tab16[i].load();
    } else {
      // accum: single parallel phase (reference ffi.cpp phase1)
      r0wg::run_phase(ops, n_ops, n_slots, extconsts, ctx, 0, num_cycles, nt);
    }
    return 0;
  } catch (const std::exception& e) {
    g_witgen_error_storage = e.what();
    return 1;
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Recursion circuit witgen (reference recursion-sys/kernels/cxx/{ffi,extern,
// context}.*): WOM argument recording + sorted permutation injection, iop
// reads, and the plonk accumulator with grand-product prefix scan.
// ---------------------------------------------------------------------------

namespace r0wg {

enum RecOp : uint32_t {
  R_WOM_READ = NOP + 4,  // after GET_CYCLE..K_NEXT_PREIMAGE
  R_IOP_BODY,
  R_PLONK_READ_WOM,
  R_PLONK_WRITE_WOM,
  R_PLONK_READ_ACCUM,
  R_PLONK_WRITE_ACCUM,
  LOADZ,
};

constexpr uint32_t kMaxWomRowsPerCycle = 9;

struct RecCtx {
  const uint32_t* wom;      // (num_wom, 4)
  uint32_t num_wom;
  const uint32_t* iops;     // (num_iops, 4)
  uint32_t num_iops;
  const uint32_t* iop_idx;  // per work cycle
  const uint32_t* par_safe; // per work cycle
  uint32_t work;            // number of program rows
  uint64_t steps;           // total rows (buffer stride)

  uint32_t* ctrl;
  uint32_t* global;
  uint32_t* data;
  const uint32_t* mix;
  uint32_t* accum;

  // wom argument state
  std::vector<std::array<uint32_t, 6>> wom_rows;  // addr, v0..3, cycle
  std::vector<uint32_t> wom_index;
  // plonk accum state (FpExt per work row)
  std::vector<std::array<uint32_t, 4>> accum_rows;
};

class RecInterp {
 public:
  RecInterp(const uint32_t* ops, uint64_t n_ops, uint32_t n_slots,
            RecCtx& ctx)
      : ops_(ops), n_ops_(n_ops), ctx_(ctx) {
    slots_.resize(n_slots);
  }

  uint32_t* buf(uint32_t id) {
    switch (id) {
      case 0: return ctx_.data;
      case 1: return ctx_.global;
      case 2: return ctx_.accum;
      case 4: return ctx_.ctrl;
      default: return nullptr;  // 3 = mix (const)
    }
  }

  uint32_t load(uint32_t bufid, uint32_t col, uint32_t back, uint64_t row,
                bool zero_default) {
    if (bufid == 3) return ctx_.mix[col];
    if (bufid == 1) {
      uint32_t v = ctx_.global[col];
      if (v == INVALID) {
        if (zero_default) return 0;
        throw std::runtime_error("rec witgen: unset global read col " +
                                 std::to_string(col));
      }
      return v;
    }
    uint64_t r = (ctx_.steps + row - back) % ctx_.steps;
    uint32_t v = buf(bufid)[(uint64_t)col * ctx_.steps + r];
    if (v == INVALID) {
      if (zero_default) return 0;
      throw std::runtime_error("rec witgen: unset read buf " +
                               std::to_string(bufid) + " col " +
                               std::to_string(col) + " back " +
                               std::to_string(back) + " row " +
                               std::to_string(row));
    }
    return v;
  }

  void store(uint32_t bufid, uint32_t col, uint32_t val, uint64_t row) {
    uint32_t* b = buf(bufid);
    uint64_t idx = bufid == 1 ? col : (uint64_t)col * ctx_.steps + row;
    uint32_t cur = b[idx];
    if (cur != INVALID && cur != val)
      throw std::runtime_error("rec witgen: inconsistent set buf " +
                               std::to_string(bufid) + " col " +
                               std::to_string(col) + " row " +
                               std::to_string(row) + " cur " +
                               std::to_string(cur) + " new " +
                               std::to_string(val));
    b[idx] = val;
  }

  void run_row(uint64_t row) {
    uint32_t* s = slots_.data();
    uint32_t iop_cursor = ctx_.iop_idx ? ctx_.iop_idx[row] : 0;
    uint32_t wom_cursor_r = ctx_.wom_index.empty() ? 0 : ctx_.wom_index[row];
    uint64_t pc = 0;
    while (pc < n_ops_) {
      const uint32_t* o = ops_ + pc * 5;
      uint32_t op = o[0], dst = o[1], a = o[2], b = o[3], c = o[4];
      switch (op) {
        case CONST: s[dst] = a; break;
        case ADD: s[dst] = fp_add(s[a], s[b]); break;
        case SUB: s[dst] = fp_sub(s[a], s[b]); break;
        case MUL: s[dst] = fp_mul(s[a], s[b]); break;
        case NEG: s[dst] = s[a] == 0 ? 0 : P - s[a]; break;
        case ISZ: s[dst] = s[a] == 0; break;
        case INV: s[dst] = fp_inv(s[a]); break;
        case BITAND: s[dst] = s[a] & s[b]; break;
        case LOAD: s[dst] = load(c, a, b, row, false); break;
        case LOADZ: s[dst] = load(c, a, b, row, true); break;
        case STORE: store(c, a, s[b], row); break;
        case MOV: s[dst] = s[a]; break;
        case EQZ:
          if (s[a])
            throw std::runtime_error("rec witgen: eqz failed, loc " +
                                     std::to_string(b) + " row " +
                                     std::to_string(row));
          break;
        case JZ:
          if (s[a] == 0) { pc = b; continue; }
          break;
        case JMP: pc = b; continue;
        case UNREACHABLE:
          throw std::runtime_error("rec witgen: unreachable, row " +
                                   std::to_string(row));
        case R_WOM_READ: {
          uint32_t addr = s[a];
          if (addr >= ctx_.num_wom)
            throw std::runtime_error("rec witgen: wom read out of range");
          for (int i = 0; i < 4; i++)
            s[dst + i] = ctx_.wom[(uint64_t)addr * 4 + i];
          break;
        }
        case R_IOP_BODY: {
          if (iop_cursor >= ctx_.num_iops)
            throw std::runtime_error("rec witgen: iop cursor overflow");
          for (int i = 0; i < 4; i++)
            s[dst + i] = ctx_.iops[(uint64_t)iop_cursor * 4 + i];
          iop_cursor++;
          break;
        }
        case R_PLONK_WRITE_WOM: {
          uint32_t idx = ctx_.wom_index[row]++;
          if (idx >= kMaxWomRowsPerCycle)
            throw std::runtime_error("rec witgen: wom rows overflow");
          auto& wr = ctx_.wom_rows[row * kMaxWomRowsPerCycle + idx];
          wr = {s[a], s[b & 0xffff], s[b >> 16], s[c & 0xffff],
                s[c >> 16], (uint32_t)row};
          if (getenv("R0_WOM_TRACE")) {
            uint32_t lo = atoi(getenv("R0_WOM_TRACE"));
            if (row >= lo && row < lo + 16)
              fprintf(stderr, "womWrite cycle=%llu idx=%u addr=%u data=(%u,%u,%u,%u)\n",
                      (unsigned long long)row, idx, wr[0], wr[1], wr[2], wr[3], wr[4]);
          }
          break;
        }
        case R_PLONK_READ_WOM: {
          if (wom_cursor_r >= ctx_.wom_rows.size())
            throw std::runtime_error("rec witgen: plonk read overflow row " +
                                     std::to_string(row));
          const auto& wr = ctx_.wom_rows[wom_cursor_r++];
          for (int i = 0; i < 5; i++) s[dst + i] = wr[i];
          break;
        }
        case R_PLONK_WRITE_ACCUM:
          ctx_.accum_rows[row] = {s[a & 0xffff], s[a >> 16], s[b & 0xffff],
                                  s[b >> 16]};
          break;
        case R_PLONK_READ_ACCUM:
          for (int i = 0; i < 4; i++) s[dst + i] = ctx_.accum_rows[row][i];
          break;
        case NOP: break;
        default:
          throw std::runtime_error("rec witgen: bad opcode " +
                                   std::to_string(op));
      }
      pc++;
    }
  }

 private:
  const uint32_t* ops_;
  uint64_t n_ops_;
  RecCtx& ctx_;
  std::vector<uint32_t> slots_;
};

// run rows [0, work) honoring par-safe chains: a chain starts at a par-safe
// row and runs until the next par-safe row (reference ffi.cpp parStepExec)
static void rec_run_chained(const uint32_t* ops, uint64_t n_ops,
                            uint32_t n_slots, RecCtx& ctx,
                            unsigned n_threads) {
  std::vector<uint32_t> starts;
  for (uint32_t c = 0; c < ctx.work; c++)
    if (c == 0 || ctx.par_safe[c]) {
      if (c == 0 || !ctx.par_safe[c - 1] || true) starts.push_back(c);
    }
  // dedupe consecutive starts is unnecessary: a chain is [start, next_start)
  std::vector<std::string> errs(n_threads);
  std::atomic<size_t> next{0};
  auto worker = [&](unsigned t) {
    try {
      RecInterp interp(ops, n_ops, n_slots, ctx);
      while (true) {
        size_t i = next.fetch_add(1);
        if (i >= starts.size()) break;
        uint32_t lo = starts[i];
        uint32_t hi = (i + 1 < starts.size()) ? starts[i + 1] : ctx.work;
        for (uint32_t c = lo; c < hi; c++) interp.run_row(c);
      }
    } catch (const std::exception& e) {
      errs[t] = e.what();
    }
  };
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < n_threads; t++) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();
  for (auto& e : errs)
    if (!e.empty()) throw std::runtime_error(e);
}

static void rec_run_flat(const uint32_t* ops, uint64_t n_ops,
                         uint32_t n_slots, RecCtx& ctx, unsigned n_threads) {
  std::vector<std::string> errs(n_threads);
  std::atomic<uint32_t> next{0};
  auto worker = [&](unsigned t) {
    try {
      RecInterp interp(ops, n_ops, n_slots, ctx);
      while (true) {
        uint32_t c = next.fetch_add(1);
        if (c >= ctx.work) break;
        interp.run_row(c);
      }
    } catch (const std::exception& e) {
      errs[t] = e.what();
    }
  };
  std::vector<std::thread> threads;
  for (unsigned t = 0; t < n_threads; t++) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();
  for (auto& e : errs)
    if (!e.empty()) throw std::runtime_error(e);
}

}  // namespace r0wg

extern "C" {

// Exec + WOM verify phases.  Buffers are column-major with stride `steps`.
int r0_rec_witgen(
    const uint32_t* exec_ops, uint64_t exec_n, uint32_t exec_slots,
    const uint32_t* vmem_ops, uint64_t vmem_n, uint32_t vmem_slots,
    const uint32_t* wom, uint32_t num_wom,
    const uint32_t* iops, uint32_t num_iops,
    const uint32_t* iop_idx, const uint32_t* par_safe, uint32_t work,
    uint32_t* ctrl, uint32_t* global_buf, uint32_t* data, uint64_t steps,
    uint32_t n_threads) {
  using namespace r0wg;
  try {
    RecCtx ctx;
    ctx.wom = wom; ctx.num_wom = num_wom;
    ctx.iops = iops; ctx.num_iops = num_iops;
    ctx.iop_idx = iop_idx; ctx.par_safe = par_safe;
    ctx.work = work; ctx.steps = steps;
    ctx.ctrl = ctrl; ctx.global = global_buf; ctx.data = data;
    ctx.mix = nullptr; ctx.accum = nullptr;
    ctx.wom_rows.assign((size_t)((uint64_t)work * kMaxWomRowsPerCycle),
                        std::array<uint32_t, 6>{0xffffffffu, 0, 0, 0, 0, 0});
    ctx.wom_index.assign(work, 0);
    unsigned nt = n_threads ? n_threads
                            : std::thread::hardware_concurrency();

    rec_run_chained(exec_ops, exec_n, exec_slots, ctx, nt);

    // sort wom rows (invalid pattern sorts last), exclusive-scan counts
    std::sort(ctx.wom_rows.begin(), ctx.wom_rows.end());
    // early write-once consistency scan: produce a precise diagnostic
    // (addr + both data tuples) instead of a later opaque wom.cpp:78 eqz
    for (size_t i = 1; i < ctx.wom_rows.size(); i++) {
      const auto& p = ctx.wom_rows[i - 1];
      const auto& q = ctx.wom_rows[i];
      if (q[0] == 0xffffffffu) break;
      if (p[0] == q[0] &&
          (p[1] != q[1] || p[2] != q[2] || p[3] != q[3] || p[4] != q[4])) {
        throw std::runtime_error(
            "rec witgen: WOM conflict at addr " + std::to_string(p[0]) +
            ": cycle " + std::to_string(p[5]) +
            " (" + std::to_string(p[1]) + "," + std::to_string(p[2]) + "," +
            std::to_string(p[3]) + "," + std::to_string(p[4]) +
            ") vs cycle " + std::to_string(q[5]) +
            " (" + std::to_string(q[1]) + "," + std::to_string(q[2]) + "," +
            std::to_string(q[3]) + "," + std::to_string(q[4]) + ")");
      }
    }
    uint32_t total = 0;
    for (uint32_t c = 0; c < work; c++) {
      uint32_t n = ctx.wom_index[c];
      ctx.wom_index[c] = total;
      total += n;
    }
    // inject wom backs into data cols 0-4 at cycle-1 (ffi.cpp:136-158)
    for (uint32_t c = 1; c < work; c++) {
      uint32_t idx = ctx.wom_index[c];
      for (int i = 0; i < 5; i++) {
        uint32_t v = idx ? ctx.wom_rows[idx - 1][i] : 0;
        data[(uint64_t)i * steps + (c - 1)] = v;
      }
    }

    rec_run_flat(vmem_ops, vmem_n, vmem_slots, ctx, nt);
    return 0;
  } catch (const std::exception& e) {
    g_witgen_error_storage = e.what();
    return 1;
  }
}

// Accum phases: compute per-row products, grand-product prefix scan,
// verify/write accum columns (reference ffi.cpp:160-190).
int r0_rec_accum(
    const uint32_t* comp_ops, uint64_t comp_n, uint32_t comp_slots,
    const uint32_t* ver_ops, uint64_t ver_n, uint32_t ver_slots,
    const uint32_t* iop_idx, const uint32_t* par_safe, uint32_t work,
    uint32_t* ctrl, uint32_t* global_buf, uint32_t* data,
    const uint32_t* mix, uint32_t* accum, uint64_t steps,
    uint32_t n_threads) {
  using namespace r0wg;
  try {
    RecCtx ctx;
    ctx.wom = nullptr; ctx.num_wom = 0;
    ctx.iops = nullptr; ctx.num_iops = 0;
    ctx.iop_idx = iop_idx; ctx.par_safe = par_safe;
    ctx.work = work; ctx.steps = steps;
    ctx.ctrl = ctrl; ctx.global = global_buf; ctx.data = data;
    ctx.mix = mix; ctx.accum = accum;
    ctx.accum_rows.assign((size_t)work, std::array<uint32_t, 4>{1, 0, 0, 0});
    unsigned nt = n_threads ? n_threads
                            : std::thread::hardware_concurrency();

    rec_run_flat(comp_ops, comp_n, comp_slots, ctx, nt);

    // grand-product inclusive scan over the work rows
    uint32_t run[4] = {1, 0, 0, 0};
    for (uint32_t c = 0; c < work; c++) {
      uint32_t out[4];
      ext_mul(run, ctx.accum_rows[c].data(), out);
      for (int i = 0; i < 4; i++) {
        run[i] = out[i];
        ctx.accum_rows[c][i] = out[i];
      }
    }

    rec_run_flat(ver_ops, ver_n, ver_slots, ctx, nt);
    return 0;
  } catch (const std::exception& e) {
    g_witgen_error_storage = e.what();
    return 1;
  }
}

}  // extern "C"

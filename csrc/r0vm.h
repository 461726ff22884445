// rv32im zkVM executor core — TPU-native framework's host-side engine.
//
// Fresh C++ implementation of the behavior specified by the reference
// executor (risc0/circuit/rv32im/src/execute/{rv32im,r0vm,pager,executor}.rs
// and risc0/binfmt/src/{elf,image}.rs).  The sequential emulation loop is the
// hot host path (SURVEY.md §2.3), hence native; witness generation and
// proving live on the TPU side (Python/JAX).

#pragma once

#include <cstdint>
#include <cstring>
#include <array>
#include <map>
#include <memory>
#include <optional>
#include <set>
#include <stdexcept>
#include <string>
#include <unordered_map>
#include <vector>

namespace r0 {

// ---------------------------------------------------------------------------
// Constants (reference: circuit/rv32im/src/execute/platform.rs)
// ---------------------------------------------------------------------------

constexpr uint32_t WORD_SIZE = 4;
constexpr uint32_t PAGE_BYTES = 1024;
constexpr uint32_t PAGE_WORDS = PAGE_BYTES / WORD_SIZE;
constexpr uint32_t MEMORY_PAGES = 4u * 1024 * 1024;  // 2^32 / 1KiB
constexpr uint32_t MERKLE_TREE_DEPTH = 22;
constexpr uint32_t LOOKUP_TABLE_CYCLES = ((1 << 8) + (1 << 16)) / 16;
constexpr uint32_t RESERVED_CYCLES = LOOKUP_TABLE_CYCLES + 1;

constexpr uint32_t ZERO_PAGE_END = 0x0001'0000;
constexpr uint32_t USER_START = 0x0001'0000;
constexpr uint32_t USER_END = 0xc000'0000;
constexpr uint32_t KERNEL_START = 0xc000'0000;
constexpr uint32_t KERNEL_END = 0xff00'0000;
constexpr uint32_t MACHINE_REGS = 0xffff'0000;
constexpr uint32_t USER_REGS = 0xffff'0080;
constexpr uint32_t SAFE_WRITE = 0xffff'0100;
constexpr uint32_t MEPC = 0xffff'0200;
constexpr uint32_t SUSPEND_PC = 0xffff'0210;
constexpr uint32_t SUSPEND_MODE = 0xffff'0214;
constexpr uint32_t GLOBAL_OUTPUT = 0xffff'0240;
constexpr uint32_t GLOBAL_INPUT = 0xffff'0260;
constexpr uint32_t ECALL_DISPATCH = 0xffff'1000;
constexpr uint32_t TRAP_DISPATCH = 0xffff'2000;
constexpr uint32_t MEMORY_END_WADDR = 0x4000'0000;  // word address

constexpr uint32_t REG_MAX = 32;
constexpr uint32_t REG_ZERO = 0, REG_A0 = 10, REG_A1 = 11, REG_A2 = 12,
                   REG_A3 = 13, REG_A4 = 14, REG_A7 = 17,
                   REG_T0 = 5, REG_T1 = 6, REG_T2 = 7, REG_T3 = 28;

// host ecall numbers (platform.rs:90-95)
constexpr uint32_t HOST_ECALL_TERMINATE = 0, HOST_ECALL_READ = 1,
                   HOST_ECALL_WRITE = 2, HOST_ECALL_POSEIDON2 = 3,
                   HOST_ECALL_SHA2 = 4, HOST_ECALL_BIGINT = 5;

constexpr uint32_t MAX_IO_BYTES = 1024;
constexpr uint32_t MAX_IO_WORDS = 4;
constexpr uint32_t MAX_SHA_COUNT = 10;  // circuit platform.rs:137

// Cycle-state / row-type encoding (reference execute/platform.rs:101-196).
// Preflight rows store (major, minor): instructions use InsnKind>>3 /
// InsnKind&7; special states use major = 7 + state/8, minor = state%8.
enum class CycleState : uint32_t {
  LoadRootAndNonce = 0, Resume = 1, Suspend = 4, StoreRoot = 5,
  ControlTable = 6, ControlDone = 7, MachineEcall = 8, Terminate = 9,
  HostReadSetup = 10, HostWrite = 11, HostReadBytes = 12, HostReadWords = 13,
  PoseidonEntry = 16, PoseidonLoadState = 17, PoseidonLoadIn = 18,
  PoseidonDoOut = 21, PoseidonPaging = 22, PoseidonStoreState = 23,
  PoseidonExtRound = 24, PoseidonIntRound = 25,
  ShaEcall = 32, ShaLoadState = 33, ShaLoadData = 34, ShaMix = 35,
  ShaStoreState = 36, BigIntEcall = 40, BigIntStep = 41, Decode = 48,
};
constexpr uint32_t PFLAG_IS_ELEM = 0x8000'0000;
constexpr uint32_t PFLAG_CHECK_OUT = 0x4000'0000;

// paging cycle model (pager.rs:30-57)
constexpr uint32_t POSEIDON_PAGE_ROUNDS = PAGE_WORDS / 8;
constexpr uint32_t PAGE_CYCLES = 1 + 10 * POSEIDON_PAGE_ROUNDS + 1;  // 322
constexpr uint32_t NODE_CYCLES = 1 + 2 + 8 + 1 + 1;                  // 13
constexpr uint32_t RESERVED_PAGING_CYCLES = 1 + 1 + 1 + 2 + 2 + 1 + 1 + 1;  // 10

// BabyBear
constexpr uint32_t BB_P = 15u * (1u << 27) + 1;

using Digest = std::array<uint32_t, 8>;

// ---------------------------------------------------------------------------
// Poseidon2 (standard-form arithmetic, reference zkp/src/core/hash/poseidon2)
// ---------------------------------------------------------------------------

void poseidon2_mix(uint32_t cells[24]);

// ---------------------------------------------------------------------------
// Pages + memory image (reference binfmt/src/image.rs)
// ---------------------------------------------------------------------------

struct Page {
  std::vector<uint8_t> data;
  Page() : data(PAGE_BYTES, 0) {}
  uint32_t load(uint32_t word_in_page) const {
    uint32_t w;
    std::memcpy(&w, &data[word_in_page * 4], 4);
    return w;
  }
  void store(uint32_t word_in_page, uint32_t val) {
    std::memcpy(&data[word_in_page * 4], &val, 4);
  }
  Digest digest() const;  // 128 absorb rounds of 8 words as 16 shorts
};

Digest digest_pair(const Digest& lhs, const Digest& rhs);

struct ZeroCache {
  Page page;
  std::vector<Digest> digests;  // [depth] 0..=MERKLE_TREE_DEPTH
  ZeroCache();
};
const ZeroCache& zero_cache();

// Sparse Merkle-ized memory image; node 1 = image_id (root).
struct MemoryImage {
  std::map<uint32_t, std::shared_ptr<Page>> pages;   // page_idx -> page
  std::map<uint32_t, Digest> digests;                // node_idx -> digest
  std::set<uint32_t> dirty;

  MemoryImage();
  static MemoryImage with_kernel(class Program user, class Program kernel);
  static MemoryImage new_kernel(class Program kernel);

  std::shared_ptr<Page> get_page(uint32_t page_idx);
  void set_page(uint32_t page_idx, std::shared_ptr<Page> page);
  void set_page_with_digest(uint32_t page_idx, std::shared_ptr<Page> page,
                            const Digest& digest);
  const Digest& get_digest(uint32_t digest_idx);
  void set_digest(uint32_t digest_idx, const Digest& d);
  Digest image_id() { return get_digest(1); }
  void update_digests();

 private:
  bool expand_if_zero(uint32_t digest_idx);
  bool is_zero(uint32_t digest_idx) const;
  void expand_zero(uint32_t digest_idx);
  void mark_dirty(uint32_t digest_idx);
};

// ---------------------------------------------------------------------------
// ELF (reference binfmt/src/elf.rs)
// ---------------------------------------------------------------------------

class Program {
 public:
  uint32_t entry = 0;
  std::map<uint32_t, uint32_t> image;  // byte addr -> word
  static Program load_elf(const uint8_t* data, size_t len, uint32_t max_mem);
};

// ---------------------------------------------------------------------------
// Host IO interface
// ---------------------------------------------------------------------------

struct HostIO {
  virtual ~HostIO() = default;
  // opaque handle to the running Machine, set by execute(); lets host-side
  // syscall handlers peek guest memory/registers (reference SyscallContext)
  void* machine_handle = nullptr;
  // fill buf with up to len bytes, return bytes read
  virtual uint32_t host_read(uint32_t fd, uint8_t* buf, uint32_t len) = 0;
  virtual uint32_t host_write(uint32_t fd, const uint8_t* buf, uint32_t len) = 0;
};

// Peek helpers on the opaque machine handle (no paging cost, no records).
uint32_t machine_peek(void* machine, uint32_t waddr);
void* debug_machine_create(MemoryImage& image, HostIO* io);
int debug_machine_step(void* machine, uint64_t max_steps, const uint32_t* bps,
                       uint32_t n_bps, uint32_t* stop_pc);
uint32_t debug_machine_pc(void* machine);
uint32_t debug_machine_mode(void* machine);
int debug_machine_halted(void* machine);
uint32_t debug_machine_exit_code(void* machine);
void debug_machine_regs(void* machine, uint32_t out[32]);
void debug_machine_free(void* machine);
void* machine_fork_impl(void* machine, HostIO* io);
int machine_fork_run_impl(void* machine, uint64_t max_cycles);
void machine_fork_free_impl(void* machine);
void machine_terminate_impl(void* machine, uint32_t a0, uint32_t a1);
uint32_t machine_user_reg(void* machine, uint32_t idx);
uint64_t machine_user_cycles(void* machine);

// ---------------------------------------------------------------------------
// Segments + result
// ---------------------------------------------------------------------------

struct TerminateState {
  uint32_t a0 = 0, a1 = 0;
};

struct Segment {
  uint64_t index = 0;
  uint32_t po2 = 0;
  uint32_t suspend_cycle = 0;   // user cycles at suspend
  uint32_t paging_cycles = 0;
  uint32_t segment_threshold = 0;
  Digest pre_digest{}, post_digest{}, input_digest{};
  // PoVW nonce read by the LoadRootAndNonce cycle from the reserved region
  // (reference preflight.rs:580-587); zero when PoVW is unused.
  std::array<uint32_t, 8> povw_nonce{};
  std::optional<Digest> output_digest;
  std::optional<TerminateState> terminate_state;
  // partial pre-image for standalone replay: pages + uncle digests
  std::map<uint32_t, std::shared_ptr<Page>> pages;       // page_idx -> data
  std::map<uint32_t, Digest> page_digests;               // node_idx -> digest
  std::vector<std::vector<uint8_t>> read_record;
  std::vector<uint32_t> write_record;
};

struct ExecResult {
  uint64_t segments = 0;
  uint64_t user_cycles = 0;
  uint64_t total_cycles = 0;
  uint64_t paging_cycles = 0;
  uint64_t reserved_cycles = 0;
  Digest pre_state{}, post_state{}, input{};
  std::optional<Digest> output;
  std::optional<TerminateState> terminate_state;
};

using SegmentFn = void (*)(void* user, const Segment& seg);

// Run a full session.  max_cycles==0 means unlimited.
// Resumable session: the rolling image carries the continuation (pause
// stores SUSPEND_PC/MODE before the final segment emit), so re-running
// continues after a sys_pause (reference guest/env pause semantics).
struct SessionState {
  MemoryImage rolling;
  uint64_t segment_counter = 0;
  uint64_t prior_user_cycles = 0;
  // flat cycle profile (reference host/server/exec/profiler.rs): pc ->
  // cycles spent on instructions starting at that pc
  bool profile_enabled = false;
  std::unordered_map<uint32_t, uint64_t> profile;
};

ExecResult execute_run(SessionState& ss, uint32_t segment_po2,
                       uint64_t max_cycles, const Digest& input_digest,
                       HostIO& io, void* seg_user, SegmentFn seg_fn);

ExecResult execute(MemoryImage image, uint32_t segment_po2,
                   uint64_t max_cycles, const Digest& input_digest,
                   HostIO& io, void* seg_user, SegmentFn seg_fn);

// Deterministically re-execute one segment from its partial pre-image and
// recorded host IO (reference execute/segment.rs:69-84 Segment::execute and
// the preflight body phase, prove/witgen/preflight.rs:155-170).
struct ReplayResult {
  uint32_t user_cycles = 0;
  uint32_t pager_cycles = 0;
  std::optional<TerminateState> terminate_state;
  Digest pre_digest{}, post_digest{};
};

ReplayResult replay_segment(const Segment& seg, const Digest& input_digest);

// ---------------------------------------------------------------------------
// Preflight trace (reference rv32im-sys/src/lib.rs:22-59)
// ---------------------------------------------------------------------------

struct RawPreflightCycle {
  uint32_t state;      // CycleState recorded as the row's next-state
  uint32_t pc;
  uint8_t major, minor, machine_mode, padding;
  uint32_t user_cycle;
  uint32_t txn_idx;
  uint32_t paging_idx;
  uint32_t bigint_idx;
  uint32_t diff_count[2];
};

struct RawMemoryTransaction {
  uint32_t addr;       // word address
  uint32_t cycle;      // 2*row (load) or 2*row+1 (store)
  uint32_t word;
  uint32_t prev_cycle;
  uint32_t prev_word;
};

struct PreflightTrace {
  std::vector<RawPreflightCycle> cycles;
  std::vector<RawMemoryTransaction> txns;
  // per-row "back" payloads (ecall args / sha state / poseidon2 state)
  std::vector<uint8_t> back_kind;      // 0 none, 1 ecall, 2 sha, 3 p2
  std::vector<uint32_t> back_offset;   // per-row offset into back_data
  std::vector<uint32_t> back_data;
  // 16 byte-values per bigint row, indexed by RawPreflightCycle.bigint_idx
  std::vector<uint32_t> bigint_bytes;
  uint32_t table_split_cycle = 0;
};

// Re-execute a segment recording the witgen trace.
PreflightTrace preflight_segment(const Segment& seg, uint32_t po2);

}  // namespace r0

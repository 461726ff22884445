// C API for Python (ctypes) bindings.

#include "r0vm.h"

#include <cstdio>
#include <map>
#include <array>
#include <stdexcept>
#include <thread>
#include <functional>
#include <cstring>
#include <string>
#include <vector>

#include "bigint.inc"

using namespace r0;

extern "C" {

// read: fill buf up to len, return rlen; write: consume buf, return rlen.
// `machine` is an opaque handle usable with r0_machine_* peeks during the call.
typedef uint32_t (*r0_host_read_fn)(void* user, void* machine, uint32_t fd,
                                    uint8_t* buf, uint32_t len);
typedef uint32_t (*r0_host_write_fn)(void* user, void* machine, uint32_t fd,
                                     const uint8_t* buf, uint32_t len);

// Flat segment view passed to Python; memory owned by the callee for the
// duration of the callback only.
struct R0Segment {
  uint64_t index;
  uint32_t po2;
  uint32_t suspend_cycle;
  uint32_t paging_cycles;
  uint32_t segment_threshold;
  uint32_t has_output;
  uint32_t has_terminate;
  uint32_t terminate_a0, terminate_a1;
  uint32_t pre_digest[8], post_digest[8], input_digest[8], output_digest[8];
  uint64_t num_pages;
  const uint32_t* page_indexes;   // [num_pages]
  const uint8_t* page_data;       // [num_pages * 1024]
  uint64_t num_digests;
  const uint32_t* digest_indexes; // [num_digests]
  const uint32_t* digest_words;   // [num_digests * 8]
  uint64_t read_record_len;       // total bytes
  const uint8_t* read_record;     // concatenated
  uint64_t num_reads;
  const uint64_t* read_lens;      // [num_reads]
  uint64_t num_writes;
  const uint32_t* write_lens;     // [num_writes]
};

typedef void (*r0_segment_fn)(void* user, const R0Segment* seg);

struct R0Result {
  uint64_t segments;
  uint64_t user_cycles;
  uint64_t total_cycles;
  uint64_t paging_cycles;
  uint64_t reserved_cycles;
  uint32_t pre_state[8], post_state[8], input[8], output[8];
  uint32_t has_output;
  uint32_t has_terminate;
  uint32_t terminate_a0, terminate_a1;
};

namespace {

struct CallbackIO : HostIO {
  void* user;
  r0_host_read_fn on_read;
  r0_host_write_fn on_write;
  uint32_t host_read(uint32_t fd, uint8_t* buf, uint32_t len) override {
    return on_read ? on_read(user, machine_handle, fd, buf, len) : 0;
  }
  uint32_t host_write(uint32_t fd, const uint8_t* buf, uint32_t len) override {
    return on_write ? on_write(user, machine_handle, fd, buf, len) : len;
  }
};

struct SegmentForwarder {
  void* user;
  r0_segment_fn fn;
};

void forward_segment(void* fwd_ptr, const Segment& seg) {
  auto* fwd = static_cast<SegmentForwarder*>(fwd_ptr);
  if (!fwd->fn) return;

  std::vector<uint32_t> page_indexes;
  std::vector<uint8_t> page_data;
  page_indexes.reserve(seg.pages.size());
  page_data.reserve(seg.pages.size() * PAGE_BYTES);
  for (auto& [idx, page] : seg.pages) {
    page_indexes.push_back(idx);
    page_data.insert(page_data.end(), page->data.begin(), page->data.end());
  }
  std::vector<uint32_t> digest_indexes;
  std::vector<uint32_t> digest_words;
  for (auto& [idx, d] : seg.page_digests) {
    digest_indexes.push_back(idx);
    for (uint32_t w : d) digest_words.push_back(w);
  }
  std::vector<uint8_t> reads;
  std::vector<uint64_t> read_lens;
  for (auto& r : seg.read_record) {
    reads.insert(reads.end(), r.begin(), r.end());
    read_lens.push_back(r.size());
  }

  R0Segment out{};
  out.index = seg.index;
  out.po2 = seg.po2;
  out.suspend_cycle = seg.suspend_cycle;
  out.paging_cycles = seg.paging_cycles;
  out.segment_threshold = seg.segment_threshold;
  out.has_output = seg.output_digest.has_value();
  out.has_terminate = seg.terminate_state.has_value();
  if (seg.terminate_state) {
    out.terminate_a0 = seg.terminate_state->a0;
    out.terminate_a1 = seg.terminate_state->a1;
  }
  std::memcpy(out.pre_digest, seg.pre_digest.data(), 32);
  std::memcpy(out.post_digest, seg.post_digest.data(), 32);
  std::memcpy(out.input_digest, seg.input_digest.data(), 32);
  if (seg.output_digest)
    std::memcpy(out.output_digest, seg.output_digest->data(), 32);
  out.num_pages = page_indexes.size();
  out.page_indexes = page_indexes.data();
  out.page_data = page_data.data();
  out.num_digests = digest_indexes.size();
  out.digest_indexes = digest_indexes.data();
  out.digest_words = digest_words.data();
  out.read_record_len = reads.size();
  out.read_record = reads.data();
  out.num_reads = read_lens.size();
  out.read_lens = read_lens.data();
  out.num_writes = seg.write_record.size();
  out.write_lens = seg.write_record.data();
  fwd->fn(fwd->user, &out);
}

thread_local std::string g_error;

}  // namespace

const char* r0_last_error() { return g_error.c_str(); }

uint32_t r0_machine_peek(void* machine, uint32_t waddr) {
  return machine_peek(machine, waddr);
}

uint32_t r0_machine_user_reg(void* machine, uint32_t idx) {
  return machine_user_reg(machine, idx);
}

uint64_t r0_machine_user_cycles(void* machine) {
  return machine_user_cycles(machine);
}

void r0_machine_peek_region(void* machine, uint32_t byte_addr, uint32_t len,
                            uint8_t* out) {
  for (uint32_t i = 0; i < len; i++) {
    uint32_t w = machine_peek(machine, (byte_addr + i) / 4);
    out[i] = (w >> (8 * ((byte_addr + i) & 3))) & 0xff;
  }
}

// Build the boot image: user+kernel pair, or kernel-only when user_len
// is 0 (reference from_kernel_elf / image.rs new_kernel — bare-metal
// programs like the riscv-tests ISA binaries have no userspace).
static MemoryImage make_image(const uint8_t* user_elf, uint64_t user_len,
                              const uint8_t* kernel_elf,
                              uint64_t kernel_len) {
  Program kernel = Program::load_elf(kernel_elf, kernel_len, 0xffff'ffff);
  if (user_len == 0) return MemoryImage::new_kernel(kernel);
  Program user = Program::load_elf(user_elf, user_len, USER_END);
  return MemoryImage::with_kernel(user, kernel);
}

// Compute the image id of a user+kernel ELF pair; returns 0 on success.
int r0_compute_image_id(const uint8_t* user_elf, uint64_t user_len,
                        const uint8_t* kernel_elf, uint64_t kernel_len,
                        uint32_t out_digest[8]) {
  try {
    MemoryImage image = make_image(user_elf, user_len,
                                   kernel_elf, kernel_len);
    Digest id = image.image_id();
    std::memcpy(out_digest, id.data(), 32);
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return 1;
  }
}

// Execute a user+kernel ELF pair.  Returns 0 on success.
int r0_execute_elf(const uint8_t* user_elf, uint64_t user_len,
                   const uint8_t* kernel_elf, uint64_t kernel_len,
                   uint32_t segment_po2, uint64_t max_cycles,
                   const uint32_t input_digest[8], void* io_user,
                   r0_host_read_fn on_read, r0_host_write_fn on_write,
                   void* seg_user, r0_segment_fn on_segment,
                   R0Result* result) {
  try {
    MemoryImage image = make_image(user_elf, user_len,
                                   kernel_elf, kernel_len);

    CallbackIO io;
    io.user = io_user;
    io.on_read = on_read;
    io.on_write = on_write;

    Digest input{};
    if (input_digest) std::memcpy(input.data(), input_digest, 32);

    SegmentForwarder fwd{seg_user, on_segment};
    ExecResult res = execute(std::move(image), segment_po2, max_cycles, input,
                             io, &fwd, forward_segment);

    result->segments = res.segments;
    result->user_cycles = res.user_cycles;
    result->total_cycles = res.total_cycles;
    result->paging_cycles = res.paging_cycles;
    result->reserved_cycles = res.reserved_cycles;
    std::memcpy(result->pre_state, res.pre_state.data(), 32);
    std::memcpy(result->post_state, res.post_state.data(), 32);
    std::memcpy(result->input, res.input.data(), 32);
    result->has_output = res.output.has_value();
    if (res.output) std::memcpy(result->output, res.output->data(), 32);
    result->has_terminate = res.terminate_state.has_value();
    if (res.terminate_state) {
      result->terminate_a0 = res.terminate_state->a0;
      result->terminate_a1 = res.terminate_state->a1;
    }
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return 1;
  }
}

struct R0ReplayResult {
  uint32_t user_cycles;
  uint32_t pager_cycles;
  uint32_t has_terminate;
  uint32_t terminate_a0, terminate_a1;
  uint32_t pre_digest[8], post_digest[8];
};

// Standalone segment replay from partial pre-image + recorded IO.
int r0_replay_segment(
    uint64_t num_pages, const uint32_t* page_indexes, const uint8_t* page_data,
    uint64_t num_digests, const uint32_t* digest_indexes,
    const uint32_t* digest_words, uint32_t suspend_cycle, uint32_t po2,
    const uint8_t* read_record, const uint64_t* read_lens, uint64_t num_reads,
    const uint32_t* write_lens, uint64_t num_writes,
    const uint32_t input_digest[8], R0ReplayResult* out) {
  try {
    Segment seg;
    seg.po2 = po2;
    seg.suspend_cycle = suspend_cycle;
    for (uint64_t i = 0; i < num_pages; i++) {
      auto page = std::make_shared<Page>();
      std::memcpy(page->data.data(), page_data + i * PAGE_BYTES, PAGE_BYTES);
      seg.pages[page_indexes[i]] = page;
    }
    for (uint64_t i = 0; i < num_digests; i++) {
      Digest d;
      std::memcpy(d.data(), digest_words + i * 8, 32);
      seg.page_digests[digest_indexes[i]] = d;
    }
    uint64_t off = 0;
    for (uint64_t i = 0; i < num_reads; i++) {
      seg.read_record.emplace_back(read_record + off,
                                   read_record + off + read_lens[i]);
      off += read_lens[i];
    }
    seg.write_record.assign(write_lens, write_lens + num_writes);

    Digest input{};
    if (input_digest) std::memcpy(input.data(), input_digest, 32);
    ReplayResult res = replay_segment(seg, input);
    out->user_cycles = res.user_cycles;
    out->pager_cycles = res.pager_cycles;
    out->has_terminate = res.terminate_state.has_value();
    if (res.terminate_state) {
      out->terminate_a0 = res.terminate_state->a0;
      out->terminate_a1 = res.terminate_state->a1;
    }
    std::memcpy(out->pre_digest, res.pre_digest.data(), 32);
    std::memcpy(out->post_digest, res.post_digest.data(), 32);
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return 1;
  }
}

// Preflight: flat views passed to a callback (valid during the call only).
struct R0PreflightView {
  uint64_t num_cycles;
  const uint32_t* cycles;       // (num_cycles, 11): state, pc, major, minor,
                                // machine_mode, user_cycle, txn_idx,
                                // paging_idx, bigint_idx, diff0, diff1
  uint64_t num_txns;
  const uint32_t* txns;         // (num_txns, 5): addr, cycle, word,
                                // prev_cycle, prev_word
  const uint8_t* back_kind;     // (num_cycles,)
  const uint32_t* back_offset;  // (num_cycles,)
  uint64_t back_data_len;
  const uint32_t* back_data;
  uint64_t bigint_bytes_len;
  const uint32_t* bigint_bytes;  // 16 values per bigint row
  uint32_t table_split_cycle;
};

typedef void (*r0_preflight_fn)(void* user, const R0PreflightView* view);

int r0_preflight_segment(
    uint64_t num_pages, const uint32_t* page_indexes, const uint8_t* page_data,
    uint64_t num_digests, const uint32_t* digest_indexes,
    const uint32_t* digest_words, uint32_t suspend_cycle, uint32_t po2,
    uint32_t segment_threshold, uint32_t has_terminate,
    const uint8_t* read_record, const uint64_t* read_lens, uint64_t num_reads,
    const uint32_t* write_lens, uint64_t num_writes,
    const uint32_t input_digest[8], const uint32_t* povw_nonce, void* user,
    r0_preflight_fn cb) {
  try {
    Segment seg;
    seg.po2 = po2;
    seg.suspend_cycle = suspend_cycle;
    seg.segment_threshold = segment_threshold;
    if (has_terminate) seg.terminate_state = TerminateState{0, 0};
    for (uint64_t i = 0; i < num_pages; i++) {
      auto page = std::make_shared<Page>();
      std::memcpy(page->data.data(), page_data + i * PAGE_BYTES, PAGE_BYTES);
      seg.pages[page_indexes[i]] = page;
    }
    for (uint64_t i = 0; i < num_digests; i++) {
      Digest d;
      std::memcpy(d.data(), digest_words + i * 8, 32);
      seg.page_digests[digest_indexes[i]] = d;
    }
    uint64_t off = 0;
    for (uint64_t i = 0; i < num_reads; i++) {
      seg.read_record.emplace_back(read_record + off,
                                   read_record + off + read_lens[i]);
      off += read_lens[i];
    }
    seg.write_record.assign(write_lens, write_lens + num_writes);
    if (input_digest) std::memcpy(seg.input_digest.data(), input_digest, 32);
    if (povw_nonce)
      std::memcpy(seg.povw_nonce.data(), povw_nonce, 32);

    PreflightTrace trace = preflight_segment(seg, po2);

    std::vector<uint32_t> cyc(trace.cycles.size() * 11);
    for (size_t i = 0; i < trace.cycles.size(); i++) {
      auto& c = trace.cycles[i];
      uint32_t* row = &cyc[i * 11];
      row[0] = c.state; row[1] = c.pc; row[2] = c.major; row[3] = c.minor;
      row[4] = c.machine_mode; row[5] = c.user_cycle; row[6] = c.txn_idx;
      row[7] = c.paging_idx; row[8] = c.bigint_idx; row[9] = c.diff_count[0];
      row[10] = c.diff_count[1];
    }
    std::vector<uint32_t> txn(trace.txns.size() * 5);
    for (size_t i = 0; i < trace.txns.size(); i++) {
      auto& t = trace.txns[i];
      uint32_t* row = &txn[i * 5];
      row[0] = t.addr; row[1] = t.cycle; row[2] = t.word;
      row[3] = t.prev_cycle; row[4] = t.prev_word;
    }
    R0PreflightView view{};
    view.num_cycles = trace.cycles.size();
    view.cycles = cyc.data();
    view.num_txns = trace.txns.size();
    view.txns = txn.data();
    view.back_kind = trace.back_kind.data();
    view.back_offset = trace.back_offset.data();
    view.back_data_len = trace.back_data.size();
    view.back_data = trace.back_data.data();
    view.bigint_bytes_len = trace.bigint_bytes.size();
    view.bigint_bytes = trace.bigint_bytes.data();
    view.table_split_cycle = trace.table_split_cycle;
    if (cb) cb(user, &view);
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return 1;
  }
}

// Poseidon2 page digest of 1KiB of data (for tests / Python-side image ops).
int r0_page_digest(const uint8_t* data, uint32_t out_digest[8]) {
  Page page;
  std::memcpy(page.data.data(), data, PAGE_BYTES);
  Digest d = page.digest();
  std::memcpy(out_digest, d.data(), 32);
  return 0;
}

int r0_digest_pair(const uint32_t lhs[8], const uint32_t rhs[8],
                   uint32_t out_digest[8]) {
  Digest l, r;
  std::memcpy(l.data(), lhs, 32);
  std::memcpy(r.data(), rhs, 32);
  Digest d = digest_pair(l, r);
  std::memcpy(out_digest, d.data(), 32);
  return 0;
}


// Standalone bibc evaluation over a flat word-addressed memory image (for
// tests: reference bibc.rs test pattern without a full Machine).  `regs` are
// the 32 machine-register byte-address values used as arenas.  Returns 0 on
// success; witness stores land directly in `mem`.
int r0_bibc_eval(const uint8_t* prog, uint64_t prog_len, uint32_t* mem,
                 uint64_t mem_words, const uint32_t* regs, uint32_t mode) {
  struct FlatIO : bibc::IO {
    uint32_t* mem;
    uint64_t mem_words;
    const uint32_t* regs;
    FlatIO(uint32_t* m, uint64_t n, const uint32_t* r)
        : mem(m), mem_words(n), regs(r) {}
    uint32_t base(uint32_t arena) {
      uint32_t v = regs[arena % 32];
      if (v % 4 != 0) throw std::runtime_error("unaligned arena");
      return v / 4;
    }
    uint32_t rd(uint32_t waddr) {
      if (waddr >= mem_words) throw std::runtime_error("bibc mem oob");
      return mem[waddr];
    }
    void wr(uint32_t waddr, uint32_t word) {
      if (waddr >= mem_words) throw std::runtime_error("bibc mem oob");
      mem[waddr] = word;
    }
    bibc::BInt load(uint32_t arena, uint32_t offset,
                    uint32_t count) override {
      uint32_t start = base(arena) + offset * 4;
      std::vector<uint32_t> limbs;
      for (uint32_t a = start; a < start + (count + 3) / 4; a++)
        limbs.push_back(rd(a));
      if (!limbs.empty()) {
        switch (count % 4) {
          case 1: limbs.back() &= 0xff; break;
          case 2: limbs.back() &= 0xffff; break;
          case 3: limbs.back() &= 0xffffff; break;
        }
      }
      return bibc::make(false, std::move(limbs));
    }
    void store(uint32_t arena, uint32_t offset, uint32_t count,
               const bibc::BInt& value) override {
      uint32_t addr = base(arena) + offset * 4;
      if (count % 16 != 0 || count < value.mag.size() * 4)
        throw std::runtime_error("bibc store count");
      for (uint32_t i = 0; i < count / 4; i++)
        wr(addr + i, i < value.mag.size() ? value.mag[i] : 0);
    }
  };
  try {
    std::vector<uint8_t> bytes(prog, prog + prog_len);
    bibc::Program program = bibc::Program::decode(bytes);
    FlatIO io(mem, mem_words, regs);
    bibc::eval(program, io);
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return 1;
  }
}


// ---- sys_fork: copy-on-write child execution (reference
// host/server/exec/syscall/fork.rs ChildExecutor) ------------------------

// Deep-fork a machine mid-syscall: the child resumes at the SAME ecall
// instruction (pc has not advanced yet), re-issues the syscall through its
// OWN callbacks, and runs unconstrained until termination.  Cached pages
// are deep-copied so child stores never alias the parent.
void* r0_machine_fork(void* machine, void* io_user, r0_host_read_fn on_read,
                      r0_host_write_fn on_write, void** out_io) {
  try {
    auto* io = new CallbackIO();
    io->user = io_user;
    io->on_read = on_read;
    io->on_write = on_write;
    *out_io = io;
    return machine_fork_impl(machine, io);
  } catch (const std::exception& e) {
    g_error = e.what();
    return nullptr;
  }
}

// Run a forked child to termination; returns 0 on clean exit, 1 on error,
// 2 on cycle-limit exhaustion.
int r0_machine_fork_run(void* machine, uint64_t max_cycles) {
  try {
    return machine_fork_run_impl(machine, max_cycles);
  } catch (const std::exception& e) {
    g_error = e.what();
    return 1;
  }
}

// Request termination of a (forked) machine from inside a syscall
// callback: the run loop exits after the current step (SYS_EXIT child stop,
// reference fork.rs:141-144).
void r0_machine_terminate(void* machine, uint32_t a0, uint32_t a1) {
  machine_terminate_impl(machine, a0, a1);
}

void r0_machine_fork_free(void* machine, void* io) {
  machine_fork_free_impl(machine);
  delete static_cast<CallbackIO*>(io);
}


// ---- resumable sessions (pause/resume; reference guest env sys_pause +
// host executor run/resume semantics) ------------------------------------

void* r0_session_create(const uint8_t* user_elf, uint64_t user_len,
                        const uint8_t* kernel_elf, uint64_t kernel_len) {
  try {
    auto* ss = new SessionState{};
    ss->rolling = make_image(user_elf, user_len, kernel_elf, kernel_len);
    return ss;
  } catch (const std::exception& e) {
    g_error = e.what();
    return nullptr;
  }
}

// One run: executes until halt or pause; call again to resume after pause.
int r0_session_run(void* session, uint32_t segment_po2, uint64_t max_cycles,
                   const uint32_t input_digest[8], void* io_user,
                   r0_host_read_fn on_read, r0_host_write_fn on_write,
                   void* seg_user, r0_segment_fn on_segment,
                   R0Result* result) {
  try {
    auto* ss = static_cast<SessionState*>(session);
    CallbackIO io;
    io.user = io_user;
    io.on_read = on_read;
    io.on_write = on_write;
    Digest input{};
    if (input_digest) std::memcpy(input.data(), input_digest, 32);
    SegmentForwarder fwd{seg_user, on_segment};
    ExecResult res = execute_run(*ss, segment_po2, max_cycles, input, io,
                                 &fwd, forward_segment);
    result->segments = res.segments;
    result->user_cycles = res.user_cycles;
    result->total_cycles = res.total_cycles;
    result->paging_cycles = res.paging_cycles;
    result->reserved_cycles = res.reserved_cycles;
    std::memcpy(result->pre_state, res.pre_state.data(), 32);
    std::memcpy(result->post_state, res.post_state.data(), 32);
    std::memcpy(result->input, res.input.data(), 32);
    result->has_output = res.output.has_value();
    if (res.output) std::memcpy(result->output, res.output->data(), 32);
    result->has_terminate = res.terminate_state.has_value();
    if (res.terminate_state) {
      result->terminate_a0 = res.terminate_state->a0;
      result->terminate_a1 = res.terminate_state->a1;
    }
    return 0;
  } catch (const std::exception& e) {
    g_error = e.what();
    return 1;
  }
}

void r0_session_free(void* session) {
  delete static_cast<SessionState*>(session);
}

// ---------------------------------------------------------------------------
// Debug session: single-step control for the GDB stub (reference
// risc0/circuit/rv32im/src/execute/gdb.rs).  The machine runs the same
// kernel+user image as a normal session; stepping is per machine
// instruction with user-mode pc breakpoints.

struct DebugState {
  MemoryImage image;
  CallbackIO io;
  void* m = nullptr;
  ~DebugState() {
    if (m) debug_machine_free(m);
  }
};

void* r0_debug_create(const uint8_t* user_elf, uint64_t user_len,
                      const uint8_t* kernel_elf, uint64_t kernel_len,
                      void* io_user, r0_host_read_fn on_read,
                      r0_host_write_fn on_write) {
  try {
    auto* ds = new DebugState();
    ds->image = make_image(user_elf, user_len, kernel_elf, kernel_len);
    ds->io.user = io_user;
    ds->io.on_read = on_read;
    ds->io.on_write = on_write;
    ds->m = debug_machine_create(ds->image, &ds->io);
    return ds;
  } catch (const std::exception& e) {
    g_error = e.what();
    return nullptr;
  }
}

// Step up to max_steps machine instructions.  Returns 0 = step budget
// used, 1 = guest halted, 2 = user-mode breakpoint hit (at *stop_pc,
// before executing it), 3 = error (r0_last_error).
int r0_debug_step(void* dbg, uint64_t max_steps, const uint32_t* bps,
                  uint32_t n_bps, uint32_t* stop_pc) {
  auto* ds = static_cast<DebugState*>(dbg);
  try {
    return debug_machine_step(ds->m, max_steps, bps, n_bps, stop_pc);
  } catch (const std::exception& e) {
    g_error = e.what();
    return 3;
  }
}

uint32_t r0_debug_pc(void* dbg) {
  return debug_machine_pc(static_cast<DebugState*>(dbg)->m);
}

uint32_t r0_debug_mode(void* dbg) {
  return debug_machine_mode(static_cast<DebugState*>(dbg)->m);
}

int r0_debug_halted(void* dbg) {
  return debug_machine_halted(static_cast<DebugState*>(dbg)->m);
}

uint32_t r0_debug_exit_code(void* dbg) {
  return debug_machine_exit_code(static_cast<DebugState*>(dbg)->m);
}

void r0_debug_read_regs(void* dbg, uint32_t out[32]) {
  debug_machine_regs(static_cast<DebugState*>(dbg)->m, out);
}

void r0_debug_read_mem(void* dbg, uint32_t byte_addr, uint32_t len,
                       uint8_t* out) {
  r0_machine_peek_region(static_cast<DebugState*>(dbg)->m, byte_addr, len,
                         out);
}

void r0_debug_free(void* dbg) { delete static_cast<DebugState*>(dbg); }

void r0_session_enable_profile(void* session) {
  static_cast<SessionState*>(session)->profile_enabled = true;
}

uint64_t r0_session_profile_size(void* session) {
  return static_cast<SessionState*>(session)->profile.size();
}

void r0_session_profile_read(void* session, uint32_t* pcs,
                             uint64_t* cycles) {
  auto* ss = static_cast<SessionState*>(session);
  size_t i = 0;
  for (const auto& [pc, n] : ss->profile) {
    pcs[i] = pc;
    cycles[i] = n;
    i++;
  }
}

}  // extern "C"

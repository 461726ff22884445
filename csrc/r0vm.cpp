// Implementation of the rv32im executor core.  See r0vm.h for provenance.

#include "r0vm.h"
#include "poseidon2_consts.h"

#include <algorithm>

namespace r0 {

// ---------------------------------------------------------------------------
// Poseidon2 permutation, standard form mod-P arithmetic
// (reference behavior: circuit/rv32im/src/execute/poseidon2.rs:180-280)
// ---------------------------------------------------------------------------

static inline uint32_t bb_add(uint32_t a, uint32_t b) {
  uint32_t x = a + b;
  return x >= BB_P ? x - BB_P : x;
}

static inline uint32_t bb_mul(uint32_t a, uint32_t b) {
  return (uint32_t)(((uint64_t)a * b) % BB_P);
}

static inline uint32_t sbox7(uint32_t x) {
  uint32_t x2 = bb_mul(x, x);
  uint32_t x4 = bb_mul(x2, x2);
  return bb_mul(bb_mul(x4, x2), x);
}

static void mul_m4(uint32_t x[4]) {
  uint64_t t0 = ((uint64_t)x[0] + x[1]) % BB_P;
  uint64_t t1 = ((uint64_t)x[2] + x[3]) % BB_P;
  uint64_t t2 = (2 * (uint64_t)x[1] + t1) % BB_P;
  uint64_t t3 = (2 * (uint64_t)x[3] + t0) % BB_P;
  uint64_t t4 = (4 * t1 + t3) % BB_P;
  uint64_t t5 = (4 * t0 + t2) % BB_P;
  uint64_t t6 = (t3 + t5) % BB_P;
  uint64_t t7 = (t2 + t4) % BB_P;
  x[0] = (uint32_t)t6;
  x[1] = (uint32_t)t5;
  x[2] = (uint32_t)t7;
  x[3] = (uint32_t)t4;
}

static void mul_m_ext(uint32_t cells[24]) {
  uint32_t sums[4] = {0, 0, 0, 0};
  for (int blk = 0; blk < 6; blk++) {
    mul_m4(&cells[blk * 4]);
    for (int j = 0; j < 4; j++) sums[j] = bb_add(sums[j], cells[blk * 4 + j]);
  }
  for (int i = 0; i < 24; i++) cells[i] = bb_add(cells[i], sums[i % 4]);
}

static void mul_m_int(uint32_t cells[24]) {
  uint64_t sum = 0;
  for (int i = 0; i < 24; i++) sum += cells[i];
  sum %= BB_P;
  for (int i = 0; i < 24; i++)
    cells[i] = (uint32_t)((sum + (uint64_t)P2_M_INT_DIAG[i] * cells[i]) % BB_P);
}

void poseidon2_mix(uint32_t cells[24]) {
  int round = 0;
  mul_m_ext(cells);
  for (int r = 0; r < 4; r++, round++) {
    for (int i = 0; i < 24; i++)
      cells[i] = sbox7(bb_add(cells[i], P2_ROUND_CONSTANTS[round * 24 + i]));
    mul_m_ext(cells);
  }
  for (int r = 0; r < 21; r++, round++) {
    cells[0] = sbox7(bb_add(cells[0], P2_ROUND_CONSTANTS[round * 24]));
    mul_m_int(cells);
  }
  for (int r = 0; r < 4; r++, round++) {
    for (int i = 0; i < 24; i++)
      cells[i] = sbox7(bb_add(cells[i], P2_ROUND_CONSTANTS[round * 24 + i]));
    mul_m_ext(cells);
  }
}

// ---------------------------------------------------------------------------
// Page / image digests (reference binfmt/src/image.rs:361-477)
// ---------------------------------------------------------------------------

Digest Page::digest() const {
  uint32_t cells[24] = {0};
  for (uint32_t i = 0; i < PAGE_WORDS / 8; i++) {
    for (uint32_t j = 0; j < 8; j++) {
      uint32_t word = load(i * 8 + j);
      cells[2 * j] = word & 0xffff;
      cells[2 * j + 1] = word >> 16;
    }
    poseidon2_mix(cells);
  }
  Digest out;
  for (int i = 0; i < 8; i++) out[i] = cells[i];
  return out;
}

Digest digest_pair(const Digest& lhs, const Digest& rhs) {
  uint32_t cells[24] = {0};
  for (int i = 0; i < 8; i++) {
    cells[i] = rhs[i];       // rhs first (image.rs:470-473)
    cells[8 + i] = lhs[i];
  }
  poseidon2_mix(cells);
  Digest out;
  for (int i = 0; i < 8; i++) out[i] = cells[i];
  return out;
}

ZeroCache::ZeroCache() : digests(MERKLE_TREE_DEPTH + 1) {
  Digest d = page.digest();
  for (int depth = MERKLE_TREE_DEPTH; depth >= 0; depth--) {
    digests[depth] = d;
    d = digest_pair(d, d);
  }
}

const ZeroCache& zero_cache() {
  static ZeroCache zc;
  return zc;
}

// ---------------------------------------------------------------------------
// MemoryImage
// ---------------------------------------------------------------------------

MemoryImage::MemoryImage() { digests[1] = zero_cache().digests[0]; }

bool MemoryImage::is_zero(uint32_t digest_idx) const {
  int depth = 31 - __builtin_clz(digest_idx);
  uint32_t idx = digest_idx;
  while (idx > 0 && !digests.count(idx)) {
    idx /= 2;
    depth--;
  }
  if (idx == 0) return false;
  return digests.at(idx) == zero_cache().digests[depth];
}

void MemoryImage::expand_zero(uint32_t digest_idx) {
  int depth = 31 - __builtin_clz(digest_idx);
  uint32_t idx = digest_idx;
  while (!digests.count(idx)) {
    uint32_t parent = idx / 2;
    digests[parent * 2] = zero_cache().digests[depth];
    digests[parent * 2 + 1] = zero_cache().digests[depth];
    idx = parent;
    depth--;
  }
}

bool MemoryImage::expand_if_zero(uint32_t digest_idx) {
  if (!is_zero(digest_idx)) return false;
  expand_zero(digest_idx);
  return true;
}

void MemoryImage::mark_dirty(uint32_t digest_idx) {
  uint32_t idx = digest_idx;
  while (idx != 1) {
    uint32_t parent = idx / 2;
    if (digests.count(parent * 2) && digests.count(parent * 2 + 1)) {
      dirty.insert(parent);
      idx = parent;
    } else {
      break;
    }
  }
}

std::shared_ptr<Page> MemoryImage::get_page(uint32_t page_idx) {
  auto it = pages.find(page_idx);
  if (it != pages.end()) return it->second;
  uint32_t digest_idx = MEMORY_PAGES + page_idx;
  if (expand_if_zero(digest_idx)) {
    auto zp = std::make_shared<Page>();
    pages[page_idx] = zp;
    return zp;
  }
  throw std::runtime_error("Unavailable page: " + std::to_string(page_idx));
}

void MemoryImage::set_page(uint32_t page_idx, std::shared_ptr<Page> page) {
  uint32_t digest_idx = MEMORY_PAGES + page_idx;
  expand_if_zero(digest_idx);
  digests[digest_idx] = page->digest();
  pages[page_idx] = std::move(page);
  mark_dirty(digest_idx);
}

void MemoryImage::set_page_with_digest(uint32_t page_idx,
                                       std::shared_ptr<Page> page,
                                       const Digest& digest) {
  uint32_t digest_idx = MEMORY_PAGES + page_idx;
  expand_if_zero(digest_idx);
  digests[digest_idx] = digest;
  pages[page_idx] = std::move(page);
  mark_dirty(digest_idx);
}

const Digest& MemoryImage::get_digest(uint32_t digest_idx) {
  expand_if_zero(digest_idx);
  auto it = digests.find(digest_idx);
  if (it == digests.end())
    throw std::runtime_error("Unavailable digest: " + std::to_string(digest_idx));
  return it->second;
}

void MemoryImage::set_digest(uint32_t digest_idx, const Digest& d) {
  expand_if_zero(digest_idx);
  digests[digest_idx] = d;
  mark_dirty(digest_idx);
}

void MemoryImage::update_digests() {
  std::vector<uint32_t> idxs(dirty.begin(), dirty.end());
  dirty.clear();
  for (auto it = idxs.rbegin(); it != idxs.rend(); ++it) {
    uint32_t idx = *it;
    digests[idx] = digest_pair(digests.at(idx * 2), digests.at(idx * 2 + 1));
  }
}

// ---------------------------------------------------------------------------
// ELF loader (reference binfmt/src/elf.rs:38-115)
// ---------------------------------------------------------------------------

static uint32_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
static uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24);
}

Program Program::load_elf(const uint8_t* data, size_t len, uint32_t max_mem) {
  Program prog;
  if (len < 52 || rd32(data) != 0x464c457f)
    throw std::runtime_error("not an ELF file");
  if (data[4] != 1) throw std::runtime_error("not a 32-bit ELF");
  if (rd16(data + 18) != 243) throw std::runtime_error("not RISC-V");
  if (rd16(data + 16) != 2) throw std::runtime_error("not ET_EXEC");
  prog.entry = rd32(data + 24);
  if (prog.entry >= max_mem || prog.entry % WORD_SIZE != 0)
    throw std::runtime_error("invalid entrypoint");
  uint32_t phoff = rd32(data + 28);
  uint32_t phentsize = rd16(data + 42);
  uint32_t phnum = rd16(data + 44);
  if (phnum > 256) throw std::runtime_error("too many program headers");
  for (uint32_t i = 0; i < phnum; i++) {
    const uint8_t* ph = data + phoff + i * phentsize;
    if ((size_t)(ph - data) + 32 > len) throw std::runtime_error("bad phdr");
    uint32_t p_type = rd32(ph);
    if (p_type != 1) continue;  // PT_LOAD
    uint32_t offset = rd32(ph + 4);
    uint32_t vaddr = rd32(ph + 8);
    uint32_t filesz = rd32(ph + 16);
    uint32_t memsz = rd32(ph + 20);
    if (filesz >= max_mem || memsz >= max_mem)
      throw std::runtime_error("invalid segment size");
    if (vaddr % WORD_SIZE != 0) throw std::runtime_error("unaligned vaddr");
    for (uint32_t off = 0; off < memsz; off += WORD_SIZE) {
      uint64_t addr = (uint64_t)vaddr + off;
      if (addr >= max_mem) throw std::runtime_error("segment exceeds max_mem");
      uint32_t word = 0;
      if (off < filesz) {
        uint32_t n = std::min<uint32_t>(filesz - off, WORD_SIZE);
        for (uint32_t j = 0; j < n; j++) {
          size_t src = (size_t)offset + off + j;
          if (src >= len) throw std::runtime_error("invalid segment offset");
          word |= (uint32_t)data[src] << (j * 8);
        }
      }
      prog.image[(uint32_t)addr] = word;
    }
  }
  return prog;
}

static MemoryImage image_from_words(const std::map<uint32_t, uint32_t>& words) {
  MemoryImage img;
  uint32_t cur_idx = UINT32_MAX;
  std::shared_ptr<Page> cur;
  for (auto& [addr, word] : words) {
    uint32_t waddr = addr / 4;
    uint32_t page_idx = waddr / PAGE_WORDS;
    if (page_idx != cur_idx) {
      if (cur) img.set_page(cur_idx, cur);
      cur = std::make_shared<Page>();
      cur_idx = page_idx;
    }
    cur->store(waddr % PAGE_WORDS, word);
  }
  if (cur) img.set_page(cur_idx, cur);
  img.update_digests();
  return img;
}

MemoryImage MemoryImage::with_kernel(Program user, Program kernel) {
  // reference image.rs:178-186; BTreeMap::append overwrites duplicate keys
  // with the user's values, so user words win over kernel words
  user.image[USER_START] = user.entry;
  for (auto& kv : user.image) kernel.image[kv.first] = kv.second;
  kernel.image[SUSPEND_PC] = kernel.entry;
  kernel.image[SUSPEND_MODE] = 1;
  return image_from_words(kernel.image);
}

MemoryImage MemoryImage::new_kernel(Program kernel) {
  // reference image.rs:169-174: kernel-only image (no userspace) — used
  // for bare-metal programs like the official riscv-tests ISA binaries
  kernel.image[SUSPEND_PC] = kernel.entry;
  kernel.image[SUSPEND_MODE] = 1;
  return image_from_words(kernel.image);
}

// ---------------------------------------------------------------------------
// Paged memory (reference execute/pager.rs)
// ---------------------------------------------------------------------------

enum class PageState : uint8_t { Unloaded = 0, Loaded = 1, Dirty = 2 };

struct PageStates {
  std::vector<uint8_t> states;  // 2 bits packed as bytes for simplicity
  std::vector<uint32_t> indexes;
  PageStates() : states(2 * MEMORY_PAGES, 0) {}
  PageState get(uint32_t idx) const { return (PageState)states[idx]; }
  void set(uint32_t idx, PageState v) {
    if (states[idx] == 0) indexes.push_back(idx);
    // Dirty cannot go back to Loaded via set() in practice (fixup guards)
    states[idx] = (uint8_t)v;
  }
  void clear() {
    for (uint32_t idx : indexes) states[idx] = 0;
    indexes.clear();
  }
};

struct PagedMemory {
  std::map<uint32_t, std::shared_ptr<Page>> image;  // working image pages
  std::vector<uint32_t> page_table;                 // page_idx -> cache idx+1
  std::vector<std::shared_ptr<Page>> page_cache;
  PageStates page_states;
  uint32_t cycles = RESERVED_PAGING_CYCLES;
  uint32_t user_registers[REG_MAX] = {0};
  uint32_t machine_registers[REG_MAX] = {0};

  explicit PagedMemory(MemoryImage& init) : page_table(MEMORY_PAGES, 0) {
    uint32_t page_idx = (MACHINE_REGS / 4) / PAGE_WORDS;
    auto page = init.get_page(page_idx);
    for (uint32_t i = 0; i < REG_MAX; i++) {
      machine_registers[i] = page->load(((MACHINE_REGS / 4) + i) % PAGE_WORDS);
      user_registers[i] = page->load(((USER_REGS / 4) + i) % PAGE_WORDS);
    }
    image = init.pages;  // shared pages (copy-on-write via cache)
  }

  std::shared_ptr<Page> image_page(uint32_t page_idx) {
    auto it = image.find(page_idx);
    if (it != image.end()) return it->second;
    auto zp = std::make_shared<Page>();
    image[page_idx] = zp;
    return zp;
  }

  void reset() {
    std::fill(page_table.begin(), page_table.end(), 0);
    page_cache.clear();
    page_states.clear();
    cycles = RESERVED_PAGING_CYCLES;
  }

  void fixup_costs(uint32_t node_idx, PageState goal) {
    while (node_idx != 0) {
      PageState state = page_states.get(node_idx);
      if ((uint8_t)goal > (uint8_t)state) {
        if (node_idx < MEMORY_PAGES) {
          if (state == PageState::Unloaded) cycles += NODE_CYCLES;
          if (goal == PageState::Dirty) cycles += NODE_CYCLES;
        }
        page_states.set(node_idx, goal);
      }
      node_idx /= 2;
    }
  }

  void load_page(uint32_t page_idx) {
    // copy the image page into the cache (mutations stay in cache)
    auto copy = std::make_shared<Page>(*image_page(page_idx));
    page_table[page_idx] = (uint32_t)page_cache.size() + 1;
    page_cache.push_back(copy);
    cycles += PAGE_CYCLES;
    fixup_costs(MEMORY_PAGES + page_idx, PageState::Loaded);
  }

  bool try_reg(uint32_t waddr, uint32_t** out) {
    if (waddr >= USER_REGS / 4 && waddr < USER_REGS / 4 + REG_MAX) {
      *out = &user_registers[waddr - USER_REGS / 4];
      return true;
    }
    if (waddr >= MACHINE_REGS / 4 && waddr < MACHINE_REGS / 4 + REG_MAX) {
      *out = &machine_registers[waddr - MACHINE_REGS / 4];
      return true;
    }
    return false;
  }

  uint32_t peek(uint32_t waddr) {
    if (waddr >= MEMORY_END_WADDR) throw std::runtime_error("invalid peek addr");
    uint32_t* reg;
    if (try_reg(waddr, &reg)) return *reg;
    uint32_t page_idx = waddr / PAGE_WORDS;
    if (page_table[page_idx])
      return page_cache[page_table[page_idx] - 1]->load(waddr % PAGE_WORDS);
    return image_page(page_idx)->load(waddr % PAGE_WORDS);
  }

  uint32_t load(uint32_t waddr) {
    if (waddr >= MEMORY_END_WADDR) throw std::runtime_error("invalid load addr");
    uint32_t* reg;
    if (try_reg(waddr, &reg)) return *reg;
    uint32_t page_idx = waddr / PAGE_WORDS;
    if (!page_table[page_idx]) {
      load_page(page_idx);
      page_states.set(MEMORY_PAGES + page_idx, PageState::Loaded);
    }
    return page_cache[page_table[page_idx] - 1]->load(waddr % PAGE_WORDS);
  }

  Page* page_for_writing(uint32_t page_idx) {
    uint32_t node_idx = MEMORY_PAGES + page_idx;
    PageState state = page_states.get(node_idx);
    if (state == PageState::Unloaded) {
      load_page(page_idx);
      state = PageState::Loaded;
    }
    if (state == PageState::Loaded) {
      cycles += PAGE_CYCLES;
      fixup_costs(node_idx, PageState::Dirty);
      page_states.set(node_idx, PageState::Dirty);
    }
    return page_cache[page_table[page_idx] - 1].get();
  }

  void store(uint32_t waddr, uint32_t word) {
    if (waddr >= MEMORY_END_WADDR) throw std::runtime_error("invalid store addr");
    uint32_t* reg;
    if (try_reg(waddr, &reg)) {
      *reg = word;
      return;
    }
    page_for_writing(waddr / PAGE_WORDS)->store(waddr % PAGE_WORDS, word);
  }

  void write_registers() {
    uint32_t page_idx = (MACHINE_REGS / 4) / PAGE_WORDS;
    Page* page = page_for_writing(page_idx);
    for (uint32_t i = 0; i < REG_MAX; i++) {
      page->store(((MACHINE_REGS / 4) + i) % PAGE_WORDS, machine_registers[i]);
      page->store(((USER_REGS / 4) + i) % PAGE_WORDS, user_registers[i]);
    }
  }

  // Returns dirty pages; merges them into the working image.
  std::map<uint32_t, std::shared_ptr<Page>> commit() {
    write_registers();
    std::map<uint32_t, std::shared_ptr<Page>> partial;
    std::vector<uint32_t> keys = page_states.indexes;
    std::sort(keys.begin(), keys.end());
    for (uint32_t node_idx : keys) {
      if (node_idx < MEMORY_PAGES) continue;
      if (page_states.get(node_idx) != PageState::Dirty) continue;
      uint32_t page_idx = node_idx - MEMORY_PAGES;
      auto page = page_cache[page_table[page_idx] - 1];
      image[page_idx] = page;
      partial[page_idx] = page;
    }
    return partial;
  }

  std::set<uint32_t> page_indexes() const {
    return std::set<uint32_t>(page_states.indexes.begin(),
                              page_states.indexes.end());
  }
};

// ---------------------------------------------------------------------------
// Machine + emulator (reference execute/{rv32im,r0vm,sha2,poseidon2}.rs)
// ---------------------------------------------------------------------------

enum class Exception : uint32_t {
  InstructionMisaligned = 0,
  InstructionFault = 1,
  IllegalInstruction = 2,
  Breakpoint = 3,
  LoadAddressMisaligned = 4,
  LoadAccessFault = 5,
  StoreAddressMisaligned = 6,
  StoreAccessFault = 7,
  InvalidEcallDispatch = 8,
  UserEnvCall = 9,
};

// Recording hooks for the preflight context (reference Risc0Context,
// r0vm.rs:35-181: the executor uses fast register arrays; the preflight
// routes registers through recorded memory transactions).
struct Recorder {
  virtual ~Recorder() = default;
  virtual uint32_t recorded_load(struct Machine& m, uint32_t waddr) = 0;
  virtual void recorded_store(struct Machine& m, uint32_t waddr,
                              uint32_t word) = 0;
  virtual void on_insn_end(struct Machine& m, uint32_t insn_kind) = 0;
  virtual void on_ecall_cycle(struct Machine& m, CycleState cur,
                              CycleState next, uint32_t s0, uint32_t s1,
                              uint32_t s2) = 0;
  virtual void on_sha_cycle(struct Machine& m, CycleState cur,
                            const uint32_t sha_state[10]) = 0;
  virtual void on_p2_cycle(struct Machine& m, CycleState cur,
                           const struct P2State& p2) = 0;
  virtual void on_bigint_cycle(struct Machine& m, CycleState cur,
                               const uint32_t state[22]) = 0;
  virtual void on_resume(struct Machine& m) = 0;
  virtual void on_suspend(struct Machine& m) = 0;
  virtual void on_trap_rewind(struct Machine& m) = 0;
};

// Full Poseidon2 cycle state (reference execute/poseidon2.rs Poseidon2State)
struct P2State {
  uint32_t has_state = 0, state_addr = 0, buf_out_addr = 0, is_elem = 0,
           check_out = 0, load_tx_type = 0, next_state = 0, sub_state = 0,
           buf_in_addr = 0, count = 0, mode = 0;
  uint32_t inner[24] = {0};
};

struct Machine {
  PagedMemory pager;
  uint32_t pc = 0;
  uint32_t user_pc = 0;
  uint32_t machine_mode = 0;
  uint32_t user_cycles = 0;      // per-segment
  uint64_t session_user_cycles = 0;
  Digest input_digest{};
  std::optional<Digest> output_digest;
  std::optional<TerminateState> terminate_state;
  std::vector<std::vector<uint8_t>> read_record;
  std::vector<uint32_t> write_record;
  HostIO* io = nullptr;
  Recorder* rec = nullptr;
  std::unordered_map<uint32_t, uint64_t>* prof = nullptr;  // pc -> cycles

  explicit Machine(MemoryImage& image) : pager(image) {}

  // --- cycle accounting -----------------------------------------------------
  void inc_cycles(uint32_t n) {
    user_cycles += n;
    session_user_cycles += n;
  }

  uint32_t segment_cycles() const {
    return user_cycles + pager.cycles + RESERVED_CYCLES;
  }

  // --- memory helpers -------------------------------------------------------
  uint32_t load_mem(uint32_t waddr) {
    return rec ? rec->recorded_load(*this, waddr) : pager.load(waddr);
  }
  void store_mem(uint32_t waddr, uint32_t word) {
    if (rec)
      rec->recorded_store(*this, waddr, word);
    else
      pager.store(waddr, word);
  }

  uint32_t load_reg(uint32_t idx) {
    // preflight context: register reads are recorded memory transactions
    // (reference Risc0Context default load_register vs executor override)
    if (rec) {
      uint32_t base = machine_mode ? MACHINE_REGS / 4 : USER_REGS / 4;
      return load_mem(base + idx);
    }
    return machine_mode ? pager.machine_registers[idx]
                        : pager.user_registers[idx];
  }
  void store_reg(uint32_t idx, uint32_t word) {
    // writes to x0 shunt to a dead location (r0vm.rs:700-707)
    if (idx == REG_ZERO) {
      uint32_t base = machine_mode ? MACHINE_REGS / 4 : USER_REGS / 4;
      store_mem(base + REG_MAX * 2, word);
      return;
    }
    if (rec) {
      uint32_t base = machine_mode ? MACHINE_REGS / 4 : USER_REGS / 4;
      store_mem(base + idx, word);
      return;
    }
    if (machine_mode)
      pager.machine_registers[idx] = word;
    else
      pager.user_registers[idx] = word;
  }
  uint32_t load_machine_reg(uint32_t idx) {
    if (rec) return load_mem(MACHINE_REGS / 4 + idx);
    return pager.machine_registers[idx];
  }

  uint8_t load_u8(uint32_t addr) {
    uint32_t word = load_mem(addr / 4);
    return (word >> (8 * (addr & 3))) & 0xff;
  }
  void store_u8(uint32_t addr, uint8_t byte) {
    uint32_t word = load_mem(addr / 4);
    uint32_t shift = 8 * (addr & 3);
    word = (word & ~(0xffu << shift)) | ((uint32_t)byte << shift);
    store_mem(addr / 4, word);
  }

  void ecall_cycle(CycleState cur, CycleState next, uint32_t s0 = 0,
                   uint32_t s1 = 0, uint32_t s2 = 0) {
    inc_cycles(1);
    if (rec) rec->on_ecall_cycle(*this, cur, next, s0, s1, s2);
  }

  std::vector<uint8_t> load_region_peek(uint32_t addr, uint32_t size) {
    std::vector<uint8_t> out;
    out.reserve(size);
    if (addr % 4 == 0 && size % 4 == 0) {
      for (uint32_t i = 0; i < size; i += 4) {
        uint32_t w = pager.peek((addr + i) / 4);
        for (int j = 0; j < 4; j++) out.push_back((w >> (8 * j)) & 0xff);
      }
    } else {
      for (uint32_t i = 0; i < size; i++) {
        uint32_t w = pager.peek((addr + i) / 4);
        out.push_back((w >> (8 * ((addr + i) & 3))) & 0xff);
      }
    }
    return out;
  }

  // --- suspend/resume (r0vm.rs:324-338) -------------------------------------
  void suspend() {
    store_mem(SUSPEND_PC / 4, pc);
    store_mem(SUSPEND_MODE / 4, machine_mode);
    if (rec) rec->on_suspend(*this);
  }

  void resume() {
    pc = load_mem(SUSPEND_PC / 4);
    if (pc < ZERO_PAGE_END) throw std::runtime_error("invalid resume pc");
    machine_mode = load_mem(SUSPEND_MODE / 4);
    if (rec) {
      rec->on_resume(*this);  // records Resume rows + input-digest stores
      return;
    }
    for (uint32_t i = 0; i < 8; i++)
      store_mem(GLOBAL_INPUT / 4 + i, input_digest[i]);
  }

  // --- traps (r0vm.rs:585-666) ----------------------------------------------
  void enter_trap(uint32_t dispatch_addr) {
    if (machine_mode) throw std::runtime_error("illegal trap in machine mode");
    store_mem(MEPC / 4, pc);
    user_pc = pc;
    pc = dispatch_addr;
    machine_mode = 1;
  }

  void trap(Exception cause) {
    if (rec) rec->on_trap_rewind(*this);
    uint32_t dispatch_addr = load_mem(TRAP_DISPATCH / 4 + (uint32_t)cause);
    if (dispatch_addr % 4 != 0 || dispatch_addr < KERNEL_START ||
        dispatch_addr >= KERNEL_END) {
      char buf[128];
      std::snprintf(buf, sizeof(buf),
                    "invalid trap dispatch address, cause %u at pc 0x%08x "
                    "(insn 0x%08x, mode %u)",
                    (uint32_t)cause, pc, pager.peek(pc / 4), machine_mode);
      throw std::runtime_error(buf);
    }
    enter_trap(dispatch_addr);
  }

  // --- ecalls ---------------------------------------------------------------
  // returns false if the session terminated
  bool machine_ecall() {
    switch (load_reg(REG_A7)) {
      case HOST_ECALL_TERMINATE: return ecall_terminate();
      case HOST_ECALL_READ: return ecall_read();
      case HOST_ECALL_WRITE: return ecall_write();
      case HOST_ECALL_POSEIDON2: return ecall_poseidon2();
      case HOST_ECALL_SHA2: return ecall_sha2();
      case HOST_ECALL_BIGINT: return ecall_bigint();
      default:
        throw std::runtime_error("unknown machine ecall");
    }
  }

  bool ecall_terminate() {
    ecall_cycle(CycleState::MachineEcall, CycleState::Terminate);
    uint32_t a0 = load_reg(REG_A0), a1 = load_reg(REG_A1);
    terminate_state = TerminateState{a0, a1};
    Digest out;
    for (uint32_t i = 0; i < 8; i++) out[i] = pager.peek(GLOBAL_OUTPUT / 4 + i);
    output_digest = out;
    pc += 4;
    ecall_cycle(CycleState::Terminate, CycleState::Suspend);
    return false;
  }

  static CycleState next_io_state(uint32_t ptr, uint32_t rlen) {
    if (rlen == 0) return CycleState::Decode;
    if (ptr % 4 != 0 || rlen < 4) return CycleState::HostReadBytes;
    return CycleState::HostReadWords;
  }

  bool ecall_read() {
    // mirrors r0vm.rs ecall_read cycle accounting
    ecall_cycle(CycleState::MachineEcall, CycleState::HostReadSetup);
    CycleState cur_state = CycleState::HostReadSetup;
    uint32_t fd = load_reg(REG_A0);
    uint32_t ptr = load_reg(REG_A1);
    uint32_t len = load_reg(REG_A2);
    if ((uint64_t)ptr + len > UINT32_MAX) throw std::runtime_error("bad read len");
    if (len > MAX_IO_BYTES) throw std::runtime_error("read too big");
    if (len > 0 && ptr < ZERO_PAGE_END) throw std::runtime_error("bad read ptr");
    std::vector<uint8_t> bytes(len, 0);
    uint32_t rlen = io->host_read(fd, bytes.data(), len);
    if (rlen > len) throw std::runtime_error("host read overflow");
    bytes.resize(rlen);
    read_record.emplace_back(bytes);
    store_reg(REG_A0, rlen);
    if (rlen == 0) pc += 4;

    auto add_cycle = [&]() {
      CycleState next = next_io_state(ptr, rlen);
      ecall_cycle(cur_state, next, ptr / 4, ptr & 3, rlen);
      cur_state = next;
    };
    add_cycle();
    uint32_t i = 0;
    while (rlen > 0 && ptr % 4 != 0) {
      store_u8(ptr, bytes[i]);
      ptr++; i++; rlen--;
      if (rlen == 0) pc += 4;
      add_cycle();
    }
    while (rlen >= MAX_IO_WORDS) {
      uint32_t words = std::min(rlen / MAX_IO_WORDS, MAX_IO_WORDS);
      for (uint32_t j = 0; j < MAX_IO_WORDS; j++) {
        if (j < words) {
          uint32_t word;
          std::memcpy(&word, &bytes[i], 4);
          store_mem(ptr / 4, word);
          ptr += 4; i += 4; rlen -= 4;
        } else {
          store_mem(SAFE_WRITE / 4 + j, 0);
        }
      }
      if (rlen == 0) pc += 4;
      add_cycle();
    }
    while (rlen > 0) {
      store_u8(ptr, bytes[i]);
      ptr++; i++; rlen--;
      if (rlen == 0) pc += 4;
      add_cycle();
    }
    return true;
  }

  bool ecall_write() {
    ecall_cycle(CycleState::MachineEcall, CycleState::HostWrite);
    uint32_t fd = load_reg(REG_A0);
    uint32_t ptr = load_reg(REG_A1);
    uint32_t len = load_reg(REG_A2);
    if ((uint64_t)ptr + len > UINT32_MAX) throw std::runtime_error("bad write len");
    if (len > MAX_IO_BYTES) throw std::runtime_error("write too big");
    auto bytes = load_region_peek(ptr, len);
    uint32_t rlen = io->host_write(fd, bytes.data(), len);
    write_record.push_back(rlen);
    store_reg(REG_A0, rlen);
    pc += 4;
    ecall_cycle(CycleState::HostWrite, CycleState::Decode);
    return true;
  }

  // sha2 accelerator (execute/sha2.rs); cycle per state transition
  bool ecall_sha2();
  bool ecall_bigint();
  // poseidon2 accelerator (execute/poseidon2.rs)
  bool ecall_poseidon2();
  void p2_step(P2State& p2, CycleState& cur_state, CycleState next,
               uint32_t sub_state);
  void p2_rest(P2State& p2, CycleState final_state);

  // --- emulator step (execute/rv32im.rs) ------------------------------------
  bool step();  // returns false when terminated

  void insn_end(uint32_t insn_kind) {
    inc_cycles(1);
    if (rec) rec->on_insn_end(*this, insn_kind);
  }
};

// internal compute-op code -> reference InsnKind value
static const uint8_t kComputeOpToKind[56] = {
    /*0..9*/ 0, 1, 2, 3, 4, 5, 6, 33, 24, 32,
    /*10..15*/ 255, 255, 255, 255, 255, 255,
    /*16..23*/ 26, 27, 28, 29, 36, 37, 38, 39,
    /*24..32*/ 7, 8, 11, 12, 25, 34, 35, 9, 10,
    /*33..39*/ 255, 255, 255, 255, 255, 255, 255,
    /*40..43*/ 21, 22, 19, 20,
    /*44..47*/ 255, 255, 255, 255,
    /*48..55*/ 13, 14, 255, 255, 15, 16, 17, 18,
};
static const uint8_t kLoadFunc3ToKind[8] = {40, 41, 42, 255, 43, 44, 255, 255};
static const uint8_t kStoreFunc3ToKind[8] = {48, 49, 50, 255, 255, 255, 255, 255};

// sha helpers
static inline uint32_t rotr(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }
static inline uint32_t bswap(uint32_t x) { return __builtin_bswap32(x); }

bool Machine::ecall_sha2() {
  pc += 4;
  ecall_cycle(CycleState::MachineEcall, CycleState::ShaEcall);
  auto check_addr = [](uint32_t a) {
    if (a < ZERO_PAGE_END) throw std::runtime_error("bad sha addr");
    return a / 4;
  };
  uint32_t state_in = check_addr(load_machine_reg(REG_A0));
  uint32_t state_out = check_addr(load_machine_reg(REG_A1));
  uint32_t data_addr = check_addr(load_machine_reg(REG_A2));
  uint32_t count = load_machine_reg(REG_A3) & 0xffff;
  uint32_t k_addr = check_addr(load_machine_reg(REG_A4));
  if (count > MAX_SHA_COUNT) throw std::runtime_error("sha count too big");

  // recorded Sha2State (reference execute/sha2.rs:31-41)
  uint32_t cur_a = 0, cur_e = 0, cur_w = 0, round = 0;
  CycleState cur_state = CycleState::ShaEcall;
  auto sha_step = [&](CycleState next) {
    inc_cycles(1);
    if (rec) {
      // WORD addresses, matching the reference Sha2State (WordAddr
      // fields, execute/sha2.rs:31-43) — the witgen injector and the
      // preflight node-idx math both consume word addresses
      uint32_t st[10] = {state_in, state_out, data_addr, count,
                         k_addr, round, (uint32_t)next, cur_a, cur_e,
                         cur_w};
      rec->on_sha_cycle(*this, cur_state, st);
    }
    cur_state = next;
  };

  constexpr int BACK = 4 + 16 + 48;
  uint32_t old_a[BACK] = {0}, old_e[BACK] = {0}, old_w[16] = {0};
  int ca = 0, ce = 0, cw = 0;
  auto push_a = [&](uint32_t v) { old_a[ca] = v; ca = (ca + 1) % BACK; };
  auto push_e = [&](uint32_t v) { old_e[ce] = v; ce = (ce + 1) % BACK; };
  auto push_w = [&](uint32_t v) { old_w[cw] = v; cw = (cw + 1) % 16; };
  auto back_a = [&](int i) { return old_a[(BACK + ca - i) % BACK]; };
  auto back_e = [&](int i) { return old_e[(BACK + ce - i) % BACK]; };
  auto back_w = [&](int i) { return old_w[(16 + cw - i) % 16]; };

  auto compute_ae = [&](uint32_t k, uint32_t w, uint32_t* oa, uint32_t* oe) {
    uint32_t a = back_a(1), b = back_a(2), c = back_a(3), d = back_a(4);
    uint32_t e = back_e(1), f = back_e(2), g = back_e(3), h = back_e(4);
    uint32_t t1 = h + (rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)) +
                  ((e & f) ^ (~e & g)) + k + w;
    uint32_t t2 = (rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)) +
                  ((a & b) ^ (a & c) ^ (b & c));
    *oe = d + t1;
    *oa = t1 + t2;
  };

  for (uint32_t i = 0; i < 4; i++) {
    round = i;
    sha_step(CycleState::ShaLoadState);
    uint32_t a = load_mem(state_in + 3 - i);
    uint32_t e = load_mem(state_in + 7 - i);
    cur_a = bswap(a);
    cur_e = bswap(e);
    push_a(cur_a);
    push_e(cur_e);
    store_mem(state_out + 3 - i, a);
    store_mem(state_out + 7 - i, e);
  }

  while (count != 0) {
    for (uint32_t i = 0; i < 16; i++) {
      round = i;
      sha_step(CycleState::ShaLoadData);
      uint32_t k = load_mem(k_addr + i);
      cur_w = bswap(load_mem(data_addr));
      data_addr++;
      push_w(cur_w);
      compute_ae(k, cur_w, &cur_a, &cur_e);
      push_a(cur_a);
      push_e(cur_e);
    }
    for (uint32_t i = 0; i < 48; i++) {
      round = i;
      sha_step(CycleState::ShaMix);
      uint32_t k = load_mem(k_addr + 16 + i);
      cur_w = (rotr(back_w(2), 17) ^ rotr(back_w(2), 19) ^ (back_w(2) >> 10)) +
              back_w(7) +
              (rotr(back_w(15), 7) ^ rotr(back_w(15), 18) ^ (back_w(15) >> 3)) +
              back_w(16);
      push_w(cur_w);
      compute_ae(k, cur_w, &cur_a, &cur_e);
      push_a(cur_a);
      push_e(cur_e);
    }
    for (uint32_t i = 0; i < 4; i++) {
      round = i;
      sha_step(CycleState::ShaStoreState);
      cur_a = back_a(4) + back_a(BACK);
      cur_e = back_e(4) + back_e(BACK);
      cur_w = 0;
      if (i == 3) count--;
      push_a(cur_a);
      push_e(cur_e);
      store_mem(state_out + 3 - i, bswap(cur_a));
      store_mem(state_out + 7 - i, bswap(cur_e));
    }
  }
  round = 0;
  sha_step(CycleState::Decode);
  return true;
}

// Poseidon2 rest() state machine (reference execute/poseidon2.rs:87-180);
// shared by the guest ecall and the paging phases.  All addresses in P2State
// are WORD addresses.
void Machine::p2_step(P2State& p2, CycleState& cur_state, CycleState next,
                      uint32_t sub_state) {
  p2.next_state = (uint32_t)next;
  p2.sub_state = sub_state;
  inc_cycles(1);
  if (rec) rec->on_p2_cycle(*this, cur_state, p2);
  cur_state = next;
}

static void p2_ext_round(uint32_t inner[24], int idx) {
  if (idx >= 4) idx += 21;  // skip partial-round constants
  for (int i = 0; i < 24; i++)
    inner[i] = sbox7(bb_add(inner[i], P2_ROUND_CONSTANTS[idx * 24 + i]));
  mul_m_ext(inner);
}

static void p2_int_rounds(uint32_t inner[24]) {
  for (int r = 0; r < 21; r++) {
    inner[0] = sbox7(bb_add(inner[0], P2_ROUND_CONSTANTS[(4 + r) * 24]));
    mul_m_int(inner);
  }
}

void Machine::p2_rest(P2State& p2, CycleState final_state) {
  CycleState cur_state = (CycleState)p2.next_state;
  uint32_t state_addr = p2.state_addr;

  if (p2.has_state == 1) {
    p2_step(p2, cur_state, CycleState::PoseidonLoadState, 0);
    for (int i = 0; i < 8; i++) p2.inner[16 + i] = load_mem(state_addr + i);
  }

  while (p2.count > 0) {
    p2_step(p2, cur_state, CycleState::PoseidonLoadIn, 0);
    if (p2.is_elem != 0) {
      for (int i = 0; i < 8; i++) p2.inner[i] = load_mem(p2.buf_in_addr++);
      p2_step(p2, cur_state, CycleState::PoseidonLoadIn, 1);
      for (int i = 0; i < 8; i++) p2.inner[8 + i] = load_mem(p2.buf_in_addr++);
    } else {
      for (int i = 0; i < 8; i++) {
        uint32_t word = load_mem(p2.buf_in_addr++);
        p2.inner[2 * i] = word & 0xffff;
        p2.inner[2 * i + 1] = word >> 16;
      }
    }
    mul_m_ext(p2.inner);
    for (int i = 0; i < 4; i++) {
      p2_step(p2, cur_state, CycleState::PoseidonExtRound, i);
      p2_ext_round(p2.inner, i);
    }
    p2_step(p2, cur_state, CycleState::PoseidonIntRound, 0);
    p2_int_rounds(p2.inner);
    for (int i = 4; i < 8; i++) {
      p2_step(p2, cur_state, CycleState::PoseidonExtRound, i);
      p2_ext_round(p2.inner, i);
    }
    p2.count--;
  }

  p2_step(p2, cur_state, CycleState::PoseidonDoOut, 0);
  if (p2.check_out != 0) {
    for (int i = 0; i < 8; i++) {
      uint32_t word = load_mem(p2.buf_out_addr + i);
      if (word != p2.inner[i])
        throw std::runtime_error("poseidon2 check failed");
    }
  } else {
    for (int i = 0; i < 8; i++) store_mem(p2.buf_out_addr + i, p2.inner[i]);
  }
  p2.buf_in_addr = 0;
  if (p2.has_state == 1) {
    p2_step(p2, cur_state, CycleState::PoseidonStoreState, 0);
    for (int i = 0; i < 8; i++) store_mem(state_addr + i, p2.inner[16 + i]);
  }
  p2_step(p2, cur_state, final_state, 0);
}

bool Machine::ecall_poseidon2() {
  pc += 4;
  ecall_cycle(CycleState::MachineEcall, CycleState::PoseidonEntry);
  // reference poseidon2.rs:285-293: registers carry WORD addresses
  uint32_t state_addr = load_machine_reg(REG_A0);
  uint32_t buf_in = load_machine_reg(REG_A1);
  uint32_t buf_out = load_machine_reg(REG_A2);
  uint32_t bits_count = load_machine_reg(REG_A3);

  P2State p2;
  p2.state_addr = state_addr;
  p2.buf_in_addr = buf_in;
  p2.buf_out_addr = buf_out;
  p2.has_state = state_addr != 0;
  p2.is_elem = (bits_count & PFLAG_IS_ELEM) ? 1 : 0;
  p2.check_out = (bits_count & PFLAG_CHECK_OUT) ? 1 : 0;
  p2.count = bits_count & 0xffff;
  p2.mode = 1;
  p2.load_tx_type = 0;  // tx::READ
  p2.next_state = (uint32_t)CycleState::PoseidonEntry;
  p2_rest(p2, CycleState::Decode);
  return true;
}

// instruction step (reference execute/rv32im.rs:226-581)
bool Machine::step() {
  uint32_t insn_pc = pc;
  // check_insn_load (r0vm.rs:718-721)
  if (insn_pc < ZERO_PAGE_END || (!machine_mode && insn_pc >= KERNEL_START)) {
    trap(Exception::InstructionFault);
    return true;
  }
  uint32_t insn = load_mem(insn_pc / 4);
  if ((insn & 0x03) != 0x03) {
    trap(Exception::IllegalInstruction);
    return true;
  }

  uint32_t top_bit = insn >> 31;
  uint32_t func7 = (insn >> 25) & 0x7f;
  uint32_t rs2i = (insn >> 20) & 0x1f;
  uint32_t rs1i = (insn >> 15) & 0x1f;
  uint32_t func3 = (insn >> 12) & 0x7;
  uint32_t rdi = (insn >> 7) & 0x1f;
  uint32_t opcode = insn & 0x7f;

  uint32_t imm_i = (top_bit * 0xfffff000) | (func7 << 5) | rs2i;
  uint32_t imm_s = (top_bit * 0xfffff000) | (func7 << 5) | rdi;
  uint32_t imm_b = (top_bit * 0xfffff000) | ((rdi & 1) << 11) |
                   ((func7 & 0x3f) << 5) | (rdi & 0x1e);
  uint32_t imm_j = (top_bit * 0xfff00000) | (rs1i << 15) | (func3 << 12) |
                   ((rs2i & 1) << 11) | ((func7 & 0x3f) << 5) | (rs2i & 0x1e);
  uint32_t imm_u = insn & 0xfffff000;

  auto check_data_addr = [&](uint32_t addr) {
    // check_data_load (r0vm.rs:723-727)
    return (addr >= ZERO_PAGE_END && machine_mode) ||
           (addr >= USER_START && addr < USER_END);
  };

  enum Cls { COMPUTE, LOAD, STORE, SYSTEM } cls;
  int op = -1;  // local op code within class
  switch (opcode) {
    case 0b0110011:
      cls = COMPUTE;
      if (func7 == 0b0000001) op = 16 + func3;           // M extension
      else if (func7 == 0b0100000 && func3 == 0b000) op = 1;   // sub
      else if (func7 == 0b0100000 && func3 == 0b101) op = 7;   // sra
      else if (func7 == 0b0000000) {
        // func3: 0 add,1 sll,2 slt,3 sltu,4 xor,5 srl,6 or,7 and
        // -> op:  0 add,8 sll,5 slt,6 sltu,2 xor,9 srl,3 or,4 and
        static const int map[8] = {0, 8, 5, 6, 2, 9, 3, 4};
        op = map[func3];
      } else op = -1;
      break;
    case 0b0010011:
      cls = COMPUTE;
      switch (func3) {
        case 0b000: op = 24; break;  // addi
        case 0b001: op = (func7 == 0) ? 28 : -1; break;  // slli
        case 0b010: op = 26; break;  // slti
        case 0b011: op = 27; break;  // sltiu
        case 0b100: op = 25; break;  // xori
        case 0b101:
          if (func7 == 0b0000000) op = 29;       // srli
          else if (func7 == 0b0100000) op = 30;  // srai
          else op = -1;
          break;
        case 0b110: op = 31; break;  // ori
        case 0b111: op = 32; break;  // andi
      }
      break;
    case 0b0000011: cls = LOAD; op = func3; break;
    case 0b0100011: cls = STORE; op = func3; break;
    case 0b0110111: cls = COMPUTE; op = 40; break;  // lui
    case 0b0010111: cls = COMPUTE; op = 41; break;  // auipc
    case 0b1100011: cls = COMPUTE; op = 48 + func3; break;  // branches
    case 0b1101111: cls = COMPUTE; op = 42; break;  // jal
    case 0b1100111: cls = COMPUTE; op = 43; break;  // jalr
    case 0b1110011:
      cls = SYSTEM;
      if (func3 == 0 && func7 == 0b0011000) op = 1;  // mret
      else if (func3 == 0 && func7 == 0b0000000) op = 0;  // eany
      else op = -1;
      break;
    case 0b0001111:
      cls = SYSTEM;
      op = (func3 == 0) ? 2 : -1;  // fence
      break;
    default: op = -1; cls = COMPUTE; break;
  }

  if (op < 0) {
    trap(Exception::IllegalInstruction);
    return true;
  }

  if (cls == SYSTEM) {
    switch (op) {
      case 0:  // eany
        switch (rs2i) {
          case 0: {
            // machine ecalls account their own cycles and return false on
            // terminate (r0vm.rs:348-359,568-580); a user ecall enters the
            // kernel dispatch and counts as one normal instruction.
            if (machine_mode) return machine_ecall();
            uint32_t dispatch_addr = load_mem(ECALL_DISPATCH / 4);
            if (dispatch_addr % 4 != 0 || dispatch_addr < KERNEL_START ||
                dispatch_addr >= KERNEL_END) {
              trap(Exception::UserEnvCall);
              return true;
            }
            enter_trap(dispatch_addr);
            insn_end(56);  // Eany
            return true;
          }
          case 1: trap(Exception::Breakpoint); return true;
          default: trap(Exception::IllegalInstruction); return true;
        }
      case 1:  // mret (r0vm.rs:637-645)
        if (!machine_mode) throw std::runtime_error("illegal mret in user mode");
        {
          uint32_t mepc = load_mem(MEPC / 4);
          if (mepc < ZERO_PAGE_END) throw std::runtime_error("bad mepc");
          pc = mepc + 4;
          machine_mode = 0;
        }
        insn_end(57);  // Mret
        return true;
      case 2:  // fence
        pc += 4;
        insn_end(58);  // Fence
        return true;
    }
  }

  if (cls == LOAD) {
    uint32_t rs1 = load_reg(rs1i);
    uint32_t addr = rs1 + imm_i;
    if (!check_data_addr(addr)) {
      trap(Exception::LoadAccessFault);
      return true;
    }
    uint32_t data = load_mem(addr / 4);
    uint32_t shift = 8 * (addr & 3);
    uint32_t out = 0;
    switch (op) {
      case 0b000: out = (data >> shift) & 0xff; if (out & 0x80) out |= 0xffffff00; break;
      case 0b001:
        if (addr & 1) { trap(Exception::LoadAddressMisaligned); return true; }
        out = (data >> shift) & 0xffff; if (out & 0x8000) out |= 0xffff0000; break;
      case 0b010:
        if (addr & 3) { trap(Exception::LoadAddressMisaligned); return true; }
        out = data; break;
      case 0b100: out = (data >> shift) & 0xff; break;
      case 0b101:
        if (addr & 1) { trap(Exception::LoadAddressMisaligned); return true; }
        out = (data >> shift) & 0xffff; break;
      default: trap(Exception::IllegalInstruction); return true;
    }
    store_reg(rdi, out);
    pc += 4;
    insn_end(kLoadFunc3ToKind[op]);
    return true;
  }

  if (cls == STORE) {
    // rs2==rs1 must not re-record the same (addr, cycle) memory txn
    // (reference execute/rv32im.rs:317-328 load_rs2 returns the cached rs1)
    uint32_t rs1 = load_reg(rs1i);
    uint32_t rs2 = rs2i == rs1i ? rs1 : load_reg(rs2i);
    uint32_t addr = rs1 + imm_s;
    uint32_t shift = 8 * (addr & 3);
    if (!check_data_addr(addr)) {
      trap(Exception::StoreAccessFault);
      return true;
    }
    uint32_t data = load_mem(addr / 4);
    switch (op) {
      case 0b000:
        data = (data & ~(0xffu << shift)) | ((rs2 & 0xff) << shift);
        break;
      case 0b001:
        if (addr & 1) { trap(Exception::StoreAddressMisaligned); return true; }
        data = (data & ~(0xffffu << shift)) | ((rs2 & 0xffff) << shift);
        break;
      case 0b010:
        if (addr & 3) { trap(Exception::StoreAddressMisaligned); return true; }
        data = rs2;
        break;
      default: trap(Exception::IllegalInstruction); return true;
    }
    store_mem(addr / 4, data);
    pc += 4;
    insn_end(kStoreFunc3ToKind[op]);
    return true;
  }

  // COMPUTE
  // rs2==rs1 reuses the loaded value (reference execute/rv32im.rs:317-328)
  uint32_t rs1 = load_reg(rs1i);
  uint32_t rs2 = rs2i == rs1i ? rs1 : load_reg(rs2i);
  uint32_t new_pc = insn_pc + 4;
  uint32_t rd = rdi;
  uint32_t out = 0;
  auto br = [&](bool cond) {
    rd = 0;
    if (cond) new_pc = insn_pc + imm_b;
    return 0u;
  };
  switch (op) {
    case 0: out = rs1 + rs2; break;                       // add
    case 1: out = rs1 - rs2; break;                       // sub
    case 2: out = rs1 ^ rs2; break;                       // xor
    case 3: out = rs1 | rs2; break;                       // or
    case 4: out = rs1 & rs2; break;                       // and
    case 5: out = (int32_t)rs1 < (int32_t)rs2; break;     // slt
    case 6: out = rs1 < rs2; break;                       // sltu
    case 8: out = rs1 << (rs2 & 0x1f); break;             // sll
    case 9: out = rs1 >> (rs2 & 0x1f); break;             // srl
    case 7: out = (uint32_t)((int32_t)rs1 >> (rs2 & 0x1f)); break;  // sra
    case 16: out = rs1 * rs2; break;                      // mul
    case 17: out = (uint32_t)(((int64_t)(int32_t)rs1 * (int64_t)(int32_t)rs2) >> 32); break;
    case 18: out = (uint32_t)(((int64_t)(int32_t)rs1 * (int64_t)(uint64_t)rs2) >> 32); break;
    case 19: out = (uint32_t)(((uint64_t)rs1 * rs2) >> 32); break;
    case 20:  // div
      out = rs2 == 0 ? UINT32_MAX
            : (rs1 == 0x80000000u && rs2 == UINT32_MAX)
                ? rs1
                : (uint32_t)((int32_t)rs1 / (int32_t)rs2);
      break;
    case 21: out = rs2 == 0 ? UINT32_MAX : rs1 / rs2; break;  // divu
    case 22:  // rem
      out = rs2 == 0 ? rs1
            : (rs1 == 0x80000000u && rs2 == UINT32_MAX)
                ? 0
                : (uint32_t)((int32_t)rs1 % (int32_t)rs2);
      break;
    case 23: out = rs2 == 0 ? rs1 : rs1 % rs2; break;  // remu
    case 24: out = rs1 + imm_i; break;                 // addi
    case 25: out = rs1 ^ imm_i; break;                 // xori
    case 26: out = (int32_t)rs1 < (int32_t)imm_i; break;
    case 27: out = rs1 < imm_i; break;
    case 28: out = rs1 << (imm_i & 0x1f); break;
    case 29: out = rs1 >> (imm_i & 0x1f); break;
    case 30: out = (uint32_t)((int32_t)rs1 >> (imm_i & 0x1f)); break;
    case 31: out = rs1 | imm_i; break;
    case 32: out = rs1 & imm_i; break;
    case 40: out = imm_u; break;                       // lui
    case 41: out = insn_pc + imm_u; break;             // auipc
    case 42: new_pc = insn_pc + imm_j; out = insn_pc + 4; break;  // jal
    case 43: new_pc = (rs1 + imm_i) & 0xfffffffe; out = insn_pc + 4; break;  // jalr
    case 48: out = br(rs1 == rs2); break;
    case 49: out = br(rs1 != rs2); break;
    case 52: out = br((int32_t)rs1 < (int32_t)rs2); break;
    case 53: out = br((int32_t)rs1 >= (int32_t)rs2); break;
    case 54: out = br(rs1 < rs2); break;
    case 55: out = br(rs1 >= rs2); break;
    default: trap(Exception::IllegalInstruction); return true;
  }
  if (new_pc % 4 != 0) {
    trap(Exception::InstructionMisaligned);
    return true;
  }
  store_reg(rd, out);
  pc = new_pc;
  insn_end(kComputeOpToKind[op]);
  return true;
}

// ---------------------------------------------------------------------------
// Segment replay (reference execute/segment.rs:69-84)
// ---------------------------------------------------------------------------

namespace {

struct ReplayIO : HostIO {
  const std::vector<std::vector<uint8_t>>* reads;
  const std::vector<uint32_t>* writes;
  size_t cur_read = 0;
  size_t cur_write = 0;

  uint32_t host_read(uint32_t fd, uint8_t* buf, uint32_t len) override {
    if (cur_read >= reads->size())
      throw std::runtime_error("replay: read record exhausted");
    const auto& rec = (*reads)[cur_read++];
    if (rec.size() > len) throw std::runtime_error("replay: read too long");
    std::memcpy(buf, rec.data(), rec.size());
    return (uint32_t)rec.size();
  }

  uint32_t host_write(uint32_t fd, const uint8_t* buf, uint32_t len) override {
    if (cur_write >= writes->size())
      throw std::runtime_error("replay: write record exhausted");
    return (*writes)[cur_write++];
  }
};

}  // namespace

ReplayResult replay_segment(const Segment& seg, const Digest& input_digest) {
  // reconstruct the partial pre-image: pages + uncle digests
  MemoryImage image;
  image.digests.clear();
  for (auto& [idx, d] : seg.page_digests) image.digests[idx] = d;
  for (auto& [page_idx, page] : seg.pages) {
    // leaf digests always recompute from the page data: the pre-image root
    // must attest the actual bytes, not caller-claimed digests
    image.digests[MEMORY_PAGES + page_idx] = page->digest();
    image.pages[page_idx] = page;
  }

  // Compute every interior node whose children are known, bottom-up; the
  // partial image carries leaf digests + uncles, which determine the root.
  auto recompute = [&image]() {
    uint32_t max_idx = image.digests.rbegin()->first;
    for (uint32_t idx = max_idx / 2; idx >= 1; idx--) {
      auto l = image.digests.find(2 * idx);
      auto r = image.digests.find(2 * idx + 1);
      if (l != image.digests.end() && r != image.digests.end())
        image.digests[idx] = digest_pair(l->second, r->second);
      if (idx == 1) break;
    }
  };
  recompute();

  ReplayResult res;
  res.pre_digest = image.image_id();

  ReplayIO io;
  io.reads = &seg.read_record;
  io.writes = &seg.write_record;

  Machine m(image);
  m.io = &io;
  io.machine_handle = &m;
  m.input_digest = input_digest;
  m.resume();

  while (m.user_cycles < seg.suspend_cycle && !m.terminate_state.has_value()) {
    if (!m.step()) break;
  }
  m.suspend();
  auto partial = m.pager.commit();
  for (auto& [idx, page] : partial)
    image.digests[MEMORY_PAGES + idx] = (image.pages[idx] = page)->digest();
  recompute();

  res.user_cycles = m.user_cycles;
  res.pager_cycles = m.pager.cycles;
  res.terminate_state = m.terminate_state;
  res.post_digest = image.image_id();
  return res;
}


// --- debug stepping (GDB stub; reference execute/gdb.rs) --------------------

void* debug_machine_create(MemoryImage& image, HostIO* io) {
  auto* m = new Machine(image);
  m->io = io;
  io->machine_handle = m;
  m->resume();
  return m;
}

int debug_machine_step(void* machine, uint64_t max_steps, const uint32_t* bps,
                       uint32_t n_bps, uint32_t* stop_pc) {
  auto* m = static_cast<Machine*>(machine);
  for (uint64_t i = 0; i < max_steps; i++) {
    if (!m->machine_mode && i > 0) {
      for (uint32_t b = 0; b < n_bps; b++) {
        if (m->pc == bps[b]) {
          if (stop_pc) *stop_pc = m->pc;
          return 2;
        }
      }
    }
    if (m->terminate_state.has_value()) return 1;
    if (!m->step()) return 1;
  }
  if (stop_pc) *stop_pc = m->pc;
  return 0;
}

uint32_t debug_machine_pc(void* machine) {
  return static_cast<Machine*>(machine)->pc;
}

uint32_t debug_machine_mode(void* machine) {
  return static_cast<Machine*>(machine)->machine_mode;
}

int debug_machine_halted(void* machine) {
  return static_cast<Machine*>(machine)->terminate_state.has_value() ? 1 : 0;
}

uint32_t debug_machine_exit_code(void* machine) {
  auto* m = static_cast<Machine*>(machine);
  return m->terminate_state ? m->terminate_state->a0 : 0;
}

void debug_machine_regs(void* machine, uint32_t out[32]) {
  auto* m = static_cast<Machine*>(machine);
  for (int i = 0; i < 32; i++) out[i] = m->pager.user_registers[i];
}

void debug_machine_free(void* machine) {
  delete static_cast<Machine*>(machine);
}

void* machine_fork_impl(void* machine, HostIO* io) {
  Machine* parent = static_cast<Machine*>(machine);
  auto* child = new Machine(*parent);
  child->rec = nullptr;
  for (auto& p : child->pager.page_cache)
    if (p) p = std::make_shared<Page>(*p);
  child->io = io;
  io->machine_handle = child;
  return child;
}

int machine_fork_run_impl(void* machine, uint64_t max_cycles) {
  Machine* m = static_cast<Machine*>(machine);
  while (!m->terminate_state.has_value()) {
    if (m->session_user_cycles >= max_cycles) return 2;
    if (!m->step()) break;
  }
  return 0;
}

void machine_fork_free_impl(void* machine) {
  delete static_cast<Machine*>(machine);
}

void machine_terminate_impl(void* machine, uint32_t a0, uint32_t a1) {
  static_cast<Machine*>(machine)->terminate_state = TerminateState{a0, a1};
}

uint32_t machine_peek(void* machine, uint32_t waddr) {
  return static_cast<Machine*>(machine)->pager.peek(waddr);
}

uint32_t machine_user_reg(void* machine, uint32_t idx) {
  return static_cast<Machine*>(machine)->pager.user_registers[idx & 31];
}

uint64_t machine_user_cycles(void* machine) {
  return static_cast<Machine*>(machine)->session_user_cycles;
}

// ---------------------------------------------------------------------------
// Executor (reference execute/executor.rs)
// ---------------------------------------------------------------------------

static std::map<uint32_t, Digest> partial_image_digests(
    MemoryImage& img, const std::set<uint32_t>& indexes) {
  // uncle digests for standalone replay (pager.rs compute_partial_image)
  std::map<uint32_t, Digest> out;
  for (uint32_t node_idx : indexes) {
    if (node_idx >= MEMORY_PAGES) {
      out[node_idx] = img.get_digest(node_idx);
      continue;
    }
    uint32_t lhs = node_idx * 2, rhs = node_idx * 2 + 1;
    if (!indexes.count(lhs)) out[lhs] = img.get_digest(lhs);
    if (!indexes.count(rhs)) out[rhs] = img.get_digest(rhs);
  }
  return out;
}

ExecResult execute_run(SessionState& ss, uint32_t segment_po2,
                       uint64_t max_cycles, const Digest& input_digest,
                       HostIO& io, void* seg_user, SegmentFn seg_fn) {
  constexpr uint32_t MAX_INSN_CYCLES = 25'000;  // reference lib.rs:45
  uint32_t segment_limit = 1u << segment_po2;
  if (MAX_INSN_CYCLES >= segment_limit)
    throw std::runtime_error("segment po2 too small");
  uint32_t segment_threshold = segment_limit - MAX_INSN_CYCLES;

  MemoryImage image = ss.rolling;       // this run's working image
  MemoryImage& rolling = ss.rolling;    // accumulates committed pages
  Digest initial_digest = rolling.image_id();

  Machine m(image);
  m.io = &io;
  io.machine_handle = &m;
  m.input_digest = input_digest;
  m.session_user_cycles = ss.prior_user_cycles;
  if (ss.profile_enabled) m.prof = &ss.profile;
  m.resume();

  ExecResult res;
  res.pre_state = initial_digest;
  res.input = input_digest;
  uint64_t& segment_counter = ss.segment_counter;
  uint64_t first_segment = segment_counter;

  bool trace_ring = getenv("RISC0_TPU_TRACE") != nullptr;
  struct TraceEnt { uint32_t pc, insn; };
  std::vector<TraceEnt> trace_buf(64);
  uint64_t trace_pos = 0;
  auto dump_trace = [&]() {
    if (!trace_ring) return;
    fprintf(stderr, "last instructions:\n");
    for (uint64_t i = trace_pos > 64 ? trace_pos - 64 : 0; i < trace_pos; i++) {
      auto& e = trace_buf[i % 64];
      fprintf(stderr, "  %08x: %08x\n", e.pc, e.insn);
    }
  };

  auto emit_segment = [&](uint32_t po2, uint32_t threshold) {
    auto partial_pages = m.pager.commit();
    auto indexes = m.pager.page_indexes();

    Segment seg;
    seg.index = segment_counter;
    seg.po2 = po2;
    seg.suspend_cycle = m.user_cycles;
    seg.paging_cycles = m.pager.cycles;
    seg.segment_threshold = threshold;
    seg.input_digest = m.input_digest;
    seg.output_digest = m.output_digest;
    seg.terminate_state = m.terminate_state;
    seg.read_record = std::move(m.read_record);
    seg.write_record = std::move(m.write_record);
    m.read_record.clear();
    m.write_record.clear();

    seg.pre_digest = rolling.image_id();
    // partial pre-image: original pages + uncle digests
    for (uint32_t node_idx : indexes) {
      if (node_idx < MEMORY_PAGES) continue;
      uint32_t page_idx = node_idx - MEMORY_PAGES;
      seg.pages[page_idx] = rolling.get_page(page_idx);
    }
    seg.page_digests = partial_image_digests(rolling, indexes);

    // apply dirty pages, update digests
    for (auto& [idx, page] : partial_pages) rolling.set_page(idx, page);
    rolling.update_digests();
    seg.post_digest = rolling.image_id();

    if (seg_fn) seg_fn(seg_user, seg);
    segment_counter++;
  };

  while (!m.terminate_state.has_value()) {
    if (max_cycles && m.session_user_cycles >= max_cycles)
      throw std::runtime_error("session limit exceeded");

    if (m.terminate_state.has_value()) break;
    if (m.segment_cycles() > segment_threshold) {
      if (m.segment_cycles() >= segment_limit) {
        dump_trace();
        throw std::runtime_error("segment limit too small for instruction");
      }
      m.suspend();
      emit_segment(segment_po2, segment_threshold);
      uint64_t total = segment_limit;
      res.total_cycles += total;
      res.paging_cycles += m.pager.cycles;
      res.reserved_cycles += total - m.pager.cycles - m.user_cycles;
      m.user_cycles = 0;
      m.pager.reset();
      m.resume();
    }

    if (trace_ring) {
      trace_buf[trace_pos % 64] = {m.pc, m.pager.peek(m.pc / 4)};
      trace_pos++;
      if (getenv("RISC0_TPU_TRACE_LIVE"))
        fprintf(stderr, "%08llx %u %08x: %08x a0=%08x a1=%08x a2=%08x a3=%08x t0=%08x\n",
                (unsigned long long)trace_pos, m.machine_mode, m.pc,
                m.pager.peek(m.pc / 4),
                m.machine_mode ? m.pager.machine_registers[10] : m.pager.user_registers[10],
                m.machine_mode ? m.pager.machine_registers[11] : m.pager.user_registers[11],
                m.machine_mode ? m.pager.machine_registers[12] : m.pager.user_registers[12],
                m.machine_mode ? m.pager.machine_registers[13] : m.pager.user_registers[13],
                m.machine_mode ? m.pager.machine_registers[5] : m.pager.user_registers[5]);
    }
    try {
      if (m.prof) {
        uint32_t pc0 = m.pc;
        uint64_t c0 = m.session_user_cycles;
        bool cont = m.step();
        (*m.prof)[pc0] += m.session_user_cycles - c0;
        if (!cont) break;
      } else if (!m.step()) {
        break;
      }
    } catch (...) {
      dump_trace();
      throw;
    }
  }

  m.suspend();
  uint32_t final_cycles_32 = m.segment_cycles();
  uint32_t final_po2 = 0;
  while ((1u << final_po2) < final_cycles_32) final_po2++;
  emit_segment(final_po2, 0);
  uint64_t final_cycles = 1ull << final_po2;
  res.total_cycles += final_cycles;
  res.paging_cycles += m.pager.cycles;
  res.reserved_cycles += final_cycles - m.pager.cycles - m.user_cycles;

  res.segments = segment_counter - first_segment;
  res.user_cycles = m.session_user_cycles - ss.prior_user_cycles;
  ss.prior_user_cycles = m.session_user_cycles;
  res.post_state = rolling.image_id();
  res.output = m.output_digest;
  res.terminate_state = m.terminate_state;
  return res;
}

ExecResult execute(MemoryImage image, uint32_t segment_po2,
                   uint64_t max_cycles, const Digest& input_digest,
                   HostIO& io, void* seg_user, SegmentFn seg_fn) {
  SessionState ss;
  ss.rolling = std::move(image);
  return execute_run(ss, segment_po2, max_cycles, input_digest, io, seg_user,
                     seg_fn);
}

}  // namespace r0

#include "preflight.inc"
#include "bigint.inc"
#include "bigint_ecall.inc"

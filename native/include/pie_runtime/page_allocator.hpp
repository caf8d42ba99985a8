// Lock-free refcounted KV-page allocator.
//
// Reference parity: pie_core's PageAllocator (reference
// src/engine/page_allocator.cpp:120-157 — single Treiber-stack free list
// whose multithreaded throughput DEGRADES with thread count, see
// benchmarks/RESULTS.md:47-121). This design shards the free list across
// N per-thread stacks with work stealing, so concurrent alloc/free scale
// instead of contending on one CAS head.
//
// Pages here are *metadata* (ids + refcounts + token counts): the actual KV
// bytes live in TPU HBM inside the paged pool arrays managed by JAX; the
// host runtime only hands out page ids (the C++ core of the reference held
// the bytes too because Apple unified memory made that free — on TPU the
// device pool is device-side by design).

#pragma once

#include <atomic>
#include <cstdint>
#include <memory>
#include <optional>
#include <vector>

namespace pie_runtime {

inline constexpr uint32_t kTokensPerPage = 64;  // reference page.hpp:14-16

struct alignas(64) PageMeta {
  std::atomic<uint32_t> ref_count{0};
  std::atomic<uint32_t> num_tokens{0};
  // intrusive freelist link: index of next free page in the same shard,
  // kNull when tail.
  std::atomic<uint32_t> next_free{0};
};

class PageAllocator {
 public:
  static constexpr uint32_t kNull = 0xffffffffu;

  explicit PageAllocator(uint32_t num_pages, uint32_t num_shards = 0);

  PageAllocator(const PageAllocator&) = delete;
  PageAllocator& operator=(const PageAllocator&) = delete;

  // Returns page id or nullopt on exhaustion (refcount starts at 1).
  std::optional<uint32_t> allocate_page();

  // Drop one reference; page returns to the pool at zero.
  void free_page(uint32_t page_id);

  // Extra reference for prefix sharing (reference page_allocator.cpp:89-92).
  void add_ref(uint32_t page_id);

  uint32_t ref_count(uint32_t page_id) const;
  void set_num_tokens(uint32_t page_id, uint32_t n);
  uint32_t num_tokens(uint32_t page_id) const;

  uint32_t num_pages() const { return num_pages_; }
  // Approximate (racy) free count, like the reference's counter.
  uint32_t num_free_pages() const {
    return free_count_.load(std::memory_order_relaxed);
  }

 private:
  struct alignas(64) Shard {
    // head encodes {index:32, tag:32} to defeat ABA.
    std::atomic<uint64_t> head{static_cast<uint64_t>(kNull)};
  };

  static uint64_t pack(uint32_t idx, uint32_t tag) {
    return (static_cast<uint64_t>(tag) << 32) | idx;
  }
  static uint32_t unpack_idx(uint64_t v) {
    return static_cast<uint32_t>(v & 0xffffffffu);
  }
  static uint32_t unpack_tag(uint64_t v) {
    return static_cast<uint32_t>(v >> 32);
  }

  bool pop_from(Shard& shard, uint32_t* out);
  void push_to(Shard& shard, uint32_t idx);
  uint32_t home_shard() const;

  uint32_t num_pages_;
  uint32_t num_shards_;
  std::vector<PageMeta> pages_;
  std::vector<Shard> shards_;
  std::atomic<uint32_t> free_count_;
};

}  // namespace pie_runtime

#include "pie_runtime/page_allocator.hpp"

#include <stdexcept>
#include <thread>

namespace pie_runtime {

namespace {
std::atomic<uint32_t> g_thread_counter{0};
thread_local uint32_t t_thread_id = 0xffffffffu;

uint32_t thread_slot() {
  if (t_thread_id == 0xffffffffu) {
    t_thread_id = g_thread_counter.fetch_add(1, std::memory_order_relaxed);
  }
  return t_thread_id;
}
}  // namespace

PageAllocator::PageAllocator(uint32_t num_pages, uint32_t num_shards)
    : num_pages_(num_pages), free_count_(num_pages) {
  if (num_pages == 0 || num_pages == kNull) {
    throw std::invalid_argument("num_pages must be in [1, 2^32-2]");
  }
  if (num_shards == 0) {
    num_shards = std::max(1u, std::thread::hardware_concurrency());
  }
  num_shards_ = num_shards;
  pages_ = std::vector<PageMeta>(num_pages);
  shards_ = std::vector<Shard>(num_shards_);
  // Round-robin the initial pool across shards; build intrusive lists.
  std::vector<uint32_t> heads(num_shards_, kNull);
  for (uint32_t i = num_pages; i-- > 0;) {
    uint32_t s = i % num_shards_;
    pages_[i].next_free.store(heads[s], std::memory_order_relaxed);
    heads[s] = i;
  }
  for (uint32_t s = 0; s < num_shards_; ++s) {
    shards_[s].head.store(pack(heads[s], 0), std::memory_order_relaxed);
  }
}

uint32_t PageAllocator::home_shard() const {
  return thread_slot() % num_shards_;
}

bool PageAllocator::pop_from(Shard& shard, uint32_t* out) {
  uint64_t head = shard.head.load(std::memory_order_acquire);
  while (true) {
    uint32_t idx = unpack_idx(head);
    if (idx == kNull) return false;
    uint32_t next = pages_[idx].next_free.load(std::memory_order_relaxed);
    uint64_t desired = pack(next, unpack_tag(head) + 1);
    if (shard.head.compare_exchange_weak(head, desired,
                                         std::memory_order_acq_rel,
                                         std::memory_order_acquire)) {
      *out = idx;
      return true;
    }
  }
}

void PageAllocator::push_to(Shard& shard, uint32_t idx) {
  uint64_t head = shard.head.load(std::memory_order_relaxed);
  while (true) {
    pages_[idx].next_free.store(unpack_idx(head), std::memory_order_relaxed);
    uint64_t desired = pack(idx, unpack_tag(head) + 1);
    if (shard.head.compare_exchange_weak(head, desired,
                                         std::memory_order_acq_rel,
                                         std::memory_order_relaxed)) {
      return;
    }
  }
}

std::optional<uint32_t> PageAllocator::allocate_page() {
  uint32_t home = home_shard();
  uint32_t idx;
  // home shard first, then steal round-robin
  for (uint32_t probe = 0; probe < num_shards_; ++probe) {
    Shard& s = shards_[(home + probe) % num_shards_];
    if (pop_from(s, &idx)) {
      free_count_.fetch_sub(1, std::memory_order_relaxed);
      pages_[idx].ref_count.store(1, std::memory_order_release);
      pages_[idx].num_tokens.store(0, std::memory_order_relaxed);
      return idx;
    }
  }
  return std::nullopt;
}

void PageAllocator::free_page(uint32_t page_id) {
  if (page_id >= num_pages_) throw std::out_of_range("bad page id");
  uint32_t prev =
      pages_[page_id].ref_count.fetch_sub(1, std::memory_order_acq_rel);
  if (prev == 0) throw std::logic_error("free of page with refcount 0");
  if (prev == 1) {
    push_to(shards_[home_shard()], page_id);
    free_count_.fetch_add(1, std::memory_order_relaxed);
  }
}

void PageAllocator::add_ref(uint32_t page_id) {
  if (page_id >= num_pages_) throw std::out_of_range("bad page id");
  uint32_t prev =
      pages_[page_id].ref_count.fetch_add(1, std::memory_order_acq_rel);
  if (prev == 0) throw std::logic_error("add_ref of free page");
}

uint32_t PageAllocator::ref_count(uint32_t page_id) const {
  return pages_[page_id].ref_count.load(std::memory_order_acquire);
}

void PageAllocator::set_num_tokens(uint32_t page_id, uint32_t n) {
  pages_[page_id].num_tokens.store(n, std::memory_order_release);
}

uint32_t PageAllocator::num_tokens(uint32_t page_id) const {
  return pages_[page_id].num_tokens.load(std::memory_order_acquire);
}

}  // namespace pie_runtime

// C ABI for ctypes bindings (reference exposed its core via nanobind,
// src/bindings.cpp; pybind11/nanobind are not vendored here so the Python
// side binds through ctypes instead).

#include <cstdint>
#include <new>

#include "pie_runtime/page_allocator.hpp"

using pie_runtime::PageAllocator;

extern "C" {

void* pie_alloc_create(uint32_t num_pages, uint32_t num_shards) {
  try {
    return new PageAllocator(num_pages, num_shards);
  } catch (...) {
    return nullptr;
  }
}

void pie_alloc_destroy(void* h) { delete static_cast<PageAllocator*>(h); }

// returns page id, or -1 on exhaustion
int64_t pie_alloc_allocate(void* h) {
  auto r = static_cast<PageAllocator*>(h)->allocate_page();
  return r ? static_cast<int64_t>(*r) : -1;
}

// bulk variant: fills out[0..n), returns number allocated
int64_t pie_alloc_allocate_n(void* h, uint32_t n, int64_t* out) {
  auto* a = static_cast<PageAllocator*>(h);
  uint32_t i = 0;
  for (; i < n; ++i) {
    auto r = a->allocate_page();
    if (!r) break;
    out[i] = static_cast<int64_t>(*r);
  }
  return i;
}

int32_t pie_alloc_free(void* h, uint32_t page_id) {
  try {
    static_cast<PageAllocator*>(h)->free_page(page_id);
    return 0;
  } catch (...) {
    return -1;
  }
}

int32_t pie_alloc_add_ref(void* h, uint32_t page_id) {
  try {
    static_cast<PageAllocator*>(h)->add_ref(page_id);
    return 0;
  } catch (...) {
    return -1;
  }
}

uint32_t pie_alloc_ref_count(void* h, uint32_t page_id) {
  return static_cast<PageAllocator*>(h)->ref_count(page_id);
}

uint32_t pie_alloc_num_free(void* h) {
  return static_cast<PageAllocator*>(h)->num_free_pages();
}

uint32_t pie_alloc_num_pages(void* h) {
  return static_cast<PageAllocator*>(h)->num_pages();
}

uint32_t pie_tokens_per_page() { return pie_runtime::kTokensPerPage; }

}  // extern "C"

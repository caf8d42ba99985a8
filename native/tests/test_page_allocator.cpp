// Allocator unit + race tests (structure mirrors the reference's
// tests/cpp/test_page_allocator.cpp coverage: exhaustion, refcount
// lifecycle, uniqueness under concurrency, leak detection — implemented as a
// dependency-free harness since GoogleTest cannot be fetched offline).

#include <algorithm>
#include <atomic>
#include <cstdio>
#include <cstdlib>
#include <mutex>
#include <set>
#include <thread>
#include <vector>

#include "pie_runtime/page_allocator.hpp"

using pie_runtime::PageAllocator;

static int g_failures = 0;

#define CHECK(cond)                                                   \
  do {                                                                \
    if (!(cond)) {                                                    \
      std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond);     \
      ++g_failures;                                                   \
    }                                                                 \
  } while (0)

static void test_exhaust_and_refill() {
  PageAllocator a(8, 2);
  std::vector<uint32_t> ids;
  for (int i = 0; i < 8; ++i) {
    auto r = a.allocate_page();
    CHECK(r.has_value());
    ids.push_back(*r);
  }
  CHECK(!a.allocate_page().has_value());
  CHECK(a.num_free_pages() == 0);
  std::set<uint32_t> uniq(ids.begin(), ids.end());
  CHECK(uniq.size() == 8);
  for (auto id : ids) a.free_page(id);
  CHECK(a.num_free_pages() == 8);
  CHECK(a.allocate_page().has_value());
}

static void test_refcount_lifecycle() {
  PageAllocator a(4, 1);
  auto id = *a.allocate_page();
  CHECK(a.ref_count(id) == 1);
  a.add_ref(id);  // prefix sharing
  CHECK(a.ref_count(id) == 2);
  a.free_page(id);
  CHECK(a.ref_count(id) == 1);
  CHECK(a.num_free_pages() == 3);  // still held
  a.free_page(id);
  CHECK(a.num_free_pages() == 4);
}

static void test_single_page_edge() {
  PageAllocator a(1, 4);
  auto id = *a.allocate_page();
  CHECK(!a.allocate_page().has_value());
  a.free_page(id);
  CHECK(a.allocate_page().has_value());
}

static void test_concurrent_unique_allocation() {
  const uint32_t kPages = 4096;
  const int kThreads = std::max(4u, std::thread::hardware_concurrency());
  PageAllocator a(kPages);
  std::vector<std::vector<uint32_t>> got(kThreads);
  std::vector<std::thread> ts;
  std::atomic<bool> go{false};
  for (int t = 0; t < kThreads; ++t) {
    ts.emplace_back([&, t] {
      while (!go.load()) {
      }
      while (true) {
        auto r = a.allocate_page();
        if (!r) break;
        got[t].push_back(*r);
      }
    });
  }
  go = true;
  for (auto& th : ts) th.join();
  std::set<uint32_t> all;
  size_t total = 0;
  for (auto& v : got) {
    total += v.size();
    all.insert(v.begin(), v.end());
  }
  CHECK(total == kPages);          // nothing lost
  CHECK(all.size() == kPages);     // nothing double-allocated
  CHECK(a.num_free_pages() == 0);
}

static void test_concurrent_alloc_free_churn() {
  const uint32_t kPages = 512;
  const int kThreads = 8;
  const int kIters = 20000;
  PageAllocator a(kPages);
  std::vector<std::thread> ts;
  for (int t = 0; t < kThreads; ++t) {
    ts.emplace_back([&] {
      std::vector<uint32_t> mine;
      unsigned seed = std::hash<std::thread::id>{}(std::this_thread::get_id());
      for (int i = 0; i < kIters; ++i) {
        seed = seed * 1664525u + 1013904223u;
        if ((seed & 1) && !mine.empty()) {
          a.free_page(mine.back());
          mine.pop_back();
        } else {
          auto r = a.allocate_page();
          if (r) mine.push_back(*r);
        }
      }
      for (auto id : mine) a.free_page(id);
    });
  }
  for (auto& th : ts) th.join();
  CHECK(a.num_free_pages() == kPages);  // leak detection
}

static void test_concurrent_shared_page_free() {
  PageAllocator a(16);
  auto id = *a.allocate_page();
  const int kRefs = 64;
  for (int i = 0; i < kRefs; ++i) a.add_ref(id);
  std::vector<std::thread> ts;
  for (int i = 0; i < kRefs; ++i) {
    ts.emplace_back([&] { a.free_page(id); });
  }
  for (auto& th : ts) th.join();
  CHECK(a.ref_count(id) == 1);
  a.free_page(id);
  CHECK(a.num_free_pages() == 16);
}

int main() {
  test_exhaust_and_refill();
  test_refcount_lifecycle();
  test_single_page_edge();
  test_concurrent_unique_allocation();
  test_concurrent_alloc_free_churn();
  test_concurrent_shared_page_free();
  if (g_failures == 0) {
    std::printf("ALL PASSED\n");
    return 0;
  }
  std::printf("%d FAILURES\n", g_failures);
  return 1;
}

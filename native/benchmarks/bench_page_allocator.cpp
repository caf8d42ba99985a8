// Allocator microbenchmarks matching the reference's published scenarios
// (reference benchmarks/cpp/core/page_allocator_benchmark.cpp:72-509 and
// BASELINE.md): single-thread alloc+free sweeps, multithreaded allocation,
// refcount sweeps, and a simulated prefill+decode inference workload.

#include <chrono>
#include <cstdio>
#include <thread>
#include <vector>

#include "pie_runtime/page_allocator.hpp"

using pie_runtime::PageAllocator;
using clk = std::chrono::steady_clock;

static double ms_since(clk::time_point t0) {
  return std::chrono::duration<double, std::milli>(clk::now() - t0).count();
}

static void bench_cycle(uint32_t pages, int reps) {
  PageAllocator a(pages);
  std::vector<uint32_t> ids(pages);
  double best = 1e30;
  for (int r = 0; r < reps; ++r) {
    auto t0 = clk::now();
    for (uint32_t i = 0; i < pages; ++i) ids[i] = *a.allocate_page();
    for (uint32_t i = 0; i < pages; ++i) a.free_page(ids[i]);
    best = std::min(best, ms_since(t0));
  }
  std::printf("alloc+free cycle %6u pages: %8.3f ms (%.1f ns/page)\n", pages,
              best, best * 1e6 / (2.0 * pages));
}

static void bench_mt_alloc(uint32_t pages, int threads, int reps) {
  double best = 1e30;
  for (int r = 0; r < reps; ++r) {
    PageAllocator a(pages);
    std::vector<std::thread> ts;
    auto t0 = clk::now();
    for (int t = 0; t < threads; ++t) {
      ts.emplace_back([&] {
        while (a.allocate_page()) {
        }
      });
    }
    for (auto& th : ts) th.join();
    best = std::min(best, ms_since(t0));
  }
  std::printf("mt alloc %6u pages %2d threads: %8.3f ms\n", pages, threads,
              best);
}

static void bench_refcount(uint32_t pages, int reps) {
  PageAllocator a(pages);
  std::vector<uint32_t> ids(pages);
  for (uint32_t i = 0; i < pages; ++i) ids[i] = *a.allocate_page();
  double best = 1e30;
  for (int r = 0; r < reps; ++r) {
    auto t0 = clk::now();
    for (uint32_t i = 0; i < pages; ++i) a.add_ref(ids[i]);
    for (uint32_t i = 0; i < pages; ++i) a.free_page(ids[i]);
    best = std::min(best, ms_since(t0));
  }
  std::printf("refcount sweep %6u pages: %8.3f ms\n", pages, best);
}

// threads emulate sequences: allocate pages across a prefill+decode
// lifecycle, then release (reference SimulateLLMInference)
static void bench_simulate(uint32_t pages, int decode_tokens, int threads,
                           int reps) {
  double best = 1e30;
  for (int r = 0; r < reps; ++r) {
    PageAllocator a(pages);
    std::vector<std::thread> ts;
    auto t0 = clk::now();
    for (int t = 0; t < threads; ++t) {
      ts.emplace_back([&] {
        std::vector<uint32_t> table;
        int prompt = 512;
        for (int i = 0; i < prompt; i += pie_runtime::kTokensPerPage) {
          if (auto p = a.allocate_page()) table.push_back(*p);
        }
        for (int tok = 0; tok < decode_tokens; ++tok) {
          if (tok % pie_runtime::kTokensPerPage == 0) {
            if (auto p = a.allocate_page()) table.push_back(*p);
          }
        }
        for (auto p : table) a.free_page(p);
      });
    }
    for (auto& th : ts) th.join();
    best = std::min(best, ms_since(t0));
  }
  std::printf("simulate %6u pages %4d decode %2d thr: %8.3f ms\n", pages,
              decode_tokens, threads, best);
}

int main() {
  const int reps = 5;
  for (uint32_t p : {2000u, 5000u, 10000u, 20000u}) bench_cycle(p, reps);
  for (uint32_t p : {2000u, 5000u, 10000u}) {
    for (int t : {1, 2, 4, 8, 16}) bench_mt_alloc(p, t, reps);
  }
  for (uint32_t p : {2000u, 5000u, 10000u, 20000u}) bench_refcount(p, reps);
  for (int thr : {4, 8}) bench_simulate(4000, 1024, thr, reps);
  bench_simulate(4000, 512, 4, reps);
  return 0;
}

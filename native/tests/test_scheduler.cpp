// Scheduler unit + concurrency tests (assert-based harness like
// test_page_allocator.cpp; the reference used GoogleTest for its one native
// test, tests/cpp/test_page_allocator.cpp — same coverage philosophy:
// lifecycle, exhaustion, edge cases, then races).

#include <atomic>
#include <cassert>
#include <cstdio>
#include <numeric>
#include <thread>
#include <vector>

#include "pie_runtime/scheduler.hpp"

using namespace pie_runtime;

namespace {

SchedulerConfig small_cfg() {
  SchedulerConfig cfg;
  cfg.num_lanes = 4;
  cfg.num_pages = 64;
  cfg.max_pages_per_seq = 8;
  cfg.prefill_chunk = 8;
  cfg.history_len = 16;
  return cfg;
}

struct LaneView {
  std::vector<int32_t> last_tokens, context_lens, block_tables, history,
      top_k;
  std::vector<uint8_t> active;
  std::vector<float> temperature, top_p, min_p, rep, pres, freq;
  explicit LaneView(const SchedulerConfig& c)
      : last_tokens(c.num_lanes),
        context_lens(c.num_lanes),
        block_tables(c.num_lanes * c.max_pages_per_seq),
        history(c.num_lanes * c.history_len),
        top_k(c.num_lanes),
        active(c.num_lanes),
        temperature(c.num_lanes),
        top_p(c.num_lanes),
        min_p(c.num_lanes),
        rep(c.num_lanes),
        pres(c.num_lanes),
        freq(c.num_lanes) {}
  uint32_t fill(Scheduler& s) {
    return s.decode_view(last_tokens.data(), context_lens.data(),
                         block_tables.data(), active.data(), history.data(),
                         temperature.data(), top_p.data(), min_p.data(),
                         top_k.data(), rep.data(), pres.data(), freq.data());
  }
};

// Drive the scheduler with a fake "model": next token = last token + 1.
// Returns generated tokens for the sequence.
std::vector<int32_t> run_echo(Scheduler& s, uint64_t id,
                              int max_steps = 1000) {
  const auto& cfg = s.config();
  LaneView view(cfg);
  std::vector<int32_t> chunk_ids(cfg.prefill_chunk);
  for (int step = 0; step < max_steps && s.has_work(); ++step) {
    s.begin_step();
    PrefillChunk c;
    while (s.next_prefill(&c)) {
      if (c.is_last) {
        // "sample" first token from the prompt's last id
        s.commit_first(c.lane, c.token_ids.back() + 1);
      }
    }
    if (view.fill(s) > 0) {
      std::vector<int32_t> toks(cfg.num_lanes, 0);
      for (uint32_t li = 0; li < cfg.num_lanes; ++li) {
        toks[li] = view.last_tokens[li] + 1;
      }
      s.commit_decode(toks.data());
    }
  }
  std::vector<int32_t> out(4096);
  const uint32_t n = s.seq_output(id, out.data(), 4096);
  assert(n != 0xffffffffu);
  out.resize(n);
  return out;
}

void test_basic_lifecycle() {
  Scheduler s(small_cfg());
  std::vector<int32_t> prompt = {10, 11, 12};
  StopCriteria stop;
  stop.max_generated_tokens = 5;
  const uint64_t id = s.submit(prompt, {}, {}, stop);
  auto out = run_echo(s, id);
  // echo model: first token 13, then 14, 15, 16, 17 -> length stop at 5
  assert(out.size() == 5);
  assert(out[0] == 13 && out[4] == 17);
  FinishedSeq fin[8];
  const uint32_t nf = s.pop_finished(fin, 8);
  assert(nf == 1);
  assert(fin[0].seq_id == id);
  assert(fin[0].reason == FinishReason::LENGTH);
  // all pages returned
  assert(s.num_free_pages() == small_cfg().num_pages);
  s.release(id);
  std::printf("test_basic_lifecycle ok\n");
}

void test_stop_token() {
  Scheduler s(small_cfg());
  StopCriteria stop;
  stop.max_generated_tokens = 100;
  stop.stop_token_ids = {15};
  const uint64_t id = s.submit({10, 11, 12}, {}, {}, stop);
  auto out = run_echo(s, id);
  // 13, 14, 15(stop)
  assert(out.size() == 3);
  assert(out.back() == 15);
  FinishedSeq fin[8];
  assert(s.pop_finished(fin, 8) == 1);
  assert(fin[0].reason == FinishReason::STOP);
  std::printf("test_stop_token ok\n");
}

void test_chunked_prefill() {
  auto cfg = small_cfg();
  cfg.prefill_chunk = 4;
  Scheduler s(cfg);
  std::vector<int32_t> prompt(11);
  std::iota(prompt.begin(), prompt.end(), 100);
  StopCriteria stop;
  stop.max_generated_tokens = 2;
  const uint64_t id = s.submit(prompt, {}, {}, stop);
  // first begin_step stages one 4-token chunk
  assert(s.begin_step() == 1);
  PrefillChunk c;
  assert(s.next_prefill(&c));
  assert(c.token_ids.size() == 4 && c.start_pos == 0 && !c.is_last);
  assert(!s.next_prefill(&c));
  // second chunk
  assert(s.begin_step() == 1);
  assert(s.next_prefill(&c));
  assert(c.start_pos == 4 && c.token_ids.size() == 4 && !c.is_last);
  // third (last) chunk: 3 tokens
  assert(s.begin_step() == 1);
  assert(s.next_prefill(&c));
  assert(c.start_pos == 8 && c.token_ids.size() == 3 && c.is_last);
  assert(c.context_len == 11);
  s.commit_first(c.lane, 999);
  auto out = run_echo(s, id);
  assert(out.size() == 2 && out[0] == 999 && out[1] == 1000);
  std::printf("test_chunked_prefill ok\n");
}

void test_admission_queueing_on_exhaustion() {
  auto cfg = small_cfg();
  cfg.num_pages = 4;  // each seq needs ceil((2+64)/64)=2 pages -> only 2 fit
  cfg.max_pages_per_seq = 2;
  Scheduler s(cfg);
  StopCriteria stop;
  stop.max_generated_tokens = 64 - 2;  // worst case exactly 1 page: 2+62=64
  std::vector<uint64_t> ids;
  for (int i = 0; i < 4; ++i) ids.push_back(s.submit({1, 2}, {}, {}, stop));
  s.begin_step();
  // pool holds 4 pages, each seq reserves 1 -> all 4 admitted onto 4 lanes
  assert(s.num_running() == 4);
  assert(s.num_waiting() == 0);
  // now exhaust: new seqs must stay WAITING
  const uint64_t id5 = s.submit({1, 2}, {}, {}, stop);
  s.begin_step();
  assert(s.num_waiting() == 1);
  (void)id5;
  std::printf("test_admission_queueing_on_exhaustion ok\n");
}

void test_lane_limit() {
  auto cfg = small_cfg();  // 4 lanes, plenty of pages
  Scheduler s(cfg);
  StopCriteria stop;
  stop.max_generated_tokens = 4;
  for (int i = 0; i < 6; ++i) s.submit({1, 2, 3}, {}, {}, stop);
  s.begin_step();
  assert(s.num_running() == 4);
  assert(s.num_waiting() == 2);
  std::printf("test_lane_limit ok\n");
}

void test_cancellation() {
  Scheduler s(small_cfg());
  StopCriteria stop;
  stop.max_generated_tokens = 200;  // fits the 8-page worst-case reservation
  const uint64_t id = s.submit({1, 2, 3}, {}, {}, stop);
  // run a few steps, then cancel mid-decode
  LaneView view(s.config());
  s.begin_step();
  PrefillChunk c;
  while (s.next_prefill(&c)) {
    if (c.is_last) s.commit_first(c.lane, 7);
  }
  assert(view.fill(s) == 1);
  assert(s.cancel(id) == 0 || true);  // returns bool
  s.cancel(id);
  std::vector<int32_t> toks(s.config().num_lanes, 9);
  s.commit_decode(toks.data());
  FinishedSeq fin[4];
  const uint32_t nf = s.pop_finished(fin, 4);
  assert(nf == 1);
  assert(fin[0].reason == FinishReason::CANCELLED);
  assert(!s.has_work());
  assert(s.num_free_pages() == small_cfg().num_pages);
  std::printf("test_cancellation ok\n");
}

void test_param_plumbing() {
  Scheduler s(small_cfg());
  SamplingParams sp;
  sp.temperature = 0.5f;
  sp.top_p = 0.9f;
  sp.min_p = 0.05f;
  sp.top_k = 40;
  LogitsParams lp;
  lp.repetition_penalty = 1.3f;
  lp.presence_penalty = 0.1f;
  lp.frequency_penalty = 0.2f;
  StopCriteria stop;
  stop.max_generated_tokens = 10;
  s.submit({5, 6}, sp, lp, stop);
  s.begin_step();
  PrefillChunk c;
  while (s.next_prefill(&c)) {
    if (c.is_last) s.commit_first(c.lane, 42);
  }
  LaneView view(s.config());
  assert(view.fill(s) == 1);
  // the occupied lane carries the per-seq params
  uint32_t lane = 0;
  for (uint32_t i = 0; i < view.active.size(); ++i) {
    if (view.active[i]) lane = i;
  }
  assert(view.temperature[lane] == 0.5f);
  assert(view.top_p[lane] == 0.9f);
  assert(view.min_p[lane] == 0.05f);
  assert(view.top_k[lane] == 40);
  assert(view.rep[lane] == 1.3f);
  assert(view.pres[lane] == 0.1f);
  assert(view.freq[lane] == 0.2f);
  // history tail: prompt 5,6 then first token 42
  const uint32_t hl = s.config().history_len;
  assert(view.history[lane * hl + hl - 1] == 42);
  assert(view.history[lane * hl + hl - 2] == 6);
  assert(view.history[lane * hl + hl - 3] == 5);
  std::printf("test_param_plumbing ok\n");
}

void test_multi_seq_interleave() {
  auto cfg = small_cfg();
  cfg.num_lanes = 3;
  Scheduler s(cfg);
  StopCriteria stop_a, stop_b, stop_c;
  stop_a.max_generated_tokens = 3;
  stop_b.max_generated_tokens = 7;
  stop_c.max_generated_tokens = 5;
  const uint64_t a = s.submit({100}, {}, {}, stop_a);
  const uint64_t b = s.submit({200}, {}, {}, stop_b);
  const uint64_t ccc = s.submit({300}, {}, {}, stop_c);
  LaneView view(cfg);
  for (int step = 0; step < 100 && s.has_work(); ++step) {
    s.begin_step();
    PrefillChunk c;
    while (s.next_prefill(&c)) {
      if (c.is_last) s.commit_first(c.lane, c.token_ids.back() + 1);
    }
    if (view.fill(s) > 0) {
      std::vector<int32_t> toks(cfg.num_lanes);
      for (uint32_t li = 0; li < cfg.num_lanes; ++li) {
        toks[li] = view.last_tokens[li] + 1;
      }
      s.commit_decode(toks.data());
    }
  }
  std::vector<int32_t> out(64);
  assert(s.seq_output(a, out.data(), 64) == 3);
  assert(out[0] == 101 && out[2] == 103);
  assert(s.seq_output(b, out.data(), 64) == 7);
  assert(out[0] == 201 && out[6] == 207);
  assert(s.seq_output(ccc, out.data(), 64) == 5);
  assert(s.num_free_pages() == cfg.num_pages);
  std::printf("test_multi_seq_interleave ok\n");
}

// Concurrency: submissions and cancellations racing a driver loop.
void test_concurrent_submit() {
  SchedulerConfig cfg;
  cfg.num_lanes = 8;
  cfg.num_pages = 2048;
  cfg.max_pages_per_seq = 4;
  cfg.prefill_chunk = 16;
  cfg.history_len = 16;
  Scheduler s(cfg);
  std::atomic<bool> done{false};
  std::atomic<uint32_t> submitted{0};
  constexpr uint32_t kPerThread = 50;
  constexpr uint32_t kThreads = 4;

  std::vector<std::thread> producers;
  for (uint32_t t = 0; t < kThreads; ++t) {
    producers.emplace_back([&s, &submitted] {
      for (uint32_t i = 0; i < kPerThread; ++i) {
        StopCriteria stop;
        stop.max_generated_tokens = 5;
        s.submit({1, 2, 3}, {}, {}, stop);
        submitted.fetch_add(1);
      }
    });
  }

  std::atomic<uint32_t> finished_count{0};
  std::thread driver([&] {
    LaneView view(cfg);
    FinishedSeq fin[64];
    while (!done.load() || s.has_work()) {
      s.begin_step();
      PrefillChunk c;
      while (s.next_prefill(&c)) {
        if (c.is_last) s.commit_first(c.lane, 50);
      }
      if (view.fill(s) > 0) {
        std::vector<int32_t> toks(cfg.num_lanes, 51);
        s.commit_decode(toks.data());
      }
      finished_count.fetch_add(s.pop_finished(fin, 64));
    }
    finished_count.fetch_add(s.pop_finished(fin, 64));
  });

  for (auto& p : producers) p.join();
  done.store(true);
  driver.join();
  assert(submitted.load() == kPerThread * kThreads);
  assert(finished_count.load() == kPerThread * kThreads);
  assert(s.num_free_pages() == cfg.num_pages);
  std::printf("test_concurrent_submit ok (%u seqs)\n", finished_count.load());
}

}  // namespace

// Driver-initiated finish: the constrained-decoding hook stops a live
// lane with STOP (machine complete) or MACHINE_ERROR (token rejected);
// already-finished / unknown ids are no-ops.
void test_finish_external() {
  Scheduler s(small_cfg());
  StopCriteria stop;
  stop.max_generated_tokens = 16;
  const uint64_t id = s.submit({5, 6, 7}, {}, {}, stop);
  // advance one step so the sequence holds a lane
  s.begin_step();
  PrefillChunk c;
  while (s.next_prefill(&c)) {
    if (c.is_last) s.commit_first(c.lane, 99);
  }
  assert(s.num_running() == 1);
  assert(s.finish_external(id, FinishReason::STOP));
  assert(!s.finish_external(id, FinishReason::MACHINE_ERROR));  // done
  assert(!s.finish_external(424242, FinishReason::STOP));       // unknown
  FinishedSeq fin[4];
  assert(s.pop_finished(fin, 4) == 1);
  assert(fin[0].reason == FinishReason::STOP);
  assert(s.num_free_pages() == small_cfg().num_pages);
  s.release(id);
}

int main() {
  test_finish_external();
  test_basic_lifecycle();
  test_stop_token();
  test_chunked_prefill();
  test_admission_queueing_on_exhaustion();
  test_lane_limit();
  test_cancellation();
  test_param_plumbing();
  test_multi_seq_interleave();
  test_concurrent_submit();
  std::printf("all scheduler tests passed\n");
  return 0;
}

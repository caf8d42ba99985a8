// C ABI for the native continuous-batching scheduler (ctypes-bound from
// pie_tpu.runtime.native_scheduler; the reference exposed its core via
// nanobind, src/bindings.cpp, but only ever bound hello()).

#include <cstdint>
#include <cstring>
#include <vector>

#include "pie_runtime/scheduler.hpp"

using pie_runtime::FinishedSeq;
using pie_runtime::LogitsParams;
using pie_runtime::PrefillChunk;
using pie_runtime::SamplingParams;
using pie_runtime::Scheduler;
using pie_runtime::SchedulerConfig;
using pie_runtime::StopCriteria;

extern "C" {

void* pie_sched_create(uint32_t num_lanes, uint32_t num_pages,
                       uint32_t max_pages_per_seq, uint32_t prefill_chunk,
                       uint32_t history_len) {
  try {
    SchedulerConfig cfg;
    cfg.num_lanes = num_lanes;
    cfg.num_pages = num_pages;
    cfg.max_pages_per_seq = max_pages_per_seq;
    cfg.prefill_chunk = prefill_chunk;
    cfg.history_len = history_len;
    return new Scheduler(cfg);
  } catch (...) {
    return nullptr;
  }
}

void pie_sched_destroy(void* h) { delete static_cast<Scheduler*>(h); }

uint64_t pie_sched_submit(void* h, const int32_t* prompt, uint32_t prompt_len,
                          uint32_t max_new_tokens, const int32_t* stop_ids,
                          uint32_t num_stop, float temperature, float top_p,
                          float min_p, int32_t top_k, float repetition_penalty,
                          float presence_penalty, float frequency_penalty,
                          uint64_t rng_seed) {
  auto* s = static_cast<Scheduler*>(h);
  SamplingParams sp;
  sp.temperature = temperature;
  sp.top_p = top_p;
  sp.min_p = min_p;
  sp.top_k = top_k;
  sp.rng_seed = rng_seed;
  LogitsParams lp;
  lp.repetition_penalty = repetition_penalty;
  lp.presence_penalty = presence_penalty;
  lp.frequency_penalty = frequency_penalty;
  StopCriteria sc;
  sc.max_generated_tokens = max_new_tokens;
  sc.stop_token_ids.assign(stop_ids, stop_ids + num_stop);
  return s->submit(std::vector<int32_t>(prompt, prompt + prompt_len), sp, lp,
                   std::move(sc));
}

int32_t pie_sched_finish_external(void* h, uint64_t seq_id,
                                  uint8_t reason) {
  return static_cast<Scheduler*>(h)->finish_external(
             seq_id, static_cast<pie_runtime::FinishReason>(reason))
             ? 0
             : -1;
}

int32_t pie_sched_cancel(void* h, uint64_t seq_id) {
  return static_cast<Scheduler*>(h)->cancel(seq_id) ? 0 : -1;
}

uint32_t pie_sched_begin_step(void* h) {
  return static_cast<Scheduler*>(h)->begin_step();
}

// Pops one staged prefill chunk into caller buffers. ids must hold
// prefill_chunk entries. Returns 1 when a chunk was written, 0 when drained.
// is_last is 1 on a sequence's final chunk.
int32_t pie_sched_next_prefill(void* h, uint32_t* lane, uint64_t* seq_id,
                               int32_t* ids, uint32_t* num_ids,
                               uint32_t* start_pos, uint32_t* context_len,
                               uint8_t* is_last) {
  PrefillChunk c;
  if (!static_cast<Scheduler*>(h)->next_prefill(&c)) return 0;
  *lane = c.lane;
  *seq_id = c.seq_id;
  *num_ids = static_cast<uint32_t>(c.token_ids.size());
  std::memcpy(ids, c.token_ids.data(), c.token_ids.size() * sizeof(int32_t));
  *start_pos = c.start_pos;
  *context_len = c.context_len;
  *is_last = c.is_last ? 1 : 0;
  return 1;
}

void pie_sched_commit_first(void* h, uint32_t lane, int32_t token) {
  static_cast<Scheduler*>(h)->commit_first(lane, token);
}

uint32_t pie_sched_decode_view(void* h, int32_t* last_tokens,
                               int32_t* context_lens, int32_t* block_tables,
                               uint8_t* active, int32_t* history,
                               float* temperature, float* top_p, float* min_p,
                               int32_t* top_k, float* rep_pen, float* presence,
                               float* frequency) {
  return static_cast<Scheduler*>(h)->decode_view(
      last_tokens, context_lens, block_tables, active, history, temperature,
      top_p, min_p, top_k, rep_pen, presence, frequency);
}

void pie_sched_commit_decode(void* h, const int32_t* tokens) {
  static_cast<Scheduler*>(h)->commit_decode(tokens);
}

// out layout: pairs of (seq_id, reason) — seq_ids[i], reasons[i].
uint32_t pie_sched_pop_finished(void* h, uint64_t* seq_ids, uint8_t* reasons,
                                uint32_t cap) {
  std::vector<FinishedSeq> buf(cap);
  const uint32_t n =
      static_cast<Scheduler*>(h)->pop_finished(buf.data(), cap);
  for (uint32_t i = 0; i < n; ++i) {
    seq_ids[i] = buf[i].seq_id;
    reasons[i] = static_cast<uint8_t>(buf[i].reason);
  }
  return n;
}

uint32_t pie_sched_seq_output(void* h, uint64_t seq_id, int32_t* out,
                              uint32_t cap) {
  return static_cast<Scheduler*>(h)->seq_output(seq_id, out, cap);
}

void pie_sched_release(void* h, uint64_t seq_id) {
  static_cast<Scheduler*>(h)->release(seq_id);
}

int32_t pie_sched_has_work(void* h) {
  return static_cast<Scheduler*>(h)->has_work() ? 1 : 0;
}

uint32_t pie_sched_num_waiting(void* h) {
  return static_cast<Scheduler*>(h)->num_waiting();
}

uint32_t pie_sched_num_running(void* h) {
  return static_cast<Scheduler*>(h)->num_running();
}

uint32_t pie_sched_num_free_pages(void* h) {
  return static_cast<Scheduler*>(h)->num_free_pages();
}

// Fills out[num_lanes] with each lane's seq id (0 for free lanes).
void pie_sched_lane_seqs(void* h, uint64_t* out) {
  static_cast<Scheduler*>(h)->lane_seqs(out);
}

}  // extern "C"

// Continuous-batching scheduler: the native host runtime the reference
// specified but never implemented.
//
// Reference parity: pie_core's Scheduler (reference
// include/engine/scheduler.hpp:27-43 — ctor over a PageAllocator with
// max_num_seqs / max_tokens_in_batch admission limits and a step() that was
// left as an empty PImpl, src/engine/scheduler.cpp:22-27). This class is the
// real thing: sequence lifecycle WAITING -> PREFILLING -> DECODING ->
// COMPLETED (sequence.hpp), page allocation per 64-token block with
// exhaustion -> stay-queued (reference page_allocator.cpp:68-73), chunked
// prefill, per-sequence sampling/logits/stop params, and batch assembly.
//
// TPU-first split: the device step (paged attention + sampling) is a jitted
// JAX program with FIXED shapes, so this scheduler manages a fixed set of
// batch *lanes* whose state (last token, context length, block table,
// penalty history, sampling params) lives in flat arrays the Python driver
// ships to the device every step — changing batch composition never
// recompiles. The C++ side owns every piece of host bookkeeping; Python only
// moves arrays and launches compiled programs.

#pragma once

#include <cstdint>
#include <deque>
#include <memory>
#include <mutex>
#include <unordered_map>
#include <vector>

#include "pie_runtime/page_allocator.hpp"
#include "pie_runtime/sequence.hpp"

namespace pie_runtime {

struct SchedulerConfig {
  uint32_t num_lanes = 8;            // decode batch width (fixed shape)
  uint32_t num_pages = 512;          // device pool size
  uint32_t max_pages_per_seq = 32;   // block-table width (fixed shape)
  uint32_t prefill_chunk = 256;      // max tokens per prefill launch
  uint32_t history_len = 64;         // repetition-penalty window
                                     // (reference logits_params.hpp:15: 60,
                                     // rounded up to a TPU-friendly 64)
};

struct PrefillChunk {
  uint32_t lane = 0;
  uint64_t seq_id = 0;
  std::vector<int32_t> token_ids;  // <= prefill_chunk tokens
  uint32_t start_pos = 0;          // position of token_ids[0]
  uint32_t context_len = 0;        // total KV tokens after this chunk
  bool is_last = false;            // final chunk -> sample first token
};

struct FinishedSeq {
  uint64_t seq_id = 0;
  FinishReason reason = FinishReason::NONE;
};

class Scheduler {
 public:
  explicit Scheduler(const SchedulerConfig& cfg);

  Scheduler(const Scheduler&) = delete;
  Scheduler& operator=(const Scheduler&) = delete;

  // Enqueue a request; returns its seq id. Thread-safe (IPC reader thread
  // and driver thread may both submit).
  uint64_t submit(std::vector<int32_t> prompt, SamplingParams sampling,
                  LogitsParams logits, StopCriteria stop);

  // Request cancellation; takes effect at the next step boundary
  // (reference sequence.hpp:62 atomic cancelled flag).
  bool cancel(uint64_t seq_id);

  // --- one scheduling step, driven from Python ---------------------------
  // 1) begin_step(): admit WAITING sequences onto free lanes (allocating
  //    pages; exhaustion leaves them queued) and stage one prefill chunk per
  //    PREFILLING lane. Returns the number of staged chunks.
  uint32_t begin_step();

  // 2) next_prefill(): pop one staged chunk (returns false when drained).
  //    The driver runs the prefill device program for it; when chunk.is_last
  //    it samples the first token and calls commit_first().
  bool next_prefill(PrefillChunk* out);

  void commit_first(uint32_t lane, int32_t token);

  // 3) decode lane-state views, copied into caller buffers sized
  //    [num_lanes] (block_table: [num_lanes * max_pages_per_seq],
  //    history: [num_lanes * history_len]). Returns number of active
  //    decode lanes.
  uint32_t decode_view(int32_t* last_tokens, int32_t* context_lens,
                       int32_t* block_tables, uint8_t* active,
                       int32_t* history, float* temperature, float* top_p,
                       float* min_p, int32_t* top_k, float* rep_pen,
                       float* presence, float* frequency) const;

  // 4) commit one batched decode step's sampled tokens [num_lanes]
  //    (ignored for inactive lanes): append, stop/length checks, page-table
  //    growth, lane recycling.
  void commit_decode(const int32_t* tokens);

  // --- results ------------------------------------------------------------
  // Drain finished sequences (up to cap); returns count.
  uint32_t pop_finished(FinishedSeq* out, uint32_t cap);

  // Copy a sequence's generated tokens into out (up to cap); returns the
  // generated count (may exceed cap). 0xffffffff if unknown id.
  uint32_t seq_output(uint64_t seq_id, int32_t* out, uint32_t cap) const;

  // Drop a completed sequence's record entirely (after results were read).
  void release(uint64_t seq_id);

  // Finish a live sequence from the driver with an explicit reason —
  // the hook constrained (machine-carrying) decoding uses to stop a lane
  // when its state machine completes (STOP) or rejects a token
  // (MACHINE_ERROR). No-op on unknown / already-finished ids.
  bool finish_external(uint64_t seq_id, FinishReason reason);

  // Fills out[num_lanes] with each lane's seq id (0 for free lanes), so the
  // driver can attribute batched decode tokens to requests for streaming.
  void lane_seqs(uint64_t* out) const;

  bool has_work() const;
  uint32_t num_waiting() const;
  uint32_t num_running() const;
  uint32_t num_free_pages() const { return allocator_.num_free_pages(); }

  const SchedulerConfig& config() const { return cfg_; }

 private:
  struct Lane {
    uint64_t seq_id = 0;
    bool occupied = false;
    int32_t last_token = 0;
    uint32_t context_len = 0;
    std::vector<int32_t> history;  // history_len ring, PAD (-1) filled
  };

  uint32_t pages_needed(uint32_t tokens) const {
    return (tokens + kTokensPerPage - 1) / kTokensPerPage;
  }
  bool allocate_pages(Sequence& seq, uint32_t total_tokens);
  bool extend_pages(Sequence& seq, uint32_t total_tokens);
  void finish(Sequence& seq, FinishReason reason);
  void push_history(Lane& lane, int32_t token);
  Sequence* find(uint64_t seq_id);
  const Sequence* find(uint64_t seq_id) const;

  SchedulerConfig cfg_;
  PageAllocator allocator_;
  mutable std::mutex mu_;
  uint64_t next_id_ = 1;
  std::deque<uint64_t> waiting_;
  std::unordered_map<uint64_t, std::unique_ptr<Sequence>> seqs_;
  std::vector<Lane> lanes_;
  std::deque<PrefillChunk> staged_;
  std::deque<FinishedSeq> finished_;
};

}  // namespace pie_runtime

// Per-request sequence record + immutable parameter structs.
//
// Reference parity: pie_core's Sequence (reference
// include/sequence/sequence.hpp:22-79 — id, status lifecycle
// WAITING/PREFILLING/DECODING/COMPLETED/ERROR, token vector, page_table,
// atomic cancelled flag) and its parameter structs
// (include/sequence/sampling_params.hpp:7-13, logits_params.hpp:11-17,
// stop_criteria.hpp:8-11, ipc_handles.hpp:7-10). On TPU the tokens/pages
// here are host-side bookkeeping; KV bytes live in the device paged pool.

#pragma once

#include <atomic>
#include <cstdint>
#include <map>
#include <vector>

namespace pie_runtime {

struct SamplingParams {
  float temperature = 1.0f;
  float top_p = 1.0f;
  float min_p = 0.0f;
  int32_t top_k = -1;
  uint64_t rng_seed = 0;
};

struct LogitsParams {
  float frequency_penalty = 0.0f;
  float presence_penalty = 0.0f;
  float repetition_penalty = 1.0f;
  // reference default repetition_context_size=60 (logits_params.hpp:15)
  int32_t repetition_context_size = 60;
  std::map<int32_t, float> logit_bias;
};

struct StopCriteria {
  uint32_t max_generated_tokens = 1024;  // reference stop_criteria.hpp:9
  std::vector<int32_t> stop_token_ids;
};

struct IPCHandles {
  uint32_t request_channel_id = 0;
  uint32_t response_channel_id = 0;
};

enum class SeqStatus : uint8_t {
  WAITING = 0,
  PREFILLING = 1,
  DECODING = 2,
  COMPLETED = 3,
  CANCELLED = 4,
  ERROR = 5,
};

enum class FinishReason : uint8_t {
  NONE = 0,
  STOP = 1,        // hit a stop token
  LENGTH = 2,      // max_generated_tokens
  CANCELLED = 3,
  OOM = 4,         // page pool exhausted mid-decode
  MACHINE_ERROR = 5,  // constrained decoding produced an invalid token
};

struct Sequence {
  uint64_t seq_id = 0;
  SeqStatus status = SeqStatus::WAITING;
  FinishReason finish_reason = FinishReason::NONE;

  // prompt tokens followed by generated tokens
  std::vector<int32_t> tokens;
  uint32_t prompt_len = 0;
  // prompt tokens already prefilled (chunked prefill cursor)
  uint32_t prefill_pos = 0;
  // logical block index -> physical page id
  std::vector<uint32_t> page_table;

  SamplingParams sampling;
  LogitsParams logits;
  StopCriteria stop;
  IPCHandles ipc;

  std::atomic<bool> cancelled{false};

  Sequence() = default;
  Sequence(uint64_t id, std::vector<int32_t> prompt)
      : seq_id(id),
        tokens(std::move(prompt)),
        prompt_len(static_cast<uint32_t>(tokens.size())) {}

  // non-copyable (atomic member), movable via explicit helper
  Sequence(const Sequence&) = delete;
  Sequence& operator=(const Sequence&) = delete;

  uint32_t logical_len() const {
    return static_cast<uint32_t>(tokens.size());
  }
  uint32_t num_generated() const {
    return static_cast<uint32_t>(tokens.size()) - prompt_len;
  }
  bool prefill_done() const { return prefill_pos >= prompt_len; }
};

}  // namespace pie_runtime

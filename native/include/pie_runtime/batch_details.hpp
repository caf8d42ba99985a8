// Mixed prefill/decode batch descriptor handed to the device program.
//
// Reference parity: pie_core's BatchDetails (reference
// include/engine/batch_details.hpp:10-88): flat token_ids/positions over
// every token in the step, per-sequence input_lengths (>1 = prefill chunk,
// ==1 = decode) and context_lengths, and a consolidated block table whose
// layout is co-designed with the attention kernel. Here the consumer is the
// JAX/Pallas paged-attention program: the flat arrays are copied into
// fixed-shape padded device buffers by the Python driver, so this struct
// deliberately exposes plain contiguous vectors (zero-copy through the C
// ABI into numpy).

#pragma once

#include <cstdint>
#include <vector>

namespace pie_runtime {

struct BatchDetails {
  // one entry per token in this step, concatenated over sequences
  std::vector<int32_t> token_ids;
  std::vector<int32_t> positions;

  // one entry per sequence in this step
  std::vector<uint64_t> sequence_ids;
  std::vector<int32_t> input_lengths;    // chunk size (1 for decode lanes)
  std::vector<int32_t> context_lengths;  // total KV tokens after this step
  // row-major [num_seqs, max_blocks_per_seq], -1 padded
  std::vector<int32_t> block_table;
  int32_t max_blocks_per_seq = 0;

  uint32_t num_prefill_seqs = 0;
  uint32_t num_decode_seqs = 0;

  uint32_t num_seqs() const {
    return static_cast<uint32_t>(sequence_ids.size());
  }
  uint32_t total_tokens() const {
    return static_cast<uint32_t>(token_ids.size());
  }
  bool empty() const { return sequence_ids.empty(); }

  void clear() {
    token_ids.clear();
    positions.clear();
    sequence_ids.clear();
    input_lengths.clear();
    context_lengths.clear();
    block_table.clear();
    num_prefill_seqs = 0;
    num_decode_seqs = 0;
  }
};

}  // namespace pie_runtime

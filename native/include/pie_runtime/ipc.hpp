// Cross-process request/response transport: POSIX shared memory rings with
// a futex doorbell.
//
// Reference parity: pie_core's intended Python->C++ request path (reference
// include/ipc/ipc_request.hpp:20-50 — a shm segment of 1024 cache-aligned
// RequestSlots with an atomic FREE/WRITING/READY/READING lifecycle plus a
// producer/consumer index block, demonstrated in src/main.cpp:28-113 with
// kqueue EVFILT_USER doorbells) whose reader was never implemented
// (include/ipc/ipc_reader.hpp has no .cpp). This is the working Linux
// version: the doorbell is a futex word in the segment (kqueue is
// macOS-only), prompts are token ids inlined per slot (the frontend
// tokenizes; no bulk-arena reclamation races), and a mirrored response ring
// streams generated tokens back per sequence.

#pragma once

#include <atomic>
#include <cstdint>
#include <string>

#include "pie_runtime/sequence.hpp"

namespace pie_runtime {

// Slot lifecycle (reference ipc_request.hpp slot states).
enum class SlotState : uint32_t {
  FREE = 0,
  WRITING = 1,
  READY = 2,
  READING = 3,
};

inline constexpr uint32_t kIpcMagic = 0x50494531;  // "PIE1"
inline constexpr uint32_t kMaxStopTokens = 8;

// Fixed-capacity request record living in shared memory. Prompt token ids
// are stored inline: slot size = sizeof(RequestSlot) + prompt_capacity*4,
// laid out back-to-back in the segment.
struct RequestSlotHeader {
  std::atomic<uint32_t> state{static_cast<uint32_t>(SlotState::FREE)};
  uint64_t request_id = 0;  // frontend-chosen correlation id
  uint32_t prompt_len = 0;
  uint32_t max_new_tokens = 0;
  uint32_t num_stop = 0;
  int32_t stop_ids[kMaxStopTokens] = {};
  float temperature = 1.0f;
  float top_p = 1.0f;
  float min_p = 0.0f;
  int32_t top_k = -1;
  float repetition_penalty = 1.0f;
  float presence_penalty = 0.0f;
  float frequency_penalty = 0.0f;
  uint64_t rng_seed = 0;
  uint8_t cancel = 0;  // 1 = this is a cancellation of request_id
  // int32_t prompt[prompt_capacity] follows
};

// One generated-token event (engine -> frontend). finished != 0 carries the
// FinishReason in `reason` and no token.
struct ResponseSlot {
  std::atomic<uint32_t> state{static_cast<uint32_t>(SlotState::FREE)};
  uint64_t request_id = 0;
  int32_t token = 0;
  uint8_t finished = 0;
  uint8_t reason = 0;  // FinishReason
};

struct RingHeader {
  uint32_t magic = 0;
  uint32_t num_request_slots = 0;
  uint32_t prompt_capacity = 0;  // tokens per slot
  uint32_t num_response_slots = 0;
  // doorbells: futex words bumped by producers, waited on by consumers
  std::atomic<uint32_t> request_doorbell{0};
  std::atomic<uint32_t> response_doorbell{0};
  // monotonically advancing claim hints (not authoritative; slots are
  // claimed by CAS on their own state words)
  std::atomic<uint32_t> request_write_idx{0};
  std::atomic<uint32_t> request_read_idx{0};
  std::atomic<uint32_t> response_write_idx{0};
  std::atomic<uint32_t> response_read_idx{0};
};

// Shared-memory channel. The `owner` creates (shm_open O_CREAT|O_EXCL),
// sizes, and unlinks at destruction; peers attach by name.
class IpcChannel {
 public:
  // Create a new segment (engine side).
  static IpcChannel* create(const std::string& name, uint32_t request_slots,
                            uint32_t prompt_capacity, uint32_t response_slots);
  // Attach to an existing segment (frontend side).
  static IpcChannel* attach(const std::string& name);
  ~IpcChannel();

  IpcChannel(const IpcChannel&) = delete;
  IpcChannel& operator=(const IpcChannel&) = delete;

  // --- frontend (producer) side -----------------------------------------
  // Write one request; returns false when the ring is full.
  bool submit(uint64_t request_id, const int32_t* prompt, uint32_t prompt_len,
              const SamplingParams& sp, const LogitsParams& lp,
              const StopCriteria& sc);
  bool submit_cancel(uint64_t request_id);

  // Poll one response event; returns false when none pending.
  bool poll_response(uint64_t* request_id, int32_t* token, uint8_t* finished,
                     uint8_t* reason);
  // Block (futex) until the response doorbell advances past `seen` or
  // timeout_ms elapses. Returns the latest doorbell value.
  uint32_t wait_responses(uint32_t seen, int timeout_ms);

  // --- engine (consumer) side --------------------------------------------
  // Claim one READY request; returns false when none pending. On success
  // copies the record and prompt into out params and frees the slot.
  // prompt_out must hold prompt_capacity() entries.
  bool next_request(RequestSlotHeader* out, int32_t* prompt_out);
  uint32_t wait_requests(uint32_t seen, int timeout_ms);
  uint32_t request_doorbell() const;
  uint32_t response_doorbell() const;

  // Push one response event; returns false when the ring is full.
  bool push_response(uint64_t request_id, int32_t token, uint8_t finished,
                     uint8_t reason);

  uint32_t prompt_capacity() const { return header_->prompt_capacity; }
  uint32_t num_request_slots() const { return header_->num_request_slots; }
  const std::string& name() const { return name_; }

 private:
  IpcChannel(std::string name, void* base, size_t size, bool owner);

  RequestSlotHeader* request_slot(uint32_t i);
  int32_t* slot_prompt(uint32_t i);
  ResponseSlot* response_slot(uint32_t i);

  std::string name_;
  void* base_ = nullptr;
  size_t size_ = 0;
  bool owner_ = false;
  RingHeader* header_ = nullptr;
  char* slots_base_ = nullptr;
  size_t slot_stride_ = 0;
  ResponseSlot* responses_ = nullptr;
};

}  // namespace pie_runtime

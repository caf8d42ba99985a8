// C ABI for the shm IPC channel + engine-side reader (ctypes-bound from
// pie_tpu.runtime.ipc).

#include <cstdint>
#include <cstring>

#include "pie_runtime/ipc.hpp"
#include "pie_runtime/ipc_reader.hpp"
#include "pie_runtime/scheduler.hpp"

using pie_runtime::FinishReason;
using pie_runtime::IpcChannel;
using pie_runtime::IpcReader;
using pie_runtime::LogitsParams;
using pie_runtime::RequestSlotHeader;
using pie_runtime::SamplingParams;
using pie_runtime::Scheduler;
using pie_runtime::StopCriteria;

extern "C" {

void* pie_ipc_create(const char* name, uint32_t request_slots,
                     uint32_t prompt_capacity, uint32_t response_slots) {
  try {
    return IpcChannel::create(name, request_slots, prompt_capacity,
                              response_slots);
  } catch (...) {
    return nullptr;
  }
}

void* pie_ipc_attach(const char* name) {
  try {
    return IpcChannel::attach(name);
  } catch (...) {
    return nullptr;
  }
}

void pie_ipc_destroy(void* h) { delete static_cast<IpcChannel*>(h); }

uint32_t pie_ipc_prompt_capacity(void* h) {
  return static_cast<IpcChannel*>(h)->prompt_capacity();
}

int32_t pie_ipc_submit(void* h, uint64_t request_id, const int32_t* prompt,
                       uint32_t prompt_len, uint32_t max_new_tokens,
                       const int32_t* stop_ids, uint32_t num_stop,
                       float temperature, float top_p, float min_p,
                       int32_t top_k, float repetition_penalty,
                       float presence_penalty, float frequency_penalty,
                       uint64_t rng_seed) {
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
  return static_cast<IpcChannel*>(h)->submit(request_id, prompt, prompt_len,
                                             sp, lp, sc)
             ? 0
             : -1;
}

int32_t pie_ipc_submit_cancel(void* h, uint64_t request_id) {
  return static_cast<IpcChannel*>(h)->submit_cancel(request_id) ? 0 : -1;
}

// Returns 1 and fills outputs when a response event was read, else 0.
int32_t pie_ipc_poll_response(void* h, uint64_t* request_id, int32_t* token,
                              uint8_t* finished, uint8_t* reason) {
  return static_cast<IpcChannel*>(h)->poll_response(request_id, token,
                                                    finished, reason)
             ? 1
             : 0;
}

uint32_t pie_ipc_wait_responses(void* h, uint32_t seen, int32_t timeout_ms) {
  return static_cast<IpcChannel*>(h)->wait_responses(seen, timeout_ms);
}

uint32_t pie_ipc_response_doorbell(void* h) {
  return static_cast<IpcChannel*>(h)->response_doorbell();
}

// Engine side: manual request drain (used when no IpcReader is attached).
// Returns 1 when a request was read; fields mirror pie_sched_submit inputs.
int32_t pie_ipc_next_request(void* h, uint64_t* request_id, int32_t* prompt,
                             uint32_t* prompt_len, uint32_t* max_new_tokens,
                             int32_t* stop_ids, uint32_t* num_stop,
                             float* temperature, float* top_p, float* min_p,
                             int32_t* top_k, float* repetition_penalty,
                             float* presence_penalty, float* frequency_penalty,
                             uint64_t* rng_seed, uint8_t* cancel) {
  RequestSlotHeader req;
  if (!static_cast<IpcChannel*>(h)->next_request(&req, prompt)) return 0;
  *request_id = req.request_id;
  *prompt_len = req.prompt_len;
  *max_new_tokens = req.max_new_tokens;
  *num_stop = req.num_stop;
  std::memcpy(stop_ids, req.stop_ids, sizeof(req.stop_ids));
  *temperature = req.temperature;
  *top_p = req.top_p;
  *min_p = req.min_p;
  *top_k = req.top_k;
  *repetition_penalty = req.repetition_penalty;
  *presence_penalty = req.presence_penalty;
  *frequency_penalty = req.frequency_penalty;
  *rng_seed = req.rng_seed;
  *cancel = req.cancel;
  return 1;
}

uint32_t pie_ipc_wait_requests(void* h, uint32_t seen, int32_t timeout_ms) {
  return static_cast<IpcChannel*>(h)->wait_requests(seen, timeout_ms);
}

uint32_t pie_ipc_request_doorbell(void* h) {
  return static_cast<IpcChannel*>(h)->request_doorbell();
}

int32_t pie_ipc_push_response(void* h, uint64_t request_id, int32_t token,
                              uint8_t finished, uint8_t reason) {
  return static_cast<IpcChannel*>(h)->push_response(request_id, token,
                                                    finished, reason)
             ? 0
             : -1;
}

// --- reader thread bridging a channel into a scheduler -------------------

void* pie_ipc_reader_create(void* channel, void* scheduler) {
  try {
    auto* r = new IpcReader(*static_cast<IpcChannel*>(channel),
                            *static_cast<Scheduler*>(scheduler));
    r->start();
    return r;
  } catch (...) {
    return nullptr;
  }
}

void pie_ipc_reader_destroy(void* h) { delete static_cast<IpcReader*>(h); }

void pie_ipc_reader_forward_token(void* h, uint64_t seq_id, int32_t token) {
  static_cast<IpcReader*>(h)->forward_token(seq_id, token);
}

void pie_ipc_reader_forward_finish(void* h, uint64_t seq_id, uint8_t reason) {
  static_cast<IpcReader*>(h)->forward_finish(
      seq_id, static_cast<FinishReason>(reason));
}

uint64_t pie_ipc_reader_accepted(void* h) {
  return static_cast<IpcReader*>(h)->requests_accepted();
}

}  // extern "C"

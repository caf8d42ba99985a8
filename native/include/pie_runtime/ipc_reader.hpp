// Engine-side IPC reader thread: futex-wait on the request doorbell, drain
// READY slots into the Scheduler, and forward generated tokens / finish
// events back through the response ring.
//
// Reference parity: pie_core's IPCReader (reference
// include/ipc/ipc_reader.hpp:26-76 — kqueue-notified wait, CAS slot claim,
// Sequence construction, SPSC handoff to the scheduler) which had no .cpp.
// Here the handoff is direct: Scheduler::submit is thread-safe, so no extra
// queue is needed; the response path (the reference's unbuilt
// "response channel", ipc_handles.hpp) is the ResponseSlot ring.

#pragma once

#include <atomic>
#include <mutex>
#include <thread>
#include <unordered_map>

#include "pie_runtime/ipc.hpp"
#include "pie_runtime/scheduler.hpp"

namespace pie_runtime {

class IpcReader {
 public:
  IpcReader(IpcChannel& channel, Scheduler& scheduler);
  ~IpcReader();

  IpcReader(const IpcReader&) = delete;
  IpcReader& operator=(const IpcReader&) = delete;

  void start();
  void stop();

  // Called by the driver after each scheduler step: stream newly generated
  // tokens and finish events into the response ring. The driver passes the
  // per-step emissions (seq_id -> token) and finished list.
  void forward_token(uint64_t seq_id, int32_t token);
  void forward_finish(uint64_t seq_id, FinishReason reason);

  uint64_t requests_accepted() const {
    return accepted_.load(std::memory_order_relaxed);
  }

 private:
  void run();

  IpcChannel& channel_;
  Scheduler& scheduler_;
  std::thread thread_;
  std::atomic<bool> running_{false};
  std::atomic<uint64_t> accepted_{0};
  // frontend request_id <-> scheduler seq_id
  std::mutex map_mu_;
  std::unordered_map<uint64_t, uint64_t> req_to_seq_;
  std::unordered_map<uint64_t, uint64_t> seq_to_req_;
};

}  // namespace pie_runtime

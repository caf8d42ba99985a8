// Engine-side IPC reader (see ipc_reader.hpp).

#include "pie_runtime/ipc_reader.hpp"

#include <vector>

namespace pie_runtime {

IpcReader::IpcReader(IpcChannel& channel, Scheduler& scheduler)
    : channel_(channel), scheduler_(scheduler) {}

IpcReader::~IpcReader() { stop(); }

void IpcReader::start() {
  bool expected = false;
  if (!running_.compare_exchange_strong(expected, true)) return;
  thread_ = std::thread([this] { run(); });
}

void IpcReader::stop() {
  if (!running_.exchange(false)) return;
  // poke the doorbell so the futex wait wakes up and sees !running_
  if (thread_.joinable()) thread_.join();
}

void IpcReader::run() {
  std::vector<int32_t> prompt(channel_.prompt_capacity());
  RequestSlotHeader req;
  uint32_t seen = channel_.request_doorbell();
  while (running_.load(std::memory_order_acquire)) {
    bool any = false;
    while (channel_.next_request(&req, prompt.data())) {
      any = true;
      if (req.cancel) {
        std::lock_guard<std::mutex> g(map_mu_);
        auto it = req_to_seq_.find(req.request_id);
        if (it != req_to_seq_.end()) scheduler_.cancel(it->second);
        continue;
      }
      SamplingParams sp;
      sp.temperature = req.temperature;
      sp.top_p = req.top_p;
      sp.min_p = req.min_p;
      sp.top_k = req.top_k;
      sp.rng_seed = req.rng_seed;
      LogitsParams lp;
      lp.repetition_penalty = req.repetition_penalty;
      lp.presence_penalty = req.presence_penalty;
      lp.frequency_penalty = req.frequency_penalty;
      StopCriteria sc;
      sc.max_generated_tokens = req.max_new_tokens;
      sc.stop_token_ids.assign(req.stop_ids, req.stop_ids + req.num_stop);
      const uint64_t seq_id = scheduler_.submit(
          std::vector<int32_t>(prompt.begin(),
                               prompt.begin() + req.prompt_len),
          sp, lp, std::move(sc));
      {
        std::lock_guard<std::mutex> g(map_mu_);
        req_to_seq_[req.request_id] = seq_id;
        seq_to_req_[seq_id] = req.request_id;
      }
      accepted_.fetch_add(1, std::memory_order_relaxed);
    }
    if (!any) {
      // timed futex wait so stop() is observed promptly
      seen = channel_.wait_requests(seen, /*timeout_ms=*/50);
    } else {
      seen = channel_.request_doorbell();
    }
  }
}

void IpcReader::forward_token(uint64_t seq_id, int32_t token) {
  uint64_t req_id;
  {
    std::lock_guard<std::mutex> g(map_mu_);
    auto it = seq_to_req_.find(seq_id);
    if (it == seq_to_req_.end()) return;
    req_id = it->second;
  }
  while (!channel_.push_response(req_id, token, /*finished=*/0, 0)) {
    // response ring full: frontend is slow; spin-yield (bounded in practice
    // by the ring size and the frontend's poll loop)
    std::this_thread::yield();
  }
}

void IpcReader::forward_finish(uint64_t seq_id, FinishReason reason) {
  uint64_t req_id;
  {
    std::lock_guard<std::mutex> g(map_mu_);
    auto it = seq_to_req_.find(seq_id);
    if (it == seq_to_req_.end()) return;
    req_id = it->second;
    seq_to_req_.erase(it);
    req_to_seq_.erase(req_id);
  }
  while (!channel_.push_response(req_id, 0, /*finished=*/1,
                                 static_cast<uint8_t>(reason))) {
    std::this_thread::yield();
  }
}

}  // namespace pie_runtime

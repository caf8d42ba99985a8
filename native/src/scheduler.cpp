// Continuous-batching scheduler implementation (see scheduler.hpp).
//
// Fills the hole the reference left open: pie_core's Scheduler::step() was
// an empty PImpl (reference src/engine/scheduler.cpp:22-27); the admission
// limits, page accounting, mixed prefill/decode batch assembly, and
// per-sequence param plumbing it sketched live here, adapted to fixed-lane
// batches for jitted TPU device programs.

#include "pie_runtime/scheduler.hpp"

#include <algorithm>
#include <cstring>

namespace pie_runtime {

namespace {
constexpr int32_t kPadToken = -1;  // matches pie_tpu.engine.core.PAD_TOKEN
}

Scheduler::Scheduler(const SchedulerConfig& cfg)
    : cfg_(cfg), allocator_(cfg.num_pages) {
  lanes_.resize(cfg_.num_lanes);
  for (auto& lane : lanes_) {
    lane.history.assign(cfg_.history_len, kPadToken);
  }
}

uint64_t Scheduler::submit(std::vector<int32_t> prompt,
                           SamplingParams sampling, LogitsParams logits,
                           StopCriteria stop) {
  std::lock_guard<std::mutex> g(mu_);
  const uint64_t id = next_id_++;
  auto seq = std::make_unique<Sequence>(id, std::move(prompt));
  seq->sampling = sampling;
  seq->logits = logits;
  seq->stop = std::move(stop);
  seqs_.emplace(id, std::move(seq));
  waiting_.push_back(id);
  return id;
}

bool Scheduler::finish_external(uint64_t seq_id, FinishReason reason) {
  std::lock_guard<std::mutex> g(mu_);
  Sequence* seq = find(seq_id);
  if (seq == nullptr) return false;
  if (seq->status != SeqStatus::PREFILLING &&
      seq->status != SeqStatus::DECODING) {
    return false;  // already finished (e.g. native stop on the same token)
  }
  finish(*seq, reason);
  return true;
}

bool Scheduler::cancel(uint64_t seq_id) {
  std::lock_guard<std::mutex> g(mu_);
  Sequence* seq = find(seq_id);
  if (seq == nullptr) return false;
  seq->cancelled.store(true, std::memory_order_release);
  return true;
}

bool Scheduler::allocate_pages(Sequence& seq, uint32_t total_tokens) {
  const uint32_t need = pages_needed(total_tokens);
  if (need > cfg_.max_pages_per_seq) return false;
  std::vector<uint32_t> pages;
  pages.reserve(need);
  for (uint32_t i = 0; i < need; ++i) {
    auto p = allocator_.allocate_page();
    if (!p) {  // roll back: all-or-nothing (exhaustion -> caller queues)
      for (uint32_t q : pages) allocator_.free_page(q);
      return false;
    }
    pages.push_back(*p);
  }
  seq.page_table = std::move(pages);
  return true;
}

bool Scheduler::extend_pages(Sequence& seq, uint32_t total_tokens) {
  const uint32_t need = pages_needed(total_tokens);
  if (need > cfg_.max_pages_per_seq) return false;
  while (seq.page_table.size() < need) {
    auto p = allocator_.allocate_page();
    if (!p) return false;
    seq.page_table.push_back(*p);
  }
  return true;
}

uint32_t Scheduler::begin_step() {
  std::lock_guard<std::mutex> g(mu_);
  // -- reap cancellations first (a lane with no active work would otherwise
  //    never pass through commit_decode to notice the flag) ----------------
  for (auto& lane : lanes_) {
    if (!lane.occupied) continue;
    Sequence* seq = find(lane.seq_id);
    if (seq == nullptr) {
      lane.occupied = false;
      continue;
    }
    if (seq->cancelled.load(std::memory_order_acquire)) {
      finish(*seq, FinishReason::CANCELLED);
    }
  }

  // -- admission: WAITING -> PREFILLING onto free lanes --------------------
  while (!waiting_.empty()) {
    const uint64_t id = waiting_.front();
    Sequence* seq = find(id);
    if (seq == nullptr) {  // released while waiting
      waiting_.pop_front();
      continue;
    }
    if (seq->cancelled.load(std::memory_order_acquire)) {
      waiting_.pop_front();
      finish(*seq, FinishReason::CANCELLED);
      continue;
    }
    auto lane_it =
        std::find_if(lanes_.begin(), lanes_.end(),
                     [](const Lane& l) { return !l.occupied; });
    if (lane_it == lanes_.end()) break;  // no free lane
    const uint32_t worst_case =
        seq->prompt_len + seq->stop.max_generated_tokens;
    if (pages_needed(worst_case) > cfg_.max_pages_per_seq) {
      waiting_.pop_front();
      finish(*seq, FinishReason::OOM);
      continue;
    }
    if (!allocate_pages(*seq, worst_case)) break;  // pool full: stay queued
    waiting_.pop_front();
    seq->status = SeqStatus::PREFILLING;
    seq->prefill_pos = 0;
    Lane& lane = *lane_it;
    lane.occupied = true;
    lane.seq_id = id;
    lane.context_len = 0;
    lane.last_token = 0;
    std::fill(lane.history.begin(), lane.history.end(), kPadToken);
    // seed penalty history with the prompt tail (reference
    // logits_params.hpp repetition_context covers prompt+output)
    const uint32_t tail = std::min<uint32_t>(
        cfg_.history_len, static_cast<uint32_t>(seq->tokens.size()));
    std::copy(seq->tokens.end() - tail, seq->tokens.end(),
              lane.history.end() - tail);
  }

  // -- stage one prefill chunk per PREFILLING lane --------------------------
  staged_.clear();
  uint32_t staged = 0;
  for (uint32_t li = 0; li < lanes_.size(); ++li) {
    Lane& lane = lanes_[li];
    if (!lane.occupied) continue;
    Sequence* seq = find(lane.seq_id);
    if (seq == nullptr || seq->status != SeqStatus::PREFILLING) continue;
    if (seq->cancelled.load(std::memory_order_acquire)) {
      finish(*seq, FinishReason::CANCELLED);
      continue;
    }
    PrefillChunk chunk;
    chunk.lane = li;
    chunk.seq_id = lane.seq_id;
    chunk.start_pos = seq->prefill_pos;
    const uint32_t n = std::min<uint32_t>(
        cfg_.prefill_chunk, seq->prompt_len - seq->prefill_pos);
    chunk.token_ids.assign(seq->tokens.begin() + seq->prefill_pos,
                           seq->tokens.begin() + seq->prefill_pos + n);
    chunk.context_len = seq->prefill_pos + n;
    chunk.is_last = (seq->prefill_pos + n >= seq->prompt_len);
    seq->prefill_pos += n;
    lane.context_len = chunk.context_len;
    staged_.push_back(std::move(chunk));
    ++staged;
  }
  return staged;
}

bool Scheduler::next_prefill(PrefillChunk* out) {
  std::lock_guard<std::mutex> g(mu_);
  if (staged_.empty()) return false;
  *out = std::move(staged_.front());
  staged_.pop_front();
  return true;
}

void Scheduler::commit_first(uint32_t lane_idx, int32_t token) {
  std::lock_guard<std::mutex> g(mu_);
  Lane& lane = lanes_[lane_idx];
  if (!lane.occupied) return;
  Sequence* seq = find(lane.seq_id);
  if (seq == nullptr) return;
  seq->tokens.push_back(token);
  push_history(lane, token);
  lane.last_token = token;
  lane.context_len = seq->logical_len();
  const auto& stop_ids = seq->stop.stop_token_ids;
  if (std::find(stop_ids.begin(), stop_ids.end(), token) != stop_ids.end()) {
    finish(*seq, FinishReason::STOP);
  } else if (seq->num_generated() >= seq->stop.max_generated_tokens) {
    finish(*seq, FinishReason::LENGTH);
  } else if (!extend_pages(*seq, seq->logical_len())) {
    finish(*seq, FinishReason::OOM);
  } else {
    seq->status = SeqStatus::DECODING;
  }
}

uint32_t Scheduler::decode_view(int32_t* last_tokens, int32_t* context_lens,
                                int32_t* block_tables, uint8_t* active,
                                int32_t* history, float* temperature,
                                float* top_p, float* min_p, int32_t* top_k,
                                float* rep_pen, float* presence,
                                float* frequency) const {
  std::lock_guard<std::mutex> g(mu_);
  uint32_t n_active = 0;
  const uint32_t mp = cfg_.max_pages_per_seq;
  const uint32_t hl = cfg_.history_len;
  for (uint32_t li = 0; li < lanes_.size(); ++li) {
    const Lane& lane = lanes_[li];
    const Sequence* seq =
        lane.occupied ? find(lane.seq_id) : nullptr;
    // occupied lanes expose their block table even mid-prefill (the prefill
    // program addresses the pool through it); `active` gates decode only
    const bool is_occupied = seq != nullptr;
    const bool is_active =
        is_occupied && seq->status == SeqStatus::DECODING &&
        !seq->cancelled.load(std::memory_order_acquire);
    active[li] = is_active ? 1 : 0;
    last_tokens[li] = is_occupied ? lane.last_token : 0;
    context_lens[li] = is_occupied ? static_cast<int32_t>(lane.context_len) : 0;
    std::fill(block_tables + li * mp, block_tables + (li + 1) * mp, -1);
    std::fill(history + li * hl, history + (li + 1) * hl, kPadToken);
    if (is_occupied) {
      // params + history exposed mid-prefill too: the driver samples the
      // first token from lane state before the lane turns DECODING
      for (size_t b = 0; b < seq->page_table.size(); ++b) {
        block_tables[li * mp + b] = static_cast<int32_t>(seq->page_table[b]);
      }
      std::copy(lane.history.begin(), lane.history.end(), history + li * hl);
      temperature[li] = seq->sampling.temperature;
      top_p[li] = seq->sampling.top_p;
      min_p[li] = seq->sampling.min_p;
      top_k[li] = seq->sampling.top_k;
      rep_pen[li] = seq->logits.repetition_penalty;
      presence[li] = seq->logits.presence_penalty;
      frequency[li] = seq->logits.frequency_penalty;
      if (is_active) ++n_active;
    } else {
      temperature[li] = 1.0f;
      top_p[li] = 1.0f;
      min_p[li] = 0.0f;
      top_k[li] = -1;
      rep_pen[li] = 1.0f;
      presence[li] = 0.0f;
      frequency[li] = 0.0f;
    }
  }
  return n_active;
}

void Scheduler::commit_decode(const int32_t* tokens) {
  std::lock_guard<std::mutex> g(mu_);
  for (uint32_t li = 0; li < lanes_.size(); ++li) {
    Lane& lane = lanes_[li];
    if (!lane.occupied) continue;
    Sequence* seq = find(lane.seq_id);
    if (seq == nullptr || seq->status != SeqStatus::DECODING) continue;
    if (seq->cancelled.load(std::memory_order_acquire)) {
      finish(*seq, FinishReason::CANCELLED);
      continue;
    }
    const int32_t tok = tokens[li];
    seq->tokens.push_back(tok);
    push_history(lane, tok);
    lane.last_token = tok;
    lane.context_len = seq->logical_len();
    const auto& stop_ids = seq->stop.stop_token_ids;
    if (std::find(stop_ids.begin(), stop_ids.end(), tok) != stop_ids.end()) {
      finish(*seq, FinishReason::STOP);
    } else if (seq->num_generated() >= seq->stop.max_generated_tokens) {
      finish(*seq, FinishReason::LENGTH);
    } else if (!extend_pages(*seq, seq->logical_len())) {
      finish(*seq, FinishReason::OOM);
    }
  }
}

uint32_t Scheduler::pop_finished(FinishedSeq* out, uint32_t cap) {
  std::lock_guard<std::mutex> g(mu_);
  uint32_t n = 0;
  while (n < cap && !finished_.empty()) {
    out[n++] = finished_.front();
    finished_.pop_front();
  }
  return n;
}

uint32_t Scheduler::seq_output(uint64_t seq_id, int32_t* out,
                               uint32_t cap) const {
  std::lock_guard<std::mutex> g(mu_);
  const Sequence* seq = find(seq_id);
  if (seq == nullptr) return 0xffffffffu;
  const uint32_t n = seq->num_generated();
  const uint32_t m = std::min(n, cap);
  std::copy(seq->tokens.begin() + seq->prompt_len,
            seq->tokens.begin() + seq->prompt_len + m, out);
  return n;
}

void Scheduler::release(uint64_t seq_id) {
  std::lock_guard<std::mutex> g(mu_);
  auto it = seqs_.find(seq_id);
  if (it == seqs_.end()) return;
  Sequence& seq = *it->second;
  // still holding pages (running/waiting)? free them first
  for (uint32_t p : seq.page_table) allocator_.free_page(p);
  seq.page_table.clear();
  seqs_.erase(it);
}

void Scheduler::lane_seqs(uint64_t* out) const {
  std::lock_guard<std::mutex> g(mu_);
  for (uint32_t li = 0; li < lanes_.size(); ++li) {
    out[li] = lanes_[li].occupied ? lanes_[li].seq_id : 0;
  }
}

bool Scheduler::has_work() const {
  std::lock_guard<std::mutex> g(mu_);
  if (!waiting_.empty()) return true;
  for (const auto& lane : lanes_) {
    if (lane.occupied) return true;
  }
  return false;
}

uint32_t Scheduler::num_waiting() const {
  std::lock_guard<std::mutex> g(mu_);
  return static_cast<uint32_t>(waiting_.size());
}

uint32_t Scheduler::num_running() const {
  std::lock_guard<std::mutex> g(mu_);
  uint32_t n = 0;
  for (const auto& lane : lanes_) n += lane.occupied ? 1 : 0;
  return n;
}

void Scheduler::finish(Sequence& seq, FinishReason reason) {
  seq.finish_reason = reason;
  seq.status = reason == FinishReason::CANCELLED ? SeqStatus::CANCELLED
               : reason == FinishReason::OOM     ? SeqStatus::ERROR
               : reason == FinishReason::MACHINE_ERROR ? SeqStatus::ERROR
                                                       : SeqStatus::COMPLETED;
  for (uint32_t p : seq.page_table) allocator_.free_page(p);
  seq.page_table.clear();
  for (auto& lane : lanes_) {
    if (lane.occupied && lane.seq_id == seq.seq_id) {
      lane.occupied = false;
      lane.context_len = 0;
      break;
    }
  }
  finished_.push_back(FinishedSeq{seq.seq_id, reason});
}

void Scheduler::push_history(Lane& lane, int32_t token) {
  // shift-left ring: history[-1] is always the newest token
  std::rotate(lane.history.begin(), lane.history.begin() + 1,
              lane.history.end());
  lane.history.back() = token;
}

Sequence* Scheduler::find(uint64_t seq_id) {
  auto it = seqs_.find(seq_id);
  return it == seqs_.end() ? nullptr : it->second.get();
}

const Sequence* Scheduler::find(uint64_t seq_id) const {
  auto it = seqs_.find(seq_id);
  return it == seqs_.end() ? nullptr : it->second.get();
}

}  // namespace pie_runtime

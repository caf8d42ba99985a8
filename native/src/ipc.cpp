// POSIX shm + futex transport (see ipc.hpp). The futex syscall is used
// directly (no FUTEX_PRIVATE_FLAG) so waits work across processes — the
// Linux equivalent of the reference's kqueue EVFILT_USER doorbell
// (reference src/main.cpp:84-107).

#include "pie_runtime/ipc.hpp"

#include <fcntl.h>
#include <linux/futex.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <sys/syscall.h>
#include <sys/time.h>
#include <unistd.h>

#include <cerrno>
#include <cstring>
#include <stdexcept>

namespace pie_runtime {

namespace {

long futex(std::atomic<uint32_t>* addr, int op, uint32_t val,
           const struct timespec* ts) {
  return syscall(SYS_futex, reinterpret_cast<uint32_t*>(addr), op, val, ts,
                 nullptr, 0);
}

void futex_wake_all(std::atomic<uint32_t>* addr) {
  futex(addr, FUTEX_WAKE, INT32_MAX, nullptr);
}

// Wait until *addr != seen (or timeout). Returns the current value.
uint32_t futex_wait_change(std::atomic<uint32_t>* addr, uint32_t seen,
                           int timeout_ms) {
  struct timespec ts;
  struct timespec* tsp = nullptr;
  if (timeout_ms >= 0) {
    ts.tv_sec = timeout_ms / 1000;
    ts.tv_nsec = (timeout_ms % 1000) * 1000000L;
    tsp = &ts;
  }
  uint32_t cur = addr->load(std::memory_order_acquire);
  if (cur != seen) return cur;
  futex(addr, FUTEX_WAIT, seen, tsp);
  return addr->load(std::memory_order_acquire);
}

size_t align_up(size_t v, size_t a) { return (v + a - 1) & ~(a - 1); }

}  // namespace

IpcChannel::IpcChannel(std::string name, void* base, size_t size, bool owner)
    : name_(std::move(name)), base_(base), size_(size), owner_(owner) {
  header_ = static_cast<RingHeader*>(base_);
  slots_base_ = static_cast<char*>(base_) + align_up(sizeof(RingHeader), 64);
  slot_stride_ = align_up(
      sizeof(RequestSlotHeader) + header_->prompt_capacity * sizeof(int32_t),
      64);
  responses_ = reinterpret_cast<ResponseSlot*>(
      slots_base_ + slot_stride_ * header_->num_request_slots);
}

IpcChannel* IpcChannel::create(const std::string& name,
                               uint32_t request_slots,
                               uint32_t prompt_capacity,
                               uint32_t response_slots) {
  shm_unlink(name.c_str());  // stale segment from a crashed run
  const int fd = shm_open(name.c_str(), O_CREAT | O_EXCL | O_RDWR, 0600);
  if (fd < 0) {
    throw std::runtime_error("shm_open(create) failed: " +
                             std::string(strerror(errno)));
  }
  const size_t slot_stride = align_up(
      sizeof(RequestSlotHeader) + prompt_capacity * sizeof(int32_t), 64);
  const size_t size = align_up(sizeof(RingHeader), 64) +
                      slot_stride * request_slots +
                      align_up(sizeof(ResponseSlot), 64) * response_slots;
  if (ftruncate(fd, static_cast<off_t>(size)) != 0) {
    close(fd);
    shm_unlink(name.c_str());
    throw std::runtime_error("ftruncate failed");
  }
  void* base =
      mmap(nullptr, size, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (base == MAP_FAILED) {
    shm_unlink(name.c_str());
    throw std::runtime_error("mmap failed");
  }
  auto* hdr = new (base) RingHeader();
  hdr->num_request_slots = request_slots;
  hdr->prompt_capacity = prompt_capacity;
  hdr->num_response_slots = response_slots;
  char* slots = static_cast<char*>(base) + align_up(sizeof(RingHeader), 64);
  for (uint32_t i = 0; i < request_slots; ++i) {
    new (slots + slot_stride * i) RequestSlotHeader();
  }
  auto* resp = reinterpret_cast<ResponseSlot*>(
      slots + slot_stride * request_slots);
  for (uint32_t i = 0; i < response_slots; ++i) new (&resp[i]) ResponseSlot();
  // publish the magic last: attachers spin on it
  std::atomic_thread_fence(std::memory_order_release);
  hdr->magic = kIpcMagic;
  return new IpcChannel(name, base, size, /*owner=*/true);
}

IpcChannel* IpcChannel::attach(const std::string& name) {
  const int fd = shm_open(name.c_str(), O_RDWR, 0600);
  if (fd < 0) {
    throw std::runtime_error("shm_open(attach) failed: " +
                             std::string(strerror(errno)));
  }
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < (off_t)sizeof(RingHeader)) {
    close(fd);
    throw std::runtime_error("bad shm segment");
  }
  void* base = mmap(nullptr, static_cast<size_t>(st.st_size),
                    PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (base == MAP_FAILED) throw std::runtime_error("mmap failed");
  auto* hdr = static_cast<RingHeader*>(base);
  if (hdr->magic != kIpcMagic) {
    munmap(base, static_cast<size_t>(st.st_size));
    throw std::runtime_error("shm segment not initialized");
  }
  return new IpcChannel(name, base, static_cast<size_t>(st.st_size),
                        /*owner=*/false);
}

IpcChannel::~IpcChannel() {
  if (base_ != nullptr) munmap(base_, size_);
  if (owner_) shm_unlink(name_.c_str());
}

RequestSlotHeader* IpcChannel::request_slot(uint32_t i) {
  return reinterpret_cast<RequestSlotHeader*>(slots_base_ +
                                              slot_stride_ * i);
}

int32_t* IpcChannel::slot_prompt(uint32_t i) {
  return reinterpret_cast<int32_t*>(slots_base_ + slot_stride_ * i +
                                    sizeof(RequestSlotHeader));
}

ResponseSlot* IpcChannel::response_slot(uint32_t i) { return &responses_[i]; }

bool IpcChannel::submit(uint64_t request_id, const int32_t* prompt,
                        uint32_t prompt_len, const SamplingParams& sp,
                        const LogitsParams& lp, const StopCriteria& sc) {
  if (prompt_len > header_->prompt_capacity) return false;
  const uint32_t n = header_->num_request_slots;
  const uint32_t start =
      header_->request_write_idx.fetch_add(1, std::memory_order_relaxed);
  for (uint32_t k = 0; k < n; ++k) {
    const uint32_t i = (start + k) % n;
    RequestSlotHeader* slot = request_slot(i);
    uint32_t expected = static_cast<uint32_t>(SlotState::FREE);
    if (!slot->state.compare_exchange_strong(
            expected, static_cast<uint32_t>(SlotState::WRITING),
            std::memory_order_acq_rel)) {
      continue;
    }
    slot->request_id = request_id;
    slot->prompt_len = prompt_len;
    slot->max_new_tokens = sc.max_generated_tokens;
    slot->num_stop = std::min<uint32_t>(
        static_cast<uint32_t>(sc.stop_token_ids.size()), kMaxStopTokens);
    for (uint32_t s = 0; s < slot->num_stop; ++s) {
      slot->stop_ids[s] = sc.stop_token_ids[s];
    }
    slot->temperature = sp.temperature;
    slot->top_p = sp.top_p;
    slot->min_p = sp.min_p;
    slot->top_k = sp.top_k;
    slot->rng_seed = sp.rng_seed;
    slot->repetition_penalty = lp.repetition_penalty;
    slot->presence_penalty = lp.presence_penalty;
    slot->frequency_penalty = lp.frequency_penalty;
    slot->cancel = 0;
    std::memcpy(slot_prompt(i), prompt, prompt_len * sizeof(int32_t));
    slot->state.store(static_cast<uint32_t>(SlotState::READY),
                      std::memory_order_release);
    header_->request_doorbell.fetch_add(1, std::memory_order_release);
    futex_wake_all(&header_->request_doorbell);
    return true;
  }
  return false;  // ring full
}

bool IpcChannel::submit_cancel(uint64_t request_id) {
  SamplingParams sp;
  LogitsParams lp;
  StopCriteria sc;
  const uint32_t n = header_->num_request_slots;
  const uint32_t start =
      header_->request_write_idx.fetch_add(1, std::memory_order_relaxed);
  for (uint32_t k = 0; k < n; ++k) {
    const uint32_t i = (start + k) % n;
    RequestSlotHeader* slot = request_slot(i);
    uint32_t expected = static_cast<uint32_t>(SlotState::FREE);
    if (!slot->state.compare_exchange_strong(
            expected, static_cast<uint32_t>(SlotState::WRITING),
            std::memory_order_acq_rel)) {
      continue;
    }
    slot->request_id = request_id;
    slot->prompt_len = 0;
    slot->cancel = 1;
    slot->state.store(static_cast<uint32_t>(SlotState::READY),
                      std::memory_order_release);
    header_->request_doorbell.fetch_add(1, std::memory_order_release);
    futex_wake_all(&header_->request_doorbell);
    return true;
  }
  return false;
}

bool IpcChannel::next_request(RequestSlotHeader* out, int32_t* prompt_out) {
  const uint32_t n = header_->num_request_slots;
  const uint32_t start =
      header_->request_read_idx.load(std::memory_order_relaxed);
  for (uint32_t k = 0; k < n; ++k) {
    const uint32_t i = (start + k) % n;
    RequestSlotHeader* slot = request_slot(i);
    uint32_t expected = static_cast<uint32_t>(SlotState::READY);
    if (!slot->state.compare_exchange_strong(
            expected, static_cast<uint32_t>(SlotState::READING),
            std::memory_order_acq_rel)) {
      continue;
    }
    // plain-field copy (atomics are not copyable)
    out->request_id = slot->request_id;
    out->prompt_len = slot->prompt_len;
    out->max_new_tokens = slot->max_new_tokens;
    out->num_stop = slot->num_stop;
    std::memcpy(out->stop_ids, slot->stop_ids, sizeof(slot->stop_ids));
    out->temperature = slot->temperature;
    out->top_p = slot->top_p;
    out->min_p = slot->min_p;
    out->top_k = slot->top_k;
    out->repetition_penalty = slot->repetition_penalty;
    out->presence_penalty = slot->presence_penalty;
    out->frequency_penalty = slot->frequency_penalty;
    out->rng_seed = slot->rng_seed;
    out->cancel = slot->cancel;
    std::memcpy(prompt_out, slot_prompt(i),
                slot->prompt_len * sizeof(int32_t));
    slot->state.store(static_cast<uint32_t>(SlotState::FREE),
                      std::memory_order_release);
    header_->request_read_idx.store((i + 1) % n, std::memory_order_relaxed);
    return true;
  }
  return false;
}

uint32_t IpcChannel::wait_requests(uint32_t seen, int timeout_ms) {
  return futex_wait_change(&header_->request_doorbell, seen, timeout_ms);
}

uint32_t IpcChannel::wait_responses(uint32_t seen, int timeout_ms) {
  return futex_wait_change(&header_->response_doorbell, seen, timeout_ms);
}

uint32_t IpcChannel::request_doorbell() const {
  return header_->request_doorbell.load(std::memory_order_acquire);
}

uint32_t IpcChannel::response_doorbell() const {
  return header_->response_doorbell.load(std::memory_order_acquire);
}

bool IpcChannel::push_response(uint64_t request_id, int32_t token,
                               uint8_t finished, uint8_t reason) {
  const uint32_t n = header_->num_response_slots;
  const uint32_t start =
      header_->response_write_idx.fetch_add(1, std::memory_order_relaxed);
  for (uint32_t k = 0; k < n; ++k) {
    const uint32_t i = (start + k) % n;
    ResponseSlot* slot = response_slot(i);
    uint32_t expected = static_cast<uint32_t>(SlotState::FREE);
    if (!slot->state.compare_exchange_strong(
            expected, static_cast<uint32_t>(SlotState::WRITING),
            std::memory_order_acq_rel)) {
      continue;
    }
    slot->request_id = request_id;
    slot->token = token;
    slot->finished = finished;
    slot->reason = reason;
    slot->state.store(static_cast<uint32_t>(SlotState::READY),
                      std::memory_order_release);
    header_->response_doorbell.fetch_add(1, std::memory_order_release);
    futex_wake_all(&header_->response_doorbell);
    return true;
  }
  return false;
}

bool IpcChannel::poll_response(uint64_t* request_id, int32_t* token,
                               uint8_t* finished, uint8_t* reason) {
  const uint32_t n = header_->num_response_slots;
  const uint32_t start =
      header_->response_read_idx.load(std::memory_order_relaxed);
  for (uint32_t k = 0; k < n; ++k) {
    const uint32_t i = (start + k) % n;
    ResponseSlot* slot = response_slot(i);
    uint32_t expected = static_cast<uint32_t>(SlotState::READY);
    if (!slot->state.compare_exchange_strong(
            expected, static_cast<uint32_t>(SlotState::READING),
            std::memory_order_acq_rel)) {
      continue;
    }
    *request_id = slot->request_id;
    *token = slot->token;
    *finished = slot->finished;
    *reason = slot->reason;
    slot->state.store(static_cast<uint32_t>(SlotState::FREE),
                      std::memory_order_release);
    header_->response_read_idx.store((i + 1) % n, std::memory_order_relaxed);
    return true;
  }
  return false;
}

}  // namespace pie_runtime

// IPC transport tests: slot lifecycle, ring-full behavior, cross-thread and
// cross-process (fork) request/response flow, reader -> scheduler bridge.

#include <sys/wait.h>
#include <unistd.h>

#include <atomic>
#include <cassert>
#include <cstdio>
#include <cstring>
#include <memory>
#include <thread>
#include <vector>

#include "pie_runtime/ipc.hpp"
#include "pie_runtime/ipc_reader.hpp"
#include "pie_runtime/scheduler.hpp"

using namespace pie_runtime;

namespace {

void test_basic_roundtrip() {
  std::unique_ptr<IpcChannel> eng(
      IpcChannel::create("/pie_test_basic", 8, 64, 32));
  std::unique_ptr<IpcChannel> fe(IpcChannel::attach("/pie_test_basic"));

  SamplingParams sp;
  sp.temperature = 0.7f;
  sp.top_k = 50;
  LogitsParams lp;
  lp.repetition_penalty = 1.1f;
  StopCriteria sc;
  sc.max_generated_tokens = 33;
  sc.stop_token_ids = {5, 6};
  int32_t prompt[4] = {10, 20, 30, 40};
  assert(fe->submit(77, prompt, 4, sp, lp, sc));

  RequestSlotHeader req;
  std::vector<int32_t> pbuf(eng->prompt_capacity());
  assert(eng->next_request(&req, pbuf.data()));
  assert(req.request_id == 77);
  assert(req.prompt_len == 4);
  assert(pbuf[0] == 10 && pbuf[3] == 40);
  assert(req.temperature == 0.7f);
  assert(req.top_k == 50);
  assert(req.repetition_penalty == 1.1f);
  assert(req.max_new_tokens == 33);
  assert(req.num_stop == 2 && req.stop_ids[1] == 6);
  assert(!eng->next_request(&req, pbuf.data()));

  // response path
  assert(eng->push_response(77, 123, 0, 0));
  assert(eng->push_response(77, 0, 1, 2));
  uint64_t rid;
  int32_t tok;
  uint8_t fin, reason;
  assert(fe->poll_response(&rid, &tok, &fin, &reason));
  assert(rid == 77 && tok == 123 && fin == 0);
  assert(fe->poll_response(&rid, &tok, &fin, &reason));
  assert(fin == 1 && reason == 2);
  assert(!fe->poll_response(&rid, &tok, &fin, &reason));
  std::printf("test_basic_roundtrip ok\n");
}

void test_ring_full() {
  std::unique_ptr<IpcChannel> eng(
      IpcChannel::create("/pie_test_full", 2, 16, 2));
  std::unique_ptr<IpcChannel> fe(IpcChannel::attach("/pie_test_full"));
  int32_t prompt[1] = {1};
  assert(fe->submit(1, prompt, 1, {}, {}, {}));
  assert(fe->submit(2, prompt, 1, {}, {}, {}));
  assert(!fe->submit(3, prompt, 1, {}, {}, {}));  // full
  RequestSlotHeader req;
  std::vector<int32_t> pbuf(16);
  assert(eng->next_request(&req, pbuf.data()));
  assert(fe->submit(3, prompt, 1, {}, {}, {}));  // slot freed
  // oversized prompt rejected
  std::vector<int32_t> big(17, 0);
  assert(!fe->submit(4, big.data(), 17, {}, {}, {}));
  std::printf("test_ring_full ok\n");
}

void test_cross_process() {
  std::unique_ptr<IpcChannel> eng(
      IpcChannel::create("/pie_test_proc", 64, 32, 256));
  constexpr int kReqs = 40;
  const pid_t pid = fork();
  assert(pid >= 0);
  if (pid == 0) {
    // child = frontend: submit kReqs requests, read back kReqs echoes
    std::unique_ptr<IpcChannel> fe(IpcChannel::attach("/pie_test_proc"));
    for (int i = 0; i < kReqs; ++i) {
      int32_t prompt[2] = {i, i + 1};
      StopCriteria sc;
      sc.max_generated_tokens = 1;
      while (!fe->submit(1000 + i, prompt, 2, {}, {}, sc)) usleep(100);
    }
    int got = 0;
    uint32_t seen = 0;
    while (got < kReqs) {
      uint64_t rid;
      int32_t tok;
      uint8_t fin, reason;
      while (fe->poll_response(&rid, &tok, &fin, &reason)) {
        assert(rid >= 1000 && rid < 1000 + kReqs);
        assert(tok == static_cast<int32_t>(rid - 1000) * 2);
        ++got;
      }
      if (got < kReqs) seen = fe->wait_responses(seen, 1000);
    }
    _exit(0);
  }
  // parent = engine: echo token = prompt[0]*2
  int served = 0;
  uint32_t seen = 0;
  RequestSlotHeader req;
  std::vector<int32_t> pbuf(32);
  while (served < kReqs) {
    while (eng->next_request(&req, pbuf.data())) {
      assert(req.prompt_len == 2);
      eng->push_response(req.request_id, pbuf[0] * 2, 0, 0);
      ++served;
    }
    if (served < kReqs) seen = eng->wait_requests(seen, 1000);
  }
  int status = 0;
  waitpid(pid, &status, 0);
  assert(WIFEXITED(status) && WEXITSTATUS(status) == 0);
  std::printf("test_cross_process ok (%d reqs)\n", served);
}

void test_reader_bridges_to_scheduler() {
  std::unique_ptr<IpcChannel> eng(
      IpcChannel::create("/pie_test_reader", 32, 32, 128));
  std::unique_ptr<IpcChannel> fe(IpcChannel::attach("/pie_test_reader"));
  SchedulerConfig cfg;
  cfg.num_lanes = 4;
  cfg.num_pages = 64;
  cfg.max_pages_per_seq = 4;
  cfg.prefill_chunk = 16;
  cfg.history_len = 16;
  Scheduler sched(cfg);
  IpcReader reader(*eng, sched);
  reader.start();

  StopCriteria sc;
  sc.max_generated_tokens = 3;
  int32_t prompt[3] = {7, 8, 9};
  assert(fe->submit(555, prompt, 3, {}, {}, sc));

  // wait for the reader thread to pick it up
  for (int i = 0; i < 1000 && sched.num_waiting() == 0; ++i) usleep(1000);
  assert(sched.num_waiting() == 1);

  // drive the scheduler like the device loop would, forwarding outputs
  std::vector<int32_t> lt(cfg.num_lanes), cl(cfg.num_lanes),
      bt(cfg.num_lanes * cfg.max_pages_per_seq),
      hist(cfg.num_lanes * cfg.history_len), tk(cfg.num_lanes);
  std::vector<uint8_t> act(cfg.num_lanes);
  std::vector<float> tp(cfg.num_lanes), pp(cfg.num_lanes), mp(cfg.num_lanes),
      rp(cfg.num_lanes), pr(cfg.num_lanes), fq(cfg.num_lanes);
  while (sched.has_work()) {
    sched.begin_step();
    PrefillChunk c;
    while (sched.next_prefill(&c)) {
      if (c.is_last) {
        sched.commit_first(c.lane, 100);
        reader.forward_token(c.seq_id, 100);
      }
    }
    uint64_t lane_seq[8];
    sched.lane_seqs(lane_seq);
    if (sched.decode_view(lt.data(), cl.data(), bt.data(), act.data(),
                          hist.data(), tp.data(), pp.data(), mp.data(),
                          tk.data(), rp.data(), pr.data(), fq.data()) > 0) {
      std::vector<int32_t> toks(cfg.num_lanes, 101);
      sched.commit_decode(toks.data());
      for (uint32_t li = 0; li < cfg.num_lanes; ++li) {
        if (act[li]) reader.forward_token(lane_seq[li], toks[li]);
      }
    }
    FinishedSeq fin[8];
    const uint32_t nf = sched.pop_finished(fin, 8);
    for (uint32_t i = 0; i < nf; ++i) {
      reader.forward_finish(fin[i].seq_id, fin[i].reason);
      sched.release(fin[i].seq_id);
    }
  }
  // frontend sees 3 tokens then a LENGTH finish
  int tokens = 0;
  bool finished = false;
  uint8_t reason = 0;
  for (int i = 0; i < 1000 && !finished; ++i) {
    uint64_t rid;
    int32_t tok;
    uint8_t fin, rsn;
    while (fe->poll_response(&rid, &tok, &fin, &rsn)) {
      assert(rid == 555);
      if (fin) {
        finished = true;
        reason = rsn;
      } else {
        ++tokens;
      }
    }
    if (!finished) usleep(1000);
  }
  assert(tokens == 3);
  assert(finished);
  assert(reason == static_cast<uint8_t>(FinishReason::LENGTH));
  reader.stop();
  std::printf("test_reader_bridges_to_scheduler ok\n");
}

void test_cancel_via_ipc() {
  std::unique_ptr<IpcChannel> eng(
      IpcChannel::create("/pie_test_cancel", 8, 16, 32));
  std::unique_ptr<IpcChannel> fe(IpcChannel::attach("/pie_test_cancel"));
  SchedulerConfig cfg;
  cfg.num_lanes = 2;
  cfg.num_pages = 32;
  cfg.max_pages_per_seq = 8;
  cfg.prefill_chunk = 8;
  cfg.history_len = 8;
  Scheduler sched(cfg);
  IpcReader reader(*eng, sched);
  reader.start();
  StopCriteria sc;
  sc.max_generated_tokens = 400;
  int32_t prompt[1] = {1};
  assert(fe->submit(9, prompt, 1, {}, {}, sc));
  for (int i = 0; i < 1000 && reader.requests_accepted() == 0; ++i)
    usleep(1000);
  assert(fe->submit_cancel(9));
  // run steps until the cancel lands
  std::vector<int32_t> lt(2), cl(2), bt(16), hist(16), tk(2);
  std::vector<uint8_t> act(2);
  std::vector<float> f6(2 * 6);
  FinishedSeq fin[4];
  bool done = false;
  for (int i = 0; i < 2000 && !done; ++i) {
    sched.begin_step();
    PrefillChunk c;
    while (sched.next_prefill(&c)) {
      if (c.is_last) sched.commit_first(c.lane, 3);
    }
    if (sched.decode_view(lt.data(), cl.data(), bt.data(), act.data(),
                          hist.data(), f6.data(), f6.data() + 2,
                          f6.data() + 4, tk.data(), f6.data() + 6,
                          f6.data() + 8, f6.data() + 10) > 0) {
      std::vector<int32_t> toks(2, 4);
      sched.commit_decode(toks.data());
    }
    const uint32_t nf = sched.pop_finished(fin, 4);
    for (uint32_t k = 0; k < nf; ++k) {
      assert(fin[k].reason == FinishReason::CANCELLED);
      done = true;
    }
    usleep(100);
  }
  assert(done);
  reader.stop();
  std::printf("test_cancel_via_ipc ok\n");
}

}  // namespace

int main() {
  test_basic_roundtrip();
  test_ring_full();
  test_cross_process();
  test_reader_bridges_to_scheduler();
  test_cancel_via_ipc();
  std::printf("all ipc tests passed\n");
  return 0;
}

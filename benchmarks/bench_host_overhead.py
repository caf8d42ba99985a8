"""Host-side scheduler overhead: Python planner vs native C++ scheduler.

Times ONE scheduling step's host bookkeeping (admission, chunk planning,
lane arrays, drain processing) with the device programs stubbed out, so
the numbers isolate exactly the work the reference intended to move into
the C++ engine process (reference include/engine/scheduler.hpp:27-43).

Run: python benchmarks/bench_host_overhead.py [--lanes 8] [--steps 200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # host-overhead bench: no device

import numpy as np


class _StubPool:
    num_pages = 4096
    quantized = False
    fold = 1


class _StubEngine:
    """PagedEngine stand-in: device programs return instantly with
    plausible shapes (every lane emits token 7 each step)."""

    def __init__(self, num_lanes=8, decode_steps=16, rider_width=248):
        self.num_lanes = num_lanes
        self.max_pages_per_seq = 64
        self.prefill_chunk = 256
        self.rider_width = rider_width
        self.history_len = 64
        self.pool = _StubPool()
        self.key = np.zeros((2,), np.uint32)

        class _M:
            def paged_forward(self, *a, **k):  # enables decode-only chunks
                raise NotImplementedError

        self.model = _M()

    def _prefill(self, params, pool, ids, positions, bt, ctx, last_idx):
        return np.zeros((1,), np.float32), pool

    def _chunk(self, params, pool, last, ctx, bt, hist, done, prod, max_new,
               stop_ids, sampling, rep, pres, freq, pf_ids, pf_pos, pf_lane,
               pf_ctx, pf_emb, pf_euse, wake_step, wake_tok, wake_ctx,
               wake_hist, bias_ids, bias_vals, allowed, mask_valid, budget,
               key, num_steps, sampler_kind, use_mask, use_embeds,
               use_rider, use_bias):
        b = self.num_lanes
        last = np.asarray(last).copy()
        ctx = np.asarray(ctx).copy()
        done = np.asarray(done).copy()
        prod = np.asarray(prod).copy()
        hist = np.asarray(hist).copy()
        ws = np.asarray(wake_step)
        emitted = np.full((num_steps, b), -1, np.int32)
        for s in range(num_steps):
            woke = ws == s
            done = done & ~woke
            ctx = np.where(woke, np.asarray(wake_ctx), ctx)
            active = ~done
            emitted[s] = np.where(active, 7, -1)
            prod = prod + active
            ctx = ctx + active
            done = done | (prod >= np.asarray(max_new))
        return emitted, pool, last, ctx, hist, done, prod, key

    params = None


def bench_python(lanes: int, steps: int) -> float:
    from pie_tpu.engine.scheduler import Scheduler

    eng = _StubEngine(num_lanes=lanes)
    sched = Scheduler(eng, decode_steps=16)
    prompt = list(range(1, 65))
    t_total = 0.0
    n_steps = 0
    for _ in range(steps):
        while len(sched.running) + len(sched.waiting) < lanes:
            sched.add_request(prompt, max_new_tokens=10_000, temperature=0.0)
        t0 = time.perf_counter()
        sched.step()
        t_total += time.perf_counter() - t0
        n_steps += 1
    return t_total / n_steps


def bench_native(lanes: int, steps: int) -> float:
    from pie_tpu.runtime.allocator import load_native

    if load_native() is None:
        return float("nan")
    from pie_tpu.runtime.native_scheduler import NativeSchedulerCore

    core = NativeSchedulerCore(
        num_lanes=lanes, num_pages=4096, max_pages_per_seq=64,
        prefill_chunk=256, history_len=64,
    )
    prompt = list(range(1, 65))
    tokens = np.full((lanes,), 7, np.int32)
    t_total = 0.0
    n_steps = 0
    for _ in range(steps):
        while core.num_running + core.num_waiting < lanes:
            core.submit(prompt, max_new_tokens=10_000, temperature=0.0)
        t0 = time.perf_counter()
        core.begin_step()
        while core.next_prefill() is not None:
            pass
        core.decode_view()
        core.commit_decode(tokens)
        for seq_id, _ in core.pop_finished():
            core.release(seq_id)
        t_total += time.perf_counter() - t0
        n_steps += 1
    return t_total / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()
    # note: the python number includes jnp.asarray staging of ~25 lane
    # arrays per chunk; the native number is pure C++ bookkeeping + the
    # numpy lane-array views Python reads back.
    py = bench_python(args.lanes, args.steps)
    nat = bench_native(args.lanes, args.steps)
    # NORMALIZE: one python Scheduler.step plans a CHUNK of 16 device
    # steps; one native step drives a single device step through the
    # ctypes boundary. Per device step the chunked python planner
    # amortizes its planning cost 16x, while the native number is
    # dominated by ctypes crossings + lane-array staging (the pure C++
    # bookkeeping inside is sub-microsecond — see native ctest timings).
    print(f"python Scheduler.step (1 chunk = 16 device steps):"
          f" {py*1e6:9.1f} us -> {py*1e6/16:6.1f} us/device-step")
    print(f"native scheduler step (1 device step):            "
          f" {nat*1e6:9.1f} us")
    if nat == nat:
        print(f"per-device-step ratio (python/native): {py/16/nat:.2f}x")


if __name__ == "__main__":
    main()

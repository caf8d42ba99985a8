"""Dissect the 209 ms _dispatch_and_drain of an under-load admission:
time (a) the 256-token direct-prefill program, (b) the n=1 wake chunk
dispatch + drain, (c) host arg-building, separately and no-load."""

from __future__ import annotations

import faulthandler
import os
import sys
import time

faulthandler.dump_traceback_later(600, exit=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import llama3_8b_config  # noqa: E402
from pie_tpu.engine.scheduler import PagedEngine, Scheduler  # noqa: E402
from pie_tpu.models.llama import LlamaModel  # noqa: E402


def main():
    cfg = llama3_8b_config()
    model = LlamaModel(cfg)
    print("init params...", flush=True)
    params = model.init_quantized_params(jax.random.PRNGKey(0), 64, 4)
    e = PagedEngine(
        model, params, num_lanes=8, num_pages=112, max_pages_per_seq=12,
        kv_quantized=True,
    )
    sched = Scheduler(e, decode_steps=8)
    print("warmup...", flush=True)
    w = sched.add_request(list(range(1, 513)), max_new_tokens=9,
                          temperature=0.0)
    sched.run_to_completion()

    # (a) direct-prefill program, differential over reps
    ids = np.zeros((1, 256), np.int32)
    ids[0, :] = np.arange(256)
    pos = np.arange(256, dtype=np.int32)[None]
    bt = np.zeros((1, 12), np.int32)
    bt[0] = np.arange(12)

    def run_prefill(reps):
        t0 = time.perf_counter()
        for r in range(reps):
            _, e.pool = e._prefill(
                e.params, e.pool, jnp.asarray(ids), jnp.asarray(pos),
                jnp.asarray(bt), jnp.full((1,), 256, jnp.int32),
                jnp.asarray(255, jnp.int32),
            )
        jax.block_until_ready(e.pool.k)
        return (time.perf_counter() - t0) * 1e3

    run_prefill(2)  # warm
    lo, hi = run_prefill(2), run_prefill(6)
    print(f"direct-prefill M=256: {(hi - lo) / 4:.1f} ms/program "
          f"(2-rep {lo:.1f}, 6-rep {hi:.1f})", flush=True)

    # (b) the n=1 decode-only chunk (wake path) — dispatch+fetch wall
    busy = [
        sched.add_request(list(range(1, 65)), max_new_tokens=300,
                          temperature=0.0)
        for _ in range(7)
    ]
    while any(not s.output_ids and s.finish_reason is None for s in busy):
        sched.step()

    import pie_tpu.engine.scheduler as sched_mod

    orig_chunk = e._chunk
    calls = []

    def timed_chunk(*a, **kw):
        t0 = time.perf_counter()
        out = orig_chunk(*a, **kw)
        t1 = time.perf_counter()
        jax.block_until_ready(out[0])
        t2 = time.perf_counter()
        calls.append((kw.get("num_steps"), (t1 - t0) * 1e3,
                      (t2 - t1) * 1e3))
        return out

    e._chunk = timed_chunk
    late = sched.add_request(
        [3 + (i * 41) % 90000 for i in range(512)], max_new_tokens=8,
        temperature=0.0,
    )
    t0 = time.perf_counter()
    while not late.output_ids:
        sched.step()
    print(f"admission TTFT: {(time.perf_counter() - t0) * 1e3:.1f} ms")
    for n, disp, wait in calls:
        print(f"  chunk n={n}: dispatch(host) {disp:.1f} ms, "
              f"block_until_ready {wait:.1f} ms", flush=True)
    e._chunk = orig_chunk
    while late.finish_reason is None:
        sched.step()
    for s in busy:
        s.cancelled = True
    sched.run_to_completion()
    print("done", flush=True)


if __name__ == "__main__":
    main()

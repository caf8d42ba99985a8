"""Under-load TTFT phase profiler: 7 busy lanes decode while a 512-token
prompt is admitted; time each host phase of the admission step()s to find
where the ~300 ms goes (round-4 verdict weak #5)."""

from __future__ import annotations

import faulthandler
import os
import sys
import time

faulthandler.dump_traceback_later(600, exit=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import llama3_8b_config  # noqa: E402
from pie_tpu.engine.scheduler import PagedEngine, Scheduler  # noqa: E402
from pie_tpu.models.llama import LlamaModel  # noqa: E402


def main():
    cfg = llama3_8b_config()
    model = LlamaModel(cfg)
    print("init params...", flush=True)
    params = model.init_quantized_params(jax.random.PRNGKey(0), 64, 4)
    engine = PagedEngine(
        model, params, num_lanes=8, num_pages=112, max_pages_per_seq=12,
        kv_quantized=True,
    )
    sched = Scheduler(engine, decode_steps=8)

    # instrument phases
    phases = []

    def wrap(name):
        orig = getattr(sched, name)

        def timed(*a, **kw):
            t0 = time.perf_counter()
            out = orig(*a, **kw)
            phases.append((name, (time.perf_counter() - t0) * 1e3))
            return out

        setattr(sched, name, timed)

    for nm in ("_drain_inflight", "_admit", "_direct_prefill",
               "_plan_chunk", "_dispatch_and_drain", "_dispatch_steady"):
        wrap(nm)

    prompt = list(range(1, 65))
    print("warmup...", flush=True)
    sched.add_request(prompt, max_new_tokens=17, temperature=0.0)
    sched.run_to_completion()
    busy = [
        sched.add_request(prompt, max_new_tokens=600, temperature=0.0)
        for _ in range(7)
    ]
    while any(not s.output_ids and s.finish_reason is None for s in busy):
        sched.step()
    warm = sched.add_request(
        list(range(1, 513)), max_new_tokens=8, temperature=0.0
    )
    while warm.finish_reason is None:
        sched.step()

    for trial in range(3):
        # steady for a few chunks
        for _ in range(3):
            sched.step()
        phases.clear()
        t0 = time.perf_counter()
        late = sched.add_request(
            [1 + (i * 37 + trial * 101) % 100000 for i in range(512)],
            max_new_tokens=8, temperature=0.0,
        )
        nsteps = 0
        step_times = []
        while not late.output_ids:
            s0 = time.perf_counter()
            sched.step()
            step_times.append((time.perf_counter() - s0) * 1e3)
            nsteps += 1
        ttft = (time.perf_counter() - t0) * 1e3
        print(f"\ntrial {trial}: TTFT {ttft:.1f} ms over {nsteps} step() calls")
        print("  step() walls:", [f"{t:.1f}" for t in step_times])
        for name, ms in phases:
            if ms > 0.5:
                print(f"  {name:22s} {ms:8.1f} ms")
        while late.finish_reason is None:
            sched.step()

    for s in busy:
        s.cancelled = True
    sched.run_to_completion()
    print("done", flush=True)


if __name__ == "__main__":
    main()

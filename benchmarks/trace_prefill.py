"""Op-level trace of the paged direct-prefill program (99 ms / 256
tokens measured; isolated matmuls only explain ~11 ms — attribute the
rest)."""

from __future__ import annotations

import faulthandler
import os
import sys
import tempfile
import time

faulthandler.dump_traceback_later(900, exit=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import llama3_8b_config  # noqa: E402
from trace_decode import _aggregate  # noqa: E402
from pie_tpu.engine.scheduler import PagedEngine  # noqa: E402
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
    ids = np.zeros((1, 256), np.int32)
    ids[0, :] = np.arange(256) % 1000
    pos = np.arange(256, dtype=np.int32)[None]
    bt = np.zeros((1, 12), np.int32)
    bt[0] = np.arange(12)

    def run(reps):
        for _ in range(reps):
            _, e.pool = e._prefill(
                e.params, e.pool, jnp.asarray(ids), jnp.asarray(pos),
                jnp.asarray(bt), jnp.full((1,), 256, jnp.int32),
                jnp.asarray(255, jnp.int32),
            )
        jax.block_until_ready(e.pool.k)

    print("warmup...", flush=True)
    run(2)
    t0 = time.perf_counter()
    run(4)
    print(f"wall: {(time.perf_counter() - t0) / 4 * 1e3:.1f} ms/program",
          flush=True)

    reps = 4
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            run(reps)
        agg, count = _aggregate(td, reps)
        rows = sorted(agg.items(), key=lambda kv: -kv[1])
        total = sum(agg.values())
        print(f"total device us: {total:.0f} (/{reps} reps = "
              f"{total / reps / 1e3:.2f} ms/program)")
        for name, us in rows[:30]:
            print(f"  {us / reps:10.1f} us  x{count[name] // reps:4d}  {name[:90]}")


if __name__ == "__main__":
    main()

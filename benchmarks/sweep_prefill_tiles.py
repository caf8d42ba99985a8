"""Prefill-sized (M=256) quant-matmul tile sweep: the direct-prefill
program measured 99 ms / 256 tokens — grid-step overhead at the default
bn=512/bk=512 prefill tiles (hundreds of steps per matmul). Differential
timing over rep counts cancels the dispatch fetch."""

from __future__ import annotations

import faulthandler
import os
import sys
import time

faulthandler.dump_traceback_later(900, exit=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pie_tpu.ops.quant import QuantizedTensor
from pie_tpu.ops.quant_matmul_pallas import quant_matmul_stacked

L = 4


def rand_qt(key, k, n, g=64, bits=4):
    ep = 32 // bits
    kp = -(-k // 512) * 512
    ks = jax.random.split(key, 3)
    return QuantizedTensor(
        packed=jax.random.bits(ks[0], (L, kp // ep, n), jnp.uint32),
        scales=jnp.full((L, kp // g, n), 0.01, jnp.bfloat16),
        biases=jnp.full((L, kp // g, n), -0.08, jnp.bfloat16),
        bits=bits, group_size=g, shape=(k, n),
    )


def bench(qt, m, bn, bk, reps):
    x = jnp.ones((m, qt.padded_k), jnp.bfloat16)

    def run(r):
        t0 = time.perf_counter()
        y = None
        for i in range(r):
            y = quant_matmul_stacked(x, jnp.int32(i % L), qt, bn=bn, bk=bk)
        y.block_until_ready()
        return (time.perf_counter() - t0) * 1e3

    run(2)
    lo, hi = run(4), run(12)
    return (hi - lo) / 8


def main():
    key = jax.random.PRNGKey(0)
    shapes = {
        "wqkv": (4096, 6144),
        "wo": (4096, 4096),
        "wgu": (4096, 28672),
        "wd": (14336, 4096),
    }
    tiles = [
        (512, 512),    # current prefill default
        (1024, 512),
        (1024, 1024),
        (2048, 512),
        (2048, 1024),
        (1024, 2048),
        (512, 2048),
    ]
    m = 256
    for name, (k, n) in shapes.items():
        qt = rand_qt(key, k, n)
        gbytes = (qt.packed.size // L) * 4 + (qt.scales.size // L) * 2 * 2
        for bn, bk in tiles:
            ms = bench(qt, m, bn, bk, 8)
            print(
                f"{name} M={m} bn={bn} bk={bk}: {ms:7.2f} ms "
                f"({gbytes / ms / 1e6:6.1f} GB/s)",
                flush=True,
            )
        print(flush=True)


if __name__ == "__main__":
    main()

"""Measure the chip's PRACTICAL sustained HBM read bandwidth (device-timed).

The bench roofline divides weight bytes by the 819 GB/s v5e HBM spec; the
in-model quant-matmul streams plateau at ~727-748 GB/s. This probe answers
whether that plateau is kernel inefficiency or simply the chip's sustainable
stream rate: a Pallas kernel whose grid DMAs a multi-GB array block by block
and does (nearly) nothing with it is a pure HBM->VMEM read — nothing in the
machine can stream weights faster than this.

Wall-clock timing through the axon dispatch tunnel is untrustworthy (see
PROFILE.md round 5), so everything here is attributed from a jax.profiler
trace's device lanes, like trace_decode.py.

Usage: python benchmarks/hbm_peak.py [--gb 4] [--block-mb 2]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from trace_decode import _aggregate  # type: ignore


def _stream_kernel(x_ref, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # consume one sublane-block so the DMA is not dead; the BlockSpec
    # pipeline streams the whole block regardless of how much we touch
    acc_ref[:] += pltpu.bitcast(x_ref[0:8, :], jnp.float32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("rows",))
def stream_read(x, rows: int):
    n = x.shape[1]
    grid = (x.shape[0] // rows,)
    return pl.pallas_call(
        _stream_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((rows, n), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((8, n), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(x)


def _device_time_us(fn, label_substr: str, reps: int = 4):
    """Trace `fn()` and return (us per rep for ops matching label, total us)."""
    td = tempfile.mkdtemp(prefix="jaxtrace_")
    with jax.profiler.trace(td):
        for _ in range(reps):
            jax.block_until_ready(fn())
    agg, _count = _aggregate(td, reps)
    # drop obviously-nested enclosing spans (jit wrappers)
    match = sum(us for name, us in agg.items() if label_substr in name)
    return match / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=4.0)
    ap.add_argument("--block-mb", type=float, default=2.0)
    args = ap.parse_args()

    n = 2048
    total_rows = int(args.gb * (1 << 30)) // (4 * n)
    block_rows = int(args.block_mb * (1 << 20)) // (4 * n)
    block_rows = max(8, (block_rows // 8) * 8)
    total_rows = (total_rows // block_rows) * block_rows
    nbytes = total_rows * n * 4
    x = jax.block_until_ready(jnp.ones((total_rows, n), jnp.uint32))
    print(f"array {nbytes/2**30:.2f} GiB, block {block_rows*n*4/2**20:.1f} MiB")

    np.asarray(stream_read(x, block_rows))  # compile
    us = _device_time_us(lambda: stream_read(x, block_rows), "stream_read")
    print(f"pallas stream read: {nbytes/us/1e3:.1f} GB/s "
          f"({us/1e3:.2f} ms device)")

    red = jax.jit(lambda a: jnp.sum(a, axis=0, dtype=jnp.uint32))
    jax.block_until_ready(red(x))
    us = _device_time_us(lambda: red(x), "reduce")
    print(f"xla column-sum read:  {nbytes/us/1e3:.1f} GB/s "
          f"({us/1e3:.2f} ms device)")


if __name__ == "__main__":
    main()

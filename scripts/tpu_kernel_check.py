"""On-hardware verification of the Pallas paged-attention decode kernel.

Runs the kernel on the real TPU (no interpret mode) at every serving
geometry — head_dim 64 (Llama-3.2-1B, the round-1 Mosaic failure) and 128
(Llama-3-8B), bf16 and INT8 pages — and checks each against the XLA
reference. Exits non-zero on compile failure or mismatch.

Usage: python scripts/tpu_kernel_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pie_tpu.cache.paged import PAGE_SIZE, fold_for
from pie_tpu.ops.paged_attention import (
    paged_attention_decode,
    paged_attention_xla,
)


def check(d, hq, hkv, quant, tol=0.05):
    b, maxp, p = 4, 8, 64
    f = fold_for(d)
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, hq, d), jnp.bfloat16)
    if quant:
        k = jax.random.randint(
            key, (p, hkv, PAGE_SIZE, d), -127, 127, jnp.int8
        )
        v = jax.random.randint(
            jax.random.PRNGKey(1), (p, hkv, PAGE_SIZE, d), -127, 127,
            jnp.int8,
        )
        ks = jax.random.uniform(
            key, (p, f, hkv, PAGE_SIZE // f), jnp.float32, 0.01, 0.02
        )
        vs = jax.random.uniform(
            jax.random.PRNGKey(2), (p, f, hkv, PAGE_SIZE // f), jnp.float32,
            0.01, 0.02,
        )
    else:
        k = jax.random.normal(key, (p, hkv, PAGE_SIZE, d), jnp.bfloat16)
        v = jax.random.normal(
            jax.random.PRNGKey(1), (p, hkv, PAGE_SIZE, d), jnp.bfloat16
        )
        ks = vs = jnp.zeros((1, f, hkv, 1), jnp.float32)
    bt = jnp.arange(b * maxp, dtype=jnp.int32).reshape(b, maxp) % p
    cl = jnp.array([100, 64, 300, 512], jnp.int32)
    out = paged_attention_decode(q, k, v, ks, vs, bt, cl, 1.0 / np.sqrt(d))
    ref = paged_attention_xla(
        q, k, v, bt, cl, 1.0 / np.sqrt(d),
        ks if quant else None, vs if quant else None,
    )
    err = float(jnp.max(jnp.abs(
        out.astype(jnp.float32) - ref.astype(jnp.float32)
    )))
    ok = err < tol
    print(f"d={d} hq={hq} hkv={hkv} quant={quant}: max_err={err:.5f} "
          f"{'OK' if ok else 'MISMATCH'}")
    return ok


def main():
    if jax.default_backend() not in ("tpu", "axon"):
        print(f"no TPU backend (got {jax.default_backend()}); nothing to do")
        return 0
    ok = True
    ok &= check(64, 32, 8, False)   # Llama-3.2-1B geometry
    ok &= check(64, 32, 8, True)
    ok &= check(128, 32, 8, False)  # Llama-3-8B geometry
    ok &= check(128, 32, 8, True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

import time, jax, jax.numpy as jnp, numpy as np
from pie_tpu.ops.quant import quantize
from pie_tpu.ops.quant_matmul_pallas import quant_matmul_pallas

def timed_fetch(name, f, x, iters=5, per=20, bytes_per=None):
    float(f(x)[0])  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(f(x)[0])  # fetch forces completion
    dt = (time.perf_counter() - t0) / (iters * per)
    bw = f"  eff BW {bytes_per/dt/1e9:6.0f} GB/s" if bytes_per else ""
    print(f"{name:40s} {dt*1e6:9.1f} us/op{bw}", flush=True)

N = 16*1024*1024
x = jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)
@jax.jit
def adds(x):
    def body(i, a):
        return a + 1.0 + i * 0.0
    return jax.lax.fori_loop(0, 20, body, x)[:1]
timed_fetch("fori 20x add 64MB", adds, x, per=20, bytes_per=2*N*4)

w = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.bfloat16)
xb = jax.random.normal(jax.random.PRNGKey(2), (8, 4096), jnp.bfloat16)
@jax.jit
def dots(xb):
    def body(i, carry):
        acc, xx = carry
        y = jnp.dot(xx, w, preferred_element_type=jnp.float32)
        return acc + y[0, 0], xx + y[:, :4096].astype(jnp.bfloat16) * 1e-9
    acc, _ = jax.lax.fori_loop(0, 20, body, (0.0, xb))
    return jnp.array([acc])
timed_fetch("fori 20x dense bf16 8x4096x4096", dots, xb, per=20, bytes_per=4096*4096*2)

qt = quantize(jax.random.normal(jax.random.PRNGKey(3), (4096, 4096), jnp.float32), 64, 4)
@jax.jit
def qdots(xb):
    def body(i, carry):
        acc, xx = carry
        y = quant_matmul_pallas(xx, qt)
        return acc + y[0, 0], xx + y[:, :4096].astype(jnp.bfloat16) * 1e-9
    acc, _ = jax.lax.fori_loop(0, 20, body, (0.0, xb))
    return jnp.array([acc])
timed_fetch("fori 20x pallas int4 8x4096x4096", qdots, xb, per=20, bytes_per=4096*4096//2)
print("DONE")

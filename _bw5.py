import time, statistics, jax, jax.numpy as jnp
from pie_tpu.ops.quant import quantize
from pie_tpu.ops.quant_matmul_pallas import quant_matmul_pallas

def bench_loop(make_body, x0, iters_pair=(8, 264), reps=9):
    ts = {}
    for it in iters_pair:
        @jax.jit
        def g(x, _it=it):
            return jax.lax.fori_loop(0, _it, lambda i, xx: make_body(xx, i), x)[0, 0]
        float(g(x0))
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter(); float(g(x0)); samples.append(time.perf_counter() - t0)
        ts[it] = statistics.median(samples)
    i0, i1 = iters_pair
    return (ts[i1] - ts[i0]) / (i1 - i0)

D, I, V = 2048, 8192, 128256
shapes = {"qkv": (D, 3072), "o": (D, D), "gateup": (D, 2*I), "down": (I, D), "lm_head": (D, V)}
for name, (K, N) in shapes.items():
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32)
    qt = quantize(w, 64, 4)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (8, K), jnp.bfloat16)
    def body(xx, i, qt=qt):
        y = quant_matmul_pallas(xx, qt)
        return xx + (y[:, :1] * 1e-12).astype(jnp.bfloat16)
    per = bench_loop(body, x0)
    qbytes = qt.packed.size*4 + qt.scales.size*qt.scales.dtype.itemsize + qt.biases.size*qt.biases.dtype.itemsize
    print(f"{name:10s} {per*1e6:8.1f} us  {qbytes/1e6:7.1f} MB  -> {qbytes/per/1e9:6.0f} GB/s", flush=True)

w = jax.random.normal(jax.random.PRNGKey(1), (D, V), jnp.bfloat16)
x0 = jax.random.normal(jax.random.PRNGKey(2), (8, D), jnp.bfloat16)
def body(xx, i):
    y = jnp.dot(xx, w, preferred_element_type=jnp.float32)
    return xx + (y[:, :1] * 1e-12).astype(jnp.bfloat16)
per = bench_loop(body, x0)
print(f"{'bf16 head':10s} {per*1e6:8.1f} us  {w.size*2/1e6:7.1f} MB  -> {w.size*2/per/1e9:6.0f} GB/s", flush=True)
print("DONE")

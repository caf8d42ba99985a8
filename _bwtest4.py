import time, jax, jax.numpy as jnp

N = 32 * 1024 * 1024  # 128MB fp32
x = jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)

def make(iters):
    @jax.jit
    def f(x, s):
        def body(i, a):
            return a * 0.999999 + s
        return jax.lax.fori_loop(0, iters, body, x)[:1]
    return f

for iters in (4, 32, 128):
    f = make(iters)
    float(f(x, 1e-9)[0])
    t0 = time.perf_counter()
    reps = 3
    for r in range(reps):
        v = float(f(x, (r + 1) * 1e-9)[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"iters={iters:4d}  total {dt*1e3:8.2f} ms", flush=True)

# fit: t = rt + iters * per_iter using 4 vs 128
f4, f128 = make(4), make(128)
float(f4(x, 1e-9)[0]); float(f128(x, 1e-9)[0])
def t(f):
    t0 = time.perf_counter()
    for r in range(5): float(f(x, (r+1)*1e-9)[0])
    return (time.perf_counter() - t0) / 5
t4, t128 = t(f4), t(f128)
per = (t128 - t4) / 124
rt = t4 - 4 * per
print(f"per-iter (128MB rd + 128MB wr): {per*1e6:.1f} us -> {256*1024*1024/per/1e9:.0f} GB/s")
print(f"dispatch+fetch round trip: {rt*1e3:.2f} ms")

import time, jax, jax.numpy as jnp
N = 16 * 1024 * 1024
x = jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)
y = jax.random.normal(jax.random.PRNGKey(1), (N,), jnp.float32)
@jax.jit
def f(x, y):
    return x + y, y + 1.0
# vary inputs each call: feed outputs back in
(a, b) = f(x, y); jax.block_until_ready((a, b))
t0 = time.perf_counter()
for _ in range(30):
    a, b = f(a, b)
jax.block_until_ready((a, b))
dt = (time.perf_counter() - t0) / 30
print(f"chained add 64MB bufs: {dt*1e3:.3f} ms -> {3*N*4/dt/1e9:.0f} GB/s effective", flush=True)

# identical-args version for comparison
t0 = time.perf_counter()
for _ in range(30):
    c, d = f(x, y)
jax.block_until_ready((c, d))
dt2 = (time.perf_counter() - t0) / 30
print(f"identical-args add:    {dt2*1e3:.3f} ms -> {3*N*4/dt2/1e9:.0f} GB/s", flush=True)
print("DONE")

import time, jax, jax.numpy as jnp
N = 16 * 1024 * 1024  # 64MB per f32 buffer
xs = [jax.random.normal(jax.random.PRNGKey(i), (N,), jnp.float32) for i in range(8)]
ys = [jax.random.normal(jax.random.PRNGKey(100+i), (N,), jnp.float32) for i in range(8)]
@jax.jit
def f(xs, ys):
    return [x + y for x, y in zip(xs, ys)]
r = f(xs, ys); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(20):
    r = f(xs, ys)
jax.block_until_ready(r)
dt = (time.perf_counter() - t0) / 20
traffic = 8 * 3 * N * 4
print(f"8x add 64MB: {dt*1e3:.2f} ms -> {traffic/dt/1e9:.0f} GB/s", flush=True)

# bf16 variant
xb = [x.astype(jnp.bfloat16) for x in xs]
yb = [y.astype(jnp.bfloat16) for y in ys]
@jax.jit
def g(xs, ys):
    return [x + y for x, y in zip(xs, ys)]
r = g(xb, yb); jax.block_until_ready(r)
t0 = time.perf_counter()
for _ in range(20):
    r = g(xb, yb)
jax.block_until_ready(r)
dt = (time.perf_counter() - t0) / 20
print(f"8x add bf16 32MB: {dt*1e3:.2f} ms -> {8*3*N*2/dt/1e9:.0f} GB/s", flush=True)
print("DONE")

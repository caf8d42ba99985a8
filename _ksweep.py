"""Tile sweep + VPU-bound test for quant_matmul_pallas decode shapes."""
import time, statistics, itertools, jax, jax.numpy as jnp
from pie_tpu.ops.quant import quantize
from pie_tpu.ops.quant_matmul_pallas import quant_matmul_pallas

def bench_loop(make_body, x0, iters_pair=(8, 136), reps=7):
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

def run(name, K, N, bits=4, tiles=None):
    w = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.float32)
    qt = quantize(w, 64, bits)
    x0 = jax.random.normal(jax.random.PRNGKey(2), (8, K), jnp.bfloat16)
    qbytes = qt.packed.size*4 + qt.scales.size*qt.scales.dtype.itemsize + qt.biases.size*qt.biases.dtype.itemsize
    for bn, bk in tiles:
        if bk > K: continue
        def body(xx, i, qt=qt, bn=bn, bk=bk):
            y = quant_matmul_pallas(xx, qt, bn=bn, bk=bk)
            return xx + (y[:, :1] * 1e-12).astype(jnp.bfloat16)
        try:
            per = bench_loop(body, x0)
        except Exception as e:
            print(f"{name} b{bits} bn={bn} bk={bk}: FAIL {str(e)[:80]}", flush=True)
            continue
        print(f"{name:8s} b{bits} bn={bn:5d} bk={bk:5d} {per*1e6:8.1f} us -> {qbytes/per/1e9:5.0f} GB/s", flush=True)

TILES = [(1024, 2048), (2048, 1024), (2048, 2048), (512, 2048), (4096, 512),
         (1024, 1024), (4096, 1024), (8192, 512)]
run("gateup", D, 2*I, 4, TILES)
run("gateup", D, 2*I, 8, [(1024, 2048), (2048, 1024)])  # VPU-bound test
run("lm_head", D, V, 4, TILES)
run("qkv", D, 3072, 4, [(3072, 2048), (1536, 2048), (1024, 2048), (3072, 1024)])
run("down", I, D, 4, [(1024, 2048), (2048, 2048), (1024, 4096), (2048, 4096), (512, 8192), (1024, 8192), (2048, 8192)])
print("DONE")

# --- scan-slice copy test: does slicing stacked weights before the pallas
# call double the HBM traffic? ---
import functools
L = 4
K, N = D, 2*I
w = jax.random.normal(jax.random.PRNGKey(1), (L, K, N), jnp.float32)
qts = jax.jit(jax.vmap(functools.partial(quantize, group_size=64, bits=4)))(w)
qt0 = jax.tree_util.tree_map(lambda a: a[0], qts)
qbytes = qt0.packed.size*4 + qt0.scales.size*2*qt0.scales.dtype.itemsize
x0 = jax.random.normal(jax.random.PRNGKey(2), (8, K), jnp.bfloat16)

def body_direct(xx, i):
    y = quant_matmul_pallas(xx, qt0)
    return xx + (y[:, :1] * 1e-12).astype(jnp.bfloat16)
per = bench_loop(body_direct, x0)
print(f"direct   {per*1e6:8.1f} us -> {qbytes/per/1e9:5.0f} GB/s", flush=True)

def body_scan(xx, i):
    def layer(h, qt):
        y = quant_matmul_pallas(h, qt)
        return h + (y[:, :1] * 1e-12).astype(jnp.bfloat16), 0.0
    h, _ = jax.lax.scan(layer, xx, qts)
    return h
per = bench_loop(body_scan, x0, iters_pair=(8, 40))
print(f"scan4    {per/L*1e6:8.1f} us/layer -> {qbytes/(per/L)/1e9:5.0f} GB/s", flush=True)

def body_idx(xx, i):
    qt = jax.tree_util.tree_map(lambda a: a[i % L], qts)
    y = quant_matmul_pallas(xx, qt)
    return xx + (y[:, :1] * 1e-12).astype(jnp.bfloat16)
per = bench_loop(body_idx, x0)
print(f"dynslice {per*1e6:8.1f} us -> {qbytes/per/1e9:5.0f} GB/s", flush=True)
print("DONE2")

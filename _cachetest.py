import os
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/jax_cache"
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"
import time, jax, jax.numpy as jnp
t0 = time.time()
w = jax.random.normal(jax.random.PRNGKey(0), (2048, 2048), jnp.bfloat16)
x = jnp.ones((8, 2048), jnp.bfloat16)
y = jax.jit(lambda a: jnp.dot(a, w).sum())(x)
print("compile+run:", time.time()-t0, float(y))
import pathlib
print("cache entries:", len(list(pathlib.Path('/root/jax_cache').iterdir())))

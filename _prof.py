import time, jax, jax.numpy as jnp
from pie_tpu.models.llama import LlamaModel
from bench import llama32_1b_config
from pie_tpu.engine import InferenceEngine

config = llama32_1b_config()
model = LlamaModel(config)
params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
params = model.quantize_params(params, group_size=64, bits=4)
engine = InferenceEngine(model=model, params=params, max_seq_len=512, decode_chunk=64)
prompt = list(range(1, 65))
engine.generate(prompt, max_completion_tokens=65, temperature=0.0)
print("warm", flush=True)
try:
    with jax.profiler.trace("/tmp/jaxtrace"):
        engine.generate(prompt, max_completion_tokens=65, temperature=0.0)
    print("trace ok", flush=True)
except Exception as e:
    print("trace failed:", e, flush=True)
t0 = time.perf_counter()
engine.generate(prompt, max_completion_tokens=129, temperature=0.0)
print("tok/s:", 129/(time.perf_counter()-t0), flush=True)

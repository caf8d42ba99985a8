"""pie_tpu — a TPU-native quantized LLM/VLM inference engine.

Built from scratch on JAX/XLA/Pallas with the capabilities of the Proxy
Inference Engine (reference: TheProxyCompany/proxy-inference-engine, an
MLX/Metal engine for Apple Silicon), re-designed TPU-first:

- group-wise affine weight-only quantization (INT4/INT8, groups 32/64/128)
  with a fused dequant+matmul Pallas kernel (`pie_tpu.ops.quant`)
- jit-compiled fixed-shape prefill/decode steps (vs the reference's MLX lazy
  graph + async_eval pipeline, reference engine/inference_engine.py:228-297)
- paged KV cache pool in HBM with refcounted pages and prefix sharing
  (the design the reference's pie_core sketched, include/engine/page.hpp)
- batched sampling (temperature/top-p/min-p/top-k), logits processors,
  constrained/structured generation via token-level masks
- OpenAI-compatible serving layer (completions / chat / responses + SSE)
- multi-chip execution via jax.sharding Mesh + NamedSharding (TP/DP)
"""

__version__ = "0.1.0"

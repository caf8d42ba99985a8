"""BatchedInferenceEngine (continuous batching service) tests: concurrent
callers, parity with the single-stream engine, streaming, cancellation."""

import threading

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pie_tpu.engine import InferenceEngine
from pie_tpu.engine.async_engine import BatchedInferenceEngine

TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    vocab_size=256,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def engines():
    from pie_tpu.models.llama import LlamaConfig, LlamaModel

    hf_cfg = transformers.LlamaConfig(**TINY, attention_bias=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    config = LlamaConfig.from_dict(dict(TINY, model_type="llama"))
    model = LlamaModel(config)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)
    single = InferenceEngine(
        model=model, params=params, max_seq_len=256, kv_dtype=jnp.float32,
        decode_chunk=8,
    )
    batched = BatchedInferenceEngine(
        model=model, params=params, num_lanes=4, num_pages=32,
        max_pages_per_seq=8, prefill_chunk=16,
    )
    import dataclasses

    # the tiny test model runs f32 for exact parity
    batched.core.pool = dataclasses.replace(
        batched.core.pool,
        k=batched.core.pool.k.astype(jnp.float32),
        v=batched.core.pool.v.astype(jnp.float32),
    )
    yield single, batched
    batched.shutdown()


def test_concurrent_callers_match_single_stream(engines):
    single, batched = engines
    prompts = [[5, 17, 42, 7], [9, 3, 3, 7, 1], list(range(10, 40))]
    expected = [
        single.generate(p, max_completion_tokens=8, temperature=0.0).token_ids
        for p in prompts
    ]
    results = [None] * len(prompts)

    def worker(i):
        results[i] = batched.generate(
            prompts[i], max_completion_tokens=8, temperature=0.0
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, r in enumerate(results):
        assert r is not None, f"request {i} hung"
        assert r.token_ids == expected[i], i
        assert r.finish_reason == "length"


def test_streaming_and_early_close_cancels(engines):
    _, batched = engines
    gen = batched.generate_stream(
        [5, 17, 42, 7], max_completion_tokens=50, temperature=0.0
    )
    toks = [next(gen).token_id for _ in range(3)]
    assert len(toks) == 3
    gen.close()  # abandon -> cancels the sequence
    # service must still serve new requests afterwards
    r = batched.generate([9, 3, 3], max_completion_tokens=4, temperature=0.0)
    assert len(r.token_ids) == 4


def test_oversized_request_errors(engines):
    _, batched = engines
    from pie_tpu.engine.engine import InferenceError

    with pytest.raises(InferenceError):
        batched.generate(
            list(range(1, 100)), max_completion_tokens=4096, temperature=0.0
        )

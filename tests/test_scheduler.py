"""Continuous-batching scheduler tests: batch-invariance vs the
single-stream engine, chunked prefill, page-exhaustion queueing, stop
tokens, cancellation, lane reuse."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pie_tpu.engine import InferenceEngine
from pie_tpu.engine.scheduler import PagedEngine, Scheduler, SeqStatus
from pie_tpu.models.llama import LlamaConfig, LlamaModel

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
def model_params():
    hf_cfg = transformers.LlamaConfig(**TINY, attention_bias=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    config = LlamaConfig.from_dict(dict(TINY, model_type="llama"))
    model = LlamaModel(config)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)
    return model, params


@pytest.fixture(scope="module")
def reference_outputs(model_params):
    model, params = model_params
    engine = InferenceEngine(
        model=model, params=params, max_seq_len=256, kv_dtype=jnp.float32,
        decode_chunk=8,
    )
    prompts = {
        "a": [5, 17, 42, 7],
        "b": [9, 3, 3, 7, 1],
        "c": list(range(10, 40)),  # long prompt -> multiple prefill chunks
    }
    return {
        k: engine.generate(p, max_completion_tokens=10, temperature=0.0).token_ids
        for k, p in prompts.items()
    }, prompts


def _make_sched(model, params, num_lanes=4, num_pages=32, chunk=16):
    eng = PagedEngine(
        model, params, num_lanes=num_lanes, num_pages=num_pages,
        max_pages_per_seq=8, prefill_chunk=chunk, kv_dtype=jnp.float32,
    )
    return Scheduler(eng)


def test_batched_greedy_matches_single_stream(model_params, reference_outputs):
    model, params = model_params
    expected, prompts = reference_outputs
    sched = _make_sched(model, params)
    seqs = {
        k: sched.add_request(p, max_new_tokens=10, temperature=0.0)
        for k, p in prompts.items()
    }
    sched.run_to_completion(max_steps=200)
    for k, seq in seqs.items():
        assert seq.status == SeqStatus.COMPLETED
        assert seq.finish_reason == "length"
        assert seq.output_ids == expected[k], k


def test_page_exhaustion_queues_then_completes(model_params):
    model, params = model_params
    # tiny pool: only 4 pages; each request needs 2 (prompt+16 new < 128 tok)
    sched = _make_sched(model, params, num_lanes=4, num_pages=4)
    seqs = [
        sched.add_request([7, i], max_new_tokens=8, temperature=0.0)
        for i in range(4)
    ]
    sched.run_to_completion(max_steps=500)
    assert all(s.status == SeqStatus.COMPLETED for s in seqs)
    assert sched.manager.num_free_pages() == 4


def test_stop_tokens_and_streaming_callback(model_params, reference_outputs):
    model, params = model_params
    expected, prompts = reference_outputs
    stop_tok = expected["a"][3]
    streamed = []
    sched = _make_sched(model, params)
    seq = sched.add_request(
        prompts["a"], max_new_tokens=10, temperature=0.0,
        stop_token_ids=(stop_tok,),
    )
    seq.on_token = lambda s, t: streamed.append(t)
    sched.run_to_completion(max_steps=200)
    assert seq.finish_reason == "stop"
    assert seq.output_ids == expected["a"][:4]
    assert streamed == seq.output_ids


def test_cancellation(model_params):
    model, params = model_params
    sched = _make_sched(model, params)
    seq = sched.add_request([5, 6, 7], max_new_tokens=50, temperature=0.0)

    def cancel_after(s, t):
        if len(s.output_ids) >= 3:
            s.cancelled = True

    seq.on_token = cancel_after
    sched.run_to_completion(max_steps=200)
    assert seq.status == SeqStatus.CANCELLED
    assert 3 <= len(seq.output_ids) <= 5
    assert sched.manager.num_free_pages() == sched.engine.pool.num_pages


def test_lane_reuse_many_requests(model_params, reference_outputs):
    model, params = model_params
    expected, prompts = reference_outputs
    sched = _make_sched(model, params, num_lanes=2)
    seqs = [
        sched.add_request(prompts["a"], max_new_tokens=10, temperature=0.0)
        for _ in range(5)
    ]
    sched.run_to_completion(max_steps=1000)
    for s in seqs:
        assert s.output_ids == expected["a"]
    assert len(sched.free_lanes) == 2


def test_direct_prefill_matches_single_stream(model_params):
    """Long prompts prefill via DEDICATED bucketed programs (one M=C
    weight stream per chunk) instead of rider slices; tokens must match
    the single-stream engine exactly, including while other lanes
    decode."""
    model, params = model_params
    engine = InferenceEngine(
        model=model, params=params, max_seq_len=256, kv_dtype=jnp.float32,
        decode_chunk=8, prompt_cache=False,
    )
    long_prompt = list(range(10, 90))  # 80 tokens
    short_prompt = [5, 17, 42, 7]
    want_long = engine.generate(
        long_prompt, max_completion_tokens=10, temperature=0.0
    ).token_ids
    want_short = engine.generate(
        short_prompt, max_completion_tokens=10, temperature=0.0
    ).token_ids

    eng = PagedEngine(
        model, params, num_lanes=4, num_pages=32, max_pages_per_seq=8,
        prefill_chunk=32, rider_width=8, kv_dtype=jnp.float32,
    )
    sched = Scheduler(eng)
    # a decoding lane is already live when the long prompt arrives
    s_short = sched.add_request(
        short_prompt, max_new_tokens=10, temperature=0.0
    )
    sched.step()
    s_long = sched.add_request(
        long_prompt, max_new_tokens=10, temperature=0.0
    )
    sched.run_to_completion(max_steps=200)
    assert s_long.output_ids == want_long, (s_long.output_ids, want_long)
    assert s_short.output_ids == want_short, (s_short.output_ids, want_short)

"""Mixed prefill+decode chunk program (BatchDetails parity).

The scheduler dispatches ONE device program per chunk: every decode lane
advances ``decode_steps`` tokens while prefill-rider slices stream other
sequences' prompts through the same weight reads (reference
include/engine/batch_details.hpp:10-88 — the mixed-batch descriptor pie_core
specified but never ran). These tests pin:

- greedy parity with the contiguous single-stream engine (f32 to avoid
  bf16 argmax near-ties),
- admission mid-decode: a long prompt admitted while lanes are decoding
  neither corrupts them nor changes its own output,
- the quantized (INT8 KV) pool path,
- single-token prompts (wake without a rider slice).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pie_tpu.engine import InferenceEngine
from pie_tpu.engine.scheduler import PagedEngine, Scheduler, SeqStatus
from pie_tpu.models.llama import LlamaConfig, LlamaModel

CFG = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    vocab_size=128,
    tie_word_embeddings=True,
    rope_theta=10000.0,
)


@pytest.fixture(scope="module")
def model_params():
    model = LlamaModel(LlamaConfig(**CFG))
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    return model, params


@pytest.fixture(scope="module")
def reference(model_params):
    """Greedy outputs from the contiguous-cache engine."""
    model, params = model_params
    eng = InferenceEngine(
        model=model, params=params, max_seq_len=128, decode_chunk=8
    )
    prompts = {
        "short": list(range(1, 9)),
        "mid": list(range(3, 20)),
        "one": [5],
        "long": list(range(40, 110)),
    }
    outs = {
        k: eng.generate(p, max_completion_tokens=12, temperature=0.0).token_ids
        for k, p in prompts.items()
    }
    return prompts, outs


def _sched(model, params, **kw):
    pe = PagedEngine(
        model, params, num_lanes=4, num_pages=64, max_pages_per_seq=8,
        rider_width=16, **kw,
    )
    return Scheduler(pe, decode_steps=4)


def test_mixed_chunk_matches_contiguous_engine(model_params, reference):
    model, params = model_params
    prompts, expected = reference
    sch = _sched(model, params)
    seqs = {
        k: sch.add_request(p, max_new_tokens=12, temperature=0.0)
        for k, p in prompts.items()
    }
    sch.run_to_completion(max_steps=100)
    for k, seq in seqs.items():
        assert seq.status == SeqStatus.COMPLETED, (k, seq.finish_reason)
        assert seq.output_ids == expected[k], k


def test_admission_mid_decode_is_isolated(model_params, reference):
    """A prompt admitted while other lanes decode produces the same tokens
    as when run alone, and does not perturb the running lanes."""
    model, params = model_params
    prompts, expected = reference
    sch = _sched(model, params)
    first = sch.add_request(
        prompts["short"], max_new_tokens=12, temperature=0.0
    )
    sch.step()  # first is now decoding
    assert first.status == SeqStatus.DECODING
    late = sch.add_request(prompts["long"], max_new_tokens=12, temperature=0.0)
    sch.run_to_completion(max_steps=100)
    assert first.output_ids == expected["short"]
    assert late.output_ids == expected["long"]


def test_quantized_pool_mixed_chunk(model_params):
    """INT8-quantized paged KV through the mixed program decodes sanely
    (finite logits path, correct lifecycle, near-bf16 outputs)."""
    model, params = model_params
    sch_ref = _sched(model, params)
    sch_q = _sched(model, params, kv_quantized=True)
    p = list(range(1, 30))
    a = sch_ref.add_request(p, max_new_tokens=8, temperature=0.0)
    b = sch_q.add_request(p, max_new_tokens=8, temperature=0.0)
    sch_ref.run_to_completion(max_steps=50)
    sch_q.run_to_completion(max_steps=50)
    assert a.status == b.status == SeqStatus.COMPLETED
    assert len(b.output_ids) == 8
    # int8 KV is lossy: require agreement on the first tokens only
    assert a.output_ids[:2] == b.output_ids[:2]


def test_page_accounting_after_mixed_chunks(model_params, reference):
    model, params = model_params
    prompts, _ = reference
    sch = _sched(model, params)
    seqs = [
        sch.add_request(p, max_new_tokens=6, temperature=0.0)
        for p in prompts.values()
    ]
    sch.run_to_completion(max_steps=100)
    assert all(s.status == SeqStatus.COMPLETED for s in seqs)
    # the PrefixStore deliberately retains each prompt's full pages for
    # reuse; after clearing it every page must be back in the pool
    assert (
        sch.manager.num_free_pages()
        == sch.engine.pool.num_pages - len(sch.prefix_store)
    )
    sch.prefix_store.clear()
    assert sch.manager.num_free_pages() == sch.engine.pool.num_pages


def test_stop_token_mid_chunk(model_params, reference):
    model, params = model_params
    prompts, expected = reference
    stop = expected["mid"][2]
    sch = _sched(model, params)
    seq = sch.add_request(
        prompts["mid"], max_new_tokens=12, temperature=0.0,
        stop_token_ids=(stop,),
    )
    sch.run_to_completion(max_steps=100)
    assert seq.finish_reason == "stop"
    assert seq.output_ids == expected["mid"][:3]

"""End-to-end engine tests on a tiny model: greedy parity vs HF generate,
stop tokens, max tokens, logprobs, sampling reproducibility."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pie_tpu.engine import InferenceEngine
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
    max_position_embeddings=256,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def setup():
    hf_cfg = transformers.LlamaConfig(**TINY, attention_bias=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    hf.eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    config = LlamaConfig.from_dict(dict(TINY, model_type="llama"))
    model = LlamaModel(config)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)
    engine = InferenceEngine(
        model=model, params=params, max_seq_len=128, kv_dtype=jnp.float32,
        decode_chunk=4,
    )
    return hf, engine


def test_greedy_matches_hf_generate(setup):
    hf, engine = setup
    prompt = [5, 17, 42, 7]
    n = 16
    with torch.no_grad():
        hf_out = hf.generate(
            torch.tensor([prompt]), max_new_tokens=n, do_sample=False,
            pad_token_id=0,
        )[0, len(prompt):].tolist()
    res = engine.generate(prompt, max_completion_tokens=n, temperature=0.0)
    assert res.token_ids == hf_out
    assert res.finish_reason == "length"
    assert res.prompt_tokens == len(prompt)
    assert res.completion_tokens == n


def test_consecutive_requests_isolated(setup):
    """Back-to-back requests must not leak KV state (reference PromptCache
    isolation semantics)."""
    _, engine = setup
    a = engine.generate([5, 17, 42, 7], max_completion_tokens=8, temperature=0.0)
    _ = engine.generate([9, 9, 9, 9, 9, 9], max_completion_tokens=8, temperature=0.0)
    c = engine.generate([5, 17, 42, 7], max_completion_tokens=8, temperature=0.0)
    assert a.token_ids == c.token_ids


def test_stop_token(setup):
    _, engine = setup
    full = engine.generate([5, 17, 42, 7], max_completion_tokens=16, temperature=0.0)
    stop_tok = full.token_ids[3]
    res = engine.generate(
        [5, 17, 42, 7], max_completion_tokens=16, temperature=0.0,
        stop_token_ids=[stop_tok],
    )
    assert res.finish_reason == "stop"
    assert res.token_ids == full.token_ids[:4]


def test_streaming_yields_incrementally(setup):
    _, engine = setup
    toks = []
    gen = engine.generate_stream([5, 17, 42, 7], max_completion_tokens=6, temperature=0.0)
    try:
        while True:
            toks.append(next(gen).token_id)
    except StopIteration as e:
        result = e.value
    assert toks == result.token_ids
    assert len(toks) == 6


def test_logprobs(setup):
    _, engine = setup
    res = engine.generate(
        [5, 17, 42, 7], max_completion_tokens=4, temperature=0.0, logprobs=True,
    )
    assert res.logprobs is not None and len(res.logprobs) == 4
    for tl in res.logprobs:
        assert tl.logprob <= 0.0
        assert len(tl.top) == engine.core.logprobs_k
        # greedy chosen token must be the argmax = first of top list
        assert tl.top[0][0] == tl.token_id
        assert tl.logprob == pytest.approx(tl.top[0][1], abs=1e-5)


def test_seeded_sampling_reproducible(setup):
    _, engine = setup
    r1 = engine.generate([5, 17, 42], max_completion_tokens=8, temperature=0.9)
    # engine state advances the PRNG; new engine with same seed reproduces
    engine.state = engine.core.new_state(seed=0)
    r2 = engine.generate([5, 17, 42], max_completion_tokens=8, temperature=0.9)
    engine.state = engine.core.new_state(seed=0)
    r3 = engine.generate([5, 17, 42], max_completion_tokens=8, temperature=0.9)
    assert r2.token_ids == r3.token_ids


def test_max_seq_len_caps_generation(setup):
    _, engine = setup
    prompt = list(range(1, 30))
    res = engine.generate(prompt, max_completion_tokens=1000, temperature=0.0)
    assert res.finish_reason == "length"
    assert len(prompt) + res.completion_tokens <= engine.core.max_seq_len


def test_logit_bias_forces_token(setup):
    _, engine = setup
    res = engine.generate(
        [5, 17, 42, 7], max_completion_tokens=4, temperature=0.0,
        logit_bias={99: 100.0},
    )
    assert res.token_ids == [99, 99, 99, 99]


def test_repetition_penalty_breaks_forced_loop(setup):
    """logit_bias pins token 99; a strong repetition penalty must break the
    loop once 99 enters the history (validates history plumbing end-to-end)."""
    _, engine = setup
    biased = engine.generate(
        [5, 17, 42, 7], max_completion_tokens=6, temperature=0.0,
        logit_bias={99: 30.0},
    )
    assert biased.token_ids == [99] * 6
    pen = engine.generate(
        [5, 17, 42, 7], max_completion_tokens=6, temperature=0.0,
        logit_bias={99: 30.0}, repetition_penalty=1000.0,
    )
    # first pick is still 99 (not yet in history); later picks diverge
    assert pen.token_ids[0] == 99
    assert pen.token_ids != [99] * 6


def test_kv_capacity_bucketing_crosses_boundary():
    """Capacity-bucketed decode (EngineCore kv_bucket): a generation that
    crosses the 256-slot bucket mid-stream must match an engine whose
    capacity makes bucketing a no-op — the trimmed-view chunks merge back
    into the full buffer exactly."""
    config = LlamaConfig.from_dict(
        dict(TINY, model_type="llama", max_position_embeddings=2048)
    )
    model = LlamaModel(config)
    import jax

    params = model.init_params(jax.random.PRNGKey(5), dtype=jnp.float32)
    big = InferenceEngine(
        model=model, params=params, max_seq_len=1024,
        kv_dtype=jnp.float32, decode_chunk=16, prompt_cache=False,
    )
    small = InferenceEngine(
        model=model, params=params, max_seq_len=320,
        kv_dtype=jnp.float32, decode_chunk=16, prompt_cache=False,
    )
    prompt = [5, 9, 2, 7, 11, 3, 8, 4, 6, 10]
    want = small.generate(
        prompt, max_completion_tokens=280, temperature=0.0
    ).token_ids
    got = big.generate(
        prompt, max_completion_tokens=280, temperature=0.0
    ).token_ids
    assert len(got) == 280
    assert got == want, (got[:40], want[:40])

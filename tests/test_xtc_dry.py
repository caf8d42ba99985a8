"""XTC sampler + DRY sequence-repetition penalty.

The reference ships both as 0-byte placeholder files
(reference src/proxy_inference_engine/samplers/xtc.py and dry.py — listed
as "empty placeholders (0 LoC)" in SURVEY P11); these are real
implementations, so the tests define semantics against first principles
and a pure-python oracle rather than reference behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pie_tpu.ops.sampling import (
    SamplingParams,
    dry_penalty,
    sample,
    sampler_kind_for,
)


# ---------------------------------------------------------------------------
# DRY
# ---------------------------------------------------------------------------


def dry_oracle(logits, history, multiplier, base, allowed):
    """Brute-force DRY: for each position j, the longest k with
    history[j-k:j] == history[-k:]; penalize token history[j] with the max
    such k once it reaches ``allowed``."""
    out = np.array(logits, dtype=np.float64)
    c = len(history)
    best = {}
    for j in range(c):
        tok = history[j]
        if tok < 0:
            continue
        m = 0
        while (
            m < c - 1
            and j - 1 - m >= 0
            and history[j - 1 - m] >= 0
            and history[j - 1 - m] == history[c - 1 - m]
        ):
            m += 1
        if m > best.get(tok, -1):
            best[tok] = m
    for tok, L in best.items():
        if L >= allowed and multiplier > 0:
            out[tok] -= multiplier * base ** (L - allowed)
    return out


def _run_dry(history, multiplier=1.0, base=2.0, allowed=2, v=16):
    logits = jnp.zeros((1, v), jnp.float32)
    h = jnp.asarray(np.asarray(history, np.int32)[None])
    out = dry_penalty(
        logits, h,
        jnp.asarray([multiplier], jnp.float32),
        jnp.asarray([base], jnp.float32),
        jnp.asarray([allowed], jnp.int32),
    )
    return np.asarray(out[0])


def test_dry_penalizes_repeat_continuation():
    # history ends with [a, b]; earlier [a, b] was followed by c
    a, b, c = 1, 2, 3
    out = _run_dry([a, b, c, a, b])
    assert out[c] == pytest.approx(-1.0)  # L=2, allowed=2 -> mult*base^0
    assert out[a] == 0.0 and out[b] == 0.0


def test_dry_exponential_in_match_length():
    a = 5
    out = _run_dry([a, a, a, a])  # continuing "aaaa" matches L=3
    assert out[a] == pytest.approx(-2.0)  # 1.0 * 2**(3-2)


def test_dry_below_allowed_length_is_free():
    a, b, c = 1, 2, 3
    # only a 1-token match (history ends with [b]; earlier b followed by c)
    out = _run_dry([b, c, 7, 8, b], allowed=2)
    assert np.all(out == 0.0)


def test_dry_zero_multiplier_noop():
    out = _run_dry([1, 1, 1, 1], multiplier=0.0)
    assert np.all(out == 0.0)


def test_dry_respects_padding():
    a, b, c = 1, 2, 3
    out = _run_dry([-1, -1, a, b, c, a, b])
    assert out[c] == pytest.approx(-1.0)
    assert out[0] == 0.0  # pads never count as token 0


def test_dry_matches_oracle_random():
    rng = np.random.default_rng(0)
    for trial in range(20):
        c = int(rng.integers(4, 24))
        v = 8
        hist = rng.integers(0, v, size=c).astype(np.int32)
        npad = int(rng.integers(0, 3))
        if npad:
            hist[:npad] = -1
        mult, base, allowed = 0.7, 1.75, 2
        got = _run_dry(hist, mult, base, allowed, v=v)
        want = dry_oracle(np.zeros(v), hist, mult, base, allowed)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dry_batched_rows_independent():
    a, b, c = 1, 2, 3
    logits = jnp.zeros((2, 8), jnp.float32)
    h = jnp.asarray(
        np.array([[a, b, c, a, b], [c, c, 4, 5, 6]], np.int32)
    )
    out = np.asarray(
        dry_penalty(
            logits, h,
            jnp.asarray([1.0, 1.0], jnp.float32),
            jnp.asarray([2.0, 2.0], jnp.float32),
            jnp.asarray([2, 2], jnp.int32),
        )
    )
    assert out[0, c] == pytest.approx(-1.0)
    assert np.all(out[1] == 0.0)  # row 2 has no >=2 repeat continuation


# ---------------------------------------------------------------------------
# XTC
# ---------------------------------------------------------------------------


def _probs_to_logits(p):
    return jnp.log(jnp.asarray(p, jnp.float32))[None]


def _sample_many(logits, params, n=64, seed=0):
    toks = []
    key = jax.random.PRNGKey(seed)
    for _ in range(n):
        key, sub = jax.random.split(key)
        toks.append(int(sample(logits, params, sub, kind="filtered")[0]))
    return toks


def test_xtc_excludes_top_choices():
    # probs: two tokens above threshold 0.2 -> with probability 1.0 the
    # TOP token is excluded, the second stays (least-probable above)
    logits = _probs_to_logits([0.5, 0.3, 0.15, 0.05])
    params = SamplingParams.make(
        1, temperature=1.0, xtc_probability=1.0, xtc_threshold=0.2
    )
    toks = _sample_many(logits, params)
    assert 0 not in toks
    assert 1 in toks  # the survivor of the above-threshold set


def test_xtc_noop_when_single_token_above():
    logits = _probs_to_logits([0.6, 0.15, 0.15, 0.1])
    params = SamplingParams.make(
        1, temperature=1.0, xtc_probability=1.0, xtc_threshold=0.5
    )
    toks = _sample_many(logits, params)
    assert 0 in toks  # n_above < 2 -> sampler untouched


def test_xtc_probability_zero_noop():
    logits = _probs_to_logits([0.7, 0.2, 0.1])
    params = SamplingParams.make(1, temperature=1.0, xtc_probability=0.0)
    toks = _sample_many(logits, params)
    assert toks.count(0) > len(toks) // 3


def test_xtc_probability_partial():
    # xtc_probability 0.5: the top token survives ~half the draws
    logits = _probs_to_logits([0.9, 0.08, 0.02])
    params = SamplingParams.make(
        1, temperature=1.0, xtc_probability=0.5, xtc_threshold=0.05
    )
    toks = _sample_many(logits, params, n=200)
    frac0 = toks.count(0) / len(toks)
    assert 0.25 < frac0 < 0.75


def test_xtc_greedy_unaffected():
    logits = _probs_to_logits([0.5, 0.3, 0.2])
    params = SamplingParams.make(
        1, temperature=0.0, xtc_probability=1.0, xtc_threshold=0.1
    )
    toks = _sample_many(logits, params, n=8)
    assert set(toks) == {0}  # temperature 0 stays greedy argmax


def test_sampler_kind_selection():
    assert sampler_kind_for(1.0, 1.0, 0.0, -1, 0.0) == "categorical"
    assert sampler_kind_for(1.0, 1.0, 0.0, -1, 0.5) == "filtered"
    assert sampler_kind_for(0.0, 1.0, 0.0, -1, 0.5) == "greedy"


# ---------------------------------------------------------------------------
# engine plumbing
# ---------------------------------------------------------------------------


def test_engine_accepts_xtc_dry_kwargs(tiny_llama_engine):
    eng = tiny_llama_engine
    out = eng.generate(
        [1, 2, 3, 4],
        max_completion_tokens=6,
        temperature=0.9,
        xtc_probability=0.3,
        xtc_threshold=0.1,
        dry_multiplier=0.8,
        dry_base=1.75,
        dry_allowed_length=2,
    )
    assert len(out.token_ids) >= 1


@pytest.fixture(scope="module")
def tiny_llama_engine():
    from pie_tpu.engine import InferenceEngine
    from pie_tpu.models.llama import LlamaConfig, LlamaModel

    config = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        tie_word_embeddings=True,
    )
    model = LlamaModel(config)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    return InferenceEngine(
        model=model, params=params, tokenizer=None, max_seq_len=64,
        kv_dtype=jnp.float32, decode_chunk=4,
    )


def test_scheduler_accepts_xtc_dry(paged_sched):
    sched = paged_sched
    seq = sched.add_request(
        [1, 2, 3, 4, 5, 6, 7, 8],
        max_new_tokens=6,
        temperature=0.9,
        xtc_probability=0.4,
        xtc_threshold=0.1,
        dry_multiplier=0.5,
    )
    sched.run_to_completion()
    assert seq.finish_reason is not None
    assert len(seq.output_ids) >= 1
    # lane params landed in the batched arrays at admission
    assert sched.samp["xtc_probability"].max() >= 0.0
    assert sched.pen["dry_multiplier"].max() >= 0.0


@pytest.fixture(scope="module")
def paged_sched():
    from pie_tpu.engine.scheduler import PagedEngine, Scheduler
    from pie_tpu.models.llama import LlamaConfig, LlamaModel

    config = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        tie_word_embeddings=True,
    )
    model = LlamaModel(config)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    eng = PagedEngine(
        model, params, num_lanes=2, num_pages=16, max_pages_per_seq=4,
    )
    from pie_tpu.engine.scheduler import Scheduler

    return Scheduler(eng, decode_steps=4)

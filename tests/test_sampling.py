"""Batched sampler semantics tests (reference samplers/*.py behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

from pie_tpu.ops.sampling import (
    SamplingParams,
    apply_logit_bias,
    presence_frequency_penalty,
    repetition_penalty,
    sample,
    top_logprobs,
)


def _logits(rows):
    return jnp.asarray(np.array(rows, np.float32))


def test_greedy_when_temp_zero():
    logits = _logits([[0.1, 3.0, 0.2, 0.5], [2.0, 0.0, 1.0, -1.0]])
    p = SamplingParams.make(2, temperature=0.0)
    for seed in range(5):
        toks = sample(logits, p, jax.random.PRNGKey(seed))
        np.testing.assert_array_equal(np.asarray(toks), [1, 0])


def test_top_k_restricts_support():
    logits = _logits([[5.0, 4.0, 3.0, -50.0, -50.0]])
    p = SamplingParams.make(1, temperature=2.0, top_k=2)
    seen = set()
    for seed in range(50):
        t = int(sample(logits, p, jax.random.PRNGKey(seed))[0])
        seen.add(t)
    assert seen <= {0, 1}
    assert len(seen) == 2


def test_top_p_keeps_nucleus():
    # probs ~ [0.7, 0.2, 0.06, ...]; top_p=0.8 keeps tokens {0, 1}
    logits = _logits([[4.0, 2.75, 1.5, 0.5, 0.0]])
    p = SamplingParams.make(1, temperature=1.0, top_p=0.8)
    seen = set()
    for seed in range(80):
        seen.add(int(sample(logits, p, jax.random.PRNGKey(seed))[0]))
    assert seen == {0, 1}


def test_min_p_scaled_threshold():
    # max prob ~0.87; min_p=0.2 -> threshold 0.17 keeps only token 0
    logits = _logits([[4.0, 2.0, 1.0, 0.0, -1.0]])
    p = SamplingParams.make(1, temperature=1.0, min_p=0.3)
    for seed in range(30):
        assert int(sample(logits, p, jax.random.PRNGKey(seed))[0]) == 0


def test_categorical_distribution():
    logits = _logits([[np.log(0.7), np.log(0.2), np.log(0.1)]])
    p = SamplingParams.make(1, temperature=1.0)
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    toks = jax.vmap(lambda k: sample(logits, p, k))(keys)
    counts = np.bincount(np.asarray(toks).ravel(), minlength=3) / 2000
    np.testing.assert_allclose(counts, [0.7, 0.2, 0.1], atol=0.05)


def test_per_sequence_params():
    logits = _logits([[0.0, 5.0, 0.0], [0.0, 5.0, 0.0]])
    p = SamplingParams.make(2, temperature=0.0).at(1, temperature=3.0, top_k=3)
    toks = [
        np.asarray(sample(logits, p, jax.random.PRNGKey(s))) for s in range(40)
    ]
    toks = np.stack(toks)
    assert (toks[:, 0] == 1).all()          # greedy row
    assert len(set(toks[:, 1].tolist())) > 1  # sampled row varies


def test_repetition_penalty_semantics():
    logits = _logits([[2.0, -2.0, 1.0, 0.5]])
    hist = jnp.asarray([[0, 1, -1, -1]], jnp.int32)
    out = np.asarray(repetition_penalty(logits, hist, jnp.asarray([2.0])))
    np.testing.assert_allclose(out[0], [1.0, -4.0, 1.0, 0.5])
    # penalty 1.0 = no-op
    out = np.asarray(repetition_penalty(logits, hist, jnp.asarray([1.0])))
    np.testing.assert_allclose(out[0], [2.0, -2.0, 1.0, 0.5])


def test_presence_frequency_penalty():
    logits = _logits([[1.0, 1.0, 1.0]])
    hist = jnp.asarray([[0, 0, 2, -1]], jnp.int32)
    out = np.asarray(
        presence_frequency_penalty(
            logits, hist, jnp.asarray([0.5]), jnp.asarray([0.25])
        )
    )
    np.testing.assert_allclose(out[0], [1.0 - 0.5 - 0.5, 1.0, 1.0 - 0.5 - 0.25])


def test_logit_bias():
    logits = _logits([[0.0, 0.0, 0.0]])
    out = np.asarray(
        apply_logit_bias(
            logits,
            jnp.asarray([[1, -1]], jnp.int32),
            jnp.asarray([[5.0, 9.0]]),
        )
    )
    np.testing.assert_allclose(out[0], [0.0, 5.0, 0.0])


def test_top_logprobs():
    lp = jnp.log(jnp.asarray([[0.5, 0.3, 0.2]]))
    vals, idx = top_logprobs(lp, 2)
    np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1])
    np.testing.assert_allclose(np.asarray(vals)[0], np.log([0.5, 0.3]), rtol=1e-4)

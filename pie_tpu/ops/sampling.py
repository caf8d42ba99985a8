"""Batched sampling and logits processing, fully jit-compatible.

Reference parity: samplers/__init__.py:11-46 dispatch (temp==0 -> argmax,
top-p, min-p w/ min_tokens_to_keep, top-k, categorical) and
logits_processors/repetition.py:6-25, plus the C++ per-sequence param structs
(include/sequence/sampling_params.hpp:7-13, logits_params.hpp:11-17).

TPU-first: instead of per-request sampler closures, ONE fused batched sampler
whose per-sequence parameters are traced arrays — a single compiled function
covers every request mix, so continuous batching never recompiles. Disabled
filters are encoded as neutral values (top_k<=0, top_p>=1, min_p<=0).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "temperature", "top_p", "min_p", "top_k",
        "xtc_probability", "xtc_threshold",
    ),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-sequence sampling parameters, batched [B] (reference
    include/sequence/sampling_params.hpp:7-13; xtc_* implement the
    Exclude-Top-Choices sampler the reference stubbed at
    samplers/xtc.py — a 0-byte placeholder)."""

    temperature: jax.Array
    top_p: jax.Array
    min_p: jax.Array
    top_k: jax.Array
    xtc_probability: jax.Array = None
    xtc_threshold: jax.Array = None

    def __post_init__(self):
        # older call sites construct field-by-field without xtc
        if self.xtc_probability is None:
            b = self.temperature.shape[0]
            object.__setattr__(
                self, "xtc_probability", jnp.zeros((b,), jnp.float32)
            )
        if self.xtc_threshold is None:
            b = self.temperature.shape[0]
            object.__setattr__(
                self, "xtc_threshold", jnp.full((b,), 0.1, jnp.float32)
            )

    @classmethod
    def make(
        cls,
        batch: int,
        temperature: float = 1.0,
        top_p: float = 1.0,
        min_p: float = 0.0,
        top_k: int = -1,
        xtc_probability: float = 0.0,
        xtc_threshold: float = 0.1,
    ) -> "SamplingParams":
        full = lambda v, dt: jnp.full((batch,), v, dt)
        return cls(
            temperature=full(temperature, jnp.float32),
            top_p=full(top_p, jnp.float32),
            min_p=full(min_p, jnp.float32),
            top_k=full(top_k, jnp.int32),
            xtc_probability=full(xtc_probability, jnp.float32),
            xtc_threshold=full(xtc_threshold, jnp.float32),
        )

    def at(self, idx: int, **kw) -> "SamplingParams":
        """Return a copy with sequence ``idx``'s params replaced."""
        out = {}
        for f in (
            "temperature", "top_p", "min_p", "top_k",
            "xtc_probability", "xtc_threshold",
        ):
            v = getattr(self, f)
            if f in kw:
                v = v.at[idx].set(kw[f])
            out[f] = v
        return SamplingParams(**out)


def _sample_sorted(logits, params, key):
    """Full path: one descending sort serves top-k, top-p, min-p and XTC."""
    b, v = logits.shape
    temp = params.temperature[:, None]
    scaled = logits / jnp.maximum(temp, 1e-6)

    xtc_key, key = jax.random.split(key)
    sort_idx = jnp.argsort(-scaled, axis=-1)
    sorted_logits = jnp.take_along_axis(scaled, sort_idx, axis=-1)
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)

    ranks = jnp.arange(v)[None, :]
    # top-k: keep ranks < k (k<=0 disables)
    k = jnp.where(params.top_k[:, None] <= 0, v, params.top_k[:, None])
    keep = ranks < k
    # top-p nucleus: keep tokens whose cumulative prob (exclusive) < top_p;
    # the top-1 token is always kept (reference samplers/top_p.py:6-35)
    cum_excl = jnp.cumsum(sorted_probs, axis=-1) - sorted_probs
    keep &= cum_excl < params.top_p[:, None]
    # min-p: prob >= max_prob * min_p (reference samplers/min_p.py:7-60,
    # min_tokens_to_keep=1 == rank 0 always kept)
    keep &= (sorted_probs >= sorted_probs[:, :1] * params.min_p[:, None]) | (
        ranks == 0
    )
    # XTC "Exclude Top Choices" (the reference's samplers/xtc.py is an
    # empty placeholder; semantics follow the original text-gen-webui
    # sampler): with probability xtc_probability, drop every token whose
    # probability exceeds xtc_threshold EXCEPT the least-probable of
    # them — pushing sampling past the head of the distribution without
    # the incoherence of a plain temperature raise. No-op when fewer
    # than 2 tokens clear the threshold.
    above = sorted_probs > params.xtc_threshold[:, None]
    n_above = jnp.sum(above, axis=-1, keepdims=True)
    coin = jax.random.uniform(xtc_key, (b, 1))
    xtc_on = (
        (params.xtc_probability[:, None] > 0.0)
        & (coin < params.xtc_probability[:, None])
        & (n_above >= 2)
    )
    keep &= ~(xtc_on & (ranks < n_above - 1))

    masked = jnp.where(keep, sorted_logits, NEG_INF)
    gumbel = jax.random.gumbel(key, (b, v), jnp.float32)
    pick_rank = jnp.argmax(masked + gumbel, axis=-1)
    sampled = jnp.take_along_axis(sort_idx, pick_rank[:, None], axis=-1)[:, 0]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(
        params.temperature <= 0.0, greedy, sampled.astype(jnp.int32)
    )


def _sample_nofilter(logits, params, key):
    """Fast path when no top-k/top-p/min-p filter is active anywhere in the
    batch: plain temperature + Gumbel-max (no vocab sort)."""
    b, v = logits.shape
    scaled = logits / jnp.maximum(params.temperature[:, None], 1e-6)
    gumbel = jax.random.gumbel(key, (b, v), jnp.float32)
    sampled = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(params.temperature <= 0.0, greedy, sampled)


def _sample_greedy(logits, params, key):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


SAMPLER_KINDS = {
    "greedy": _sample_greedy,
    "categorical": _sample_nofilter,
    "filtered": _sample_sorted,
}


def sampler_kind_for(
    temperature, top_p, min_p, top_k, xtc_probability=0.0
) -> str:
    """Host-side static sampler selection from (scalar or array) params:
    the cheapest compiled program that covers every sequence in the batch.
    Static dispatch avoids paying the full-vocab argsort on batches that
    never use a truncation filter."""
    import numpy as np

    t = np.asarray(temperature)
    active = t > 0.0
    if not active.any():
        return "greedy"
    if (
        (np.asarray(top_k) > 0) & active
    ).any() or (
        (np.asarray(top_p) < 1.0) & active
    ).any() or (
        (np.asarray(min_p) > 0.0) & active
    ).any() or (
        (np.asarray(xtc_probability) > 0.0) & active
    ).any():
        return "filtered"
    return "categorical"


def sample(
    logits: jax.Array,
    params: SamplingParams,
    key: jax.Array,
    kind: str = "auto",
) -> jax.Array:
    """Fused batched sampler: temperature / top-k / top-p / min-p /
    categorical via Gumbel-max; temperature==0 selects greedy argmax.

    ``kind`` statically picks the compiled path ("greedy" / "categorical" /
    "filtered"); "auto" keeps a runtime lax.cond for callers whose params
    are only known on device.

    logits: [B, V] f32. Returns token ids [B] int32.
    """
    if kind != "auto":
        return SAMPLER_KINDS[kind](logits, params, key)
    active = params.temperature > 0.0
    any_filter = jnp.any(
        active
        & (
            (params.top_k > 0)
            | (params.top_p < 1.0)
            | (params.min_p > 0.0)
            | (params.xtc_probability > 0.0)
        )
    )
    return jax.lax.cond(
        any_filter, _sample_sorted, _sample_nofilter, logits, params, key
    )


# ---------------------------------------------------------------------------
# Logits processors (batched)
# ---------------------------------------------------------------------------


def repetition_penalty(
    logits: jax.Array,
    history: jax.Array,
    penalty: jax.Array,
) -> jax.Array:
    """Divide positive / multiply negative logits of recently seen tokens
    (reference logits_processors/repetition.py:6-25; context windowing is the
    caller's job — pass the last ``context_size`` tokens, pad with -1).

    logits: [B, V]; history: [B, C] int32 (pad=-1); penalty: [B] (1.0 = off).
    """
    b, v = logits.shape
    valid = history >= 0
    ids = jnp.where(valid, history, 0)
    seen = jnp.zeros((b, v), jnp.bool_).at[
        jnp.arange(b)[:, None], ids
    ].max(valid)
    pen = penalty[:, None]
    penalized = jnp.where(logits > 0, logits / pen, logits * pen)
    return jnp.where(seen & (pen != 1.0), penalized, logits)


def presence_frequency_penalty(
    logits: jax.Array,
    history: jax.Array,
    presence: jax.Array,
    frequency: jax.Array,
) -> jax.Array:
    """OpenAI-style presence/frequency penalties (reference C++ LogitsParams,
    include/sequence/logits_params.hpp:11-17)."""
    b, v = logits.shape
    valid = history >= 0
    ids = jnp.where(valid, history, 0)
    counts = jnp.zeros((b, v), jnp.float32).at[
        jnp.arange(b)[:, None], ids
    ].add(valid.astype(jnp.float32))
    return (
        logits
        - presence[:, None] * (counts > 0)
        - frequency[:, None] * counts
    )


def dry_penalty(
    logits: jax.Array,
    history: jax.Array,
    multiplier: jax.Array,
    base: jax.Array,
    allowed_length: jax.Array,
) -> jax.Array:
    """DRY ("Don't Repeat Yourself") sequence-repetition penalty — the
    sampler the reference stubbed at samplers/dry.py (0-byte placeholder).
    Semantics follow the original p-e-w sampler over the engine's rolling
    history window: if the history ends with a sequence whose earlier
    occurrence (inside the window) was followed by token t, then t is
    penalized by ``multiplier * base**(L - allowed_length)`` where L is
    the longest such match length, once L >= allowed_length. Unlike
    token-frequency penalties this targets verbatim LOOPS: it fires on
    continuations of repeated n-grams, not on every reuse of a word.

    logits: [B, V]; history: [B, C] int32, pad=-1, most recent LAST;
    multiplier [B] (0 disables), base [B], allowed_length [B] int32.

    Device-first design: the O(C^2) suffix-match table is a [C, C]
    boolean cumulative-AND per lane — trivial VPU work at the engine's
    C=64-token window — followed by one scatter-max over the vocab, so
    the op is a few fused passes with no host round trip (the reference's
    intended design would have paid a per-token Python scan).
    """
    b, v = logits.shape
    c = history.shape[1]
    valid = history >= 0
    # cmp[b, i, j]: history token at distance (i+1) from the end matches
    # history[j - 1 - i] — i.e. the i-th comparison of a suffix-match
    # ending just before position j
    tail = history[:, ::-1]  # tail[:, i] = history[:, c-1-i]
    ar = jnp.arange(c)
    src_idx = ar[None, :] - 1 - ar[:, None]  # [i, j] -> j - 1 - i
    in_bounds = src_idx >= 0
    gathered = history[:, jnp.clip(src_idx, 0, c - 1)]  # [B, C(i), C(j)]
    cmp = (
        (gathered == tail[:, :, None])
        & in_bounds[None]
        & valid[:, None, :]  # position j itself must hold a real token
        & (gathered >= 0)
    )
    # match length ending before j = count of leading True along i
    run = jnp.cumprod(cmp.astype(jnp.int32), axis=1)
    m = jnp.sum(run, axis=1)  # [B, C] longest suffix match before pos j
    # the most recent position's "match" is the suffix against itself
    # shifted by zero — exclude j == c-1's trivial alignment? j-1-i
    # indexes STRICTLY earlier tokens, so j = c-1 compares the suffix
    # against itself offset by one: a genuine repetition signal (e.g.
    # "a a a" continuation). Nothing to exclude.
    m = jnp.where(valid, m, 0)
    L = jnp.zeros((b, v), jnp.int32)
    ids = jnp.where(valid, history, 0)
    L = L.at[jnp.arange(b)[:, None], ids].max(m, mode="drop")
    fire = (L >= allowed_length[:, None]) & (multiplier[:, None] > 0.0)
    pen = multiplier[:, None] * jnp.power(
        base[:, None], (L - allowed_length[:, None]).astype(jnp.float32)
    )
    return jnp.where(fire, logits - pen, logits)


def apply_logit_bias(
    logits: jax.Array, bias_ids: jax.Array, bias_vals: jax.Array
) -> jax.Array:
    """Sparse per-sequence logit bias. bias_ids: [B, NB] (pad=-1);
    bias_vals: [B, NB]."""
    b, v = logits.shape
    valid = bias_ids >= 0
    ids = jnp.where(valid, bias_ids, 0)
    return logits.at[jnp.arange(b)[:, None], ids].add(
        jnp.where(valid, bias_vals, 0.0)
    )


def log_softmax(logits: jax.Array) -> jax.Array:
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def top_logprobs(
    logprobs: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Top-k (values, token ids) per row — reference engine/utils.py:4-48."""
    vals, idx = jax.lax.top_k(logprobs, k)
    return vals, idx.astype(jnp.int32)

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
    data_fields=("temperature", "top_p", "min_p", "top_k"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-sequence sampling parameters, batched [B] (reference
    include/sequence/sampling_params.hpp:7-13)."""

    temperature: jax.Array
    top_p: jax.Array
    min_p: jax.Array
    top_k: jax.Array

    @classmethod
    def make(
        cls,
        batch: int,
        temperature: float = 1.0,
        top_p: float = 1.0,
        min_p: float = 0.0,
        top_k: int = -1,
    ) -> "SamplingParams":
        full = lambda v, dt: jnp.full((batch,), v, dt)
        return cls(
            temperature=full(temperature, jnp.float32),
            top_p=full(top_p, jnp.float32),
            min_p=full(min_p, jnp.float32),
            top_k=full(top_k, jnp.int32),
        )

    def at(self, idx: int, **kw) -> "SamplingParams":
        """Return a copy with sequence ``idx``'s params replaced."""
        out = {}
        for f in ("temperature", "top_p", "min_p", "top_k"):
            v = getattr(self, f)
            if f in kw:
                v = v.at[idx].set(kw[f])
            out[f] = v
        return SamplingParams(**out)


def _sample_sorted(logits, params, key):
    """Full path: one descending sort serves top-k, top-p and min-p."""
    b, v = logits.shape
    temp = params.temperature[:, None]
    scaled = logits / jnp.maximum(temp, 1e-6)

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
    temperature, top_p, min_p, top_k
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

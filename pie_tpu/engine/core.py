"""EngineCore: the jit-compiled device program for autoregressive generation.

TPU-first redesign of the reference's hot loop (engine/inference_engine.py:
228-297). Where the reference builds a fresh lazy graph per token and paces it
with ``mx.async_eval`` one step ahead, here the decode loop is a compiled
``lax.scan`` over a fixed-shape state: the host syncs once per *chunk* of
steps, not per token — the per-token host round-trip called out in SURVEY.md
§3.3 as the reference's latency bottleneck does not exist on this path.

Per-sequence sampling parameters, penalties and stop tokens are traced
arrays, so one compiled program serves every request mix (no recompiles as
continuous batching changes the batch composition).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pie_tpu.cache.kv_cache import make_kv_cache

from pie_tpu.ops.sampling import (
    SamplingParams,
    apply_logit_bias,
    dry_penalty,
    presence_frequency_penalty,
    repetition_penalty,
    sample,
    top_logprobs,
)

PAD_TOKEN = -1


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "repetition", "presence", "frequency",
        "dry_multiplier", "dry_base", "dry_allowed",
    ),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class PenaltyParams:
    """Per-sequence logits-processor parameters [B] (reference
    include/sequence/logits_params.hpp:11-17; repetition context windowing
    per logits_processors/repetition.py:6-25; dry_* implement the DRY
    sequence-repetition penalty the reference stubbed at samplers/dry.py
    — a 0-byte placeholder — see ops/sampling.py:dry_penalty)."""

    repetition: jax.Array
    presence: jax.Array
    frequency: jax.Array
    dry_multiplier: jax.Array = None
    dry_base: jax.Array = None
    dry_allowed: jax.Array = None

    def __post_init__(self):
        # older call sites construct field-by-field without dry
        b = self.repetition.shape[0]
        if self.dry_multiplier is None:
            object.__setattr__(
                self, "dry_multiplier", jnp.zeros((b,), jnp.float32)
            )
        if self.dry_base is None:
            object.__setattr__(
                self, "dry_base", jnp.full((b,), 1.75, jnp.float32)
            )
        if self.dry_allowed is None:
            object.__setattr__(
                self, "dry_allowed", jnp.full((b,), 2, jnp.int32)
            )

    @classmethod
    def make(
        cls,
        batch: int,
        repetition: float = 1.0,
        presence: float = 0.0,
        frequency: float = 0.0,
        dry_multiplier: float = 0.0,
        dry_base: float = 1.75,
        dry_allowed: int = 2,
    ) -> "PenaltyParams":
        return cls(
            repetition=jnp.full((batch,), repetition, jnp.float32),
            presence=jnp.full((batch,), presence, jnp.float32),
            frequency=jnp.full((batch,), frequency, jnp.float32),
            dry_multiplier=jnp.full((batch,), dry_multiplier, jnp.float32),
            dry_base=jnp.full((batch,), dry_base, jnp.float32),
            dry_allowed=jnp.full((batch,), dry_allowed, jnp.int32),
        )

    def at(self, idx: int, **kw) -> "PenaltyParams":
        out = {}
        for f in (
            "repetition", "presence", "frequency",
            "dry_multiplier", "dry_base", "dry_allowed",
        ):
            v = getattr(self, f)
            if f in kw:
                v = v.at[idx].set(kw[f])
            out[f] = v
        return PenaltyParams(**out)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("cache", "last_token", "lengths", "history", "done", "key"),
    meta_fields=(),
)
@dataclasses.dataclass(frozen=True)
class DecodeState:
    """Carried state of the decode loop (one slot per batch lane)."""

    cache: object
    last_token: jax.Array  # [B] int32
    lengths: jax.Array  # [B] int32 — current length == next position
    history: jax.Array  # [B, H] recent tokens for penalties (-1 pad)
    done: jax.Array  # [B] bool
    key: jax.Array


class EngineCore:
    """Compiled prefill/decode for one model + fixed batch geometry."""

    #: bench-only ablation switches ("noproc", "nosample"); set by
    #: benchmarks/ablate_decode.py, never in production.
    _ablate: frozenset = frozenset()

    def __init__(
        self,
        model,
        params,
        batch_size: int = 1,
        max_seq_len: int = 2048,
        kv_dtype=jnp.bfloat16,
        kv_quantized: bool = False,
        kv_window: Optional[int] = None,
        history_len: int = 64,
        logprobs_k: int = 8,
    ):
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self.max_seq_len = max_seq_len
        self.kv_dtype = kv_dtype
        self.kv_quantized = kv_quantized
        self.kv_window = kv_window
        self.history_len = history_len
        self.logprobs_k = logprobs_k

        self._prefill = jax.jit(
            self._prefill_impl, donate_argnames=("state",),
            static_argnames=("return_logprobs", "sampler_kind"),
        )
        self._decode = jax.jit(
            self._decode_impl,
            donate_argnames=("state",),
            static_argnames=(
                "num_steps", "return_logprobs", "sampler_kind", "kv_bucket",
            ),
        )

    # ------------------------------------------------------------------

    def new_state(self, seed: int = 0) -> DecodeState:
        cfg = self.model.config
        if hasattr(self.model, "make_cache"):
            # model-specific cache layout (e.g. gemma-3's bounded dual
            # sliding/global groups)
            cache = self.model.make_cache(
                self.batch_size,
                self.max_seq_len,
                dtype=self.kv_dtype,
                window=self.kv_window,
                quantized=self.kv_quantized,
            )
        else:
            cache = make_kv_cache(
                cfg.num_hidden_layers,
                self.batch_size,
                self.max_seq_len,
                cfg.num_key_value_heads,
                cfg.resolved_head_dim,
                dtype=self.kv_dtype,
                window=self.kv_window,
                quantized=self.kv_quantized,
            )
        b = self.batch_size
        return DecodeState(
            cache=cache,
            last_token=jnp.zeros((b,), jnp.int32),
            lengths=jnp.zeros((b,), jnp.int32),
            history=jnp.full((b, self.history_len), PAD_TOKEN, jnp.int32),
            done=jnp.ones((b,), jnp.bool_),
            key=jax.random.PRNGKey(seed),
        )

    # ------------------------------------------------------------------

    def _process_logits(
        self, logits, history, penalties, bias_ids, bias_vals, allowed_mask
    ):
        logits = apply_logit_bias(logits, bias_ids, bias_vals)
        logits = repetition_penalty(logits, history, penalties.repetition)
        logits = presence_frequency_penalty(
            logits, history, penalties.presence, penalties.frequency
        )
        logits = dry_penalty(
            logits, history, penalties.dry_multiplier,
            penalties.dry_base, penalties.dry_allowed,
        )
        if allowed_mask is not None:
            logits = jnp.where(allowed_mask, logits, -1e30)
        return logits

    def _push_history(self, history, token, active):
        new = jnp.where(active, token, PAD_TOKEN)
        return jnp.concatenate([history[:, 1:], new[:, None]], axis=1)

    def _prefill_impl(
        self,
        params,
        state: DecodeState,
        input_ids,  # [B, Tpad]
        prompt_lens,  # [B]
        first_pos,  # [B] start position (prefix-cache reuse offset)
        sampling: SamplingParams,
        penalties: PenaltyParams,
        bias_ids,
        bias_vals,
        allowed_mask=None,
        inputs_embeds=None,  # [B, Tpad, D] — VLM prefill (image features
        #                       already scattered over placeholder slots)
        positions3=None,  # [3, B, Tpad] M-RoPE t/h/w streams (qwen2-vl
        #                   image prompts; None = text-collapsed rope)
        return_logprobs: bool = False,
        sampler_kind: str = "auto",
    ):
        """Run the prompt through the model, sample the first new token."""
        b, t = input_ids.shape
        positions = first_pos[:, None] + jnp.arange(t)[None, :]
        cache = state.cache.advance(first_pos, t, valid_lens=prompt_lens)
        extra = {} if positions3 is None else {"positions3": positions3}
        logits, cache = self.model(
            params, input_ids, cache, positions, inputs_embeds=inputs_embeds,
            valid_lens=prompt_lens, **extra,
        )
        cache = cache.trim_to(first_pos + prompt_lens)

        # logits of the LAST real prompt token, per sequence
        last_idx = jnp.clip(prompt_lens - 1, 0, t - 1)
        last_logits = jnp.take_along_axis(
            logits, last_idx[:, None, None], axis=1
        )[:, 0]

        # seed history with the tail of the prompt
        h = self.history_len
        hist_idx = prompt_lens[:, None] - h + jnp.arange(h)[None, :]
        hist = jnp.where(
            hist_idx >= 0,
            jnp.take_along_axis(
                input_ids, jnp.clip(hist_idx, 0, t - 1), axis=1
            ),
            PAD_TOKEN,
        )

        proc = self._process_logits(
            last_logits, hist, penalties, bias_ids, bias_vals, allowed_mask
        )
        key, sub = jax.random.split(state.key)
        token = sample(proc, sampling, sub, kind=sampler_kind)
        lengths = first_pos + prompt_lens

        new_state = DecodeState(
            cache=cache,
            last_token=token,
            lengths=lengths,
            history=self._push_history(hist, token, jnp.ones((b,), jnp.bool_)),
            done=jnp.zeros((b,), jnp.bool_),
            key=key,
        )
        aux = None
        if return_logprobs:
            lp = jax.nn.log_softmax(proc, axis=-1)
            chosen = jnp.take_along_axis(lp, token[:, None], axis=1)[:, 0]
            tv, ti = top_logprobs(lp, self.logprobs_k)
            aux = (chosen, tv, ti)
        return new_state, token, aux

    def _decode_impl(
        self,
        params,
        state: DecodeState,
        sampling: SamplingParams,
        penalties: PenaltyParams,
        bias_ids,
        bias_vals,
        stop_ids,  # [NS] int32, -1 padded
        allowed_mask=None,  # [B, V] or None — constrained decoding mask
        pos_delta=None,  # [B] or None — M-RoPE decode offset: after an
        #                  image prompt the rope position stream runs
        #                  AHEAD of the KV slot index by delta (HF
        #                  get_rope_index semantics); rope sees
        #                  lengths - delta while the cache writes at
        #                  lengths. None = text rope (positions as-is).
        num_steps: int = 8,
        return_logprobs: bool = False,
        sampler_kind: str = "auto",
        kv_bucket: int = 0,
    ):
        """Scan ``num_steps`` decode steps; done lanes emit PAD and freeze.

        kv_bucket: capacity-bucketed attention — the chunk runs on a
        [.., :kv_bucket] cache view (every position this chunk touches
        must be < kv_bucket; the engine rounds current length + steps up
        to a power-of-two bucket), then merges back into the full buffer.
        Short-context decode stops paying the full max_seq_len cache read
        per token."""
        full_cache = None
        cache0 = state.cache
        if (
            kv_bucket
            and hasattr(cache0, "trim_capacity")
            and getattr(cache0, "window", None) is None
            and kv_bucket < cache0.capacity
        ):
            full_cache = cache0
            state = dataclasses.replace(
                state, cache=cache0.trim_capacity(kv_bucket)
            )

        def step(state, _):
            active = ~state.done
            cache = state.cache.advance(state.lengths, 1)
            extra = {}
            if pos_delta is not None:
                from pie_tpu.models.qwen2_vl import text_positions3

                extra["positions3"] = text_positions3(
                    (state.lengths - pos_delta)[:, None]
                )
            logits, cache = self.model(
                params, state.last_token[:, None], cache,
                state.lengths[:, None], **extra,
            )
            logits = logits[:, 0]
            if "noproc" in self._ablate:
                proc = logits
            else:
                proc = self._process_logits(
                    logits, state.history, penalties, bias_ids, bias_vals,
                    allowed_mask,
                )
            key, sub = jax.random.split(state.key)
            # advance the RNG only when some lane actually samples: a
            # speculative chunk dispatched after every lane froze must not
            # perturb the seeded stream of a later request on this engine
            key = jnp.where(jnp.any(active), key, state.key)
            if "nosample" in self._ablate:
                token = logits[:, :8].argmax(-1).astype(jnp.int32)
            else:
                token = sample(proc, sampling, sub, kind=sampler_kind)
            token = jnp.where(active, token, state.last_token)
            # stop ids are -1 padded; real tokens are >= 0 so pads never match
            hit_stop = jnp.any(token[:, None] == stop_ids[None, :], axis=1)
            emitted = jnp.where(active, token, PAD_TOKEN)
            new_done = state.done | hit_stop
            lengths = jnp.where(active, state.lengths + 1, state.lengths)
            new_state = DecodeState(
                cache=cache,
                last_token=token,
                lengths=lengths,
                history=self._push_history(state.history, token, active),
                done=new_done,
                key=key,
            )
            if return_logprobs:
                lp = jax.nn.log_softmax(proc, axis=-1)
                chosen = jnp.take_along_axis(lp, token[:, None], axis=1)[:, 0]
                tv, ti = top_logprobs(lp, self.logprobs_k)
                out = (emitted, chosen, tv, ti)
            else:
                out = (emitted,)
            return new_state, out

        state, outs = jax.lax.scan(step, state, None, length=num_steps)
        if full_cache is not None:
            state = dataclasses.replace(
                state, cache=full_cache.merge_trimmed(state.cache)
            )
        return state, outs

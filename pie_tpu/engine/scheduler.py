"""Continuous-batching scheduler over the paged KV pool.

Reference parity: the pie_core design that was specified but never
implemented — Sequence lifecycle WAITING -> PREFILLING -> DECODING ->
COMPLETED (reference include/sequence/sequence.hpp:22-28), scheduler
admission limits max_num_seqs / max_tokens_in_batch (include/engine/
scheduler.hpp:27-43, whose step() was an empty PImpl, src/engine/
scheduler.cpp:22-27), page allocation per 64 tokens with exhaustion ->
queueing (src/engine/page_allocator.cpp:68-73), per-sequence sampling and
logits params (include/sequence/sampling_params.hpp, logits_params.hpp).

TPU-first: fixed batch lanes + fixed-shape jitted device programs. Prefill
runs one sequence chunk at a time (chunked, bucketed); decode runs one
batched step over every DECODING lane through the Pallas paged-attention
kernel. Changing batch composition never recompiles: lane state is data.
"""

from __future__ import annotations

import dataclasses
import enum
import itertools
import logging
from collections import deque
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pie_tpu.cache.paged import PAGE_SIZE, PagedCacheManager, PagedKVPool
from pie_tpu.engine.core import PAD_TOKEN
from pie_tpu.ops.sampling import (
    SamplingParams,
    apply_logit_bias,
    presence_frequency_penalty,
    repetition_penalty,
    sample,
)

logger = logging.getLogger(__name__)


class SeqStatus(enum.Enum):
    WAITING = "waiting"
    PREFILLING = "prefilling"
    DECODING = "decoding"
    COMPLETED = "completed"
    CANCELLED = "cancelled"
    ERROR = "error"


@dataclasses.dataclass
class Sequence:
    """One request (reference include/sequence/sequence.hpp:31-79)."""

    seq_id: int
    prompt_ids: list[int]
    max_new_tokens: int = 256
    stop_token_ids: tuple[int, ...] = ()
    temperature: float = 1.0
    top_p: float = 1.0
    min_p: float = 0.0
    top_k: int = -1
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0

    status: SeqStatus = SeqStatus.WAITING
    output_ids: list[int] = dataclasses.field(default_factory=list)
    prefill_pos: int = 0  # prompt tokens already prefilled
    lane: int = -1
    finish_reason: Optional[str] = None
    cancelled: bool = False
    on_token: Optional[Callable[["Sequence", int], None]] = None
    on_finish: Optional[Callable[["Sequence"], None]] = None

    @property
    def num_tokens(self) -> int:
        return len(self.prompt_ids) + len(self.output_ids)


class PagedEngine:
    """Device-side compiled programs for the scheduler."""

    def __init__(
        self,
        model,
        params,
        num_lanes: int = 8,
        num_pages: int = 512,
        max_pages_per_seq: int = 32,
        prefill_chunk: int = 256,
        kv_dtype=jnp.bfloat16,
        kv_quantized: bool = False,
        history_len: int = 64,
        seed: int = 0,
    ):
        cfg = model.config
        self.model = model
        self.params = params
        self.num_lanes = num_lanes
        self.max_pages_per_seq = max_pages_per_seq
        self.prefill_chunk = prefill_chunk
        self.history_len = history_len
        self.pool = PagedKVPool.create(
            cfg.num_hidden_layers,
            num_pages,
            cfg.num_key_value_heads,
            cfg.resolved_head_dim,
            kv_dtype,
            kv_quantized,
        )
        self.key = jax.random.PRNGKey(seed)

        self._prefill = jax.jit(self._prefill_impl, donate_argnames=("pool",))
        self._decode = jax.jit(
            self._decode_impl, donate_argnames=("pool",),
            static_argnames=("sampler_kind",),
        )
        self._sample_first = jax.jit(self._sample_first_impl)

    # -- device programs -------------------------------------------------

    def _prefill_impl(self, params, pool, ids, positions, block_table,
                      context_len, last_idx):
        """One prefill chunk for ONE sequence (lane-independent: writes only
        into the pool). Returns last-token logits [V]."""
        logits, pool = self.model.paged_forward(
            params, ids, pool, block_table, positions, context_len,
        )
        return logits[0, last_idx], pool

    def _sample_first_impl(self, logits, sampling, penalties, history, key):
        logits = logits[None]
        logits = repetition_penalty(logits, history, penalties[0])
        logits = presence_frequency_penalty(
            logits, history, penalties[1], penalties[2]
        )
        return sample(logits, sampling, key)[0]

    def _decode_impl(self, params, pool, last_tokens, context_lens,
                     block_tables, histories, sampling, pen_rep, pen_pres,
                     pen_freq, active, key, sampler_kind="auto"):
        """One batched decode step over all lanes. Inactive lanes compute
        with context_len 1 (cheap) and their results are masked out."""
        b = last_tokens.shape[0]
        # inactive lanes (free, or mid-prefill) must not write KV anywhere:
        # position -1 routes their write out-of-bounds in paged_forward
        positions = jnp.where(active, context_lens - 1, -1)[:, None]
        safe_lens = jnp.where(active, context_lens, 1)
        logits, pool = self.model.paged_forward(
            params, last_tokens[:, None], pool, block_tables, positions,
            safe_lens,
        )
        logits = logits[:, 0]
        logits = repetition_penalty(logits, histories, pen_rep)
        logits = presence_frequency_penalty(logits, histories, pen_pres, pen_freq)
        key, sub = jax.random.split(key)
        tokens = sample(logits, sampling, sub, kind=sampler_kind)
        tokens = jnp.where(active, tokens, PAD_TOKEN)
        return tokens, pool, key


class Scheduler:
    """Host-side continuous-batching orchestrator (the reference's missing
    Scheduler::step())."""

    def __init__(self, engine: PagedEngine, num_pages: Optional[int] = None):
        self.engine = engine
        self.manager = PagedCacheManager(
            engine.pool.num_pages, engine.max_pages_per_seq
        )
        self.waiting: deque[Sequence] = deque()
        self.running: dict[int, Sequence] = {}  # lane -> seq
        self.free_lanes = list(range(engine.num_lanes - 1, -1, -1))
        self._ids = itertools.count()
        b = engine.num_lanes
        h = engine.history_len
        # host mirrors of lane state (numpy; shipped to device per step)
        self.last_tokens = np.zeros((b,), np.int32)
        self.context_lens = np.zeros((b,), np.int32)
        self.block_tables = np.full(
            (b, engine.max_pages_per_seq), -1, np.int32
        )
        self.histories = np.full((b, h), PAD_TOKEN, np.int32)
        self.samp = {
            "temperature": np.ones((b,), np.float32),
            "top_p": np.ones((b,), np.float32),
            "min_p": np.zeros((b,), np.float32),
            "top_k": np.full((b,), -1, np.int32),
        }
        self.pen = {
            "repetition": np.ones((b,), np.float32),
            "presence": np.zeros((b,), np.float32),
            "frequency": np.zeros((b,), np.float32),
        }

    # -- public API ------------------------------------------------------

    def submit(self, seq: Sequence) -> int:
        if seq.seq_id is None or seq.seq_id < 0:
            seq.seq_id = next(self._ids)
        self.waiting.append(seq)
        return seq.seq_id

    def add_request(self, prompt_ids, **kw) -> Sequence:
        seq = Sequence(seq_id=next(self._ids), prompt_ids=list(prompt_ids), **kw)
        self.waiting.append(seq)
        return seq

    @property
    def has_work(self) -> bool:
        return bool(self.waiting or self.running)

    def run_to_completion(self, max_steps: int = 100000) -> None:
        for _ in range(max_steps):
            if not self.has_work:
                return
            self.step()
        raise RuntimeError("scheduler did not drain")

    # -- one scheduling step --------------------------------------------

    def step(self) -> list[Sequence]:
        """Admit -> prefill one chunk each -> batched decode. Returns
        sequences that finished this step."""
        finished: list[Sequence] = []
        self._admit()
        self._prefill_step()
        finished += self._decode_step()
        return finished

    def _admit(self):
        while self.waiting and self.free_lanes:
            seq = self.waiting[0]
            if seq.cancelled:
                self.waiting.popleft()
                self._finish(seq, "cancelled")
                continue
            need = len(seq.prompt_ids) + seq.max_new_tokens
            if self.manager.pages_needed(need) > self.engine.max_pages_per_seq:
                self.waiting.popleft()
                self._finish(seq, "error: sequence exceeds max pages")
                continue
            if not self.manager.allocate_seq(seq.seq_id, need):
                break  # pool exhausted -> stay queued (reference contract)
            self.waiting.popleft()
            lane = self.free_lanes.pop()
            seq.lane = lane
            seq.status = SeqStatus.PREFILLING
            seq.prefill_pos = 0
            self.running[lane] = seq
            table = self.manager.block_table(seq.seq_id)
            self.block_tables[lane] = -1
            self.block_tables[lane, : len(table)] = table
            self.context_lens[lane] = 0
            self.histories[lane] = PAD_TOKEN
            self.samp["temperature"][lane] = seq.temperature
            self.samp["top_p"][lane] = seq.top_p
            self.samp["min_p"][lane] = seq.min_p
            self.samp["top_k"][lane] = seq.top_k
            self.pen["repetition"][lane] = seq.repetition_penalty
            self.pen["presence"][lane] = seq.presence_penalty
            self.pen["frequency"][lane] = seq.frequency_penalty

    def _prefill_step(self):
        e = self.engine
        for lane, seq in list(self.running.items()):
            if seq.status != SeqStatus.PREFILLING:
                continue
            if seq.cancelled:
                self._finish(seq, "cancelled")
                continue
            plen = len(seq.prompt_ids)
            chunk = min(e.prefill_chunk, plen - seq.prefill_pos)
            c = _bucket_chunk(chunk, e.prefill_chunk)
            ids = np.zeros((1, c), np.int32)
            ids[0, :chunk] = seq.prompt_ids[
                seq.prefill_pos : seq.prefill_pos + chunk
            ]
            positions = seq.prefill_pos + np.arange(c)[None, :]
            positions[0, chunk:] = -1  # pad tokens: no KV write
            new_len = seq.prefill_pos + chunk
            logits, e.pool = e._prefill(
                e.params,
                e.pool,
                jnp.asarray(ids),
                jnp.asarray(positions.astype(np.int32)),
                jnp.asarray(self.block_tables[lane : lane + 1]),
                jnp.full((1,), new_len, jnp.int32),
                jnp.asarray(chunk - 1, jnp.int32),
            )
            seq.prefill_pos = new_len
            self.context_lens[lane] = new_len
            if seq.prefill_pos >= plen:
                # sample the first generated token from this chunk's logits
                hist = np.full((1, e.history_len), PAD_TOKEN, np.int32)
                tail = seq.prompt_ids[-e.history_len :]
                hist[0, -len(tail) :] = tail
                sampling = SamplingParams(
                    temperature=jnp.asarray(self.samp["temperature"][lane : lane + 1]),
                    top_p=jnp.asarray(self.samp["top_p"][lane : lane + 1]),
                    min_p=jnp.asarray(self.samp["min_p"][lane : lane + 1]),
                    top_k=jnp.asarray(self.samp["top_k"][lane : lane + 1]),
                )
                pen = (
                    jnp.asarray(self.pen["repetition"][lane : lane + 1]),
                    jnp.asarray(self.pen["presence"][lane : lane + 1]),
                    jnp.asarray(self.pen["frequency"][lane : lane + 1]),
                )
                e.key, sub = jax.random.split(e.key)
                tok = int(e._sample_first(
                    logits, sampling, pen, jnp.asarray(hist), sub
                ))
                self.histories[lane] = np.roll(self.histories[lane], -1)
                self.histories[lane, :-1] = hist[0, 1:]
                self.histories[lane, -1] = tok
                self._emit(seq, tok)
                if seq.status == SeqStatus.PREFILLING:
                    seq.status = SeqStatus.DECODING
                    self.last_tokens[lane] = tok
                    # the sampled token occupies the next slot
                    self.context_lens[lane] = new_len + 1
                    if not self.manager.extend_seq(seq.seq_id, new_len + 1):
                        self._finish(seq, "error: out of pages")
                    else:
                        self._sync_table(lane, seq)

    def _decode_step(self) -> list[Sequence]:
        e = self.engine
        lanes = [
            lane for lane, s in self.running.items()
            if s.status == SeqStatus.DECODING
        ]
        if not lanes:
            return []
        active = np.zeros((e.num_lanes,), bool)
        active[lanes] = True
        sampling = SamplingParams(
            temperature=jnp.asarray(self.samp["temperature"]),
            top_p=jnp.asarray(self.samp["top_p"]),
            min_p=jnp.asarray(self.samp["min_p"]),
            top_k=jnp.asarray(self.samp["top_k"]),
        )
        from pie_tpu.ops.sampling import sampler_kind_for

        skind = sampler_kind_for(
            self.samp["temperature"][lanes], self.samp["top_p"][lanes],
            self.samp["min_p"][lanes], self.samp["top_k"][lanes],
        )
        tokens, e.pool, e.key = e._decode(
            e.params,
            e.pool,
            jnp.asarray(self.last_tokens),
            jnp.asarray(self.context_lens),
            jnp.asarray(self.block_tables),
            jnp.asarray(self.histories),
            sampling,
            jnp.asarray(self.pen["repetition"]),
            jnp.asarray(self.pen["presence"]),
            jnp.asarray(self.pen["frequency"]),
            jnp.asarray(active),
            e.key,
            sampler_kind=skind,
        )
        tokens = np.asarray(tokens)
        finished = []
        for lane in lanes:
            seq = self.running[lane]
            tok = int(tokens[lane])
            if seq.cancelled:
                self._finish(seq, "cancelled")
                finished.append(seq)
                continue
            self._emit(seq, tok)
            self.histories[lane] = np.roll(self.histories[lane], -1)
            self.histories[lane, -1] = tok
            self.last_tokens[lane] = tok
            if seq.status != SeqStatus.DECODING:
                finished.append(seq)  # _emit finished it (stop/length)
                continue
            self.context_lens[lane] += 1
            if not self.manager.extend_seq(seq.seq_id, int(self.context_lens[lane])):
                self._finish(seq, "error: out of pages")
                finished.append(seq)
                continue
            self._sync_table(lane, seq)
        return finished

    # -- helpers --------------------------------------------------------

    def _sync_table(self, lane: int, seq: Sequence):
        table = self.manager.block_table(seq.seq_id)
        self.block_tables[lane, : len(table)] = table

    def _emit(self, seq: Sequence, tok: int):
        seq.output_ids.append(tok)
        if seq.on_token:
            try:
                seq.on_token(seq, tok)
            except Exception:  # pragma: no cover
                logger.exception("on_token callback failed")
        if tok in seq.stop_token_ids:
            self._finish(seq, "stop")
        elif len(seq.output_ids) >= seq.max_new_tokens:
            self._finish(seq, "length")

    def _finish(self, seq: Sequence, reason: str):
        seq.finish_reason = reason
        seq.status = (
            SeqStatus.CANCELLED if reason == "cancelled"
            else SeqStatus.ERROR if reason.startswith("error")
            else SeqStatus.COMPLETED
        )
        if seq.lane >= 0:
            self.running.pop(seq.lane, None)
            self.free_lanes.append(seq.lane)
            self.block_tables[seq.lane] = -1
            self.context_lens[seq.lane] = 0
            seq.lane = -1
        self.manager.free_seq(seq.seq_id)
        if seq.on_finish:
            try:
                seq.on_finish(seq)
            except Exception:  # pragma: no cover
                logger.exception("on_finish callback failed")


def _bucket_chunk(n: int, max_chunk: int) -> int:
    c = 16
    while c < n:
        c *= 2
    return min(c, max_chunk)

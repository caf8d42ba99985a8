"""OpenAI-compatible server tests (aiohttp TestClient, tiny model, offline
tokenizer). Covers chat (non-stream + SSE stream + usage chunk), completions,
responses, logprobs, and error mapping."""

import asyncio
import json

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
aiohttp = pytest.importorskip("aiohttp")

from aiohttp.test_utils import TestClient, TestServer

from pie_tpu.engine import InferenceEngine
from pie_tpu.models.llama import LlamaConfig, LlamaModel
from pie_tpu.server.app import create_app
from pie_tpu.tokenizer import Tokenizer
from pie_tpu.tokenizer.control_tokens import LLAMA3

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


def _tiny_tokenizer():
    from tokenizers import Tokenizer as RawTok, models, pre_tokenizers

    words = [
        "hello", "world", "how", "are", "you", "fine", "thanks", "user",
        "assistant", "system", "weather", "sunny", "<unk>",
    ]
    specials = LLAMA3.all_control_tokens
    vocab = {w: i for i, w in enumerate(specials + words)}
    raw = RawTok(models.WordLevel(vocab, unk_token="<unk>"))
    raw.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    raw.add_special_tokens(specials)
    hf = transformers.PreTrainedTokenizerFast(
        tokenizer_object=raw, bos_token="<|begin_of_text|>",
        eos_token="<|end_of_text|>", unk_token="<unk>",
    )
    return Tokenizer(hf, LLAMA3)


@pytest.fixture(scope="module")
def engine_fixture():
    torch.manual_seed(0)
    config = LlamaConfig.from_dict(dict(TINY, model_type="llama"))
    model = LlamaModel(config)
    import jax

    params = model.init_params(jax.random.PRNGKey(1), dtype=jnp.float32)
    tokenizer = _tiny_tokenizer()
    engine = InferenceEngine(
        model=model, params=params, tokenizer=tokenizer, max_seq_len=128,
        kv_dtype=jnp.float32, decode_chunk=4,
    )
    # warm the compile caches so request handlers stay fast
    for max_toks in (5, 6, 8):
        engine.chat(
            [{"role": "user", "text": "hello"}],
            max_completion_tokens=max_toks, temperature=0.0,
        )
    engine.generate([1, 2, 3], max_completion_tokens=5, temperature=0.0,
                    logprobs=True)
    return engine


def _call(engine, coro_fn):
    # aiohttp Applications cannot be restarted across event loops; build a
    # fresh app (cheap) around the warm module-scoped engine per test
    async def run():
        app = create_app(engine=engine)
        async with TestClient(
            TestServer(app), timeout=aiohttp.ClientTimeout(total=590)
        ) as client:
            return await coro_fn(client)

    return asyncio.run(run())


def test_health(engine_fixture):
    async def go(client):
        resp = await client.get("/health")
        assert resp.status == 200
        return await resp.json()

    assert _call(engine_fixture, go)["status"] == "ok"


def test_chat_completion(engine_fixture):
    async def go(client):
        resp = await client.post(
            "/v1/chat/completions",
            json={
                "model": "tiny",
                "messages": [{"role": "user", "content": "hello world"}],
                "max_tokens": 8,
                "temperature": 0.0,
            },
        )
        assert resp.status == 200, await resp.text()
        return await resp.json()

    data = _call(engine_fixture, go)
    assert data["object"] == "chat.completion"
    choice = data["choices"][0]
    assert choice["message"]["role"] == "assistant"
    assert choice["finish_reason"] in ("stop", "length")
    assert data["usage"]["prompt_tokens"] > 0
    assert data["usage"]["completion_tokens"] > 0


def test_chat_streaming_sse(engine_fixture):
    async def go(client):
        resp = await client.post(
            "/v1/chat/completions",
            json={
                "messages": [{"role": "user", "content": "hello"}],
                "max_tokens": 6,
                "temperature": 0.0,
                "stream": True,
                "stream_options": {"include_usage": True},
            },
        )
        assert resp.status == 200
        body = (await resp.read()).decode()
        return body

    body = _call(engine_fixture, go)
    events = [
        json.loads(line[6:])
        for line in body.splitlines()
        if line.startswith("data: ") and line != "data: [DONE]"
    ]
    assert body.rstrip().endswith("data: [DONE]")
    # first chunk carries the role
    assert events[0]["choices"][0]["delta"].get("role") == "assistant"
    # some content chunk exists
    assert any(
        e["choices"] and e["choices"][0]["delta"].get("content")
        for e in events
    )
    # a finish chunk exists
    assert any(
        e["choices"] and e["choices"][0].get("finish_reason") for e in events
    )
    # usage chunk included
    assert any(e.get("usage") for e in events)


def test_completions(engine_fixture):
    async def go(client):
        resp = await client.post(
            "/v1/completions",
            json={"prompt": "hello world how", "max_tokens": 5,
                  "temperature": 0.0, "logprobs": 2},
        )
        assert resp.status == 200, await resp.text()
        return await resp.json()

    data = _call(engine_fixture, go)
    assert data["object"] == "text_completion"
    assert isinstance(data["choices"][0]["text"], str)
    lp = data["choices"][0]["logprobs"]
    assert lp is not None and len(lp["tokens"]) == len(lp["token_logprobs"])


def test_responses_api(engine_fixture):
    async def go(client):
        resp = await client.post(
            "/v1/responses",
            json={"input": "hello", "instructions": "you are fine",
                  "max_output_tokens": 5, "temperature": 0.0},
        )
        assert resp.status == 200, await resp.text()
        return await resp.json()

    data = _call(engine_fixture, go)
    assert data["object"] == "response"
    assert data["output"][0]["type"] == "message"
    assert data["usage"]["input_tokens"] > 0


def test_invalid_request_422(engine_fixture):
    async def go(client):
        resp = await client.post("/v1/chat/completions", json={"messages": "x"})
        return resp.status

    assert _call(engine_fixture, go) == 422


def test_completions_streaming_501(engine_fixture):
    async def go(client):
        resp = await client.post(
            "/v1/completions", json={"prompt": "hello", "stream": True}
        )
        return resp.status

    assert _call(engine_fixture, go) == 501


def test_chat_n_choices_on_batching_engine():
    """n>1 chat choices decode as concurrent lanes of the batching engine
    (the reference degrades n>1 to one choice; the single-stream engine
    here still does)."""
    import dataclasses

    import jax

    from pie_tpu.engine.async_engine import BatchedInferenceEngine

    config = LlamaConfig.from_dict(dict(TINY, model_type="llama"))
    model = LlamaModel(config)
    params = model.init_params(jax.random.PRNGKey(2), dtype=jnp.float32)
    engine = BatchedInferenceEngine(
        model=model, params=params, tokenizer=_tiny_tokenizer(),
        num_lanes=4, num_pages=32, max_pages_per_seq=8, prefill_chunk=16,
    )
    engine.core.pool = dataclasses.replace(
        engine.core.pool,
        k=engine.core.pool.k.astype(jnp.float32),
        v=engine.core.pool.v.astype(jnp.float32),
    )
    try:
        async def go(client):
            resp = await client.post(
                "/v1/chat/completions",
                json={
                    "model": "tiny",
                    "messages": [{"role": "user", "content": "hello"}],
                    "max_completion_tokens": 5,
                    "temperature": 0.9,
                    "n": 3,
                },
            )
            assert resp.status == 200, await resp.text()
            return await resp.json()

        data = _call(engine, go)
        assert len(data["choices"]) == 3
        assert [c["index"] for c in data["choices"]] == [0, 1, 2]
        assert data["usage"]["completion_tokens"] == sum(
            min(5, 5) for _ in range(3)
        ) or data["usage"]["completion_tokens"] > 0
    finally:
        engine.shutdown()

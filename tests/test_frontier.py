"""Front-tier HTTP router (multi-host serving): requests proxy to engine
hosts through the RequestRouter; a dead host is detected on dispatch
failure and its requests fail over to survivors. Charter §5.8 — the
reference is single-box."""

import asyncio

import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
aiohttp = pytest.importorskip("aiohttp")

from aiohttp.test_utils import TestClient, TestServer

from pie_tpu.engine import InferenceEngine
from pie_tpu.models.llama import LlamaConfig, LlamaModel
from pie_tpu.server.app import create_app
from pie_tpu.server.frontier import create_frontier
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

    words = ["hello", "world", "user", "assistant", "system", "<unk>"]
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
def engine():
    config = LlamaConfig.from_dict(dict(TINY, model_type="llama"))
    model = LlamaModel(config)
    params = model.init_params(jax.random.PRNGKey(1), dtype=jnp.float32)
    eng = InferenceEngine(
        model=model, params=params, tokenizer=_tiny_tokenizer(),
        max_seq_len=128, kv_dtype=jnp.float32, decode_chunk=4,
    )
    eng.chat([{"role": "user", "text": "hello"}], max_completion_tokens=5,
             temperature=0.0)  # warm compile
    return eng


CHAT_BODY = {
    "model": "tiny",
    "messages": [{"role": "user", "content": "hello world"}],
    "max_completion_tokens": 5,
    "temperature": 0.0,
}


def test_frontier_routes_and_fails_over(engine):
    async def go():
        engine_app = create_app(engine=engine)
        engine_server = TestServer(engine_app)
        await engine_server.start_server()
        live = f"http://{engine_server.host}:{engine_server.port}"
        dead = "http://127.0.0.1:9"  # discard port: connection refused

        frontier = create_frontier([dead, live])
        from pie_tpu.server.frontier import ROUTER_KEY

        # bias placement so the first request lands on the dead host and
        # must fail over (least-loaded placement would otherwise always
        # pick the live host here)
        frontier[ROUTER_KEY]._hosts[live] = 5
        async with TestClient(
            TestServer(frontier), timeout=aiohttp.ClientTimeout(total=590)
        ) as client:
            # several requests: some will hit the dead host first and must
            # fail over to the live one
            for _ in range(3):
                resp = await client.post(
                    "/v1/chat/completions", json=CHAT_BODY
                )
                assert resp.status == 200, await resp.text()
                data = await resp.json()
                assert data["choices"][0]["finish_reason"] in (
                    "stop", "length"
                )
            health = await (await client.get("/health")).json()
            assert health["hosts"] == [live]  # dead host evicted
            frontier[ROUTER_KEY]._hosts[live] = 0
        await engine_server.close()
        return True

    assert asyncio.run(go())


def test_frontier_relays_sse_stream(engine):
    """Streaming chat completions proxy through the front tier chunk by
    chunk (SSE relay)."""

    async def go():
        engine_app = create_app(engine=engine)
        engine_server = TestServer(engine_app)
        await engine_server.start_server()
        live = f"http://{engine_server.host}:{engine_server.port}"
        frontier = create_frontier([live])
        async with TestClient(
            TestServer(frontier), timeout=aiohttp.ClientTimeout(total=590)
        ) as client:
            resp = await client.post(
                "/v1/chat/completions",
                json={**CHAT_BODY, "stream": True},
            )
            assert resp.status == 200, await resp.text()
            body = (await resp.read()).decode()
            assert "data: " in body and "[DONE]" in body
        await engine_server.close()
        return True

    assert asyncio.run(go())

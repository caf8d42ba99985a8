"""End-to-end constrained generation through the engine chat API: a tiny
RANDOM model forced to emit schema-valid JSON / tool calls via token
masking."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pie_tpu.engine import InferenceEngine
from pie_tpu.models.llama import LlamaConfig, LlamaModel
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

JSON_PIECES = (
    list('{}[]":,.-0123456789 ')
    + ['{"', '"}', '": ', '", "', "true", "false", "null"]
    + list("abcdefghijklmnopqrstuvwxyz")
    + ["name", "count", "city", "alpha", "beta", "get_weather", "arguments"]
)


def _tokenizer():
    from tokenizers import Tokenizer as RawTok, models, pre_tokenizers

    words = ["hello", "user", "assistant", "system", "<unk>"]
    specials = LLAMA3.all_control_tokens
    vocab = {w: i for i, w in enumerate(specials + words)}
    for p in JSON_PIECES:
        if p not in vocab:
            vocab[p] = len(vocab)
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
    params = model.init_params(jax.random.PRNGKey(3), dtype=jnp.float32)
    return InferenceEngine(
        model=model, params=params, tokenizer=_tokenizer(), max_seq_len=128,
        kv_dtype=jnp.float32, decode_chunk=4,
    )


def test_json_schema_constrained_chat(engine):
    schema = {
        "type": "object",
        "properties": {
            "name": {"enum": ["alpha", "beta"]},
            "count": {"type": "integer"},
        },
        "required": ["name", "count"],
        "additionalProperties": False,
    }
    inter = engine.chat(
        [{"role": "user", "text": "hello"}],
        response_format={
            "type": "json_schema",
            "json_schema": {"name": "t", "schema": schema},
        },
        max_completion_tokens=64,
        temperature=0.9,  # even at high temp the mask forces validity
    )
    data = json.loads(inter.text)
    assert data["name"] in ("alpha", "beta")
    assert isinstance(data["count"], int)
    assert inter.finish_reason == "stop"


def test_json_object_mode(engine):
    from pie_tpu.structured.json_machine import JsonMachine

    inter = engine.chat(
        [{"role": "user", "text": "hello"}],
        response_format={"type": "json_object"},
        max_completion_tokens=200,
        temperature=0.3,
    )
    if inter.finish_reason == "stop":
        assert isinstance(json.loads(inter.text), dict)
    else:
        # budget exhausted mid-structure: text must still be a valid JSON
        # object prefix (every emitted token was mask-approved)
        m = JsonMachine({"type": "object"})
        assert m.advance(inter.text)


def test_forced_tool_call(engine):
    tools = [{
        "type": "function",
        "function": {
            "name": "get_weather",
            "parameters": {
                "type": "object",
                "properties": {"city": {"type": "string"}},
                "required": ["city"],
                "additionalProperties": False,
            },
        },
    }]
    inter = engine.chat(
        [{"role": "user", "text": "hello"}],
        tools=tools,
        tool_choice="required",
        max_completion_tokens=80,
        temperature=1.0,
    )
    assert inter.finish_reason == "tool_calls"
    calls = inter.tool_calls
    assert calls and calls[0]["name"] == "get_weather"
    assert "city" in calls[0]["arguments"]

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
    + list("abcdefghijklmnopqrstuvwxyz</>")
    + ["name", "count", "city", "alpha", "beta", "get_weather", "arguments"]
    + ["<think>", "</think>"]
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


def test_constrained_forced_fast_path(engine):
    """Uniquely-determined tokens are emitted with NO device program: a
    schema whose output is fully forced ends with fewer prefill/decode
    dispatches than tokens (reference multi_token_sampling fast path,
    engine/inference_engine.py:40)."""
    from pie_tpu.structured.json_machine import JsonMachine

    # every token is forced: single-key object with a fixed enum value
    schema = {
        "type": "object",
        "properties": {"name": {"enum": ["alpha"]}},
        "required": ["name"],
        "additionalProperties": False,
    }
    calls = {"n": 0}
    orig = engine.core._prefill

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    engine.core._prefill = counting
    try:
        result, text = engine.generate_constrained(
            [1, 2, 3], JsonMachine(schema), max_completion_tokens=64,
            temperature=0.0,
        )
    finally:
        engine.core._prefill = orig
    assert json.loads(text) == {"name": "alpha"}
    assert result.finish_reason == "stop"
    # prompt prefill + at most a couple of choice-point extends; far fewer
    # device calls than emitted tokens
    assert calls["n"] < result.completion_tokens


def test_constrained_logprobs_and_stop(engine):
    from pie_tpu.structured.json_machine import JsonMachine

    schema = {
        "type": "object",
        "properties": {"name": {"enum": ["alpha", "beta"]}},
        "required": ["name"],
        "additionalProperties": False,
    }
    result, text = engine.generate_constrained(
        [1, 2, 3], JsonMachine(schema), max_completion_tokens=64,
        temperature=0.0, logprobs=True,
    )
    assert result.finish_reason == "stop"
    assert result.logprobs is not None
    assert len(result.logprobs) == result.completion_tokens
    # forced tokens report logprob 0.0; sampled ones carry top-k entries
    assert any(lp.logprob == 0.0 and lp.top == [] for lp in result.logprobs)
    assert all(lp.logprob <= 0.0 for lp in result.logprobs)

    # stop_token_ids end generation even mid-machine
    eot = engine.tokenizer.stop_tokens[0]
    bias = {eot: 50.0}
    result2, _ = engine.generate_constrained(
        [1, 2, 3], JsonMachine(schema), max_completion_tokens=64,
        temperature=0.0, stop_token_ids=[eot], logit_bias=bias,
    )
    assert result2.finish_reason in ("stop", "length",
                                     "error: constrained decoding produced invalid token")


def test_reasoning_chat_state(engine):
    """chat with reasoning=True produces <think>...</think> followed by the
    structured output, and labeled_output strips the think block."""
    from pie_tpu.structured import RootStateMachine

    root = RootStateMachine(engine.tokenizer.control_tokens)
    st = root.configure(
        response_format={"type": "json_schema", "json_schema": {"schema": {
            "type": "object",
            "properties": {"name": {"enum": ["alpha"]}},
            "required": ["name"], "additionalProperties": False,
        }}},
        reasoning=True,
    )
    result, text = engine.generate_constrained(
        [1, 2, 3], st.machine, max_completion_tokens=200, temperature=0.0,
    )
    assert text.startswith("<think>")
    if result.finish_reason == "stop":
        label, value = RootStateMachine.labeled_output(st, text)
        assert label == "json"
        assert value == {"name": "alpha"}


def test_per_state_sampler_switching(engine):
    """Reasoning+tool_call composite: the <think> phase samples at the
    request's temperature while the tool_call phase forces temp 0
    (reference keys samplers off the live PSE state each step,
    engine/inference_engine.py:257-271, sub_state.py:12-21)."""
    from pie_tpu.structured import RootStateMachine

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
    root = RootStateMachine(engine.tokenizer.control_tokens)
    st = root.configure(tools=tools, tool_choice="required", reasoning=True)
    assert st.state_kwargs == {
        "tool_call": {"temperature": 0.0, "min_p": 0.02}
    }
    assert st.generation_kwargs == {}

    seen = []
    orig = engine.core._prefill

    def recording(params, state, ids, lens, first, sampling, *a, **kw):
        seen.append(float(sampling.temperature[0]))
        return orig(params, state, ids, lens, first, sampling, *a, **kw)

    # bias the close tag so the think phase ends deterministically fast
    close_id = engine.tokenizer.encode("</think>")[-1]
    engine.core._prefill = recording
    try:
        result, text = engine.generate_constrained(
            [5, 6], st.machine, max_completion_tokens=60, temperature=0.9,
            state_kwargs=st.state_kwargs, logit_bias={close_id: 50.0},
        )
    finally:
        engine.core._prefill = orig
    # the run must traverse BOTH phases: think-phase dispatches at the
    # request temperature, tool-phase dispatches forced to 0
    assert any(abs(t - 0.9) < 1e-6 for t in seen), seen
    assert any(t == 0.0 for t in seen), seen
    # order: every 0.9 dispatch precedes every 0.0 dispatch
    last_hot = max(i for i, t in enumerate(seen) if abs(t - 0.9) < 1e-6)
    first_cold = min(i for i, t in enumerate(seen) if t == 0.0)
    assert last_hot < first_cold, seen


def test_reasoning_chat_response(engine):
    """reasoning=True: the response separates reasoning_content from the
    visible answer."""
    inter = engine.chat(
        [{"role": "user", "text": "hello"}],
        response_format={"type": "json_object"},
        reasoning=True,
        max_completion_tokens=200,
        temperature=0.3,
    )
    rc = inter.metadata.get("reasoning_content")
    assert rc is not None
    assert "<think>" not in (inter.text or "")

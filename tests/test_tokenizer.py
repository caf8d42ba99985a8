"""Tokenizer wrapper + control tokens + chat template tests (offline —
builds a tiny WordLevel tokenizer, no network)."""

import pytest

tokenizers = pytest.importorskip("tokenizers")
transformers = pytest.importorskip("transformers")

from pie_tpu.interaction import Content, Interaction, InteractionRole
from pie_tpu.tokenizer import Tokenizer, get_control_tokens
from pie_tpu.tokenizer.chat_template import render_chat
from pie_tpu.tokenizer.control_tokens import CHATML, GEMMA, LLAMA3


def _tiny_hf_tokenizer(control):
    from tokenizers import Tokenizer as RawTok, models, pre_tokenizers

    words = [
        "hello", "world", "how", "are", "you", "fine", "thanks", "a", "b",
        "user", "assistant", "system", "<unk>",
    ]
    specials = [t for t in control.all_control_tokens]
    vocab = {w: i for i, w in enumerate(specials + words)}
    raw = RawTok(models.WordLevel(vocab, unk_token="<unk>"))
    raw.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    for s in specials:
        raw.add_special_tokens([s])
    tok = transformers.PreTrainedTokenizerFast(
        tokenizer_object=raw,
        bos_token=control.bos or None,
        eos_token=control.eos,
        unk_token="<unk>",
    )
    return tok


def test_family_sniffing():
    assert get_control_tokens(eos_token="<|eot_id|>").family == "llama3"
    assert get_control_tokens(eos_token="<|im_end|>").family == "chatml"
    assert get_control_tokens(eos_token="<eos>").family == "gemma"
    assert get_control_tokens(family="llama3") is LLAMA3
    with pytest.raises(ValueError):
        get_control_tokens(family="nope")


def test_render_chat_llama3():
    msgs = [
        {"role": "system", "text": "be brief"},
        {"role": "user", "text": "hello"},
    ]
    out = render_chat(msgs, LLAMA3)
    assert "<|start_header_id|>system<|end_header_id|>\n\nbe brief<|eot_id|>" in out
    assert "<|start_header_id|>user<|end_header_id|>\n\nhello<|eot_id|>" in out
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")


def test_render_chat_gemma_folds_system():
    msgs = [
        {"role": "system", "text": "be brief"},
        {"role": "user", "text": "hello"},
        {"role": "assistant", "text": "hi"},
    ]
    out = render_chat(msgs, GEMMA)
    assert "system" not in out  # folded into user turn
    assert "be brief\n\nhello" in out
    assert "<start_of_turn>model" in out


def test_render_chat_tools_injected():
    msgs = [{"role": "user", "text": "hello"}]
    tools = [{"name": "get_weather", "parameters": {"type": "object"}}]
    out = render_chat(msgs, CHATML, tools=tools)
    assert "get_weather" in out


def test_tokenizer_roundtrip_and_stops():
    tok = Tokenizer(_tiny_hf_tokenizer(LLAMA3), LLAMA3)
    ids = tok.encode("hello world")
    assert tok.decode(ids) == "hello world"
    stops = tok.stop_tokens
    assert tok.token_to_id("<|eot_id|>") in stops
    assert tok.token_to_id("<|end_of_text|>") in stops


def test_apply_chat_template_encodes():
    tok = Tokenizer(_tiny_hf_tokenizer(LLAMA3), LLAMA3)
    ids = tok.apply_chat_template(
        [Interaction.simple("user", "hello world")], add_bos=True
    )
    assert ids[0] == tok.token_to_id("<|begin_of_text|>")
    text = tok.decode(ids)
    assert "hello world" in text
    assert "assistant" in text


def test_interaction_model():
    it = Interaction(
        role=InteractionRole.ASSISTANT,
        content=[
            Content.text_content("hi "),
            Content.tool_call_content("f", {"x": 1}, "call_1"),
            Content.text_content("there"),
        ],
        metadata={"finish_reason": "stop"},
    )
    assert it.text == "hi there"
    assert it.tool_calls == [{"name": "f", "arguments": {"x": 1}, "id": "call_1"}]
    assert it.finish_reason == "stop"
    d = it.to_dict()
    assert d["role"] == "assistant" and d["finish_reason"] == "stop"
    with pytest.raises(AttributeError):
        it.nope

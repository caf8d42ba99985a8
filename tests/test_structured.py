"""Structured-generation tests: JSON machine acceptance, schema
constraints, token masks, root state machine mapping."""

import json

import numpy as np
import pytest

from pie_tpu.structured.json_machine import JsonMachine
from pie_tpu.structured.root import RootStateMachine
from pie_tpu.structured.token_masks import TokenMasker


def accepts_full(schema, text):
    m = JsonMachine(schema)
    return m.advance(text) and m.is_complete


def rejects_prefix(schema, text):
    return not JsonMachine(schema).advance(text)


def test_free_json_values():
    for text in [
        '{"a": 1, "b": [true, null, "x"]}',
        "[1, 2.5, -3e2]",
        '"hello \\"world\\""',
        "true",
        "-12.5e-3",
        "{}",
        "[]",
    ]:
        assert accepts_full(None, text), text


def test_free_json_rejections():
    for text in ["{,", "[1,,2]", "tru_", "01a", '{"a" 1}', "}", '{"a":}']:
        assert rejects_prefix(None, text) or not (
            (m := JsonMachine(None)).advance(text) and m.is_complete
        ), text


def test_incomplete_not_complete():
    m = JsonMachine(None)
    assert m.advance('{"a": [1, 2')
    assert not m.is_complete
    assert m.advance("]}")
    assert m.is_complete


def test_schema_object_properties():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
        },
        "required": ["name"],
        "additionalProperties": False,
    }
    assert accepts_full(schema, '{"name": "bob"}')
    assert accepts_full(schema, '{"name": "bob", "age": 3}')
    assert accepts_full(schema, '{"age": 3, "name": "x"}')
    # unknown property rejected at the key
    assert rejects_prefix(schema, '{"zzz"')
    # age must be integer
    assert rejects_prefix(schema, '{"name": "b", "age": "x"')
    assert rejects_prefix(schema, '{"name": "b", "age": 1.')
    # required missing -> close not allowed
    assert rejects_prefix(schema, '{"age": 1}')
    # duplicate key rejected
    assert rejects_prefix(schema, '{"name": "a", "name"')


def test_schema_enum_and_nested():
    schema = {
        "type": "object",
        "properties": {
            "color": {"enum": ["red", "green"]},
            "point": {
                "type": "object",
                "properties": {"x": {"type": "number"}},
                "required": ["x"],
            },
        },
        "required": ["color"],
    }
    assert accepts_full(schema, '{"color": "red"}')
    assert accepts_full(schema, '{"color": "green", "point": {"x": 1.5}}')
    assert rejects_prefix(schema, '{"color": "blu')


def test_schema_array_oneof():
    one = {
        "oneOf": [
            {
                "type": "object",
                "properties": {"name": {"enum": ["f"]}, "arguments": {"type": "object"}},
                "required": ["name"],
                "additionalProperties": False,
            },
            {
                "type": "object",
                "properties": {"name": {"enum": ["g"]}, "n": {"type": "integer"}},
                "required": ["name"],
                "additionalProperties": False,
            },
        ]
    }
    schema = {"type": "array", "items": one, "minItems": 1}
    assert accepts_full(schema, '[{"name": "f"}]')
    assert accepts_full(schema, '[{"name": "g", "n": 2}, {"name": "f"}]')
    assert rejects_prefix(schema, "[]")  # minItems 1
    assert rejects_prefix(schema, '[{"name": "h"')


def test_whitespace_tolerated_but_bounded():
    assert accepts_full(None, '{ "a": 1 }')
    m = JsonMachine(None)
    assert not m.advance("      {")  # > MAX_WS_RUN leading spaces... rejected


class _FakeTok:
    """Char-level fake tokenizer: token id == ord(char); a few multi-char
    tokens at the top."""

    MULTI = ['{"', '"}', '": ', "true", "false", "null", '{"name"']

    def __init__(self):
        self.vocab_size = 256 + len(self.MULTI)

    def decode(self, ids):
        out = []
        for t in ids:
            if t < 256:
                out.append(chr(t))
            else:
                out.append(self.MULTI[t - 256])
        return "".join(out)


def test_token_masks_constrain_and_multichar():
    masker = TokenMasker(_FakeTok())
    m = JsonMachine({"type": "object", "properties": {"name": {"type": "string"}},
                     "required": ["name"], "additionalProperties": False})
    mask = masker.build_mask(m)
    assert mask[ord("{")]
    assert mask[256 + 0]  # '{"'
    assert mask[256 + len(_FakeTok.MULTI) - 1]  # '{"name"'
    assert not mask[ord("[")]
    assert not mask[ord("a")]
    # advance with a multi-char token and re-mask
    assert m.advance('{"name"')
    mask = masker.build_mask(m)
    # after the key string closed, next must be ':' (or ws); '"' is invalid
    assert mask[ord(":")]
    assert not mask[ord('"')]


def test_token_mask_full_json_generation_walk():
    """Greedy-walk the mask until completion -> output must be valid JSON
    conforming to the schema."""
    rng = np.random.default_rng(0)
    masker = TokenMasker(_FakeTok())
    schema = {
        "type": "object",
        "properties": {
            "name": {"enum": ["alpha", "beta"]},
            "count": {"type": "integer"},
        },
        "required": ["name", "count"],
        "additionalProperties": False,
    }
    m = JsonMachine(schema)
    out = []
    for _ in range(200):
        if m.is_complete:
            break
        mask = masker.build_mask(m)
        ids = np.nonzero(mask)[0]
        assert len(ids) > 0, f"dead end after {''.join(out)!r}"
        tid = int(rng.choice(ids))
        s = masker.token_strs[tid]
        assert m.advance(s)
        out.append(s)
    text = "".join(out)
    data = json.loads(text)
    assert data["name"] in ("alpha", "beta")
    assert isinstance(data["count"], int)


def test_root_state_machine_mapping():
    r = RootStateMachine()
    s = r.configure(response_format={"type": "json_object"})
    assert s.name == "structured_output" and s.machine is not None
    s = r.configure(
        response_format={
            "type": "json_schema",
            "json_schema": {"name": "x", "schema": {"type": "object"}},
        }
    )
    assert s.name == "structured_output"
    tools = [{"type": "function", "function": {"name": "get_w", "parameters": {
        "type": "object", "properties": {"city": {"type": "string"}},
        "required": ["city"]}}}]
    s = r.configure(tools=tools, tool_choice="required")
    assert s.name == "tool_call"
    assert s.generation_kwargs["temperature"] == 0.0
    assert s.machine.advance('{"name": "get_w", "arguments": {"city": "x"}}')
    assert s.machine.is_complete
    # named tool choice
    s = r.configure(
        tools=tools, tool_choice={"type": "function", "function": {"name": "get_w"}},
    )
    assert s.name == "tool_call"
    # auto -> text (unconstrained; host-side parsing)
    s = r.configure(tools=tools, tool_choice="auto")
    assert s.name == "text"
    label, val = RootStateMachine.labeled_output(
        r.configure(tools=tools, tool_choice="required"),
        '{"name": "get_w", "arguments": {"city": "sf"}}',
    )
    assert label == "tool_calls"
    assert val[0]["name"] == "get_w"

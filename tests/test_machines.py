"""Composable constrained-generation machines (reference AnyStateMachine /
ReasoningState / FreeformStateMachine composition, state_machine/root.py:
66-125, sub_states/__init__.py:1-13)."""

import pytest

from pie_tpu.structured.json_machine import JsonMachine
from pie_tpu.structured.machines import (
    ANY_CHAR,
    AnyMachine,
    FreeformMachine,
    LiteralMachine,
    SequenceMachine,
    reasoning_machine,
)


def test_literal():
    m = LiteralMachine("<think>")
    assert m.allowed_chars() == {"<"}
    assert m.accepts_prefix("<think>")
    assert not m.accepts_prefix("<thonk")
    assert m.advance("<think")
    assert not m.is_complete
    assert m.advance(">")
    assert m.is_complete
    assert m.allowed_chars() == set()


def test_freeform_delimited():
    m = FreeformMachine(end_delimiters=("</s>",))
    assert ANY_CHAR in m.allowed_chars()
    assert m.advance("hello world")
    assert not m.is_complete
    assert m.advance("</s>")
    assert m.is_complete
    assert m.body == "hello world"
    assert not m.advance("x")  # nothing after the delimiter


def test_sequence_hands_over():
    m = SequenceMachine(
        [LiteralMachine("ab"), LiteralMachine("cd")], names=["a", "b"]
    )
    assert m.advance("a")
    assert m.active_names() == {"a"}
    assert m.advance("bc")
    assert m.active_names() == {"b"}
    assert not m.is_complete
    assert m.advance("d")
    assert m.is_complete
    assert not m.advance("e")


def test_sequence_rejects_wrong_order():
    m = SequenceMachine([LiteralMachine("ab"), LiteralMachine("cd")])
    assert not m.advance("c")
    assert m.advance("ab")  # state unchanged by the failed advance


def test_any_machine_branches():
    m = AnyMachine(
        [LiteralMachine("yes"), LiteralMachine("yodel")], names=["y1", "y2"]
    )
    assert m.allowed_chars() == {"y"}
    assert m.advance("y")
    assert m.active_names() == {"y1", "y2"}
    assert m.advance("e")
    assert m.active_names() == {"y1"}
    assert m.advance("s")
    assert m.is_complete


def test_any_with_json():
    m = AnyMachine([JsonMachine({"type": "object"}), LiteralMachine("none")])
    m2 = m.copy()
    assert m.advance('{"a": 1}')
    assert m.is_complete
    assert m2.advance("none")
    assert m2.is_complete


def test_reasoning_then_json():
    inner = JsonMachine({"type": "object", "properties": {"x": {"type": "integer"}},
                         "required": ["x"], "additionalProperties": False})
    m = reasoning_machine(inner)
    assert m.allowed_chars() == {"<"}
    assert m.advance("<think>")
    assert ANY_CHAR in m.allowed_chars()
    assert m.advance("let me think about it...")
    assert not m.is_complete
    assert m.advance("</think>")
    assert "{" in m.allowed_chars()
    assert m.advance('{"x": 42}')
    assert m.is_complete
    assert "reasoning" not in m.active_names()


def test_reasoning_freeform_output():
    m = reasoning_machine(None, stop=("<eot>",))
    assert m.advance("<think>hm</think>some answer")
    assert not m.is_complete
    assert m.advance("<eot>")
    assert m.is_complete


def test_accepts_prefix_no_mutation():
    m = reasoning_machine(JsonMachine({"type": "object"}))
    m.advance("<think>x</think>")
    before = m.text
    assert m.accepts_prefix('{"k"')
    assert not m.accepts_prefix("nope")
    assert m.text == before
    assert m.advance("{}")
    assert m.is_complete


def test_root_reasoning_configure_and_label():
    from pie_tpu.structured.root import RootStateMachine

    root = RootStateMachine()
    st = root.configure(
        response_format={"type": "json_schema", "json_schema": {
            "schema": {"type": "object", "properties": {"a": {"type": "integer"}},
                       "required": ["a"], "additionalProperties": False}}},
        reasoning=True,
    )
    assert st.machine is not None
    assert st.name == "reasoning+structured_output"
    assert st.machine.advance('<think>reason</think>{"a": 7}')
    assert st.machine.is_complete
    label, value = RootStateMachine.labeled_output(
        st, '<think>reason</think>{"a": 7}'
    )
    assert label == "json"
    assert value == {"a": 7}

"""Root state machine: maps request parameters to constrained-decoding
states.

Reference parity: RootStateMachine._create_state_graph (reference
state_machine/root.py:66-125): response_format json_schema ->
StructuredOutputState; json_object -> empty-schema JSON; tools ->
ToolCallState (single, or array-of-oneOf for parallel calls; tool_choice
'required'/named function filtering); text -> freeform with stop sequences.
Per-state generation kwargs: tool calls force temperature 0.0 / min_p 0.02
(reference state_machine/sub_states/tool_call.py:57-59).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Sequence

from pie_tpu.structured.json_machine import JsonMachine


@dataclasses.dataclass
class StructuredState:
    name: str  # "text" | "structured_output" | "tool_call" | "reasoning"
    machine: Optional[JsonMachine] = None  # None = freeform
    generation_kwargs: dict = dataclasses.field(default_factory=dict)
    stop_sequences: tuple[str, ...] = ()


def _tool_schema(tool: dict) -> dict:
    fn = tool.get("function", tool)
    return {
        "type": "object",
        "properties": {
            "name": {"enum": [fn["name"]]},
            "arguments": fn.get("parameters") or {"type": "object"},
        },
        "required": ["name", "arguments"],
        "additionalProperties": False,
    }


class RootStateMachine:
    """Builds the active constrained state for a request."""

    def __init__(self, control_tokens=None):
        self.control_tokens = control_tokens
        self.state: Optional[StructuredState] = None

    #: think-tag pair used when a request asks for a reasoning state
    REASONING_TAGS = ("<think>", "</think>")

    def configure(
        self,
        response_format: Optional[dict] = None,
        tools: Optional[Sequence[dict]] = None,
        tool_choice: Any = "auto",
        parallel_tool_calls: bool = False,
        stop: Sequence[str] = (),
        reasoning: bool = False,
    ) -> StructuredState:
        """Build the active constrained state. ``reasoning=True`` prepends a
        <think>...</think> state ahead of whatever output state the rest of
        the parameters select (reference ReasoningState composed into the
        root graph, state_machine/sub_states/__init__.py:1-13 +
        root.py:66-125)."""
        stop = tuple(stop or ())
        fmt_type = (response_format or {}).get("type", "text")

        if tools and tool_choice not in (None, "none", "auto"):
            selected = list(tools)
            if isinstance(tool_choice, dict):
                name = (
                    tool_choice.get("function", {}).get("name")
                    or tool_choice.get("name")
                )
                selected = [
                    t for t in tools
                    if (t.get("function", t).get("name")) == name
                ]
                if not selected:
                    raise ValueError(f"unknown tool in tool_choice: {name}")
            schemas = [_tool_schema(t) for t in selected]
            one = schemas[0] if len(schemas) == 1 else {"oneOf": schemas}
            if parallel_tool_calls:
                schema = {"type": "array", "items": one, "minItems": 1}
            else:
                schema = one
            self.state = StructuredState(
                name="tool_call",
                machine=JsonMachine(schema),
                generation_kwargs={"temperature": 0.0, "min_p": 0.02},
            )
        elif fmt_type == "json_schema":
            spec = response_format.get("json_schema", {}) or {}
            schema = spec.get("schema") or spec.get("schema_") or {}
            self.state = StructuredState(
                name="structured_output", machine=JsonMachine(schema)
            )
        elif fmt_type == "json_object":
            self.state = StructuredState(
                name="structured_output",
                machine=JsonMachine({"type": "object"}),
            )
        else:
            self.state = StructuredState(name="text", stop_sequences=stop)
        if reasoning:
            from pie_tpu.structured.machines import reasoning_machine

            open_tag, close_tag = self.REASONING_TAGS
            self.state = StructuredState(
                name=f"reasoning+{self.state.name}",
                machine=reasoning_machine(
                    self.state.machine, open_tag, close_tag,
                    stop=self.state.stop_sequences
                    or (self._end_of_turn(),),
                ),
                generation_kwargs=self.state.generation_kwargs,
                stop_sequences=self.state.stop_sequences,
            )
        return self.state

    def _end_of_turn(self) -> str:
        if self.control_tokens is not None:
            return self.control_tokens.end_of_turn
        return "</s>"

    # -- output labeling (reference get_labeled_output) ------------------

    @staticmethod
    def labeled_output(state: StructuredState, text: str):
        """Parse the raw generated text according to the state; returns
        (label, value). Reasoning states strip the <think> block before
        labeling the remainder (reference get_labeled_output semantics)."""
        if state.name.startswith("reasoning+"):
            open_tag, close_tag = RootStateMachine.REASONING_TAGS
            i = text.find(close_tag)
            if i != -1:
                text = text[i + len(close_tag):]
            inner = dataclasses.replace(
                state, name=state.name.split("+", 1)[1]
            )
            return RootStateMachine.labeled_output(inner, text)
        if state.machine is None:
            return "text", text
        try:
            value = json.loads(text)
        except json.JSONDecodeError:
            return "text", text
        if state.name == "tool_call":
            calls = value if isinstance(value, list) else [value]
            return "tool_calls", [
                {"name": c.get("name"), "arguments": c.get("arguments", {})}
                for c in calls
                if isinstance(c, dict)
            ]
        return "json", value

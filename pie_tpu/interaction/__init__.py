"""Interaction data model (reference interaction/__init__.py:4-26)."""

from pie_tpu.interaction.content import Content, ContentType
from pie_tpu.interaction.interaction import (
    Interaction,
    InteractionRole,
    InteractionType,
)

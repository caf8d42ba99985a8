"""Model zoo: config parsing, registry, weight loading, architectures."""

from pie_tpu.models.registry import get_model_class, register_model
from pie_tpu.models.loader import load_model

"""Inference engine: jit-compiled prefill/decode core + host orchestration."""

from pie_tpu.engine.core import DecodeState, EngineCore, PenaltyParams
from pie_tpu.engine.engine import GenerationResult, InferenceEngine

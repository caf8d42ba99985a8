"""Model loading: config parsing, safetensors weights, quantize-on-load.

Reference parity: models/utils.py:27-125 — snapshot layout (config.json +
*.safetensors [+ model.safetensors.index.json]), architecture dispatch,
weight sanitization, and group-wise quantization hookup driven by the
config's "quantization" block. Network download (HF hub snapshot,
models/utils.py:164-198) is intentionally host-side-optional: pass a local
path; a hub fetch hook can be layered on by the caller.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from pie_tpu.models.config import QuantizationConfig, load_config_dict
from pie_tpu.models.registry import get_model_class

logger = logging.getLogger(__name__)


def load_safetensors_weights(model_path: Path) -> dict[str, np.ndarray]:
    """Load all weights: sharded index first, then single file (reference
    model-utils load order src/models/model_utils.cpp:108-126)."""
    from safetensors import safe_open

    model_path = Path(model_path)
    weights: dict[str, np.ndarray] = {}
    index = model_path / "model.safetensors.index.json"
    if index.exists():
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        for shard in sorted(set(weight_map.values())):
            with safe_open(model_path / shard, framework="np") as f:
                for key in f.keys():
                    weights[key] = f.get_tensor(key)
        return weights
    files = sorted(model_path.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors found in {model_path}")
    for file in files:
        with safe_open(file, framework="np") as f:
            for key in f.keys():
                weights[key] = f.get_tensor(key)
    return weights


def load_model(
    model_path: str | Path,
    dtype=jnp.bfloat16,
    quantization: Optional[QuantizationConfig] = None,
):
    """Load (model, params) from a local HF-style snapshot directory.

    If the config has a "quantization" block, or `quantization` is passed,
    linear weights are group-wise quantized on load.
    """
    model_path = Path(model_path)
    cfg_dict = load_config_dict(model_path)
    model = build_model(cfg_dict)
    weights = load_safetensors_weights(model_path)
    params = model.from_hf_state_dict(weights, dtype=dtype)
    qcfg = quantization or QuantizationConfig.from_dict(
        cfg_dict.get("quantization")
    )
    if qcfg is not None:
        logger.info(
            "quantizing weights: %d bits, group size %d", qcfg.bits, qcfg.group_size
        )
        params = model.quantize_params(params, qcfg.group_size, qcfg.bits)
    return model, params


def build_model(cfg_dict: dict[str, Any]):
    """Instantiate the right architecture from a config dict."""
    model_type = cfg_dict.get("model_type", "llama")
    cls = get_model_class(model_type)
    return cls(cls.config_class.from_dict(cfg_dict) if hasattr(cls, "config_class")
               else _config_for(cls, cfg_dict))


def _config_for(cls, cfg_dict):
    # Convention: <Arch>Model has a module-level <Arch>Config with from_dict.
    import importlib

    mod = importlib.import_module(cls.__module__)
    for name in dir(mod):
        if name.endswith("Config") and name != "BaseConfig":
            return getattr(mod, name).from_dict(cfg_dict)
    raise ValueError(f"no config class found for {cls}")

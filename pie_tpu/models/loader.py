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


def resolve_model_path(model_path: str | Path) -> Path:
    """Local path passthrough, or HF-hub snapshot download for repo ids
    (reference models/utils.py:164-198 snapshot_download flow): a
    non-existent path that looks like ``org/name`` is fetched (or served
    from the local hub cache) via huggingface_hub."""
    p = Path(model_path)
    if p.exists():
        return p
    s = str(model_path)
    if s.count("/") == 1 and not s.startswith((".", "/", "~")):
        try:
            from huggingface_hub import snapshot_download
        except ImportError as e:  # pragma: no cover - baked into the image
            raise FileNotFoundError(
                f"{s} is not a local path and huggingface_hub is unavailable"
            ) from e
        logger.info("downloading model snapshot %s from the HF hub", s)
        try:
            return Path(snapshot_download(
                repo_id=s,
                allow_patterns=[
                    "*.safetensors", "*.json", "*.gguf",
                    "tokenizer.model", "*.txt",
                ],
            ))
        except Exception as e:
            # a typo'd RELATIVE local path (e.g. "models/llama-3b") also
            # looks like a repo id; name both interpretations instead of
            # surfacing a bare hub error
            raise FileNotFoundError(
                f"{s!r} is neither an existing local path nor a "
                f"downloadable HF hub repo id ({type(e).__name__}: {e})"
            ) from e
    raise FileNotFoundError(f"model path {s} does not exist")


def load_model(
    model_path: str | Path,
    dtype=jnp.bfloat16,
    quantization: Optional[QuantizationConfig] = None,
):
    """Load (model, params) from a local HF-style snapshot directory or an
    HF-hub repo id (downloaded via resolve_model_path).

    If the config has a "quantization" block, or `quantization` is passed,
    linear weights are group-wise quantized on load.
    """
    model_path = resolve_model_path(model_path)
    # GGUF fallback (reference load order src/models/model_utils.cpp:108-126:
    # sharded safetensors -> single safetensors -> gguf)
    gguf_file = None
    if model_path.suffix == ".gguf":
        gguf_file = model_path
    elif model_path.is_dir() and not any(model_path.glob("*.safetensors")):
        ggufs = sorted(model_path.glob("*.gguf"))
        gguf_file = ggufs[0] if ggufs else None
    if gguf_file is not None:
        from pie_tpu.models.gguf import load_gguf_model

        model, params = load_gguf_model(gguf_file, dtype=dtype)
        if quantization is not None:
            params = model.quantize_params(
                params, quantization.group_size, quantization.bits
            )
        return model, params
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


# ---------------------------------------------------------------------------
# params (de)serialization — quantized checkpoints
# ---------------------------------------------------------------------------


def save_params(params: dict, path: str | Path):
    """Persist a params pytree (dense or quantized) to safetensors +
    a sidecar JSON describing structure (QuantizedTensor leaves carry
    bits/group_size/shape metadata)."""
    import jax

    from pie_tpu.ops.quant import QuantizedTensor

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tensors: dict[str, np.ndarray] = {}
    spec: dict[str, Any] = {}

    def visit(prefix: str, node):
        if isinstance(node, QuantizedTensor):
            spec[prefix] = {
                "kind": "quantized",
                "bits": node.bits,
                "group_size": node.group_size,
                "shape": list(node.shape),
            }
            for f in ("packed", "scales", "biases"):
                arr = getattr(node, f)
                key = f"{prefix}.{f}"
                tensors[key] = _to_np(arr, spec, key)
        elif isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}.{k}" if prefix else k, v)
        else:
            spec[prefix] = {"kind": "array"}
            tensors[prefix] = _to_np(node, spec, prefix)

    visit("", params)
    from safetensors.numpy import save_file

    save_file(tensors, str(path), metadata={"pie": json.dumps(spec)})


def _to_np(arr, spec, key):
    import jax.numpy as jnp

    a = np.asarray(arr.astype(jnp.float32) if arr.dtype == jnp.bfloat16 else arr)
    if arr.dtype == jnp.bfloat16:
        spec.setdefault("__bf16__", []).append(key)
    return a


def load_params(path: str | Path) -> dict:
    import jax.numpy as jnp
    from safetensors import safe_open
    from safetensors.numpy import load_file

    from pie_tpu.ops.quant import QuantizedTensor

    with safe_open(str(path), framework="np") as f:
        spec = json.loads((f.metadata() or {}).get("pie", "{}"))
    data = load_file(str(path))
    bf16 = set(spec.pop("__bf16__", []))

    def as_jnp(key):
        arr = jnp.asarray(data[key])
        return arr.astype(jnp.bfloat16) if key in bf16 else arr

    out: dict = {}
    for key, info in spec.items():
        parts = key.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        leaf = parts[-1]
        if info["kind"] == "quantized":
            node[leaf] = QuantizedTensor(
                packed=as_jnp(f"{key}.packed"),
                scales=as_jnp(f"{key}.scales"),
                biases=as_jnp(f"{key}.biases"),
                bits=info["bits"],
                group_size=info["group_size"],
                shape=tuple(info["shape"]),
            )
        else:
            node[leaf] = as_jnp(key)
    return out

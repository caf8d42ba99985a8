"""Numerical parity of the pie_tpu Llama decoder vs HuggingFace transformers
(torch CPU) on identical random weights — the strongest correctness anchor we
can run hermetically (SURVEY.md §4 test-pyramid item (b))."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pie_tpu.cache.kv_cache import KVCache, QuantizedKVCache
from pie_tpu.models.llama import LlamaConfig, LlamaModel

TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    vocab_size=256,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    max_position_embeddings=128,
    tie_word_embeddings=False,
)


def _build_hf(config_extra=None):
    cfg = dict(TINY, **(config_extra or {}))
    hf_cfg = transformers.LlamaConfig(**cfg, attention_bias=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg)
    model.eval()
    return model, cfg


def _state_dict_numpy(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


def _make_cache(model, b, s, dtype=jnp.float32, quantized=False):
    cfg = model.config
    cls = QuantizedKVCache if quantized else KVCache
    return cls.create(
        cfg.num_hidden_layers, b, s, cfg.num_key_value_heads,
        cfg.resolved_head_dim, dtype,
    )


def _forward(model, params, ids, cache, first_pos):
    b, t = ids.shape
    positions = first_pos[:, None] + jnp.arange(t)[None, :]
    cache = cache.advance(first_pos, t)
    logits, cache = model(params, jnp.asarray(ids), cache, positions)
    return logits, cache


@pytest.mark.parametrize("rope_scaling", [None, {
    "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
    "high_freq_factor": 4.0, "original_max_position_embeddings": 32,
}])
def test_logits_match_hf(rope_scaling):
    extra = {"rope_scaling": rope_scaling} if rope_scaling else {}
    hf_model, cfg = _build_hf(extra)
    sd = _state_dict_numpy(hf_model)

    config = LlamaConfig.from_dict(dict(cfg, model_type="llama"))
    model = LlamaModel(config)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)

    b, t, s = 2, 10, 16
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg["vocab_size"], (b, t))

    with torch.no_grad():
        hf_logits = hf_model(torch.tensor(ids)).logits.numpy()

    cache = _make_cache(model, b, s)
    logits, _ = _forward(model, params, ids, cache, jnp.zeros((b,), jnp.int32))
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3, rtol=2e-3)


def test_incremental_decode_matches_full_forward():
    """Prefill + per-token decode must equal a single full forward pass."""
    hf_model, cfg = _build_hf()
    sd = _state_dict_numpy(hf_model)
    config = LlamaConfig.from_dict(dict(cfg, model_type="llama"))
    model = LlamaModel(config)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)

    b, t, s = 1, 12, 16
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg["vocab_size"], (b, t))

    full_logits, _ = _forward(
        model, params, ids, _make_cache(model, b, s), jnp.zeros((b,), jnp.int32)
    )

    cache = _make_cache(model, b, s)
    p = 6
    logits_p, cache = _forward(
        model, params, ids[:, :p], cache, jnp.zeros((b,), jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full_logits[:, :p]), atol=2e-4, rtol=2e-4
    )
    for i in range(p, t):
        step_logits, cache = _forward(
            model, params, ids[:, i : i + 1], cache, jnp.full((b,), i, jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, i]),
            atol=2e-4, rtol=2e-4,
        )


def test_quantized_weights_close():
    """INT8 g=32 quantized weights stay close to dense logits."""
    hf_model, cfg = _build_hf()
    sd = _state_dict_numpy(hf_model)
    config = LlamaConfig.from_dict(dict(cfg, model_type="llama"))
    model = LlamaModel(config)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)
    qparams = model.quantize_params(params, group_size=32, bits=8)

    b, t, s = 1, 8, 8
    ids = np.random.default_rng(2).integers(0, cfg["vocab_size"], (b, t))
    dense_logits, _ = _forward(
        model, params, ids, _make_cache(model, b, s), jnp.zeros((b,), jnp.int32)
    )
    q_logits, _ = _forward(
        model, qparams, ids, _make_cache(model, b, s), jnp.zeros((b,), jnp.int32)
    )
    dense_top = np.argmax(np.asarray(dense_logits), -1)
    q_top = np.argmax(np.asarray(q_logits), -1)
    assert (dense_top == q_top).mean() >= 0.7


def test_quantized_kv_cache_close():
    """INT8 KV cache keeps decode logits close to the fp cache."""
    hf_model, cfg = _build_hf()
    sd = _state_dict_numpy(hf_model)
    config = LlamaConfig.from_dict(dict(cfg, model_type="llama"))
    model = LlamaModel(config)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)

    b, t, s = 1, 8, 8
    ids = np.random.default_rng(3).integers(0, cfg["vocab_size"], (b, t))
    fp_logits, _ = _forward(
        model, params, ids, _make_cache(model, b, s), jnp.zeros((b,), jnp.int32)
    )
    q_logits, _ = _forward(
        model, params, ids, _make_cache(model, b, s, quantized=True),
        jnp.zeros((b,), jnp.int32),
    )
    assert (
        np.argmax(np.asarray(fp_logits), -1) == np.argmax(np.asarray(q_logits), -1)
    ).mean() >= 0.7


def test_rotating_cache_matches_windowed_attention():
    """A rotating cache at capacity == window must reproduce sliding-window
    attention (reference cache/kv_cache/rotating.py semantics)."""
    hf_model, cfg = _build_hf()
    sd = _state_dict_numpy(hf_model)
    config = LlamaConfig.from_dict(dict(cfg, model_type="llama"))
    model = LlamaModel(config)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)

    b, t, w = 1, 10, 4
    ids = np.random.default_rng(4).integers(0, cfg["vocab_size"], (b, t))

    # Ground truth: LARGE-capacity cache with the window MASK (no slot
    # reuse). The rotating cache (capacity == window) must match it exactly:
    # rotation only changes storage, not attention semantics.
    big = KVCache.create(
        config.num_hidden_layers, b, 16, config.num_key_value_heads,
        config.resolved_head_dim, jnp.float32, window=w,
    )
    rot = KVCache.create(
        config.num_hidden_layers, b, w, config.num_key_value_heads,
        config.resolved_head_dim, jnp.float32, window=w,
    )
    for i in range(t):
        chunk = ids[:, i : i + 1]
        pos = jnp.full((b,), i, jnp.int32)
        big_logits, big = _forward(model, params, chunk, big, pos)
        rot_logits, rot = _forward(model, params, chunk, rot, pos)
        np.testing.assert_allclose(
            np.asarray(rot_logits[:, 0]), np.asarray(big_logits[:, 0]),
            atol=3e-4, rtol=3e-4,
        )

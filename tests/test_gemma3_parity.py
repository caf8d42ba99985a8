"""Gemma-3 text decoder parity vs HF transformers on random weights
(sliding/global layer pattern, dual RoPE, q/k norms, 4-norm blocks)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow  # heavy torch-parity suite (fast path: -m "not slow")
pytest.importorskip("transformers.models.gemma3")

from pie_tpu.cache.kv_cache import KVCache
from pie_tpu.models.gemma3 import Gemma3Config, Gemma3Model

TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=7,  # includes one global layer (pattern 6)
    num_attention_heads=4,
    num_key_value_heads=2,
    head_dim=16,
    vocab_size=256,
    rms_norm_eps=1e-6,
    rope_theta=1000000.0,
    rope_local_base_freq=10000.0,
    sliding_window=8,
    sliding_window_pattern=6,
    query_pre_attn_scalar=16,
    max_position_embeddings=128,
    attention_bias=False,
)


@pytest.fixture(scope="module")
def setup():
    hf_cfg = transformers.Gemma3TextConfig(**TINY)
    torch.manual_seed(0)
    hf = transformers.Gemma3ForCausalLM(hf_cfg)
    hf.eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    cfg = Gemma3Config.from_dict(dict(TINY, model_type="gemma3_text"))
    model = Gemma3Model(cfg)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)
    return hf, model, params


def _make_cache(model, b, s):
    cfg = model.config
    return KVCache.create(
        cfg.num_hidden_layers, b, s, cfg.num_key_value_heads, cfg.head_dim,
        jnp.float32,
    )


def _forward(model, params, ids, cache, first_pos):
    b, t = ids.shape
    positions = first_pos[:, None] + jnp.arange(t)[None, :]
    cache = cache.advance(first_pos, t)
    return model(params, jnp.asarray(ids), cache, positions)


def test_logits_match_hf(setup):
    hf, model, params = setup
    b, t = 2, 12  # > sliding_window 8 so window masking is exercised
    ids = np.random.default_rng(0).integers(0, 256, (b, t))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    logits, _ = _forward(
        model, params, ids, _make_cache(model, b, 32),
        jnp.zeros((b,), jnp.int32),
    )
    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, atol=3e-3, rtol=3e-3
    )


def test_incremental_matches_full(setup):
    _, model, params = setup
    b, t = 1, 14
    ids = np.random.default_rng(1).integers(0, 256, (b, t))
    full, _ = _forward(
        model, params, ids, _make_cache(model, b, 32),
        jnp.zeros((b,), jnp.int32),
    )
    cache = _make_cache(model, b, 32)
    logits_p, cache = _forward(
        model, params, ids[:, :6], cache, jnp.zeros((b,), jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(logits_p), np.asarray(full[:, :6]), atol=3e-4, rtol=3e-4
    )
    for i in range(6, t):
        step, cache = _forward(
            model, params, ids[:, i : i + 1], cache,
            jnp.full((b,), i, jnp.int32),
        )
        np.testing.assert_allclose(
            np.asarray(step[:, 0]), np.asarray(full[:, i]),
            atol=3e-4, rtol=3e-4,
        )


VLM_TINY = dict(
    text_config=dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=270, rope_theta=1000000.0, rope_local_base_freq=10000.0,
        sliding_window=8, sliding_window_pattern=2, query_pre_attn_scalar=16,
        max_position_embeddings=128,
    ),
    vision_config=dict(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        num_channels=3,
    ),
    mm_tokens_per_image=4,
    image_token_index=260,
    boi_token_index=258,
    eoi_token_index=259,
)


def test_vlm_image_forward_matches_hf():
    hf_cfg = transformers.Gemma3Config(**VLM_TINY)
    torch.manual_seed(0)
    hf = transformers.Gemma3ForConditionalGeneration(hf_cfg)
    hf.eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    cfg = Gemma3Config.from_dict(
        {**VLM_TINY, "model_type": "gemma3", "tie_word_embeddings": True}
    )
    model = Gemma3Model(cfg)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    pixels = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    # prompt with 4 image-token placeholders
    ids = np.array([[5, 7, 260, 260, 260, 260, 9, 11]], np.int32)
    with torch.no_grad():
        hf_logits = hf(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixels),
        ).logits.numpy()
    logits, _ = _vlm_forward(model, params, ids, pixels)
    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, atol=5e-3, rtol=5e-3
    )


def _vlm_forward(model, params, ids, pixels):
    b, t = ids.shape
    cache = _make_cache(model, b, 32)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    cache = cache.advance(jnp.zeros((b,), jnp.int32), t)
    return model(
        params, jnp.asarray(ids), cache, positions,
        pixel_values=jnp.asarray(pixels),
    )

"""Qwen2-VL parity vs HF transformers: text decoder with M-RoPE, vision
tower + merger, image scatter."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow  # heavy torch-parity suite (fast path: -m "not slow")
pytest.importorskip("transformers.models.qwen2_vl")

from pie_tpu.cache.kv_cache import KVCache
from pie_tpu.models.qwen2_vl import (
    Qwen2VLConfig,
    Qwen2VLModel,
    mrope_positions,
    text_positions3,
)

VLM_TINY = dict(
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    vocab_size=300,
    rms_norm_eps=1e-6,
    rope_theta=1000000.0,
    max_position_embeddings=256,
    tie_word_embeddings=False,
    rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
    image_token_id=290,
    video_token_id=291,
    vision_start_token_id=292,
    vision_end_token_id=293,
    vision_config=dict(
        depth=2,
        embed_dim=32,
        num_heads=4,
        hidden_size=64,
        in_channels=3,
        patch_size=4,
        temporal_patch_size=2,
        spatial_merge_size=2,
        mlp_ratio=2,
    ),
)


@pytest.fixture(scope="module")
def setup():
    hf_cfg = transformers.Qwen2VLConfig(**VLM_TINY)
    torch.manual_seed(0)
    hf = transformers.Qwen2VLForConditionalGeneration(hf_cfg)
    hf.eval()
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    cfg = Qwen2VLConfig.from_dict(dict(VLM_TINY, model_type="qwen2_vl"))
    model = Qwen2VLModel(cfg)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)
    return hf, model, params


def _make_cache(model, b, s):
    cfg = model.config
    return KVCache.create(
        cfg.num_hidden_layers, b, s, cfg.num_key_value_heads,
        cfg.resolved_head_dim, jnp.float32,
    )


def test_text_logits_match_hf(setup):
    hf, model, params = setup
    b, t = 2, 10
    ids = np.random.default_rng(0).integers(0, 280, (b, t))
    with torch.no_grad():
        hf_logits = hf(torch.tensor(ids)).logits.numpy()
    cache = _make_cache(model, b, 16).advance(jnp.zeros((b,), jnp.int32), t)
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    logits, _ = model(params, jnp.asarray(ids), cache, positions)
    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, atol=3e-3, rtol=3e-3
    )


def test_vlm_image_forward_matches_hf(setup):
    hf, model, params = setup
    # one 8x8 image, patch 4 -> grid (1, 2, 2)?? with temporal 2 and
    # merge 2: grid_thw=(1,4,4) => 16 patches -> 4 merged tokens
    grid_thw = np.array([[1, 4, 4]])
    n_patches = 16
    pdim = 3 * 2 * 4 * 4
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((n_patches, pdim)).astype(np.float32)
    ids = np.array([[5, 292, 290, 290, 290, 290, 293, 9]], np.int64)
    with torch.no_grad():
        hf_logits = hf(
            input_ids=torch.tensor(ids),
            pixel_values=torch.tensor(pixels),
            image_grid_thw=torch.tensor(grid_thw),
        ).logits.numpy()
    b, t = ids.shape
    cache = _make_cache(model, b, 16).advance(jnp.zeros((b,), jnp.int32), t)
    pos3 = jnp.asarray(
        mrope_positions(ids, model.config.image_token_id, grid_thw)
    )
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    logits, _ = model(
        params, jnp.asarray(ids), cache, positions,
        pixel_values=jnp.asarray(pixels), grid_thw=grid_thw,
        positions3=pos3,
    )
    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, atol=5e-3, rtol=5e-3
    )

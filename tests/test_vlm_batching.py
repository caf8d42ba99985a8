"""VLM continuous batching (round-2 verdict weak #7): a gemma-3 image
request rides the scheduler's prefill rider as precomputed vision-tower
embeddings and decodes ALONGSIDE text lanes, matching the single-stream
engine's output. Reference: models/gemma/ensemble.py:108-157 scatter +
include/engine/batch_details.hpp flat-batch design."""

import dataclasses
import threading

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
pytest.importorskip("transformers.models.gemma3")

from pie_tpu.engine import InferenceEngine
from pie_tpu.engine.async_engine import BatchedInferenceEngine
from pie_tpu.models.gemma3 import Gemma3Config, Gemma3Model

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
        num_attention_heads=4, image_size=56, patch_size=14, num_channels=3,
    ),
    mm_tokens_per_image=4,
    image_token_index=260,
    boi_token_index=258,
    eoi_token_index=259,
)


@pytest.fixture(scope="module")
def engines():
    hf_cfg = transformers.Gemma3Config(**VLM_TINY)
    torch.manual_seed(0)
    hf = transformers.Gemma3ForConditionalGeneration(hf_cfg)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    cfg = Gemma3Config.from_dict(
        {**VLM_TINY, "model_type": "gemma3", "tie_word_embeddings": True}
    )
    model = Gemma3Model(cfg)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)
    single = InferenceEngine(
        model=model, params=params, max_seq_len=64, kv_dtype=jnp.float32,
        decode_chunk=4, prompt_cache=False,
    )
    batched = BatchedInferenceEngine(
        model=model, params=params, num_lanes=4, num_pages=32,
        max_pages_per_seq=8, prefill_chunk=16,
    )
    batched.core.pool = dataclasses.replace(
        batched.core.pool,
        k=batched.core.pool.k.astype(jnp.float32),
        v=batched.core.pool.v.astype(jnp.float32),
    )
    yield single, batched
    batched.shutdown()


def _image_prompt():
    """Prompt with image placeholder run + pixels (4 tokens per image)."""
    img_tok = VLM_TINY["image_token_index"]
    prompt = [2, 258] + [img_tok] * 4 + [259, 7, 9, 11]
    rng = np.random.default_rng(3)
    pixels = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)
    return prompt, pixels


def test_vlm_decodes_alongside_text_lanes(engines):
    single, batched = engines
    prompt, pixels = _image_prompt()

    want = single.generate(
        prompt, max_completion_tokens=6, temperature=0.0,
        pixel_values=pixels,
    )
    want_text_a = single.generate(
        [5, 6, 7], max_completion_tokens=6, temperature=0.0
    )
    # reset the single engine's cache state between requests is implicit
    # (fresh prefill from position 0); batched runs all three CONCURRENTLY
    results = {}

    def vlm():
        results["img"] = batched.generate(
            prompt, max_completion_tokens=6, temperature=0.0,
            pixel_values=pixels,
        )

    def text(i):
        results[f"t{i}"] = batched.generate(
            [5, 6, 7], max_completion_tokens=6, temperature=0.0
        )

    threads = [threading.Thread(target=vlm)] + [
        threading.Thread(target=text, args=(i,)) for i in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)

    assert results["img"].token_ids == want.token_ids
    for i in range(2):
        assert results[f"t{i}"].token_ids == want_text_a.token_ids


def test_text_only_gemma3_batched_matches_single(engines):
    """Gemma-3's mixed_forward (sliding-window paged attention) matches the
    single-stream dual-cache engine on text-only prompts long enough to
    cross the window."""
    single, batched = engines
    prompt = list(range(1, 15))  # > sliding_window=8
    want = single.generate(prompt, max_completion_tokens=8, temperature=0.0)
    got = batched.generate(prompt, max_completion_tokens=8, temperature=0.0)
    assert got.token_ids == want.token_ids


def test_gemma3_long_prompt_direct_prefill(engines):
    """A prompt body >32 tokens routes through the scheduler's DIRECT
    prefill (dedicated paged_forward prefill program with dual
    full/window masks) instead of rider slices; tokens must match the
    single-stream dual-cache engine."""
    single, batched = engines
    prompt = list(range(1, 41))  # 40 tokens > direct-prefill threshold 32
    want = single.generate(prompt, max_completion_tokens=8, temperature=0.0)
    got = batched.generate(prompt, max_completion_tokens=8, temperature=0.0)
    assert got.token_ids == want.token_ids, (got.token_ids, want.token_ids)

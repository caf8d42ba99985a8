"""Prompt cache: prefix reuse correctness + disk persistence round-trip."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from pie_tpu.cache.kv_cache import KVCache, QuantizedKVCache
from pie_tpu.cache.prompt_cache import (
    PromptCache,
    common_prefix_len,
    load_cache,
    save_cache,
)
from pie_tpu.engine import InferenceEngine
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
    max_position_embeddings=256,
    tie_word_embeddings=False,
)


def test_common_prefix():
    assert common_prefix_len([1, 2, 3], [1, 2, 4]) == 2
    assert common_prefix_len([1, 2], [1, 2, 3]) == 2
    assert common_prefix_len([], [1]) == 0


def test_reuse_prefix_leaves_one_token():
    pc = PromptCache()
    pc.update([1, 2, 3, 4])
    assert pc.reuse_prefix([1, 2, 3, 4]) == 3  # full match: re-run last
    assert pc.reuse_prefix([1, 2, 9]) == 2
    assert pc.reuse_prefix([7, 8]) == 0


def test_engine_prefix_reuse_matches_cold(tmp_path):
    hf_cfg = transformers.LlamaConfig(**TINY, attention_bias=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    config = LlamaConfig.from_dict(dict(TINY, model_type="llama"))
    model = LlamaModel(config)
    params = model.from_hf_state_dict(sd, dtype=jnp.float32)

    cold = InferenceEngine(
        model=model, params=params, max_seq_len=128, kv_dtype=jnp.float32,
        decode_chunk=4, prompt_cache=False,
    )
    warm = InferenceEngine(
        model=model, params=params, max_seq_len=128, kv_dtype=jnp.float32,
        decode_chunk=4, prompt_cache=True,
    )
    base = [3, 1, 4, 1, 5, 9, 2, 6]
    r1_cold = cold.generate(base, max_completion_tokens=6, temperature=0.0)
    r1_warm = warm.generate(base, max_completion_tokens=6, temperature=0.0)
    assert r1_cold.token_ids == r1_warm.token_ids

    # extended prompt sharing the prefix: warm engine prefills only suffix
    ext = base + [7, 7]
    r2_cold = cold.generate(ext, max_completion_tokens=6, temperature=0.0)
    assert warm.prompt_cache.reuse_prefix(ext) == len(base)
    r2_warm = warm.generate(ext, max_completion_tokens=6, temperature=0.0)
    assert r2_cold.token_ids == r2_warm.token_ids

    # divergent prompt invalidates reuse
    div = [9, 9, 9]
    r3_cold = cold.generate(div, max_completion_tokens=4, temperature=0.0)
    r3_warm = warm.generate(div, max_completion_tokens=4, temperature=0.0)
    assert r3_cold.token_ids == r3_warm.token_ids


@pytest.mark.parametrize("quantized", [False, True])
def test_cache_save_load_roundtrip(tmp_path, quantized):
    cls = QuantizedKVCache if quantized else KVCache
    cache = cls.create(2, 1, 16, 2, 8, jnp.bfloat16, window=None)
    cache = cache.advance(jnp.zeros((1,), jnp.int32), 5)
    path = tmp_path / "c.safetensors"
    save_cache(cache, path, extra_meta={"computed_ids": [1, 2, 3]})
    loaded, meta = load_cache(path)
    assert type(loaded) is cls
    assert meta["computed_ids"] == [1, 2, 3]
    np.testing.assert_array_equal(
        np.asarray(loaded.slot_positions), np.asarray(cache.slot_positions)
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.length), np.asarray(cache.length)
    )


def test_prompt_cache_disk(tmp_path):
    pc = PromptCache(cache_dir=tmp_path)
    cache = KVCache.create(2, 1, 16, 2, 8, jnp.float32)
    ids = [1, 2, 3]
    pc.save_prompt(ids, cache)
    hit = pc.load_prompt(ids)
    assert hit is not None
    loaded, computed = hit
    assert computed == ids
    assert pc.load_prompt([4, 5]) is None


def _tiny_engine(**kw):
    config = LlamaConfig.from_dict(dict(TINY, model_type="llama"))
    model = LlamaModel(config)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    return model, params, InferenceEngine(
        model=model, params=params, max_seq_len=128, kv_dtype=jnp.float32,
        decode_chunk=4, **kw,
    )


def test_cache_prompt_disk_through_engine(tmp_path):
    """engine.cache_prompt persists KV; a FRESH engine restores it from disk
    during generate and prefills only the last token (reference
    cache_prompt -> load_cached_prompt flow, cache/prompt_cache.py:78-125)."""
    model, params, eng = _tiny_engine(prompt_cache_dir=tmp_path)
    prompt = [5, 7, 11, 13, 17, 19]
    path = eng.cache_prompt(prompt)
    assert path is not None and path.exists()
    ref = eng.generate(prompt, max_completion_tokens=8, temperature=0.0)

    fresh = InferenceEngine(
        model=model, params=params, max_seq_len=128, kv_dtype=jnp.float32,
        decode_chunk=4, prompt_cache_dir=tmp_path,
    )
    calls = {"n": 0, "slens": []}
    orig = fresh.core._prefill

    def counting(params_, state, ids, lens, first_pos, *a, **kw):
        calls["n"] += 1
        calls["slens"].append(int(np.asarray(lens)[0]))
        return orig(params_, state, ids, lens, first_pos, *a, **kw)

    fresh.core._prefill = counting
    try:
        res = fresh.generate(prompt, max_completion_tokens=8, temperature=0.0)
    finally:
        fresh.core._prefill = orig
    # disk hit: only the final prompt token is re-prefetched
    assert calls["slens"] == [1]
    assert res.token_ids == ref.token_ids


def test_kv_quantize_threshold_through_engine():
    """The contiguous cache converts to INT8 once a request crosses the
    threshold (reference maybe_quantize, cache/kv_cache/__init__.py:241-265)."""
    _, _, eng = _tiny_engine(prompt_cache=False, kv_quantize_threshold=10)
    assert isinstance(eng.state.cache, KVCache)
    eng.generate(list(range(1, 16)), max_completion_tokens=4, temperature=0.0)
    # threshold crossed during that request; conversion happens on the next
    eng.generate([1, 2, 3], max_completion_tokens=2, temperature=0.0)
    assert isinstance(eng.state.cache, QuantizedKVCache)


def test_hub_resolve_monkeypatched(tmp_path, monkeypatch):
    """Non-local org/name paths route through huggingface_hub
    snapshot_download (reference models/utils.py:164-198)."""
    from pie_tpu.models import loader as loader_mod

    local = tmp_path / "snap"
    local.mkdir()
    seen = {}

    def fake_snapshot_download(repo_id, **kw):
        seen["repo"] = repo_id
        return str(local)

    import huggingface_hub

    monkeypatch.setattr(
        huggingface_hub, "snapshot_download", fake_snapshot_download
    )
    out = loader_mod.resolve_model_path("org/model-name")
    assert out == local and seen["repo"] == "org/model-name"
    # local paths pass through untouched; junk raises
    assert loader_mod.resolve_model_path(tmp_path) == tmp_path
    with pytest.raises(FileNotFoundError):
        loader_mod.resolve_model_path("/definitely/not/here")

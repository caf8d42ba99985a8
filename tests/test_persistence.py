"""Quantized checkpoint save/load round-trip + metrics rendering."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pie_tpu.models.llama import LlamaConfig, LlamaModel
from pie_tpu.models.loader import load_params, save_params
from pie_tpu.utils.metrics import Metrics


def test_quantized_params_roundtrip(tmp_path):
    config = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        tie_word_embeddings=False,
    )
    model = LlamaModel(config)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    qparams = model.quantize_params(params, group_size=32, bits=8)
    path = tmp_path / "ckpt.safetensors"
    save_params(qparams, path)
    loaded = load_params(path)

    flat1 = jax.tree_util.tree_leaves_with_path(qparams)
    flat2 = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(flat1) == len(flat2)
    for (p1, l1), (p2, l2) in zip(sorted(flat1, key=lambda x: str(x[0])),
                                  sorted(flat2, key=lambda x: str(x[0]))):
        assert l1.shape == l2.shape, p1
        np.testing.assert_array_equal(
            np.asarray(l1.astype(jnp.float32)),
            np.asarray(l2.astype(jnp.float32)),
        )

    # loaded params drive the model identically
    from pie_tpu.cache.kv_cache import KVCache

    cache = KVCache.create(2, 1, 8, 2, 16, jnp.float32)
    ids = jnp.asarray([[1, 2, 3]])
    pos = jnp.asarray([[0, 1, 2]])
    c1 = cache.advance(jnp.zeros((1,), jnp.int32), 3)
    y1, _ = model(qparams, ids, c1, pos)
    c2 = KVCache.create(2, 1, 8, 2, 16, jnp.float32).advance(
        jnp.zeros((1,), jnp.int32), 3
    )
    y2, _ = model(loaded, ids, c2, pos)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_metrics_render():
    m = Metrics()
    m.record_request(10, 5, ttft=0.02, latency=0.5)
    m.record_request(3, 1, ttft=None, latency=0.1, error=True)
    text = m.render()
    assert "pie_requests_total 2" in text
    assert "pie_request_errors_total 1" in text
    assert "pie_prompt_tokens_total 13" in text
    assert "pie_ttft_seconds_count 1" in text
    assert 'pie_request_seconds_bucket{le="0.5"} 2' in text

"""PPL-harness self-tests on a tiny random model (the harness itself is the
charter's quality gate, SURVEY.md §6; checkpoint-scale runs happen via
scripts/ppl.py on real weights)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pie_tpu.models.llama import LlamaConfig, LlamaModel

import importlib.util
import pathlib

_spec = importlib.util.spec_from_file_location(
    "ppl", pathlib.Path(__file__).parent.parent / "scripts" / "ppl.py"
)
ppl_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ppl_mod)

TINY = dict(
    model_type="llama",
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    vocab_size=256,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def tiny():
    config = LlamaConfig.from_dict(TINY)
    model = LlamaModel(config)
    params = model.init_params(jax.random.PRNGKey(0), dtype=jnp.float32)
    return model, params


def test_ppl_matches_direct_crossentropy(tiny):
    """compute_ppl over one window == exp(mean nll) computed by hand."""
    model, params = tiny
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 250, size=33).astype(np.int64)

    got = ppl_mod.compute_ppl(model, params, ids, seq_len=33)

    from pie_tpu.cache.kv_cache import make_kv_cache

    cfg = model.config
    t = len(ids)
    cache = make_kv_cache(
        cfg.num_hidden_layers, 1, t, cfg.num_key_value_heads,
        cfg.resolved_head_dim, dtype=jnp.bfloat16,
    ).advance(jnp.zeros((1,), jnp.int32), t)
    logits, _ = model(
        params, jnp.asarray(ids, jnp.int32)[None],
        cache, jnp.arange(t)[None],
    )
    logp = jax.nn.log_softmax(np.asarray(logits[0, :-1], np.float64), axis=-1)
    nll = -logp[np.arange(t - 1), ids[1:]]
    want = float(np.exp(nll.mean()))
    assert got == pytest.approx(want, rel=1e-4)


def test_ppl_windows_consistent(tiny):
    """Multi-window PPL aggregates nll/count across windows."""
    model, params = tiny
    rng = np.random.default_rng(1)
    ids = rng.integers(1, 250, size=64).astype(np.int64)
    full = ppl_mod.compute_ppl(model, params, ids, seq_len=16)
    assert np.isfinite(full) and full > 1.0


def test_quantized_ppl_close_and_ordered(tiny):
    """INT8 PPL is close to bf16 PPL; INT4 degrades more than INT8."""
    model, params = tiny
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 250, size=128).astype(np.int64)
    p_bf16 = ppl_mod.compute_ppl(model, params, ids, seq_len=64)
    q8 = ppl_mod.quantize_variant(model, params, "int8")
    p_int8 = ppl_mod.compute_ppl(model, q8, ids, seq_len=64)
    # random tiny models have no redundancy, so tolerances are loose — the
    # point is the machinery, not the value
    assert abs(p_int8 - p_bf16) / p_bf16 < 0.05


def test_mlx_layout_roundtrip_identical_ppl(tiny):
    """INT4 via the reference's MLX packing gives the SAME codes (bit-exact
    interchange) and matching perplexity vs our direct quantize_params
    (charter interchange check; reference models/utils.py:95-111
    quantization semantics). Scales round differently by one f32 ulp
    between the two pipelines, so PPL gets a small relative tolerance."""
    model, params = tiny
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 250, size=96).astype(np.int64)
    q_direct = model.quantize_params(params, 64, 4, fuse_projections=False)
    q_mlx = ppl_mod.mlx_roundtrip_params(model, params, 64, 4)
    for name in model.LINEAR_KEYS:
        np.testing.assert_array_equal(
            np.asarray(q_direct["layers"][name].packed),
            np.asarray(q_mlx["layers"][name].packed),
        )
    p_direct = ppl_mod.compute_ppl(model, q_direct, ids, seq_len=48)
    p_mlx = ppl_mod.compute_ppl(model, q_mlx, ids, seq_len=48)
    assert p_mlx == pytest.approx(p_direct, rel=1e-3)

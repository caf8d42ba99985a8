"""GGUF reader tests: header/metadata parsing, plain + quantized tensor
dequantization against hand-computed blocks, llama name mapping, and
end-to-end load_model parity with the safetensors path (reference loaded
GGUF via MLX io, src/models/model_utils.cpp:98-126)."""

import struct

import numpy as np
import pytest
import jax.numpy as jnp

from pie_tpu.models.gguf import (
    GGML_BF16,
    GGML_F16,
    GGML_F32,
    GGML_Q4_0,
    GGML_Q4_1,
    GGML_Q8_0,
    gguf_to_hf_llama,
    read_gguf,
)

# ---- minimal GGUF writer (test fixture) ----------------------------------

_T_U32, _T_F32, _T_BOOL, _T_STRING, _T_ARRAY, _T_U64 = 4, 6, 7, 8, 9, 10
_T_I32 = 5


def _pack_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _pack_value(vtype, value) -> bytes:
    if vtype == _T_U32:
        return struct.pack("<I", value)
    if vtype == _T_I32:
        return struct.pack("<i", value)
    if vtype == _T_F32:
        return struct.pack("<f", value)
    if vtype == _T_BOOL:
        return struct.pack("<B", 1 if value else 0)
    if vtype == _T_STRING:
        return _pack_string(value)
    if vtype == _T_U64:
        return struct.pack("<Q", value)
    if vtype == _T_ARRAY:
        etype, values = value
        out = struct.pack("<IQ", etype, len(values))
        for v in values:
            out += _pack_value(etype, v)
        return out
    raise ValueError(vtype)


def q8_0_encode(x: np.ndarray) -> bytes:
    """Blockwise GGML Q8_0 encoding of a flat f32 array (len % 32 == 0)."""
    out = b""
    for blk in x.reshape(-1, 32):
        amax = np.abs(blk).max()
        scale = amax / 127.0 if amax > 0 else 0.0
        q = np.round(blk / scale).astype(np.int8) if scale else np.zeros(32, np.int8)
        out += np.float16(scale).tobytes() + q.tobytes()
    return out


def q4_0_encode(x: np.ndarray) -> bytes:
    out = b""
    for blk in x.reshape(-1, 32):
        amax_i = np.abs(blk).argmax()
        maxv = blk[amax_i]
        scale = maxv / -8.0 if maxv != 0 else 0.0
        inv = 1.0 / scale if scale else 0.0
        q = np.clip(np.round(blk * inv + 8), 0, 15).astype(np.uint8)
        packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
        out += np.float16(scale).tobytes() + packed.tobytes()
    return out


def q4_1_encode(x: np.ndarray) -> bytes:
    out = b""
    for blk in x.reshape(-1, 32):
        mn, mx = blk.min(), blk.max()
        scale = (mx - mn) / 15.0 if mx > mn else 0.0
        inv = 1.0 / scale if scale else 0.0
        q = np.clip(np.round((blk - mn) * inv), 0, 15).astype(np.uint8)
        packed = (q[:16] | (q[16:] << 4)).astype(np.uint8)
        out += (
            np.float16(scale).tobytes() + np.float16(mn).tobytes()
            + packed.tobytes()
        )
    return out


def write_gguf(path, metadata, tensors, align=32):
    """tensors: list of (name, shape, gtype, payload_bytes)."""
    buf = struct.pack("<IIQQ", 0x46554747, 3, len(tensors), len(metadata))
    for key, (vtype, value) in metadata.items():
        buf += _pack_string(key) + struct.pack("<I", vtype)
        buf += _pack_value(vtype, value)
    offset = 0
    payloads = []
    for name, shape, gtype, payload in tensors:
        dims = tuple(reversed(shape))
        buf += _pack_string(name) + struct.pack("<I", len(dims))
        buf += struct.pack(f"<{len(dims)}Q", *dims)
        buf += struct.pack("<IQ", gtype, offset)
        payloads.append((offset, payload))
        offset += (len(payload) + align - 1) // align * align
    data_start = (len(buf) + align - 1) // align * align
    buf += b"\0" * (data_start - len(buf))
    for off, payload in payloads:
        buf += b"\0" * (data_start + off - len(buf))
        buf += payload
    with open(path, "wb") as f:
        f.write(buf)


# ---- tests ----------------------------------------------------------------


def test_metadata_and_plain_tensors(tmp_path):
    rng = np.random.default_rng(0)
    f32 = rng.normal(size=(4, 8)).astype(np.float32)
    f16 = rng.normal(size=(2, 16)).astype(np.float16)
    bf = rng.normal(size=(32,)).astype(np.float32)
    bf16_payload = (bf.view(np.uint32) >> 16).astype(np.uint16).tobytes()
    path = tmp_path / "t.gguf"
    write_gguf(
        path,
        {
            "general.architecture": (_T_STRING, "llama"),
            "general.alignment": (_T_U32, 32),
            "llama.block_count": (_T_U32, 2),
            "llama.rope.freq_base": (_T_F32, 10000.0),
            "some.flag": (_T_BOOL, True),
            "some.list": (_T_ARRAY, (_T_I32, [1, 2, 3])),
        },
        [
            ("a", f32.shape, GGML_F32, f32.tobytes()),
            ("b", f16.shape, GGML_F16, f16.tobytes()),
            ("c", bf.shape, GGML_BF16, bf16_payload),
        ],
    )
    md, tensors = read_gguf(path)
    assert md["general.architecture"] == "llama"
    assert md["llama.block_count"] == 2
    assert md["some.flag"] is True
    assert md["some.list"] == [1, 2, 3]
    np.testing.assert_array_equal(tensors["a"], f32)
    np.testing.assert_array_equal(tensors["b"].astype(np.float16), f16)
    # bf16 rounds the mantissa to 8 bits
    np.testing.assert_allclose(tensors["c"], bf, rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize(
    "gtype,encode,tol",
    [
        (GGML_Q8_0, q8_0_encode, 0.01),
        (GGML_Q4_0, q4_0_encode, 0.15),
        (GGML_Q4_1, q4_1_encode, 0.15),
    ],
)
def test_quant_roundtrip(tmp_path, gtype, encode, tol):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 64)).astype(np.float32)
    path = tmp_path / "q.gguf"
    write_gguf(
        path,
        {"general.architecture": (_T_STRING, "llama")},
        [("w", x.shape, gtype, encode(x.reshape(-1)))],
    )
    _, tensors = read_gguf(path)
    w = tensors["w"]
    assert w.shape == x.shape
    err = np.abs(w - x).max()
    assert err <= tol * np.abs(x).max(), err


def test_llama_mapping_and_e2e(tmp_path):
    """A tiny llama written as GGUF generates identically to the same
    weights loaded via from_hf_state_dict."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from pie_tpu.engine import InferenceEngine
    from pie_tpu.models.llama import LlamaConfig, LlamaModel
    from pie_tpu.models.loader import load_model

    TINY = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=512,
        tie_word_embeddings=False,
    )
    hf_cfg = transformers.LlamaConfig(**TINY, attention_bias=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg)
    sd = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}

    inv_block = {
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "ffn_norm.weight",
    }
    gg_tensors = []
    for k, v in sd.items():
        if k == "model.embed_tokens.weight":
            name = "token_embd.weight"
        elif k == "model.norm.weight":
            name = "output_norm.weight"
        elif k == "lm_head.weight":
            name = "output.weight"
        elif k.startswith("model.layers."):
            _, _, idx, rest = k.split(".", 3)
            name = f"blk.{idx}.{inv_block[rest]}"
        else:
            continue
        gg_tensors.append((name, v.shape, GGML_F32, v.astype(np.float32).tobytes()))

    path = tmp_path / "tiny-llama.gguf"
    write_gguf(
        path,
        {
            "general.architecture": (_T_STRING, "llama"),
            "llama.embedding_length": (_T_U32, TINY["hidden_size"]),
            "llama.feed_forward_length": (_T_U32, TINY["intermediate_size"]),
            "llama.block_count": (_T_U32, TINY["num_hidden_layers"]),
            "llama.attention.head_count": (_T_U32, TINY["num_attention_heads"]),
            "llama.attention.head_count_kv": (_T_U32, TINY["num_key_value_heads"]),
            "llama.attention.layer_norm_rms_epsilon": (_T_F32, TINY["rms_norm_eps"]),
            "llama.rope.freq_base": (_T_F32, TINY["rope_theta"]),
            "llama.context_length": (_T_U32, TINY["max_position_embeddings"]),
        },
        gg_tensors,
    )

    model_g, params_g = load_model(path, dtype=jnp.float32)
    assert model_g.config.vocab_size == 256

    config = LlamaConfig.from_dict(dict(TINY, model_type="llama"))
    model_s = LlamaModel(config)
    params_s = model_s.from_hf_state_dict(sd, dtype=jnp.float32)

    eng_g = InferenceEngine(model=model_g, params=params_g, max_seq_len=128,
                            kv_dtype=jnp.float32)
    eng_s = InferenceEngine(model=model_s, params=params_s, max_seq_len=128,
                            kv_dtype=jnp.float32)
    out_g = eng_g.generate([5, 17, 42, 7], max_completion_tokens=8,
                           temperature=0.0).token_ids
    out_s = eng_s.generate([5, 17, 42, 7], max_completion_tokens=8,
                           temperature=0.0).token_ids
    assert out_g == out_s

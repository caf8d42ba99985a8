"""Llama-3 family decoder (also serves mistral / qwen2 via config flags).

Reference parity: models/llama/language.py:13-223 (GQA attention with
Llama3RoPE, SiLU-gated MLP, RMSNorm, tied/untied lm_head) — re-designed
TPU-first:

- parameters are a plain pytree with all decoder layers STACKED on a leading
  axis; the forward pass is a single ``lax.scan`` over layers (one trace, fast
  compile, XLA pipelines layer-by-layer).
- the KV cache is a fixed-capacity [L, B, S, Hkv, Dh] buffer updated with
  per-sequence dynamic slices (donated at the jit boundary for in-place
  updates) instead of the reference's growable per-request cache objects.
- linear layers are either dense [K, N] arrays or group-wise quantized
  :class:`QuantizedTensor` (fused dequant+matmul Pallas kernel on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pie_tpu.cache.kv_cache import (
    KVCache,
    QuantizedKVCache,
    quantize_kv,
)
from pie_tpu.models.config import BaseConfig, _filter_kwargs
from pie_tpu.models.registry import register_model
from pie_tpu.ops.attention import attention_mask, sdpa, sdpa_quantized
from pie_tpu.ops.quant import QuantizedTensor, quantized_matmul
from pie_tpu.ops.rope import (
    RopeScalingConfig,
    apply_rope_cs,
    apply_rope_matrix,
    apply_rope_tables,
    make_inv_freq,
    rope_matrix,
    rope_qkv_cs,
    rope_tables,
)


@dataclasses.dataclass(frozen=True)
class LlamaConfig(BaseConfig):
    model_type: str = "llama"
    hidden_size: int = 2048
    num_hidden_layers: int = 16
    intermediate_size: int = 8192
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-5
    vocab_size: int = 128256
    rope_theta: float = 500000.0
    rope_scaling: Optional[dict] = None
    tie_word_embeddings: bool = True
    attention_bias: bool = False
    mlp_bias: bool = False
    max_position_embeddings: int = 131072

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "LlamaConfig":
        return cls(**_filter_kwargs(cls, d))

    @property
    def resolved_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads


def linear(
    x: jax.Array, w, bias=None, layer=None, rope_cs=None, rope_dim=0,
    ln_w=None, ln_eps=0.0,
) -> jax.Array:
    """Apply a (possibly quantized) linear layer.

    w is [K, N] / QuantizedTensor, or — when ``layer`` is given — the
    layer-stacked [L, K, N] variant indexed by a traced layer id (the
    quantized path reads the selected layer inside the Pallas kernel with
    zero slice copy; dense stacked weights use a dynamic slice which XLA
    fuses into the dot).

    rope_cs/rope_dim: fused rope epilogue for a bias-free fused-QKV
    projection (ops/rope.py:rope_qkv_cs).
    ln_w/ln_eps: fused rms-norm prologue (decode path): x is the pre-norm
    residual stream; the Pallas kernel normalizes in-register."""
    if isinstance(w, QuantizedTensor):
        y = quantized_matmul(x, w, layer=layer, rope_cs=rope_cs,
                             rope_dim=rope_dim, ln_w=ln_w, ln_eps=ln_eps)
    else:
        if ln_w is not None:
            lw = (
                jax.lax.dynamic_index_in_dim(ln_w, layer, 0, keepdims=False)
                if layer is not None and ln_w.ndim == 2 else ln_w
            )
            x = rms_norm(x, lw, ln_eps)
        if layer is not None and w.ndim == 3:
            w = jax.lax.dynamic_index_in_dim(w, layer, 0, keepdims=False)
        y = jnp.dot(
            x, w.astype(x.dtype), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        if rope_dim:
            shp = y.shape
            y = apply_rope_cs(
                y.reshape(-1, shp[-1]), rope_cs[0], rope_cs[1], rope_dim
            ).reshape(shp)
    if bias is not None:
        assert rope_dim == 0, "rope epilogue requires a bias-free projection"
        if layer is not None and bias.ndim == 2:
            bias = jax.lax.dynamic_index_in_dim(bias, layer, 0, keepdims=False)
        y = y + bias.astype(y.dtype)
    return y


def _dyn(a: jax.Array, i) -> jax.Array:
    """Select layer i of a stacked [L, ...] array."""
    return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * inv * w.astype(jnp.float32)).astype(x.dtype)


@register_model("llama")
class LlamaModel:
    """Functional Llama decoder. All state lives in the params pytree."""

    #: bench-only ablation switches ("norope", "noattn", "nomlp", "nocache",
    #: "nohead"); set by benchmarks/ablate_decode.py, never in production.
    _ablate: frozenset = frozenset()

    #: multi-chip serving: set to the ("dp", "tp") Mesh to pin activation
    #: shardings inside the forward (with_sharding_constraint); None = let
    #: XLA propagate from the param/cache shardings (single chip: no-op)
    mesh = None

    def __init__(self, config: LlamaConfig):
        self.config = config
        self.inv_freq = jnp.asarray(
            make_inv_freq(
                config.resolved_head_dim,
                config.rope_theta,
                RopeScalingConfig.from_dict(config.rope_scaling),
            )
        )

    def _constrain(self, x: jax.Array, *spec) -> jax.Array:
        if self.mesh is None:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(self.mesh, PartitionSpec(*spec))
        )

    # -- parameter construction ------------------------------------------

    def init_params(self, key: jax.Array, dtype=jnp.bfloat16) -> dict:
        """Random-init params (tests / synthetic benchmarks)."""
        cfg = self.config
        d, dh = cfg.hidden_size, cfg.resolved_head_dim
        hq, hkv, di = (
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            cfg.intermediate_size,
        )
        l = cfg.num_hidden_layers
        keys = iter(jax.random.split(key, 16))

        def w(key, *shape, scale=None):
            scale = scale or (1.0 / np.sqrt(shape[-2]))
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        params = {
            "embed": w(next(keys), cfg.vocab_size, d, scale=0.02),
            "layers": {
                "wq": w(next(keys), l, d, hq * dh),
                "wk": w(next(keys), l, d, hkv * dh),
                "wv": w(next(keys), l, d, hkv * dh),
                "wo": w(next(keys), l, hq * dh, d),
                "wg": w(next(keys), l, d, di),
                "wu": w(next(keys), l, d, di),
                "wd": w(next(keys), l, di, d),
                "ln1": jnp.ones((l, d), dtype),
                "ln2": jnp.ones((l, d), dtype),
            },
            "norm": jnp.ones((d,), dtype),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = w(next(keys), d, cfg.vocab_size, scale=0.02)
        return params

    # names of layer weights that are linear (quantizable); bias names too
    LINEAR_KEYS = ("wq", "wk", "wv", "wo", "wg", "wu", "wd")

    # HF checkpoint key mapping: our name -> HF per-layer suffix.
    HF_LAYER_MAP = {
        "wq": "self_attn.q_proj.weight",
        "wk": "self_attn.k_proj.weight",
        "wv": "self_attn.v_proj.weight",
        "wo": "self_attn.o_proj.weight",
        "wg": "mlp.gate_proj.weight",
        "wu": "mlp.up_proj.weight",
        "wd": "mlp.down_proj.weight",
        "ln1": "input_layernorm.weight",
        "ln2": "post_attention_layernorm.weight",
    }
    HF_BIAS_MAP = {
        "bq": "self_attn.q_proj.bias",
        "bk": "self_attn.k_proj.bias",
        "bv": "self_attn.v_proj.bias",
    }
    HF_PREFIX = "model.layers.{i}."
    HF_TOP = {
        "embed": "model.embed_tokens.weight",
        "norm": "model.norm.weight",
        "lm_head": "lm_head.weight",
    }

    def from_hf_state_dict(
        self, weights: dict[str, np.ndarray], dtype=jnp.bfloat16
    ) -> dict:
        """Build params from an HF-style state dict (numpy arrays, [N, K]
        linear layout). Reference parity: weight sanitization + key mapping
        of models/utils.py:75-125 and models/llama/language.py:190-223."""
        cfg = self.config
        l = cfg.num_hidden_layers
        layers: dict[str, list] = {}
        use_bias = cfg.attention_bias and (
            self.HF_PREFIX.format(i=0) + self.HF_BIAS_MAP["bq"]
        ) in weights
        lmap = dict(self.HF_LAYER_MAP)
        bmap = dict(self.HF_BIAS_MAP) if use_bias else {}
        for name, suffix in {**lmap, **bmap}.items():
            mats = []
            for i in range(l):
                wkey = self.HF_PREFIX.format(i=i) + suffix
                m = np.asarray(weights[wkey])
                if name in self.LINEAR_KEYS:
                    m = m.T  # HF [N, K] -> KN layout
                mats.append(m)
            layers[name] = jnp.asarray(np.stack(mats), dtype=dtype)
        params = {
            "embed": jnp.asarray(weights[self.HF_TOP["embed"]], dtype=dtype),
            "layers": layers,
            "norm": jnp.asarray(weights[self.HF_TOP["norm"]], dtype=dtype),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = jnp.asarray(
                np.asarray(weights[self.HF_TOP["lm_head"]]).T, dtype=dtype
            )
        return params

    def quantize_params(
        self, params: dict, group_size: int = 64, bits: int = 4,
        fuse_projections: bool = True, quantize_lm_head: bool = True,
    ) -> dict:
        """Group-wise quantize every linear weight (reference
        models/utils.py:95-111 ``nn.quantize`` hookup; predicate: last dim
        divisible by group size — always true for llama dims)."""
        import functools

        from pie_tpu.ops.quant import quantize

        out = dict(params)
        layers = dict(params["layers"])
        qfn = jax.jit(
            jax.vmap(functools.partial(quantize, group_size=group_size, bits=bits))
        )
        fuse = fuse_projections and "bq" not in layers
        names = list(self.LINEAR_KEYS)
        if fuse:
            # fuse QKV and gate/up along the output dim: fewer, larger
            # kernel launches on the decode critical path
            layers["wqkv"] = qfn(
                jnp.concatenate(
                    [layers.pop("wq"), layers.pop("wk"), layers.pop("wv")],
                    axis=-1,
                )
            )
            layers["wgu"] = qfn(
                jnp.concatenate([layers.pop("wg"), layers.pop("wu")], axis=-1)
            )
            names = ["wo", "wd"]
        for name in names:
            layers[name] = qfn(layers[name])  # [L, K, N] stacked quantize
        out["layers"] = layers
        if "lm_head" in params:
            out["lm_head"] = quantize(params["lm_head"], group_size, bits)
        elif quantize_lm_head:
            # tied embeddings: keep the bf16 table for lookups but give the
            # decode hot path an int-quantized head (saves the full-vocab
            # bf16 read per token)
            out["lm_head"] = quantize(
                params["embed"].T.astype(jnp.float32), group_size, bits
            )
        return out

    def init_quantized_params(
        self, key: jax.Array, group_size: int = 64, bits: int = 4,
        dtype=jnp.bfloat16,
    ) -> dict:
        """Random params built DIRECTLY in quantized form (random packed
        codes + sane scales). Lets benchmarks stand up geometries whose bf16
        init would not fit HBM (e.g. Llama-3-8B on a 16 GB chip); decode
        throughput does not depend on weight content."""
        from pie_tpu.ops.quant import QuantizedTensor

        cfg = self.config
        d, dh = cfg.hidden_size, cfg.resolved_head_dim
        hq, hkv, di = (
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            cfg.intermediate_size,
        )
        l = cfg.num_hidden_layers
        ep = 32 // bits
        keys = iter(jax.random.split(key, 24))

        def rq(kk, *shape):
            """Random stacked QuantizedTensor of logical shape [L, K, N]."""
            ll, k, n = shape
            kp = -(-k // 512) * 512
            g = group_size
            sc = 0.02 / np.sqrt(k)
            packed = jax.random.bits(kk, (ll, kp // ep, n), jnp.uint32)
            scales = jnp.full((ll, kp // g, n), sc, dtype)
            biases = jnp.full((ll, kp // g, n), -sc * (2 ** bits - 1) / 2, dtype)
            return QuantizedTensor(
                packed=packed, scales=scales, biases=biases,
                bits=bits, group_size=g, shape=(k, n),
            )

        layers = {
            "wqkv": rq(next(keys), l, d, (hq + 2 * hkv) * dh),
            "wo": rq(next(keys), l, hq * dh, d),
            "wgu": rq(next(keys), l, d, 2 * di),
            "wd": rq(next(keys), l, di, d),
            "ln1": jnp.ones((l, d), dtype),
            "ln2": jnp.ones((l, d), dtype),
        }
        params = {
            "embed": (
                jax.random.normal(next(keys), (cfg.vocab_size, d), dtype)
                * 0.02
            ),
            "layers": layers,
            "norm": jnp.ones((d,), dtype),
        }
        lm = rq(next(keys), 1, d, cfg.vocab_size)
        params["lm_head"] = QuantizedTensor(
            packed=lm.packed[0], scales=lm.scales[0], biases=lm.biases[0],
            bits=bits, group_size=group_size, shape=lm.shape,
        )
        return params

    # -- forward ----------------------------------------------------------


    # -- projection helpers (fused or per-matrix) -------------------------

    def _attn_proj(self, p, x, b, t, layer=None, rope_cs=None, rope_dim=0,
                   ln_w=None, ln_eps=0.0):
        cfg = self.config
        dh = cfg.resolved_head_dim
        hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
        if "wqkv" in p:
            y = linear(x, p["wqkv"], layer=layer, rope_cs=rope_cs,
                       rope_dim=rope_dim, ln_w=ln_w, ln_eps=ln_eps)
            nq, nk = hq * dh, hkv * dh
            q = y[..., :nq]
            k = y[..., nq : nq + nk]
            v = y[..., nq + nk :]
        else:
            if ln_w is not None:
                lw = (
                    _dyn(ln_w, layer)
                    if layer is not None and ln_w.ndim == 2 else ln_w
                )
                x = rms_norm(x, lw, ln_eps)
            q = linear(x, p["wq"], p.get("bq"), layer=layer)
            k = linear(x, p["wk"], p.get("bk"), layer=layer)
            v = linear(x, p["wv"], p.get("bv"), layer=layer)
        return (
            q.reshape(b, t, hq, dh),
            k.reshape(b, t, hkv, dh),
            v.reshape(b, t, hkv, dh),
        )

    def _mlp(self, p, x, layer=None, ln_w=None, ln_eps=0.0):
        """Gated MLP; ln_w folds the pre-MLP norm into the wgu kernel
        prologue on the decode path (x is then the pre-norm residual)."""
        if "wgu" in p:
            y = linear(x, p["wgu"], layer=layer, ln_w=ln_w, ln_eps=ln_eps)
            di = y.shape[-1] // 2
            g, u = y[..., :di], y[..., di:]
        else:
            if ln_w is not None:
                lw = (
                    _dyn(ln_w, layer)
                    if layer is not None and ln_w.ndim == 2 else ln_w
                )
                x = rms_norm(x, lw, ln_eps)
            g = linear(x, p["wg"], layer=layer)
            u = linear(x, p["wu"], layer=layer)
        return linear(jax.nn.silu(g) * u, p["wd"], layer=layer)

    #: one-launch decode MLP-block kernel policy. None = auto by geometry:
    #: SMALL models (hidden <= 2048, 1B-class) win — their 2-9 MB weight
    #: streams are dominated by per-kernel pipeline fill, which the fusion
    #: amortizes (paired A/B: 1.482 -> 1.413 ms/tok on 1B). LARGE models
    #: (8B) LOSE 0.5-0.9 ms/tok — the monolithic kernel schedules worse
    #: around the attention/cache ops than three separate launches, which
    #: XLA's async dispatch already pipelines. True/False force it.
    use_fused_mlp_kernel: Optional[bool] = None

    def _fused_mlp_ok(self, p, m: int) -> bool:
        """Static gate for the one-launch decode MLP-block kernel
        (ops/fused_mlp_pallas): decode-sized batch, quantized fused
        weights, single chip, no conflicting ablations."""
        if self.use_fused_mlp_kernel is False:
            return False
        if (
            self.use_fused_mlp_kernel is None
            and self.config.hidden_size > 2048
        ):
            return False
        if self._ablate & {"nomlp", "nofusedmlp"} or self.mesh is not None:
            return False
        if jax.default_backend() != "tpu":
            return False
        if not ("wo" in p and "wgu" in p and "wd" in p):
            return False
        if not isinstance(p["wo"], QuantizedTensor):
            return False
        from pie_tpu.ops.fused_mlp_pallas import fused_mlp_supported

        return fused_mlp_supported(p["wo"], p["wgu"], p["wd"], m)

    def _mlp_block(self, p, h, attn_flat, layer, eps, fused,
                   fused_ln=False):
        """The post-attention stretch of a decoder layer: wo projection +
        residual + ln2 + gated MLP + residual. On the decode path this is
        ONE Pallas launch (fused_mlp_stacked) instead of 3 matmul launches
        plus the XLA glue between them — per-launch dispatch + pipeline
        fill cost ~12-16 us/layer at 8B (benchmarks/PROFILE.md)."""
        b, t, dm = h.shape
        if fused:
            from pie_tpu.ops.fused_mlp_pallas import fused_mlp_stacked

            out = fused_mlp_stacked(
                attn_flat.reshape(b * t, -1), h.reshape(b * t, dm),
                _dyn(p["ln2"], layer), layer, p["wo"], p["wgu"], p["wd"],
                eps=eps,
            )
            return out.reshape(b, t, dm)
        h = h + linear(attn_flat, p["wo"], layer=layer)
        h = self._constrain(h, "dp", None, None)
        if "nomlp" not in self._ablate:
            if fused_ln:
                # ln2 folds into the wgu kernel prologue (same machinery
                # as the ln1 fold on the QKV projection)
                h = h + self._mlp(p, h, layer=layer, ln_w=p["ln2"],
                                  ln_eps=eps)
            else:
                x = rms_norm(h, _dyn(p["ln2"], layer), eps)
                h = h + self._mlp(p, x, layer=layer)
            h = self._constrain(h, "dp", None, None)
        return h

    def embed(self, params: dict, input_ids: jax.Array) -> jax.Array:
        return params["embed"][input_ids]

    def unembed(self, params: dict, h: jax.Array, ln_w=None,
                ln_eps: float = 0.0) -> jax.Array:
        """Project to vocab logits. ln_w/ln_eps: the final rms_norm folded
        into the lm_head projection's in-kernel prologue (decode path) —
        callers then pass the PRE-norm hidden state."""
        if ln_w is not None and "lm_head" not in params:
            h = rms_norm(h, ln_w, ln_eps)
            ln_w = None
        if "nohead" in self._ablate:
            return jnp.broadcast_to(
                h.sum(-1, keepdims=True),
                h.shape[:-1] + (self.config.vocab_size,),
            )
        if "lm_head" in params:
            return linear(h, params["lm_head"], ln_w=ln_w, ln_eps=ln_eps)
        return jnp.einsum(
            "btd,vd->btv",
            h,
            params["embed"].astype(h.dtype),
            preferred_element_type=jnp.float32,
        )

    def __call__(
        self,
        params: dict,
        input_ids: jax.Array,
        cache,
        positions: jax.Array,
        inputs_embeds: Optional[jax.Array] = None,
        valid_lens: Optional[jax.Array] = None,
    ):
        """Forward pass writing this chunk's K/V into a fixed-capacity cache.

        input_ids: [B, T] (ignored when inputs_embeds given)
        cache: KVCache or QuantizedKVCache, ALREADY ADVANCED for these
               positions (cache.slot_positions includes the new tokens --
               the engine calls cache.advance() before the model).
        positions: [B, T] global positions of the input tokens
        returns: (logits [B, T, V] f32, cache with updated k/v storage)
        """
        cfg = self.config
        dh = cfg.resolved_head_dim
        hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads

        h = inputs_embeds if inputs_embeds is not None else self.embed(params, input_ids)
        b, t = h.shape[0], h.shape[1]
        quantized = isinstance(cache, QuantizedKVCache)
        mask = attention_mask(positions, cache.slot_positions, cache.window)
        write_slots = cache.write_slot(positions)  # [B, T]
        if valid_lens is not None and cache.window is not None:
            # rotating slots alias once positions wrap: bucket-pad tokens
            # must not overwrite live entries (contiguous slots are safe --
            # pads land beyond the prompt and are re-written later)
            valid = jnp.arange(t)[None, :] < valid_lens[:, None]
            write_slots = jnp.where(valid, write_slots, cache.capacity)
        batch_idx = jnp.arange(b)[:, None]
        # rope hoisted out of the layer scan. Decode (T==1) with a fused
        # bias-free QKV projection folds the rotation INTO the projection
        # kernel's f32-accumulator epilogue (ops/quant_matmul_pallas.py:
        # _rope_epilogue) — standalone per-layer rope kernels cost
        # ~1.25 ms/token at 8B (2 launches x 32 layers, ablation-measured);
        # the epilogue rides the HBM-bound matmul for free.
        fused_rope = (
            t == 1 and "wqkv" in params["layers"] and dh in (64, 128)
            and "norope" not in self._ablate
        )
        rope_cs = None
        if fused_rope:
            rope_cs = rope_qkv_cs(
                positions[:, 0], self.inv_freq, hq, hkv, dh
            )
            rope_fn = lambda x: x
        elif t == 1:
            rot = rope_matrix(positions, self.inv_freq, dh)
            rope_fn = lambda x: apply_rope_matrix(x, rot)
        else:
            cos, sin = rope_tables(positions, self.inv_freq)
            rope_fn = lambda x: apply_rope_tables(x, cos, sin)
        scale = dh**-0.5
        eps = cfg.rms_norm_eps

        _abl = self._ablate
        p = params["layers"]
        use_fused_mlp = self._fused_mlp_ok(p, b * t)
        # decode: ln1 folds into the QKV projection as an in-kernel prologue
        # (quant_matmul_stacked ln_w) — one fewer XLA launch per layer
        fused_ln = t == 1 and b * t <= 32 and "noln" not in self._ablate

        def layer_fn(carry, i):
            if quantized:
                h, ckq_all, cks_all, cvq_all, cvs_all = carry
            else:
                h, ck_all, cv_all = carry
            if fused_ln:
                x = h
                ln_kw = dict(ln_w=p["ln1"], ln_eps=eps)
            else:
                x = rms_norm(h, _dyn(p["ln1"], i), eps)
                ln_kw = {}
            q, k, v = self._attn_proj(
                p, x, b, t, layer=i, rope_cs=rope_cs,
                rope_dim=dh if fused_rope else 0, **ln_kw,
            )
            # Megatron layout: heads live on "tp" between the column- and
            # row-parallel projections, residual stream replicated over tp
            q = self._constrain(q, "dp", None, "tp", None)
            k = self._constrain(k, "dp", None, "tp", None)
            v = self._constrain(v, "dp", None, "tp", None)
            if "norope" not in _abl and not fused_rope:
                q = rope_fn(q)
                k = rope_fn(k)

            if "nocache" in _abl:
                h = self._mlp_block(
                    p, h, q.reshape(b, t, hq * dh), i, eps, use_fused_mlp,
                    fused_ln=fused_ln,
                )
                if quantized:
                    return (h, ckq_all, cks_all, cvq_all, cvs_all), None
                return (h, ck_all, cv_all), None

            if quantized:
                kq, ks = quantize_kv(k)
                vq, vs = quantize_kv(v)
                ckq_all = ckq_all.at[i, batch_idx, write_slots].set(
                    kq, mode="drop"
                )
                cks_all = cks_all.at[i, batch_idx, write_slots].set(
                    ks, mode="drop"
                )
                cvq_all = cvq_all.at[i, batch_idx, write_slots].set(
                    vq, mode="drop"
                )
                cvs_all = cvs_all.at[i, batch_idx, write_slots].set(
                    vs, mode="drop"
                )
            elif cache.window is None:
                # contiguous slots: per-sequence dynamic_update_slice
                # lowers much better than a general scatter on TPU
                start = positions[:, 0]

                def write(c, kv, st, il):
                    return jax.lax.dynamic_update_slice(
                        c, kv[None], (il, st, 0, 0)
                    )

                ck_all = jax.vmap(write, in_axes=(1, 0, 0, None), out_axes=1)(
                    ck_all, k.astype(ck_all.dtype), start, i
                )
                cv_all = jax.vmap(write, in_axes=(1, 0, 0, None), out_axes=1)(
                    cv_all, v.astype(cv_all.dtype), start, i
                )
                ck = _dyn(ck_all, i)
                cv = _dyn(cv_all, i)
            else:
                ck_all = ck_all.at[i, batch_idx, write_slots].set(
                    k.astype(ck_all.dtype), mode="drop"
                )
                cv_all = cv_all.at[i, batch_idx, write_slots].set(
                    v.astype(cv_all.dtype), mode="drop"
                )
                ck = _dyn(ck_all, i)
                cv = _dyn(cv_all, i)

            if "noattn" in _abl:
                attn = q
            elif quantized:
                # attend directly on the int8 cache: scales factor out of
                # the dots, no dequantized copy is ever materialized
                attn = sdpa_quantized(
                    q, _dyn(ckq_all, i), _dyn(cks_all, i),
                    _dyn(cvq_all, i), _dyn(cvs_all, i), mask, scale,
                )
            else:
                attn = sdpa(q, ck.astype(q.dtype), cv.astype(q.dtype), mask, scale)
            attn = self._constrain(attn, "dp", None, "tp", None)
            h = self._mlp_block(
                p, h, attn.reshape(b, t, hq * dh), i, eps, use_fused_mlp,
                fused_ln=fused_ln,
            )
            if quantized:
                return (h, ckq_all, cks_all, cvq_all, cvs_all), None
            return (h, ck_all, cv_all), None

        idxs = jnp.arange(cfg.num_hidden_layers)
        if quantized:
            carry0 = (h, cache.k_q, cache.k_scale, cache.v_q, cache.v_scale)
            carry, _ = jax.lax.scan(layer_fn, carry0, idxs)
            h = carry[0]
            cache = dataclasses.replace(
                cache, k_q=carry[1], k_scale=carry[2],
                v_q=carry[3], v_scale=carry[4],
            )
        else:
            carry, _ = jax.lax.scan(layer_fn, (h, cache.k, cache.v), idxs)
            h = carry[0]
            cache = dataclasses.replace(cache, k=carry[1], v=carry[2])
        if fused_ln and "lm_head" in params:
            logits = self.unembed(params, h, params["norm"], eps)
        else:
            h = rms_norm(h, params["norm"], eps)
            logits = self.unembed(params, h)
        return logits.astype(jnp.float32), cache

    def make_cache_shape(self, batch: int, max_len: int) -> tuple:
        cfg = self.config
        return (
            cfg.num_hidden_layers,
            batch,
            max_len,
            cfg.num_key_value_heads,
            cfg.resolved_head_dim,
        )

    # -- paged-pool forward (continuous batching path) --------------------

    def paged_forward(
        self,
        params: dict,
        input_ids: jax.Array,  # [B, T]
        pool,  # PagedKVPool
        block_tables: jax.Array,  # [B, maxP]
        positions: jax.Array,  # [B, T]
        context_lens: jax.Array,  # [B] lens AFTER this chunk
        use_kernel: bool = True,
    ):
        """Forward over the global paged KV pool (reference pie_core's
        intended IModel::forward(BatchDetails) path, include/models/
        imodel.hpp:16-35 + batch_details.hpp:10-88).

        decode (T==1) uses the Pallas paged-attention kernel; prefill gathers
        pages to dense KV (prefill is compute-bound so the gather is cheap
        relative to the matmuls).
        """
        from pie_tpu.cache import paged as paged_mod
        from pie_tpu.ops.paged_attention import (
            decode_kernel_supported,
            paged_attention_decode,
            paged_attention_xla,
        )

        cfg = self.config
        dh = cfg.resolved_head_dim
        hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
        use_kernel = use_kernel and decode_kernel_supported(
            dh, hkv, pool.quantized
        )
        h = self.embed(params, input_ids)
        b, t = h.shape[0], h.shape[1]
        decode = t == 1
        # decode rope fused into the QKV projection epilogue (same trick as
        # __call__; saves ~1.25 ms/token at 8B vs standalone rope kernels)
        fused_rope = (
            decode and "wqkv" in params["layers"] and dh in (64, 128)
            and "norope" not in self._ablate
        )
        rope_cs = None
        if "norope" in self._ablate:
            rope_fn = lambda x: x
        elif fused_rope:
            rope_cs = rope_qkv_cs(positions[:, 0], self.inv_freq, hq, hkv, dh)
            rope_fn = lambda x: x
        elif decode:
            rot = rope_matrix(positions, self.inv_freq, dh)
            rope_fn = lambda x: apply_rope_matrix(x, rot)
        else:
            cos, sin = rope_tables(positions, self.inv_freq)
            rope_fn = lambda x: apply_rope_tables(x, cos, sin)
        scale = dh**-0.5
        eps = cfg.rms_norm_eps
        quantized = pool.quantized
        fold = pool.fold

        page_idx = positions // paged_mod.PAGE_SIZE
        slot = positions % paged_mod.PAGE_SIZE
        phys = jnp.take_along_axis(
            block_tables, jnp.minimum(page_idx, block_tables.shape[1] - 1),
            axis=1,
        )
        # invalid writes (pad tokens with position<0, inactive decode lanes,
        # unmapped pages) route out-of-bounds and are dropped by mode="drop"
        phys_safe = jnp.where(
            (phys >= 0) & (positions >= 0), phys, pool.num_pages
        )
        # reads/DMAs need in-range page ids; invalid entries read page 0 and
        # are masked out of attention by context_lens / position masks
        safe_tables = jnp.maximum(block_tables, 0)

        if not decode:
            kv_pos = _paged_kv_positions(block_tables, context_lens)
            mask = attention_mask(positions, kv_pos)

        lp = params["layers"]
        use_fused_mlp = decode and self._fused_mlp_ok(lp, b * t)
        fused_ln = decode and b * t <= 32 and "noln" not in self._ablate

        def layer_fn(carry, i):
            if quantized:
                h, apk, apv, apks, apvs = carry
            else:
                h, apk, apv = carry
            if fused_ln:
                x = h
                ln_kw = dict(ln_w=lp["ln1"], ln_eps=eps)
            else:
                x = rms_norm(h, _dyn(lp["ln1"], i), eps)
                ln_kw = {}
            q, k, v = self._attn_proj(
                lp, x, b, t, layer=i, rope_cs=rope_cs,
                rope_dim=dh if fused_rope else 0, **ln_kw,
            )
            if not fused_rope:
                q = rope_fn(q)
                k = rope_fn(k)

            # pool is head-major [L, P, Hkv, PAGE, D]; the advanced indices
            # around the head slice keep values in natural [B, T, Hkv, ...]
            if quantized:
                kq, ks = quantize_kv(k)
                vq, vs = quantize_kv(v)
                apk = apk.at[i, phys_safe, :, slot].set(kq, mode="drop")
                apv = apv.at[i, phys_safe, :, slot].set(vq, mode="drop")
                apks = apks.at[
                    i, phys_safe, slot % fold, :, slot // fold
                ].set(ks[..., 0], mode="drop")
                apvs = apvs.at[
                    i, phys_safe, slot % fold, :, slot // fold
                ].set(vs[..., 0], mode="drop")
            else:
                apk = apk.at[i, phys_safe, :, slot].set(
                    k.astype(apk.dtype), mode="drop"
                )
                apv = apv.at[i, phys_safe, :, slot].set(
                    v.astype(apv.dtype), mode="drop"
                )

            # per-layer pool slice for the attention ops. NOTE: a stacked
            # kernel that indexes [layer, page] inside its DMAs exists
            # (paged_attention_decode_stacked) and would avoid these
            # ~30 MB/layer slice copies, but Mosaic runs ~3x slower per
            # call when the ANY-space operand is the full 235 MB pool
            # (measured: 22 us/layer on a [P, ...] slice vs 60 us on the
            # [L*P, ...] view, scaling with operand size) — slicing wins.
            pk, pv = _dyn(apk, i), _dyn(apv, i)
            if quantized:
                pks, pvs = _dyn(apks, i), _dyn(apvs, i)
            else:
                pks = pvs = None

            if decode:
                if use_kernel and jax.default_backend() == "tpu":
                    dummy = jnp.zeros((1, fold, hkv, 1), jnp.float32)
                    attn = paged_attention_decode(
                        q[:, 0], pk, pv,
                        pks if quantized else dummy,
                        pvs if quantized else dummy,
                        safe_tables, context_lens, scale,
                    )[:, None]
                else:
                    attn = paged_attention_xla(
                        q[:, 0], pk, pv, safe_tables, context_lens, scale,
                        pks if quantized else None,
                        pvs if quantized else None,
                    )[:, None]
            else:
                bt_idx = safe_tables
                mp = bt_idx.shape[1]
                s_tot = mp * paged_mod.PAGE_SIZE

                def flat(a, w):  # [B,maxP,Hkv,PAGE,w] -> [B,S,Hkv,w]
                    return jnp.swapaxes(a, 2, 3).reshape(b, s_tot, hkv, w)

                if quantized:
                    # gathered pages stay int8; scales fold into the dots
                    unperm = paged_mod.unpermute_page_scales
                    attn = sdpa_quantized(
                        q, flat(pk[bt_idx], dh), flat(unperm(pks[bt_idx]), 1),
                        flat(pv[bt_idx], dh), flat(unperm(pvs[bt_idx]), 1),
                        mask, scale,
                    )
                else:
                    ck = flat(pk[bt_idx], dh).astype(q.dtype)
                    cv = flat(pv[bt_idx], dh).astype(q.dtype)
                    attn = sdpa(q, ck, cv, mask, scale)

            h2 = self._mlp_block(
                lp, h, attn.reshape(b, t, hq * dh), i, eps, use_fused_mlp
            )
            if quantized:
                return (h2, apk, apv, apks, apvs), None
            return (h2, apk, apv), None

        idxs = jnp.arange(cfg.num_hidden_layers)
        if quantized:
            carry0 = (h, pool.k, pool.v, pool.k_scale, pool.v_scale)
            carry, _ = jax.lax.scan(layer_fn, carry0, idxs)
            h = carry[0]
            pool = dataclasses.replace(
                pool, k=carry[1], v=carry[2],
                k_scale=carry[3], v_scale=carry[4],
            )
        else:
            carry, _ = jax.lax.scan(layer_fn, (h, pool.k, pool.v), idxs)
            h = carry[0]
            pool = dataclasses.replace(pool, k=carry[1], v=carry[2])
        if fused_ln and "lm_head" in params:
            logits = self.unembed(params, h, params["norm"], eps)
        else:
            h = rms_norm(h, params["norm"], eps)
            logits = self.unembed(params, h)
        return logits.astype(jnp.float32), pool


    # -- mixed prefill+decode forward (BatchDetails program) ---------------

    def mixed_forward(
        self,
        params: dict,
        pool,  # PagedKVPool
        dec_tokens: jax.Array,  # [B] int32 decode-lane tokens
        dec_positions: jax.Array,  # [B] write position per lane (-1 frozen)
        dec_ctx: jax.Array,  # [B] context len incl. this token (>=1 safe)
        block_tables: jax.Array,  # [B, maxP]
        pf_ids: jax.Array,  # [Cs] prefill-rider tokens (-1 pad)
        pf_positions: jax.Array,  # [Cs] their positions (-1 pad)
        pf_lane: jax.Array,  # scalar int32 lane whose table the rider uses
        pf_ctx: jax.Array,  # scalar int32 tokens in pool for rider lane
        #                     AFTER this slice (mask bound for rider attn)
        use_kernel: bool = True,
        pf_embeds: Optional[jax.Array] = None,  # [Cs, D] rider embeddings
        #   (VLM prompts: precomputed image-merged embeddings instead of
        #   re-embedding placeholder ids)
        pf_embeds_valid=True,  # scalar bool: rider slice carries embeds
    ):
        """ONE device program for a mixed continuous-batching step: every
        decode lane advances one token AND a chunk of prefill tokens rides
        along, sharing a single stream of the quantized weights per layer.

        This is the reference's BatchDetails co-design (include/engine/
        batch_details.hpp:10-88: flat token_ids/positions spanning prefill
        chunks + decode singles, per-seq context lens, consolidated block
        table) realized TPU-first: the flat token axis has STATIC length
        M = B + Cs, so one compiled program serves every batch composition —
        frozen lanes and rider pads are position -1 (no KV write, masked
        attention) instead of a shape change.

        Matmuls/norms act on the flat [1, M, D] stream (one weight read
        serves prefill AND decode); attention splits by role: lanes go
        through the Pallas paged-decode kernel, the rider does masked dense
        attention over its lane's gathered pages, skipped via lax.cond
        when the rider is empty.

        Returns (decode logits [B, V] f32, updated pool). Rider tokens never
        touch the lm_head: the scheduler feeds each prompt's final token as
        the waking lane's first decode token, so first-token sampling is
        just a decode step.
        """
        from pie_tpu.cache import paged as paged_mod
        from pie_tpu.ops.paged_attention import (
            decode_kernel_supported,
            paged_attention_decode,
            paged_attention_xla,
        )

        cfg = self.config
        dh = cfg.resolved_head_dim
        hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
        use_kernel = use_kernel and decode_kernel_supported(
            dh, hkv, pool.quantized
        )
        b = dec_tokens.shape[0]
        cs = pf_ids.shape[0]
        m = b + cs
        scale = dh**-0.5
        eps = cfg.rms_norm_eps
        quantized = pool.quantized
        fold = pool.fold

        flat_ids = jnp.concatenate([dec_tokens, pf_ids])  # [M]
        positions = jnp.concatenate([dec_positions, pf_positions])  # [M]
        # rope fused into the QKV projection epilogue (one C/S row per flat
        # token; pad rows rotate by garbage angles but their K is dropped and
        # their attention output discarded)
        fused_rope = (
            "wqkv" in params["layers"] and dh in (64, 128)
            and "norope" not in self._ablate
        )
        if fused_rope:
            rope_cs = rope_qkv_cs(positions, self.inv_freq, hq, hkv, dh)
        else:
            cos, sin = rope_tables(positions[None], self.inv_freq)
        h = self.embed(params, jnp.maximum(flat_ids, 0)[None])  # [1, M, D]
        if pf_embeds is not None:
            pf_part = jnp.where(
                pf_embeds_valid, pf_embeds.astype(h.dtype), h[0, b:]
            )
            h = jnp.concatenate([h[:, :b], pf_part[None]], axis=1)

        # physical page + slot per flat token
        page_idx = positions // paged_mod.PAGE_SIZE
        slot = positions % paged_mod.PAGE_SIZE
        maxp = block_tables.shape[1]
        dec_phys = jnp.take_along_axis(
            block_tables,
            jnp.clip(page_idx[:b, None], 0, maxp - 1),
            axis=1,
        )[:, 0]
        pf_table = jax.lax.dynamic_index_in_dim(
            block_tables, pf_lane, 0, keepdims=False
        )  # [maxP]
        pf_phys = pf_table[jnp.clip(page_idx[b:], 0, maxp - 1)]
        phys = jnp.concatenate([dec_phys, pf_phys])  # [M]
        phys_safe = jnp.where(
            (phys >= 0) & (positions >= 0), phys, pool.num_pages
        )
        safe_tables = jnp.maximum(block_tables, 0)
        pf_any = jnp.any(pf_ids >= 0)

        # rider attention mask vs its lane's page slots
        pf_kv_pos = _paged_kv_positions(pf_table[None], pf_ctx[None])  # [1,S]
        pf_mask = attention_mask(pf_positions[None], pf_kv_pos)  # [1, Cs, S]

        lp = params["layers"]

        def layer_fn(carry, i):
            if quantized:
                h, apk, apv, apks, apvs = carry
            else:
                h, apk, apv = carry
            x = rms_norm(h, _dyn(lp["ln1"], i), eps)
            q, k, v = self._attn_proj(
                lp, x, 1, m, layer=i,
                rope_cs=rope_cs if fused_rope else None,
                rope_dim=dh if fused_rope else 0,
            )  # [1, M, H, dh]
            if not fused_rope and "norope" not in self._ablate:
                q = apply_rope_tables(q, cos, sin)
                k = apply_rope_tables(k, cos, sin)

            if quantized:
                kq, ks = quantize_kv(k[0])
                vq, vs = quantize_kv(v[0])
                apk = apk.at[i, phys_safe, :, slot].set(kq, mode="drop")
                apv = apv.at[i, phys_safe, :, slot].set(vq, mode="drop")
                apks = apks.at[
                    i, phys_safe, slot % fold, :, slot // fold
                ].set(ks[..., 0], mode="drop")
                apvs = apvs.at[
                    i, phys_safe, slot % fold, :, slot // fold
                ].set(vs[..., 0], mode="drop")
            else:
                apk = apk.at[i, phys_safe, :, slot].set(
                    k[0].astype(apk.dtype), mode="drop"
                )
                apv = apv.at[i, phys_safe, :, slot].set(
                    v[0].astype(apv.dtype), mode="drop"
                )

            # decode lanes: paged attention, one query per lane (sliced
            # per-layer pool — see the layout note in paged_forward)
            pk, pv = _dyn(apk, i), _dyn(apv, i)
            if quantized:
                pks, pvs = _dyn(apks, i), _dyn(apvs, i)
            else:
                pks = pvs = None
            q_dec = q[0, :b]  # [B, Hq, dh]
            if use_kernel and jax.default_backend() == "tpu":
                dummy = jnp.zeros((1, fold, hkv, 1), jnp.float32)
                attn_dec = paged_attention_decode(
                    q_dec, pk, pv,
                    pks if quantized else dummy,
                    pvs if quantized else dummy,
                    safe_tables, dec_ctx, scale,
                )
            else:
                attn_dec = paged_attention_xla(
                    q_dec, pk, pv, safe_tables, dec_ctx, scale,
                    pks if quantized else None,
                    pvs if quantized else None,
                )

            # prefill rider: masked dense attention over its lane's pages
            # (gathers index the stacked pool [layer, pages] directly — one
            # gather, no per-layer pool slice; runs only when the cond takes
            # this branch)
            def rider_attn(_):
                bt = jnp.maximum(pf_table, 0)  # [maxP]
                q_pf = q[:, b:]  # [1, Cs, Hq, dh]

                def flat(a, w):
                    return jnp.swapaxes(a, 2, 3).reshape(1, -1, hkv, w)

                if quantized:
                    # gathered pages stay int8; scales fold into the dots
                    unperm = paged_mod.unpermute_page_scales
                    return sdpa_quantized(
                        q_pf, flat(apk[i, bt][None], dh),
                        flat(unperm(apks[i, bt][None]), 1),
                        flat(apv[i, bt][None], dh),
                        flat(unperm(apvs[i, bt][None]), 1),
                        pf_mask, scale,
                    )[0]
                return sdpa(
                    q_pf, flat(apk[i, bt][None], dh).astype(q.dtype),
                    flat(apv[i, bt][None], dh).astype(q.dtype),
                    pf_mask, scale,
                )[0]  # [Cs, Hq, dh]

            attn_pf = jax.lax.cond(
                pf_any,
                rider_attn,
                lambda _: jnp.zeros((cs, hq, dh), q.dtype),
                operand=None,
            )

            attn = jnp.concatenate([attn_dec, attn_pf])[None]  # [1, M, Hq, dh]
            h2 = h + linear(attn.reshape(1, m, hq * dh), lp["wo"], layer=i)
            x = rms_norm(h2, _dyn(lp["ln2"], i), eps)
            h2 = h2 + self._mlp(lp, x, layer=i)
            if quantized:
                return (h2, apk, apv, apks, apvs), None
            return (h2, apk, apv), None

        idxs = jnp.arange(cfg.num_hidden_layers)
        if quantized:
            carry0 = (h, pool.k, pool.v, pool.k_scale, pool.v_scale)
            carry, _ = jax.lax.scan(layer_fn, carry0, idxs)
            h = carry[0]
            pool = dataclasses.replace(
                pool, k=carry[1], v=carry[2],
                k_scale=carry[3], v_scale=carry[4],
            )
        else:
            carry, _ = jax.lax.scan(layer_fn, (h, pool.k, pool.v), idxs)
            h = carry[0]
            pool = dataclasses.replace(pool, k=carry[1], v=carry[2])
        h = rms_norm(h[:, :b], params["norm"], eps)  # lanes only
        logits = self.unembed(params, h)  # [1, B, V]
        return logits[0].astype(jnp.float32), pool


def _paged_kv_positions(block_tables: jax.Array, context_lens: jax.Array):
    """kv slot positions [B, maxP*PAGE] for gathered paged KV: slot j of
    logical page i holds position i*PAGE + j when < context_len else -1."""
    from pie_tpu.cache.paged import PAGE_SIZE

    b, mp = block_tables.shape
    pos = jnp.arange(mp * PAGE_SIZE)[None, :]
    valid = (pos < context_lens[:, None]) & (
        jnp.repeat(block_tables >= 0, PAGE_SIZE, axis=1)
    )
    return jnp.where(valid, pos, -1)

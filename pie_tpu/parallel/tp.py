"""Tensor-parallel sharding specs for the decoder stack.

Megatron-style column/row parallel layout expressed as PartitionSpecs over a
("dp", "tp") mesh:

- wq/wk/wv/wg/wu: column parallel (output features over tp)
- wo/wd:         row parallel (contraction dim over tp; psum after)
- embed:         vocab rows over tp (masked lookup + psum)
- lm_head:       vocab cols over tp (all_gather of logits)
- KV cache:      kv heads over tp, batch over dp
- norms/scalars: replicated

QuantizedTensor leaves shard the same named axes: packed [L, K/ep, N],
scales/biases [L, G, N] follow their weight's (K -> rows, N -> cols) mapping
— both K/ep and G divide evenly because tile and group sizes divide K.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


# leaf name -> spec for stacked layer weights [L, K, N] (or quantized twins)
_COL = P(None, None, "tp")  # shard N
_ROW = P(None, "tp", None)  # shard K
LAYER_SPECS = {
    "wq": _COL,
    "wk": _COL,
    "wv": _COL,
    "wg": _COL,
    "wu": _COL,
    "wd": _ROW,
    "wo": _ROW,
    "bq": P(None, "tp"),
    "bk": P(None, "tp"),
    "bv": P(None, "tp"),
    "ln1": P(None, None),
    "ln2": P(None, None),
    "q_norm": P(None, None),
    "k_norm": P(None, None),
}


def param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a llama-style params pytree."""
    from pie_tpu.ops.quant import QuantizedTensor

    def spec_for(name: str, leaf, stacked: bool):
        if name in LAYER_SPECS:
            base = LAYER_SPECS[name]
        elif name == "embed":
            base = P("tp", None)
        elif name == "lm_head":
            base = P(None, "tp")
        elif name == "norm":
            base = P(None)
        else:
            base = P()
        if isinstance(leaf, QuantizedTensor):
            # packed/scales/biases share the (row, col) mapping of the weight
            return QuantizedTensor(
                packed=base, scales=base, biases=base,
                bits=leaf.bits, group_size=leaf.group_size, shape=leaf.shape,
            )
        return base

    out = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = {n: spec_for(n, leaf, True) for n, leaf in v.items()}
        else:
            out[k] = spec_for(k, v, False)
    return out


def shard_llama_params(params: dict, mesh: jax.sharding.Mesh) -> dict:
    """device_put params with TP shardings."""
    specs = param_specs(params)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, jax.Array),
    )


def cache_spec() -> P:
    """KV cache [L, B, S, Hkv, Dh]: batch over dp, kv heads over tp."""
    return P(None, "dp", None, "tp", None)


def shard_pool(pool, mesh: jax.sharding.Mesh):
    """Shard the paged KV pool over the mesh: kv heads on "tp" (pages are a
    GLOBAL pool shared by every dp lane — sequences on different lanes
    allocate from the same page ids, so the page axis replicates across dp
    while each tp shard stores its heads' slice of every page).

    k/v [L, P, Hkv, PAGE, D] -> heads on tp; scales
    [L, P, fold, Hkv, PAGE//fold] -> heads on tp."""
    import dataclasses

    kv = NamedSharding(mesh, P(None, None, "tp", None, None))
    sc = NamedSharding(mesh, P(None, None, None, "tp", None))
    return dataclasses.replace(
        pool,
        k=jax.device_put(pool.k, kv),
        v=jax.device_put(pool.v, kv),
        k_scale=jax.device_put(pool.k_scale, sc),
        v_scale=jax.device_put(pool.v_scale, sc),
    )


def shard_cache(cache, mesh: jax.sharding.Mesh):
    import dataclasses

    kv_sharding = NamedSharding(mesh, cache_spec())
    host = NamedSharding(mesh, P("dp", None))  # [B, S] metadata
    vec = NamedSharding(mesh, P("dp"))  # [B]
    updates = {}
    for f in dataclasses.fields(cache):
        v = getattr(cache, f.name)
        if f.name in ("k", "v", "k_q", "v_q", "k_scale", "v_scale"):
            updates[f.name] = jax.device_put(v, kv_sharding)
        elif f.name == "slot_positions":
            updates[f.name] = jax.device_put(v, host)
        elif f.name == "length":
            updates[f.name] = jax.device_put(v, vec)
    return dataclasses.replace(cache, **updates)

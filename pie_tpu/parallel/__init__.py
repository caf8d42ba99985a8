"""Multi-chip execution: device mesh, TP/DP shardings, collective wiring.

The reference has no multi-device parallelism at all (SURVEY.md §2.3); this
subsystem is designed-in per the build charter: weights and KV heads
tensor-sharded over ICI, batch data-parallel, collectives emitted by
shard_map/pjit from NamedSharding specs.
"""

from pie_tpu.parallel.mesh import make_mesh
from pie_tpu.parallel.tp import (
    param_specs,
    replicate_kv_heads,
    shard_cache,
    shard_llama_params,
    shard_params,
    shard_pool,
)

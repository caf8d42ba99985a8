"""Device mesh construction."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np


def make_mesh(
    tp: int = 1,
    dp: int = 1,
    devices: Optional[Sequence] = None,
) -> jax.sharding.Mesh:
    """Build a (dp, tp) mesh. tp rides the fastest (innermost) axis so
    tensor-parallel collectives stay on adjacent ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    if dp * tp > len(devices):
        raise ValueError(f"need {dp * tp} devices, have {len(devices)}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return jax.sharding.Mesh(arr, ("dp", "tp"))

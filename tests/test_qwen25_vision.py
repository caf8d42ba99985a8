"""Qwen2.5-VL windowed vision tower parity vs HF transformers: windowed
attention with full attention only at fullatt_block_indexes, RMSNorm
blocks, gated-SiLU MLP (round-2 verdict missing #1; reference
models/intern/vision.py:277-358,420-428). The grid is chosen large enough
that window attention demonstrably differs from full attention."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.slow  # heavy torch-parity suite (fast path: -m "not slow")
pytest.importorskip("transformers.models.qwen2_5_vl")

from pie_tpu.models.qwen2_vl import Qwen2VisionTower

VCFG = dict(
    depth=4,
    hidden_size=64,
    out_hidden_size=32,
    intermediate_size=128,
    num_heads=4,
    patch_size=2,
    temporal_patch_size=2,
    spatial_merge_size=2,
    window_size=8,  # -> 2x2 merge units per window
    fullatt_block_indexes=[3],
    in_channels=3,
)

GRID = np.array([[1, 12, 12]])  # 6x6 merge units -> 3x3 windows per frame


@pytest.fixture(scope="module")
def setup():
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLVisionConfig,
    )
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    hf_cfg = Qwen2_5_VLVisionConfig(**VCFG)
    torch.manual_seed(0)
    hf = Qwen2_5_VisionTransformerPretrainedModel(hf_cfg)
    hf.eval()
    sd = {
        "visual." + k: v.detach().float().numpy()
        for k, v in hf.state_dict().items()
    }
    tower = Qwen2VisionTower(VCFG)
    vp = tower.from_hf_state_dict(sd, dtype=jnp.float32)
    return hf, tower, vp


def _pixels(grid):
    t, h, w = grid[0]
    n = t * h * w
    rng = np.random.default_rng(0)
    return rng.normal(
        size=(n, 3 * VCFG["temporal_patch_size"] * VCFG["patch_size"] ** 2)
    ).astype(np.float32)


def test_windowed_tower_matches_hf(setup):
    hf, tower, vp = setup
    px = _pixels(GRID)
    with torch.no_grad():
        want = hf(
            torch.from_numpy(px), grid_thw=torch.from_numpy(GRID)
        ).numpy()
    got = np.asarray(tower.forward(vp, jnp.asarray(px), GRID))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_windows_actually_differ_from_full(setup):
    """Guard against a silently window-free tower: running every block with
    full attention must CHANGE the output on this grid."""
    hf, tower, vp = setup
    px = _pixels(GRID)
    got = np.asarray(tower.forward(vp, jnp.asarray(px), GRID))
    full = Qwen2VisionTower(
        dict(VCFG, fullatt_block_indexes=list(range(VCFG["depth"])))
    )
    got_full = np.asarray(full.forward(vp, jnp.asarray(px), GRID))
    assert np.max(np.abs(got - got_full)) > 1e-3


def test_window_order_roundtrip():
    """The merge-unit permutation + inverse is a bijection and groups
    whole windows contiguously."""
    tower = Qwen2VisionTower(VCFG)
    order, win_seg, frame_seg = tower._window_order(GRID)
    nu = GRID[0].prod() // tower.spatial_merge_size**2
    assert sorted(order.tolist()) == list(range(nu))
    # window ids are contiguous runs
    changes = np.flatnonzero(np.diff(win_seg)) + 1
    assert np.all(np.diff(win_seg[np.sort(changes)]) > 0)
    assert frame_seg.max() == 0  # single frame

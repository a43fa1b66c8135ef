"""Pallas kernel parity tests (interpret mode on the CPU backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from octseg.data.utils import _postprocess_chain
from octseg.ops.pallas.postprocess import fused_overlay_postprocess


def _random_masks(rng, m, h, w, blobs=True):
    import cv2

    out = np.zeros((m, h, w), np.float32)
    for i in range(m):
        n = rng.integers(1, 4)
        for _ in range(n):
            cy, cx = rng.integers(0, h), rng.integers(0, w)
            r = int(rng.integers(3, max(h, w) // 4))
            cv2.circle(out[i], (cx, cy), r, 1.0, -1)
    return out


@pytest.mark.parametrize('shape', [
    (2, 96, 128),
    # non-multiple-of-tile and wide shapes: covered fast by the first case +
    # border/multi-tile tests; full shape sweep runs in the CI full tier
    pytest.param((1, 100, 100), marks=pytest.mark.heavy),
    pytest.param((3, 130, 250), marks=pytest.mark.heavy),
])
def test_fused_postprocess_matches_xla_chain(rng, shape):
    masks = _random_masks(rng, *shape)
    fill_ref, ring_ref = _postprocess_chain(jnp.asarray(masks))
    fill, ring = fused_overlay_postprocess(jnp.asarray(masks), interpret=True)
    np.testing.assert_array_equal(np.asarray(ring), np.asarray(ring_ref))
    np.testing.assert_allclose(np.asarray(fill), np.asarray(fill_ref), atol=1e-5)


def test_fused_postprocess_border_touching_blobs(rng):
    # blobs intersecting every border exercise the zero-pad morphology
    # identities and the REFLECT_101 blur corrections
    masks = np.zeros((1, 64, 200), np.float32)
    masks[0, :10, :10] = 1
    masks[0, -8:, -12:] = 1
    masks[0, 30:40, 0:5] = 1
    masks[0, 0:5, 100:140] = 1
    fill_ref, ring_ref = _postprocess_chain(jnp.asarray(masks))
    fill, ring = fused_overlay_postprocess(jnp.asarray(masks), interpret=True)
    np.testing.assert_array_equal(np.asarray(ring), np.asarray(ring_ref))
    np.testing.assert_allclose(np.asarray(fill), np.asarray(fill_ref), atol=1e-5)


@pytest.mark.heavy  # tiling covered fast by shape0 parity + border-touching test
def test_fused_postprocess_multi_tile(rng):
    # H > TILE_H exercises the slab/halo logic across tile boundaries
    masks = _random_masks(rng, 1, 300, 140)
    fill_ref, ring_ref = _postprocess_chain(jnp.asarray(masks))
    fill, ring = fused_overlay_postprocess(jnp.asarray(masks), interpret=True)
    np.testing.assert_array_equal(np.asarray(ring), np.asarray(ring_ref))
    np.testing.assert_allclose(np.asarray(fill), np.asarray(fill_ref), atol=1e-5)


def test_fused_postprocess_sharded_over_mesh(rng):
    """shard_map composition: the Pallas kernel runs per-device over an
    8-device mesh along the mask axis (multi-chip save_results path)."""
    from octseg.ops.pallas.postprocess import fused_overlay_postprocess_sharded
    from octseg.parallel.sharding import make_mesh

    masks = _random_masks(rng, 8, 64, 96)
    mesh = make_mesh(8)
    fill_ref, ring_ref = _postprocess_chain(jnp.asarray(masks))
    fill, ring = fused_overlay_postprocess_sharded(
        jnp.asarray(masks), mesh, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ring), np.asarray(ring_ref))
    np.testing.assert_allclose(np.asarray(fill), np.asarray(fill_ref), atol=1e-5)

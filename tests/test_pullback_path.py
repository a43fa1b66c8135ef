import numpy as np
import pytest

from tests.test_infer import models_dir  # fixture reuse  # noqa: F401


def test_segment_pullback_contract(models_dir, rng):  # noqa: F811
    from octseg.infer.engine import InferenceEngine

    frames = rng.integers(0, 255, (5, 100, 100, 3), dtype=np.uint8)
    engine = InferenceEngine(models_dir, classes=[
        'Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum',
    ], block_size=4)
    out = engine.segment_pullback(frames, output_size=[80, 80])
    assert out.shape == (5, 80, 80, 4)
    assert set(np.unique(out)) <= {0.0, 1.0}

    # channel routing identical to the PIL path contract
    from PIL import Image

    images = [Image.fromarray(f) for f in frames]
    masks = [np.zeros((80, 80, 4)) for _ in images]
    ref = engine.segment(images, masks, output_size=[80, 80])
    # both paths binarize the same logits; resampling chains differ by design
    # (pullback path resizes native->input once), so require strong agreement
    agree = np.mean([np.mean(out[i] == ref[i]) for i in range(5)])
    assert agree > 0.9, agree


@pytest.mark.heavy  # multiblock sharding also certified by dryrun_multichip; contract test stays fast
def test_segment_pullback_multiblock_sharded(models_dir, rng):  # noqa: F811
    """Multiple blocks per pullback: the on-device slice must stay frame-axis
    sharded (regression: eager dynamic_slice dropped the sharding and the
    compiled runner rejected the chunk — caught by dryrun_multichip)."""
    from octseg.infer.engine import InferenceEngine

    frames = rng.integers(0, 255, (20, 64, 64, 3), dtype=np.uint8)
    classes = ['Lumen', 'Fibrous cap', 'Lipid core', 'Vasa vasorum']
    small = InferenceEngine(models_dir, classes=classes, block_size=8)
    big = InferenceEngine(models_dir, classes=classes, block_size=32)
    assert small.block_size < frames.shape[0]  # forces >= 3 slices
    out_multi = small.segment_pullback(frames, output_size=[64, 64])
    out_single = big.segment_pullback(frames, output_size=[64, 64])
    assert out_multi.shape == (20, 64, 64, 4)
    # Different block sizes compile different XLA executables whose float
    # results differ in the last ulp; with the fixture's random weights a
    # handful of logits sit exactly at the threshold and can flip sign, so
    # demand near-identity rather than bit-exactness (the regression under
    # test is sharding/shape handling, not numerics).
    mismatch = np.mean(out_multi != out_single)
    assert mismatch < 1e-3, f'mask mismatch fraction {mismatch}'

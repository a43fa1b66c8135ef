"""Fused normalization and logits postprocessing.

The reference normalizes inside forward() with registered ImageNet mean/std
buffers (reference: src/models/smp/model.py:49-51,65-71) and thresholds with
sigmoid(x) > 0.5 (model.py:82-83,195). Note sigmoid(x) > 0.5 == (x > 0), so
thresholding never needs the transcendental. XLA fuses these elementwise ops
into neighbouring convolutions.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_imagenet(
    x: jnp.ndarray,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    input_scale: float = 1.0,
) -> jnp.ndarray:
    """(x * input_scale - mean) / std over the channel (last) axis.

    Pass input_scale=1/255 for uint8-range inputs. The reference's
    training-time normalization expects images already scaled the way torch
    DataLoader delivered them (raw 0..255 floats, model.py:69 applies
    mean/std directly — we preserve that exact behavior at the call site).
    """
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return (x * input_scale - mean) / std


def sigmoid_threshold(logits: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Binary mask from logits; == sigmoid(logits) > threshold, fused form."""
    if threshold == 0.5:
        return (logits > 0).astype(jnp.float32)
    logit_thr = jnp.log(threshold / (1.0 - threshold))
    return (logits > logit_thr).astype(jnp.float32)

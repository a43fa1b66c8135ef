"""Multilabel soft Dice loss from logits.

Exact semantics of smp.losses.DiceLoss(MULTILABEL_MODE, from_logits=True) as
used by the reference (reference: src/models/smp/model.py:55): per-class soft
dice computed over (batch, pixels) jointly, then averaged over classes;
smooth=0, eps=1e-7, loss = mean_c (1 - dice_c).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice_loss_from_logits(
    logits: jnp.ndarray,  # (N, H, W, C)
    targets: jnp.ndarray,  # (N, H, W, C) in {0, 1}
    smooth: float = 0.0,
    eps: float = 1e-7,
    valid: jnp.ndarray = None,  # (N,) 0/1 — excludes mesh-padding samples
) -> jnp.ndarray:
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    targets = targets.astype(jnp.float32)
    if valid is not None:
        # zeroing padded samples before the joint sums gives exactly the
        # loss an unpadded batch of the real samples would produce
        v = valid.astype(jnp.float32)[:, None, None, None]
        probs = probs * v
        targets = targets * v
    # aggregate over batch and spatial dims jointly (smp dims=(0, 2) on
    # (N, C, HW) — i.e. one dice score per class over the whole batch)
    intersection = jnp.sum(probs * targets, axis=(0, 1, 2))
    cardinality = jnp.sum(probs + targets, axis=(0, 1, 2))
    dice = (2.0 * intersection + smooth) / jnp.clip(cardinality + smooth, eps)
    loss = 1.0 - dice
    # smp masks out classes absent from both pred-sum and target-sum only via
    # eps clamping; mean over classes
    return jnp.mean(loss)

"""Class-activation-map explainability in JAX (9 grad-CAM-family methods).

Framework equivalent of the reference CAM processor (reference:
src/models/cam_processor.py:19-140), which wraps pytorch_grad_cam. Here the
activations/gradients come from the model's encode/decode split: the tapped
layer is a pyramid level (default: the deepest encoder feature, the analog of
``model.encoder.layer4[-1]`` in the reference driver,
src/models/visualize_activation_maps.py:103), and d(target)/d(activation) is
a single jax.grad through the decoder.

Methods: GradCAM, HiResCAM, GradCAMElementWise, GradCAM++, XGradCAM,
AblationCAM, EigenCAM, EigenGradCAM, LayerCAM — same list as the reference
(cam_processor.py:39-49).

Target: SemanticSegmentationTarget — sum of one class's logits under the
predicted mask (cam_processor.py:116-140).
"""

from __future__ import annotations

from typing import List, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from octseg.ops.resize import resize_bilinear

CAM_METHODS = [
    'GradCAM',
    'HiResCAM',
    'GradCAMElementWise',
    'GradCAMPlusPlus',
    'XGradCAM',
    'AblationCAM',
    'EigenCAM',
    'EigenGradCAM',
    'LayerCAM',
]


class SemanticSegmentationTarget:
    """target(logits) = sum of class-channel logits where mask == 1."""

    def __init__(self, category: int, mask: np.ndarray):
        self.category = category
        self.mask = jnp.asarray(mask, jnp.float32)

    def __call__(self, logits: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(logits[..., self.category] * self.mask)


def _pca_first_component(a: np.ndarray) -> np.ndarray:
    """Projection onto the first principal component over channels (EigenCAM).
    a: (H, W, C) → (H, W), sign-fixed to non-negative max response."""
    h, w, c = a.shape
    flat = a.reshape(-1, c)
    flat = flat - flat.mean(axis=0, keepdims=True)
    # SVD of (HW, C): first right singular vector = principal channel mix
    _u, _s, vt = np.linalg.svd(flat, full_matrices=False)
    proj = flat @ vt[0]
    if proj.max() < -proj.min():
        proj = -proj
    return proj.reshape(h, w)


class CAMProcessor:
    """CAM extraction for a flax SegmentationModel bundle."""

    def __init__(
        self,
        model,
        variables,
        method: str = 'GradCAM',
        feature_level: Optional[int] = None,
        percentile: int = 99,
    ):
        if method not in CAM_METHODS:
            raise ValueError(f'Unknown CAM method {method!r}; known: {CAM_METHODS}')
        self.model = model
        self.variables = variables
        self.method = method
        if feature_level is None:
            # deepest level the decoder actually consumes: tapping a dead
            # level gives identically-zero gradients (all-blank CAMs). Only
            # PSPNet ignores the deep pyramid (encoder_depth=3 semantics —
            # octseg/models/decoders/pspnet.py); every other decoder reads
            # features[5].
            deep = type(model.decoder).__name__ == 'PSPDecoder'
            feature_level = 3 if deep else 5
        self.level = feature_level
        self.percentile = percentile
        # variables flow through as jit ARGUMENTS — a partial/closure would
        # bake them into the program as constants, whose multi-hundred-MB
        # compile payload relay-attached compile services reject (HTTP 413)
        self._encode = jax.jit(
            lambda v, x: model.apply(v, x, train=False, method='encode')
        )
        self._decode = jax.jit(
            lambda v, feats: model.apply(v, feats, train=False, method='decode')
        )

    # ---- core quantities -------------------------------------------------
    def _acts_and_grads(self, img: np.ndarray, target: SemanticSegmentationTarget):
        feats = self._encode(self.variables, img[None])
        feats = list(feats)
        a = feats[self.level]

        def target_of(act):
            f = list(feats)
            f[self.level] = act
            return target(self._decode(self.variables, f))

        g = jax.grad(target_of)(a)
        return (
            np.asarray(a[0], np.float32),
            np.asarray(g[0], np.float32),
            feats,
        )

    def _ablation_weights(self, feats: List, target: SemanticSegmentationTarget,
                          chunk: int = 32) -> np.ndarray:
        """AblationCAM: per-channel target drop when the channel is zeroed."""
        a = feats[self.level]
        c = a.shape[-1]

        def scored(act):
            f = list(feats)
            f[self.level] = act
            return target(self._decode(self.variables, f))

        base = float(scored(a))

        def ablate_one(ch):
            mask = (jnp.arange(c) != ch).astype(a.dtype)
            return scored(a * mask)

        scores = []
        for start in range(0, c, chunk):
            idx = jnp.arange(start, min(start + chunk, c))
            scores.append(jax.vmap(ablate_one)(idx))
        scores = np.asarray(jnp.concatenate(scores), np.float32)
        # fraction of the target score lost per ablated channel: the divisor
        # keeps base's SIGN (dividing by abs(base) inverts every weight when
        # the masked-logit sum is negative)
        denom = base if abs(base) > 1e-8 else 1e-8
        return (base - scores) / denom

    # ---- public API --------------------------------------------------------
    def extract_activation_map(
        self, img: np.ndarray, category: int, mask: np.ndarray
    ) -> np.ndarray:
        """CAM heatmap in [0, 1] at image resolution.

        img: (H, W, 3) float32 preprocessed exactly as for prediction.
        mask: (H, W) predicted binary mask for the category.
        """
        target = SemanticSegmentationTarget(category, mask)
        a, g, feats = self._acts_and_grads(img.astype(np.float32), target)

        m = self.method
        if m == 'GradCAM':
            w = g.mean(axis=(0, 1))
            cam = np.maximum((a * w).sum(-1), 0)
        elif m == 'HiResCAM':
            cam = np.maximum((a * g).sum(-1), 0)
        elif m == 'GradCAMElementWise':
            cam = np.maximum(np.maximum(a * g, 0).sum(-1), 0)
        elif m == 'GradCAMPlusPlus':
            g2, g3 = g**2, g**3
            denom = 2 * g2 + (a * g3).sum(axis=(0, 1), keepdims=True)
            alpha = np.where(g != 0, g2 / np.where(denom != 0, denom, 1e-8), 0)
            w = (alpha * np.maximum(g, 0)).sum(axis=(0, 1))
            cam = np.maximum((a * w).sum(-1), 0)
        elif m == 'XGradCAM':
            w = (g * a).sum(axis=(0, 1)) / (a.sum(axis=(0, 1)) + 1e-8)
            cam = np.maximum((a * w).sum(-1), 0)
        elif m == 'AblationCAM':
            w = self._ablation_weights(feats, target)
            cam = np.maximum((a * w).sum(-1), 0)
        elif m == 'EigenCAM':
            cam = np.maximum(_pca_first_component(a), 0)
        elif m == 'EigenGradCAM':
            cam = np.maximum(_pca_first_component(a * g), 0)
        elif m == 'LayerCAM':
            cam = np.maximum((np.maximum(g, 0) * a).sum(-1), 0)
        else:  # pragma: no cover
            raise AssertionError(m)

        # robust normalize (pytorch_grad_cam scales by max; use percentile cap
        # for stability) then resize to image resolution
        cap = np.percentile(cam, self.percentile)
        cam = cam / (cap + 1e-7)
        cam = np.clip(cam, 0, 1)
        h, w_ = img.shape[:2]
        cam = np.asarray(resize_bilinear(jnp.asarray(cam[:, :, None]), (h, w_)))[:, :, 0]
        return np.clip(cam, 0, 1)

    @staticmethod
    def overlay_activation_map(
        img: np.ndarray, cam: np.ndarray, image_weight: float = 0.5
    ) -> np.ndarray:
        """show_cam_on_image parity: jet-colormap heatmap blended over the
        (uint8 RGB) image."""
        heat = cv2.applyColorMap((cam * 255).astype(np.uint8), cv2.COLORMAP_JET)
        heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB).astype(np.float32) / 255
        base = img.astype(np.float32) / 255 if img.max() > 1 else img.astype(np.float32)
        out = (1 - image_weight) * heat + image_weight * base
        return (out / max(out.max(), 1e-7) * 255).astype(np.uint8)

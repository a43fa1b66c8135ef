"""Canonical class registry for the four OCT plaque features.

Behavioral parity with the reference class map (reference:
src/data/utils.py:16-45 — ids, RGB colors, reversed maps). The channel
convention used everywhere in the framework is ``channel = class_id - 1`` in
(H, W, 4) masks with values {0, 255} on disk and {0, 1} on device.
"""

from __future__ import annotations

CLASS_MAP = {
    'Lumen': {'id': 1, 'color': [228, 30, 199]},
    'Fibrous cap': {'id': 2, 'color': [123, 171, 226]},
    'Lipid core': {'id': 3, 'color': [125, 227, 127]},
    'Vasa vasorum': {'id': 4, 'color': [208, 2, 27]},
}

CLASS_COLORS_RGB = {name: tuple(info['color']) for name, info in CLASS_MAP.items()}

CLASS_COLORS_BGR = {name: tuple(info['color'][::-1]) for name, info in CLASS_MAP.items()}

CLASS_IDS = {name: info['id'] for name, info in CLASS_MAP.items()}

CLASS_IDS_REVERSED = {v: k for k, v in CLASS_IDS.items()}

ALL_CLASSES = list(CLASS_MAP.keys())
NUM_CLASSES = len(CLASS_MAP)

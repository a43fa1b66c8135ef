"""octseg — TPU-native OCT plaque segmentation framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
ViacheslavDanilov/oct_segmentation (see SURVEY.md): segmentation of four
atherosclerotic plaque features (Lumen, Fibrous cap, Lipid core, Vasa vasorum)
in OCT pullbacks with nine encoder-decoder model families, device-fused
pre/post-processing, hybrid per-feature ensemble inference, 5-fold CV training,
Bayesian/HyperBand tuning, CAM explainability, and quantification analytics.
"""

import os

__version__ = '0.2.0'  # 0.2: bitpacked mask transport (invalidates AOT exports)

# Repository root (parent of the octseg package), mirroring the reference's
# src/__init__.py PROJECT_DIR convention so configs/paths resolve the same way.
PROJECT_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

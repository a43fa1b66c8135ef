#!/usr/bin/env bash
# Run the CAM driver over all 9 methods (role of the reference's
# src/models/visualize_activation_maps.sh).
set -euo pipefail
for method in GradCAM HiResCAM GradCAMElementWise GradCAMPlusPlus XGradCAM \
              AblationCAM EigenCAM EigenGradCAM LayerCAM; do
  python -m octseg.explain.visualize_activation_maps cam_method="${method}" "$@"
done

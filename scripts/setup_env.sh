#!/usr/bin/env bash
# Environment bootstrap for a generic TPU VM (role of the reference's
# make_env.sh + environment.yaml). The benchmark image has everything baked.
set -euo pipefail

python -m pip install --upgrade pip
# TPU runtime + frameworks
pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install flax optax
# host-side IO / analytics / tests
pip install opencv-python-headless pillow pyyaml numpy pandas scikit-learn \
    scipy matplotlib seaborn pytest
# octseg itself (native components build lazily with g++ on first import)
pip install -e . --no-build-isolation
python -m pytest tests/ -x -q

"""Model profiler: FLOPs / parameter counts for any arch × encoder.

Framework equivalent of the reference profiler (reference:
src/models/get_model_info.py:20-43, which uses ptflops at 512x512x3). Here the
numbers come from the XLA compiler itself — jit(...).lower().compile()
.cost_analysis() — which reports the FLOPs of the program that actually runs
on the TPU, not a torch-module estimate.

Config: configs/get_model_info.yaml.
Usage: python -m octseg.models.get_model_info [key=value ...]
"""

from __future__ import annotations

import functools
import logging

from octseg.core.config import Config, entry_point

log = logging.getLogger(__name__)


def model_info(architecture: str, encoder: str, input_size: int = 512,
               classes: int = 4) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from octseg.models import create_model

    model = create_model(architecture, encoder, classes=classes)
    x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    rngs = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(0)}
    shapes = jax.eval_shape(functools.partial(model.init, train=False), rngs, x)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes['params']))

    fwd = jax.jit(functools.partial(model.apply, train=False))
    cost = fwd.lower(shapes, x).compile().cost_analysis()
    flops = float(cost.get('flops', 0.0))
    return {
        'architecture': architecture,
        'encoder': encoder,
        'input_size': input_size,
        'params': n_params,
        'params_m': round(n_params / 1e6, 2),
        'flops': flops,
        'gflops': round(flops / 1e9, 2),
        'bytes_accessed': float(cost.get('bytes accessed', 0.0)),
    }


@entry_point('get_model_info')
def main(cfg: Config) -> None:
    info = model_info(
        cfg.architecture, cfg.encoder, int(cfg.get('input_size', 512)),
        int(cfg.get('num_classes', 4)),
    )
    log.info('Model complexity:')
    for k, v in info.items():
        log.info('  %s: %s', k, v)


if __name__ == '__main__':
    main()

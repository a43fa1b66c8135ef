"""Checkpointing: single-file weights for inference + full-state resume.

Mirrors the reference's artifact contract — a ``weights.ckpt`` file next to a
``config.json`` manifest per model dir (reference: src/models/smp/train.py:
105-119 manifest; predict.py:31-50 loads both) — and adds what the reference
lacks (SURVEY.md §5): a resume checkpoint carrying optimizer state and epoch
so training restarts continue where they left off.

Format is flax msgpack (single file, atomic rename), chosen over directory
checkpoints so the model dir layout stays byte-compatible with the reference
(weights.ckpt + config.json + metrics.csv).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

from flax import serialization


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(data)
    os.replace(tmp, path)


def _fetch(tree: Any) -> Any:
    """One batched device_get for the whole tree: per-leaf fetches inside
    msgpack_serialize cost a host<->device round trip EACH (~30 ms on a
    tunneled chip x hundreds of leaves, r2), batching collapses them into a
    single transfer."""
    import jax

    return jax.device_get(tree)


def save_weights(path: str, params: Any, batch_stats: Any) -> None:
    payload = _fetch({'params': params, 'batch_stats': batch_stats})
    _atomic_write(path, serialization.msgpack_serialize(
        serialization.to_state_dict(payload)))


def load_weights(path: str) -> Dict[str, Any]:
    with open(path, 'rb') as f:
        return serialization.msgpack_restore(f.read())


def restore_weights_into(variables: Dict[str, Any], path: str) -> Dict[str, Any]:
    """Restore a weights.ckpt into a freshly-initialized variables tree."""
    raw = load_weights(path)
    return {
        'params': serialization.from_state_dict(variables['params'], raw['params']),
        'batch_stats': serialization.from_state_dict(
            variables['batch_stats'], raw['batch_stats']
        ),
    }


def save_resume(path: str, state: Any, epoch: int, extra: Optional[dict] = None) -> None:
    payload = {
        'state': serialization.to_state_dict(_fetch(state)),
        'epoch': epoch,
        'extra': extra or {},
    }
    _atomic_write(path, serialization.msgpack_serialize(payload))


def load_resume(path: str, state_template: Any) -> Tuple[Any, int, dict]:
    with open(path, 'rb') as f:
        raw = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(state_template, raw['state'])
    return state, int(raw['epoch']), dict(raw.get('extra', {}))


def initialize_model_dir(
    model_dir: str,
    classes,
    arch: str = 'Unet',
    encoder: str = 'resnet18',
    input_size: int = 512,
    seed: int = 0,
    init_size: int | None = None,
) -> str:
    """Create a model dir with randomly-initialized weights + manifest
    (reference layout: weights.ckpt + config.json). Used by benchmarks and
    tests; training overwrites weights.ckpt with real ones. ``init_size``
    lets callers initialize at a small spatial size (shapes are
    size-independent for these convnets) while the manifest declares the
    real ``input_size`` — a full-size init is a multi-minute XLA compile."""
    import jax
    import jax.numpy as jnp

    from octseg.models import create_model

    os.makedirs(model_dir, exist_ok=True)
    model = create_model(arch, encoder, classes=len(classes))
    size = init_size or input_size
    sample = jnp.zeros((1, size, size, 3), jnp.float32)
    rng = jax.random.PRNGKey(seed)
    variables = jax.jit(
        lambda r, x: model.init({'params': r, 'dropout': r}, x, train=False)
    )(rng, sample)
    save_weights(
        os.path.join(model_dir, 'weights.ckpt'),
        variables['params'], variables['batch_stats'],
    )
    with open(os.path.join(model_dir, 'config.json'), 'w') as f:
        json.dump(
            {
                'model_name': f'{arch}_{encoder}',
                'architecture': arch,
                'encoder': encoder,
                'input_size': input_size,
                'classes': list(classes),
                'batch_size': 4,
                'optimizer': 'Adam',
                'lr': 1e-4,
                'normalize': True,  # octseg-trained: inference matches training
            },
            f, indent=2,
        )
    return model_dir


def save_manifest(model_dir: str, cfg: Any, model_name: str) -> None:
    """config.json with the exact reference keys (train.py:105-119)."""
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, 'config.json'), 'w') as f:
        json.dump(
            {
                'model_name': model_name,
                'architecture': cfg.architecture,
                'encoder': cfg.encoder,
                'input_size': cfg.input_size,
                'classes': list(cfg.classes),
                'batch_size': cfg.batch_size,
                'optimizer': cfg.optimizer,
                'lr': cfg.lr,
                # octseg-trained models apply ImageNet mean/std at inference
                # exactly as in training. Reference-converted dirs omit the
                # key, preserving the reference predict() quirk of skipping
                # normalization (src/models/smp/model.py:183-200).
                'normalize': True,
            },
            f,
            indent=2,
        )

"""Convergence proof: the training stack can actually learn segmentation.

The real dataset is unreachable (DVC pointers to Google Drive, zero egress),
so this trains on procedurally generated OCT-like data with exact ground
truth (octseg.data.synth) and asserts Dice — the reference's headline metric
(README.md:70-75) — reaches overfit-perfection on the train set and a sane
score on held-out frames.  Calibrated on this rig: Unet/resnet18 @64px
reaches dice 0.98 by ~50 steps at lr 1e-3.

The chip-scale runs of the reference's three winning configs live in
scripts/train_synth.py; their eval_*.json artifacts are committed under
eval/synth/.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from octseg.data.synth import make_synth_fold
from octseg.models import create_model
from octseg.ops.normalize import normalize_imagenet
from octseg.train import checkpoint as ckpt
from octseg.train.data import OCTDataset
from octseg.train.state import TrainState, make_optimizer
from octseg.train.train import make_train_step


@pytest.fixture(scope='module')
def synth_fold(tmp_path_factory):
    root = tmp_path_factory.mktemp('synth') / 'fold'
    make_synth_fold(str(root), n_train=8, n_test=4, size=64, seed=3)
    return str(root)


def _load_split(fold, split, classes, size=64):
    ds = OCTDataset(os.path.join(fold, split), classes, size)
    pairs = [ds.load(i) for i in range(len(ds))]
    return (jnp.asarray(np.stack([p[0] for p in pairs])),
            jnp.asarray(np.stack([p[1] for p in pairs])))


@pytest.mark.heavy  # fast-tier training coverage: test_train; convergence artifacts: eval/synth_fullscale, eval/demo_realdata
def test_convergence_and_heldout_dice(synth_fold, tmp_path):
    """Overfit train dice >= 0.95 within 60 steps; held-out dice >= 0.5;
    the trained weights round-trip through the model-dir contract and the
    evaluation harness (octseg.train.evaluate)."""
    classes = ['Lumen']
    imgs, masks = _load_split(synth_fold, 'train', classes)

    model = create_model('Unet', 'resnet18', classes=len(classes))
    rng = jax.random.PRNGKey(0)
    variables = model.init({'params': rng, 'dropout': rng}, imgs[:1], train=False)
    tx = make_optimizer('Adam', 1e-3, 0.0)
    state = TrainState.create(variables['params'], variables['batch_stats'], tx)
    step = jax.jit(make_train_step(model, use_augmentation=False),
                   donate_argnums=(0,))

    dice = 0.0
    for i in range(60):
        state, metrics = step(state, imgs, masks, jax.random.fold_in(rng, i))
        dice = float(np.mean(metrics['dice']))
    assert dice >= 0.95, f'train dice after 60 steps: {dice}'

    # persist through the reference model-dir contract and score both splits
    # with the DSC-parity harness
    model_dir = tmp_path / 'LM'
    model_dir.mkdir()
    ckpt.save_weights(str(model_dir / 'weights.ckpt'), state.params,
                      state.batch_stats)
    import json

    with open(model_dir / 'config.json', 'w') as f:
        json.dump({'model_name': 'Unet_resnet18', 'architecture': 'Unet',
                   'encoder': 'resnet18', 'input_size': 64, 'classes': classes,
                   'batch_size': 8, 'optimizer': 'Adam', 'lr': 1e-3,
                   'normalize': True}, f)

    from octseg.train.evaluate import evaluate_model

    train_scores = evaluate_model(str(model_dir), synth_fold, split='train')
    heldout = evaluate_model(str(model_dir), synth_fold, split='test')
    assert train_scores['Lumen']['dice'] >= 0.9, train_scores
    assert heldout['Lumen']['dice'] >= 0.5, heldout


def test_evaluate_applies_training_normalization(synth_fold, tmp_path):
    """evaluate_model must feed images through the same mean/std
    normalization the trainer uses (guards the r2 regression: the harness fed
    raw 0..255 floats into normalization-trained models and scored ~0)."""
    import json

    classes = ['Lumen']
    imgs, masks = _load_split(synth_fold, 'test', classes)
    model = create_model('Unet', 'resnet18', classes=1)
    rng = jax.random.PRNGKey(1)
    variables = model.init({'params': rng, 'dropout': rng}, imgs[:1], train=False)

    model_dir = tmp_path / 'M'
    model_dir.mkdir()
    ckpt.save_weights(str(model_dir / 'weights.ckpt'), variables['params'],
                      variables['batch_stats'])
    with open(model_dir / 'config.json', 'w') as f:
        json.dump({'model_name': 'Unet_resnet18', 'architecture': 'Unet',
                   'encoder': 'resnet18', 'input_size': 64, 'classes': classes,
                   'batch_size': 4, 'optimizer': 'Adam', 'lr': 1e-3,
                   'normalize': True}, f)

    from octseg.ops.normalize import sigmoid_threshold
    from octseg.train.evaluate import evaluate_model
    from octseg.train.metrics import compute_metrics

    got = evaluate_model(str(model_dir), synth_fold, split='test')

    logits = model.apply(variables, normalize_imagenet(imgs), train=False)
    want = compute_metrics(sigmoid_threshold(logits), masks, jnp.float32(0))
    np.testing.assert_allclose(
        got['Lumen']['dice'], float(np.mean(np.asarray(want['dice'])[:, 0])),
        rtol=1e-5,
    )

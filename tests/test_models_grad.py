"""Differentiability of every architecture (eval_shape — no compilation)."""

import functools

import jax
import jax.numpy as jnp
import pytest

from octseg.models import SUPPORTED_ARCHITECTURES, create_model
from octseg.train.losses import dice_loss_from_logits

RNGS = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}


@pytest.mark.parametrize('arch', SUPPORTED_ARCHITECTURES)
def test_arch_backward_shapes(arch):
    model = create_model(arch, 'resnet18', classes=2)
    # SMP PAN's FPA maxpool pyramid needs a >=8px deepest map (os=16)
    size = 128 if arch == 'PAN' else 64
    x = jnp.zeros((2, size, size, 3), jnp.float32)
    y = jnp.zeros((2, size, size, 2), jnp.float32)
    variables = jax.eval_shape(functools.partial(model.init, train=False), RNGS, x)

    def loss_fn(params, batch_stats):
        logits, _mutated = model.apply(
            {'params': params, 'batch_stats': batch_stats},
            x, train=True, mutable=['batch_stats'],
            rngs={'dropout': RNGS['dropout']},
        )
        return dice_loss_from_logits(logits, y)

    grads = jax.eval_shape(
        lambda p, b: jax.grad(loss_fn)(p, b),
        variables['params'], variables['batch_stats'],
    )
    # every parameter receives a gradient of its own shape
    flat_p = jax.tree.leaves(variables['params'])
    flat_g = jax.tree.leaves(grads)
    assert len(flat_p) == len(flat_g)
    for p, g in zip(flat_p, flat_g):
        assert p.shape == g.shape

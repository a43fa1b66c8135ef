import functools

import jax
import jax.numpy as jnp
import pytest

from octseg.models import (
    SUPPORTED_ARCHITECTURES,
    create_model,
    encoder_out_channels,
    get_preprocessing_params,
    normalize_arch,
)

RNGS = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(1)}


@pytest.mark.parametrize('arch', SUPPORTED_ARCHITECTURES)
def test_arch_output_shape(arch):
    # SMP PAN needs a >=8px deepest map (its FPA maxpool pyramid collapses
    # below 128px input at output_stride 16 — same constraint in torch smp)
    size = 128 if arch == 'PAN' else 64
    x = jnp.zeros((2, size, size, 3), jnp.float32)
    model = create_model(arch, 'resnet18', classes=4)
    shapes = jax.eval_shape(functools.partial(model.init, train=False), RNGS, x)
    out = jax.eval_shape(functools.partial(model.apply, train=False), shapes, x)
    assert out.shape == (2, size, size, 4)
    assert out.dtype == jnp.float32


@pytest.mark.parametrize(
    'encoder,expected',
    [
        ('resnet18', (3, 64, 64, 128, 256, 512)),
        ('resnet50', (3, 64, 256, 512, 1024, 2048)),
        ('resnet101', (3, 64, 256, 512, 1024, 2048)),
        ('timm-regnetx_002', (3, 32, 24, 56, 152, 368)),
        ('timm-regnetx_064', (3, 32, 168, 392, 784, 1624)),
        ('timm-regnety_120', (3, 32, 224, 448, 896, 2240)),
        ('efficientnet-b0', (3, 32, 24, 40, 112, 320)),
        ('efficientnet-b5', (3, 48, 40, 64, 176, 512)),
        ('efficientnet-b7', (3, 64, 48, 80, 224, 640)),
    ],
)
def test_encoder_channels(encoder, expected):
    # channel contract matches the SMP encoders the reference uses
    assert tuple(encoder_out_channels(encoder)) == expected


@pytest.mark.parametrize('encoder', ['resnet18', 'timm-regnetx_002', 'efficientnet-b0'])
def test_encoder_pyramid_shapes(encoder):
    from octseg.models.encoders import create_encoder

    enc = create_encoder(encoder)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(functools.partial(enc.init, train=False), RNGS, x)
    feats = jax.eval_shape(functools.partial(enc.apply, train=False), shapes, x)
    expected_ch = encoder_out_channels(encoder)
    assert len(feats) == 6
    for i, (f, ch) in enumerate(zip(feats, expected_ch)):
        assert f.shape[1] == 64 // (2**i), (i, f.shape)
        assert f.shape[3] == ch, (i, f.shape, ch)


def test_arch_name_normalization():
    # the reference uses both 'unet' (train.yaml) and 'Unet' (tune.yaml)
    assert normalize_arch('unet') == normalize_arch('Unet')
    assert normalize_arch('UnetPlusPlus') == 'unetplusplus'
    assert normalize_arch('Linknet') == normalize_arch('LinkNet')
    with pytest.raises(ValueError):
        normalize_arch('nope')


def test_preprocessing_params():
    p = get_preprocessing_params('resnet50')
    assert p['mean'] == [0.485, 0.456, 0.406]
    assert p['std'] == [0.229, 0.224, 0.225]


def test_real_forward_unet():
    x = jnp.ones((1, 32, 32, 3), jnp.float32) * 0.5
    model = create_model('Unet', 'resnet18', classes=2)
    variables = model.init(RNGS, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 32, 32, 2)
    assert jnp.all(jnp.isfinite(out))


def test_train_mode_updates_batch_stats():
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    model = create_model('Unet', 'resnet18', classes=1)
    variables = model.init(RNGS, x, train=False)
    out, mutated = model.apply(
        variables, x, train=True, mutable=['batch_stats'], rngs={'dropout': RNGS['dropout']}
    )
    assert 'batch_stats' in mutated


@pytest.mark.heavy  # remat equivalence; exercised at scale by benchmarks/train_fullscale.py
def test_block_remat_is_transparent():
    """Per-block rematerialization (octseg.models.rematutil) must not change
    parameter paths (checkpoints are remat-agnostic) nor outputs, and grads
    must flow through the checkpointed blocks."""
    import jax
    import jax.numpy as jnp

    import numpy as np

    from octseg.models import create_model, rematutil

    m = create_model('Unet', 'resnet18', classes=2)
    k = {'params': jax.random.PRNGKey(0), 'dropout': jax.random.PRNGKey(0)}
    x = jnp.ones((1, 64, 64, 3))
    try:
        v1 = m.init(k, x, train=False)
        rematutil.set_block_remat(True)
        v2 = m.init(k, x, train=False)
        assert jax.tree.structure(v1) == jax.tree.structure(v2)
        o1 = m.apply(v1, x, train=False)
        o2 = m.apply(v2, x, train=False)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

        def loss(p):
            out, _ = m.apply(
                {'params': p, 'batch_stats': v2['batch_stats']},
                jnp.ones((2, 64, 64, 3)), train=True, mutable=['batch_stats'],
                rngs={'dropout': jax.random.PRNGKey(1)},
            )
            return (out ** 2).mean()

        g = jax.grad(loss)(v2['params'])
        leaves = jax.tree.leaves(g)
        assert any(float(jnp.abs(leaf).max()) > 0 for leaf in leaves)
    finally:
        rematutil.set_block_remat(False)

"""Int8 quantized-conv correctness (octseg/ops/quantize.py).

Small single-conv cases only: XLA:CPU lowers int8 convs through a slow
generic path, so whole-model int8 runs are TPU-only (bench.py --int8 and
the engine's int8 flag); these tests pin the math and the interceptor
wiring cheaply.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from octseg.ops.quantize import (
    MIN_MACS,
    _eligible,
    apply_int8,
    quantized_conv,
)


def _rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape)
                       .astype(np.float32))


@pytest.mark.parametrize('strides,padding,bias', [
    ((1, 1), ((1, 1), (1, 1)), True),
    ((2, 2), 'SAME', False),
    # flax also accepts int and per-dim-int padding — the int8 path must
    # replicate those, not crash unpacking them
    ((1, 1), 1, False),
    ((1, 1), (2, 1), True),
])
def test_quantized_conv_close_to_fp32(strides, padding, bias):
    x = _rand((2, 16, 16, 64))
    conv = nn.Conv(64, (3, 3), strides=strides, padding=padding, use_bias=bias)
    v = conv.init(jax.random.PRNGKey(0), x)
    ref = conv.apply(v, x)
    got = quantized_conv(
        x, v['params']['kernel'],
        v['params']['bias'] if bias else None, conv)
    assert got.shape == ref.shape
    rel = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel


def test_quantized_conv_dilated():
    x = _rand((1, 16, 16, 64))
    conv = nn.Conv(64, (3, 3), kernel_dilation=(2, 2),
                   padding=((2, 2), (2, 2)), use_bias=False)
    v = conv.init(jax.random.PRNGKey(1), x)
    ref = conv.apply(v, x)
    got = quantized_conv(x, v['params']['kernel'], None, conv)
    rel = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    assert got.shape == ref.shape and rel < 0.05


def test_eligibility_rules():
    k = jnp.zeros((3, 3, 64, 64))
    assert _eligible(nn.Conv(64, (3, 3)), k)
    # depthwise/grouped convs stay exact (VPU-bound)
    assert not _eligible(nn.Conv(64, (3, 3), feature_group_count=64), k)
    # tiny convs stay exact (no MXU win, pure accuracy loss)
    assert not _eligible(nn.Conv(4, (1, 1)), jnp.zeros((1, 1, 3, 4)))
    assert 3 * 3 * 64 * 64 * 1 >= MIN_MACS


class _TwoConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (3, 3), padding=((1, 1), (1, 1)), name='big')(x)
        x = nn.relu(x)
        return nn.Conv(2, (1, 1), name='tiny')(x)


def test_interceptor_swaps_only_eligible_convs():
    m = _TwoConv()
    x = _rand((1, 8, 8, 64), seed=3)
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)
    got = jax.jit(lambda v, x: apply_int8(m, v, x))(v, x)
    assert got.shape == ref.shape
    rel = float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref)))
    assert 0 < rel < 0.05  # changed (big conv quantized) but close
    # the tiny head conv is exact given identical inputs: feeding the same
    # feature map through only the second conv must match bit-for-bit
    feat = _rand((1, 8, 8, 64), seed=4)
    sub = nn.Conv(2, (1, 1))
    sv = {'params': v['params']['tiny']}
    with jax.disable_jit():
        a = sub.apply(sv, feat)
        from octseg.ops.quantize import int8_conv_mode
        with int8_conv_mode():
            b = sub.apply(sv, feat)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

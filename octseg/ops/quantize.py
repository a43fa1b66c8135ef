"""Int8 inference quantization for the MXU-bound models.

v5e's MXU runs int8 at 2x the bf16 peak (394 vs 197 TOPS), and the r2 bench
physics put U-Net++/resnet101 at 59% bf16 MFU — MXU-bound, so int8 is the
identified headroom lever (VERDICT r2 item 1; docs/NEXT.md). This module
quantizes convolutions transparently for ANY octseg model via a flax method
interceptor — no per-architecture model changes:

- weights: symmetric per-output-channel int8 (scale = amax / 127 over
  h, w, cin), computed in-graph from the replicated kernel (a tiny reduction
  vs the conv itself),
- activations: symmetric per-tensor dynamic int8 (scale = amax / 127 over
  the whole tensor — one bandwidth pass, VPU-cheap),
- conv: int8 x int8 -> int32 on the MXU (preferred_element_type), dequantized
  by scale_a * scale_w[channel] in f32, bias added, cast back to the
  compute dtype.

Only plain (non-grouped) convs with enough arithmetic intensity are
quantized — depthwise/grouped convs are VPU-roofline on this chip
(docs/NEXT.md measurements) and tiny convs lose accuracy for no time.
The reference has no quantized path (torch fp32, src/models/smp/model.py);
this is an octseg-only opt-in (engine ``int8=True``, bench --int8).
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# quantize only convs whose per-pixel arithmetic (k*k*cin*cout MACs) is MXU
# territory; below this the conv is bandwidth/VPU-bound and int8 only adds
# quantization error
MIN_MACS = 64 * 64 * 9


def _pair(v) -> tuple:
    """Canonicalize a flax conv size attribute (None | int | sequence)."""
    if v is None:
        return (1, 1)
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def _amax(x, axes=None):
    a = jnp.max(jnp.abs(x), axis=axes, keepdims=axes is not None)
    return jnp.maximum(a.astype(jnp.float32), 1e-8)


def quantized_conv(x: jnp.ndarray, kernel: jnp.ndarray, bias, conv: nn.Conv):
    """The int8 path for one nn.Conv call (NHWC x HWIO), replicating the
    module's padding/stride/dilation semantics."""
    k_h, k_w, cin, cout = kernel.shape
    # activation: per-tensor dynamic symmetric
    sa = _amax(x)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (127.0 / sa)),
                  -127, 127).astype(jnp.int8)
    # weights: per-output-channel symmetric
    sw = _amax(kernel, axes=(0, 1, 2))  # (1, 1, 1, cout)
    wq = jnp.clip(jnp.round(kernel.astype(jnp.float32) * (127.0 / sw)),
                  -127, 127).astype(jnp.int8)

    # flax nn.Conv accepts: str | int | sequence of (int | (lo, hi) pair)
    padding = conv.padding
    if isinstance(padding, str):
        pad = padding
    elif isinstance(padding, int):
        pad = ((padding, padding),) * 2
    else:
        pad = tuple(
            (int(p), int(p)) if isinstance(p, int) else (int(p[0]), int(p[1]))
            for p in padding)
        if len(pad) == 1:
            pad = pad * 2
    y = jax.lax.conv_general_dilated(
        xq, wq,
        window_strides=_pair(conv.strides),
        padding=pad,
        rhs_dilation=_pair(conv.kernel_dilation),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        feature_group_count=conv.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    scale = (sa * sw.reshape(1, 1, 1, cout)) / (127.0 * 127.0)
    y = y.astype(jnp.float32) * scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    dtype = conv.dtype or x.dtype
    return y.astype(dtype)


def _eligible(conv: nn.Conv, kernel) -> bool:
    if conv.feature_group_count != 1:
        return False  # depthwise: VPU-bound, int8 buys nothing
    if _pair(conv.input_dilation) != (1, 1):
        return False  # transposed-style convs: keep exact
    k_h, k_w, cin, cout = kernel.shape
    return k_h * k_w * cin * cout >= MIN_MACS


def _interceptor(next_fn, args, kwargs, context):
    mod = context.module
    if (type(mod) is nn.Conv and context.method_name == '__call__'
            and mod.scope is not None
            and mod.scope.has_variable('params', 'kernel')):
        kernel = mod.scope.get_variable('params', 'kernel')
        if _eligible(mod, kernel):
            bias = (mod.scope.get_variable('params', 'bias')
                    if mod.scope.has_variable('params', 'bias') else None)
            return quantized_conv(args[0], kernel, bias, mod)
    return next_fn(*args, **kwargs)


@contextlib.contextmanager
def int8_conv_mode():
    """Context manager: every eligible nn.Conv inside model.apply runs the
    int8 MXU path. Usage:

        with int8_conv_mode():
            logits = model.apply(variables, x, train=False)
    """
    with nn.intercept_methods(_interceptor):
        yield


def apply_int8(model, variables, x, **kwargs) -> Any:
    """model.apply with int8 convs (jit-safe: the interceptor only rewires
    tracing, so wrap the whole call in jit as usual)."""
    with int8_conv_mode():
        return model.apply(variables, x, **kwargs)

"""Pallas TPU kernel: two-pass projective warp (the augmentation sampler).

Replaces the gather-based warp in octseg.ops.warp._sample_pair_fused for the
training augmentation hot path. XLA lowers per-pixel gathers on TPU to
per-index DMAs (~30-60 ns/index: a 16x512x512 batch costs ~115 ms — measured,
r2), so the warp is re-expressed with NO gathers at all, using the classic
two-pass (Catmull-Smith) decomposition:

  pass 1 (horizontal): for every SOURCE row y, resample along x at
      px(y, u) = sx(u, v(y, u)), where v(y, u) inverts the row equation
      y = sy(u, v) of the 3x3 inverse homography M;
  pass 2 (vertical, run as a horizontal pass on the transposed
      intermediate): out[v, u] = resample of J[:, u] along y at sy(u, v).

Each 1-D resample row is a small matmul on the MXU: the (S, T) interpolation
matrix holds hat(x - pos[t]) weights (bilinear, image channels) or box
indicator weights (nearest, mask channels) and is built in VMEM from a 2-D
iota — sparse-by-construction, never materialized to HBM. One kernel serves
both passes; XLA does the cheap layout transposes between them.

Semantics (parity targets, octseg.ops.warp):
- zero border: hat/box weights vanish outside [0, S-1], reproducing the
  zero-padded taps of _sample_pair_fused exactly (half-outside positions
  contribute partial weight, fully-outside positions produce 0);
- nearest = round-half-up, the tap-select rule of _sample_pair_fused;
- weights/taps in bfloat16 (same quantization budget as the gather path:
  <=0.5/255, below uint8 source precision), accumulation in float32.

For axis-aligned maps (flip / shift / scale / crop — no rotation or
perspective) the two-pass result equals the direct 4-tap sampler to bf16
tolerance. With rotation/perspective the x-positions of the two y-taps are
evaluated on their own source rows (sampling along the warped line), which
differs from the axis-aligned 4-tap stencil by O(|dsx/dv|) <= 0.3 px — an
equally valid resampling of the same homography; augmentation requires
distribution parity, not bit parity (SURVEY.md §7).

The reference's equivalent work is cv2.warpAffine/warpPerspective inside
albumentations on CPU workers (reference: src/models/smp/dataset.py:160-207).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_PAD = 16  # channel rows padded to the bf16 sublane tile
_EPS = 1e-6


def _make_kernel(kind: int, n_img: int, n_mask: int, block_rows: int,
                 s_len: int, t_len: int):
    """kind 0: rows are source y, cols are output u, positions px(y, u).
    kind 1: rows are output columns u (of the transposed intermediate),
    cols are output rows v, positions sy(u, v)."""

    def kernel(mat_ref, in_ref, out_ref):
        m00 = mat_ref[0, 0, 0]
        m01 = mat_ref[0, 0, 1]
        m02 = mat_ref[0, 0, 2]
        m10 = mat_ref[0, 0, 3]
        m11 = mat_ref[0, 0, 4]
        m12 = mat_ref[0, 0, 5]
        m20 = mat_ref[0, 0, 6]
        m21 = mat_ref[0, 0, 7]
        m22 = mat_ref[0, 0, 8]
        r0 = pl.program_id(1) * block_rows
        # output-axis coordinate (1, T) and source-axis iota (S, T)
        t = jax.lax.broadcasted_iota(jnp.int32, (1, t_len), 1).astype(jnp.float32)
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (s_len, t_len), 0).astype(
            jnp.float32
        )
        # image rows contribute through hat weights, mask rows through box
        # weights: select per channel row after two full-width dots (the dots
        # are tiny; full width keeps the sublane tiling trivial)
        ch = jax.lax.broadcasted_iota(jnp.int32, (C_PAD, 1), 0)
        img_row = (ch < n_img).astype(jnp.float32)

        for j in range(block_rows):
            r = (r0 + j).astype(jnp.float32)
            if kind == 0:
                # v(y, u): the source row of output row v crossing row y at u
                den = r * m21 - m11
                den = jnp.where(jnp.abs(den) < _EPS, _EPS, den)
                v = (m10 * t + m12 - r * (m20 * t + m22)) / den
                wp = m20 * t + m21 * v + m22
                wp = jnp.where(jnp.abs(wp) < _EPS, _EPS, wp)
                pos = (m00 * t + m01 * v + m02) / wp
            else:
                wp = m20 * r + m21 * t + m22
                wp = jnp.where(jnp.abs(wp) < _EPS, _EPS, wp)
                pos = (m10 * r + m11 * t + m12) / wp
            d = s_iota - pos  # (S, T) f32, broadcast over rows
            s_lin = jnp.maximum(0.0, 1.0 - jnp.abs(d)).astype(jnp.bfloat16)
            s_box = ((d > -0.5) & (d <= 0.5)).astype(jnp.bfloat16)
            row = in_ref[0, j]  # (C_PAD, S) bf16
            out_lin = jnp.dot(row, s_lin, preferred_element_type=jnp.float32)
            out_box = jnp.dot(row, s_box, preferred_element_type=jnp.float32)
            out = out_lin * img_row + out_box * (1.0 - img_row)
            out_ref[0, j] = out.astype(jnp.bfloat16)

    return kernel


def _pick_block_rows(rows: int) -> int:
    for br in (8, 4, 2, 1):
        if rows % br == 0:
            return br
    return 1


@functools.partial(jax.jit, static_argnames=('kind', 'n_img', 'n_mask', 'interpret'))
def _pass_call(x: jnp.ndarray, m9: jnp.ndarray, kind: int, n_img: int,
               n_mask: int, interpret: bool = False) -> jnp.ndarray:
    """x: (N, R, C_PAD, S) bf16 channel-major rows; returns (N, R, C_PAD, T)."""
    n, rows, cpad, s_len = x.shape
    m9 = m9.reshape(n, 1, 9)
    t_len = s_len  # square warps only (the augmentation use case)
    br = _pick_block_rows(rows)
    kernel = _make_kernel(kind, n_img, n_mask, br, s_len, t_len)
    return pl.pallas_call(
        kernel,
        grid=(n, rows // br),
        in_specs=[
            pl.BlockSpec((1, 1, 9), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, br, cpad, s_len), lambda i, j: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, br, cpad, t_len), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, rows, cpad, t_len), jnp.bfloat16),
        interpret=interpret,
    )(m9, x)


def warp_pair_2pass(imgs: jnp.ndarray, masks: jnp.ndarray, mats: jnp.ndarray,
                    interpret: bool = False):
    """Warp a batch by per-sample inverse homographies without gathers.

    imgs (N, H, W, Ci) float32, bilinear; masks (N, H, W, Cm) float32,
    nearest; mats (N, 3, 3) output->source maps. Returns float32 pairs with
    zero borders. Requires Ci + Cm <= C_PAD and H == W (augmentation frames
    are square; the fold builder emits square crops).
    """
    n, h, w, ci = imgs.shape
    cm = masks.shape[-1]
    if ci + cm > C_PAD:
        raise ValueError(f'too many channels: {ci}+{cm} > {C_PAD}')
    if h != w:
        raise ValueError('warp_pair_2pass requires square frames')
    x = jnp.concatenate([imgs, masks], axis=-1).astype(jnp.bfloat16)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, C_PAD - ci - cm)))
    xm = jnp.transpose(x, (0, 1, 3, 2))  # (N, H, C, W): rows = source y
    m9 = mats.reshape(n, 9).astype(jnp.float32)
    j = _pass_call(xm, m9, kind=0, n_img=ci, n_mask=cm, interpret=interpret)
    jt = jnp.transpose(j, (0, 3, 2, 1))  # (N, W, C, H): rows = columns u
    o = _pass_call(jt, m9, kind=1, n_img=ci, n_mask=cm, interpret=interpret)
    out = jnp.transpose(o, (0, 3, 1, 2)).astype(jnp.float32)  # (N, V, U, C)
    return out[..., :ci], out[..., ci:ci + cm]

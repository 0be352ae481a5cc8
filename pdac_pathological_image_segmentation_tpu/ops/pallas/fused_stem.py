"""Pallas kernel: fused ResNet stem — uint8 pixels → normalize → 7×7/2 conv
→ BatchNorm → ReLU → 3×3/2 maxpool, one HBM read + one HBM write.

Replaces the four separate XLA passes at the top of every encoder forward
(reference ``models/resunet.py:25-28`` — conv1/bn1/relu/maxpool), which at
bs=512/512² on v5e cost ~22.5 ms/step: normalize 1.9 + input layout copy
2.9 + stem conv 9.2 + maxpool(+bn+relu) 8.5 (round-2 profile).  The chain
is bandwidth-dominated because XLA materializes the stride-2 conv's
[N,256,256,64] activation in HBM (4.3 GB at bs=512) just to immediately
max-pool it down 4×.

Design (TPU-first):

* the conv runs as an implicit GEMM over a **space-to-depth** view: the
  7×7/2/pad-3 conv on 3 channels becomes a dense 4×4/1 conv on 12 channels
  (K = 4·4·12 = 192 contraction — vs 64 when XLA contracts input channels
  only), computed as ``W[64,192] @ A[192, rows·cols]`` with the *pixel* dim
  in lanes — both MXU dims stay full (K pads 192→2×128 ⇒ 75%);
* ImageNet normalization is folded in: the per-channel scale multiplies the
  conv kernel, the mean shift is subtracted from the pixels in VMEM, and
  the zero-padded border equals the normalized zero exactly
  (same identity as ``train/steps._fold_normalize_into_stem``);
* BatchNorm (inference) folds to a per-output-channel scale into ``W`` and
  a bias ``B``; ReLU and the 3×3/2 maxpool run on the conv tile while it is
  still in VMEM — the [256,256,64] intermediate never exists in HBM;
* grid = (N,): one sample per step; the next sample's uint8 block DMAs in
  while the current one computes (BlockSpec double-buffering).

Output is **CHW per sample** ([N, 64, H/4, W/4]) — the natural layout of
the M-in-lanes GEMM; the caller transposes to NHWC (XLA folds that into
the consumer conv's layout choice or a single copy, both measured).

Inference-path only (no custom VJP): the training step keeps the XLA stem.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pdac_pathological_image_segmentation_tpu.config import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)

BN_EPS = 1e-5
_NEG = -1e30  # -inf stand-in that survives bf16


def fold_stem_weights(kernel, bn_scale, bn_bias, bn_mean, bn_var,
                      eps: float = BN_EPS):
    """Fold ImageNet-normalize scale + inference BatchNorm into the stem
    conv, rearranged for the space-to-depth implicit GEMM.

    ``kernel``: (7,7,3,64) HWIO.  Returns ``(Wt, B)`` with ``Wt`` (64, 192)
    in (dy2,dx2,py,px,c) contraction order and ``B`` (64,) f32.

    Geometry: input rows are left-padded by 4 (even ⇒ pairing-aligned), so
    conv output o reads padded rows 2o+1..2o+7 — the 7 taps embed into the
    4 row-pairs o..o+3 with the first slot of pair o empty; hence the
    kernel embeds at offset 1 of an 8×8 grid.
    """
    s = 1.0 / (255.0 * jnp.asarray(IMAGENET_STD, jnp.float32))
    a = bn_scale * jax.lax.rsqrt(bn_var + eps)  # (64,)
    b = bn_bias - bn_mean * a
    k = kernel.astype(jnp.float32) * s[None, None, :, None]  # (7,7,3,64)
    k = k * a[None, None, None, :]
    kpad = jnp.zeros((8, 8, 3, 64), jnp.float32).at[1:8, 1:8].set(k)
    w4 = kpad.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
    wt = w4.reshape(192, 64).T  # (64, 192), order (dy2,dx2,py,px,c)
    return wt.astype(jnp.bfloat16), b.astype(jnp.float32)


def _stem_kernel(x_ref, wt_ref, b_ref, m_ref, out_ref, s2d_ref, *, h: int,
                 w: int, row_chunk: int):
    """One sample: x_ref (1,H,W,3) u8 → out_ref (1,64,H/4,W/4) bf16."""
    hc, wc = h // 2, w // 2  # conv output size
    hp, wp = h // 4, w // 4  # pool output size
    up, vp = hc + 4, wc + 4  # s2d buffer (pairs + border)

    # --- space-to-depth fill: (py,px,c) → leading dim, pairs in (rows, cols)
    # (Mosaic has no direct u8→bf16 cast: go u8→i32→f32→bf16)
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32).astype(
        jnp.bfloat16) - m_ref[0]  # (H, W, 3)
    s2d = x.reshape(hc, 2, wc, 2, 3).transpose(1, 3, 4, 0, 2).reshape(
        12, hc, wc
    )
    s2d_ref[:] = jnp.zeros((12, up, vp), jnp.bfloat16)
    s2d_ref[:, 3:3 + hc, 3:3 + wc] = s2d

    wt = wt_ref[:]  # (64, 192) bf16
    bias = b_ref[:].reshape(64, 1)  # f32

    n_chunks = hc // row_chunk
    for c in range(n_chunks):
        o0 = row_chunk * c - 1  # first conv row of this chunk (may be -1)
        rows = row_chunk + 1
        # implicit-GEMM contraction operand: (192, rows, wc)
        parts = []
        for dy2 in range(4):
            # conv row o reads row-pairs o..o+3; buffer row u = pair + 1
            # (real pairs start at buffer row 3 == pair 2)
            r0 = o0 + dy2 + 1
            for dx2 in range(4):
                parts.append(
                    s2d_ref[:, r0:r0 + rows, dx2 + 1:dx2 + 1 + wc]
                )
        a = jnp.concatenate(parts, axis=0).reshape(192, rows * wc)
        conv = jax.lax.dot_general(
            wt, a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (64, rows*wc)
        conv = jnp.maximum(conv + bias, 0.0).reshape(64, rows, wc)
        if c == 0:
            # the o=-1 row was computed from pad zeros; for maxpool it must
            # be -inf (pool pad never wins), not relu(bias).  (iota mask —
            # .at[].set lowers to scatter, which Mosaic doesn't support)
            row_ids = jax.lax.broadcasted_iota(jnp.int32, conv.shape, 1)
            conv = jnp.where(row_ids == 0, _NEG, conv)
        # 3×3/2 maxpool: rows 2rr,2rr+1,2rr+2 (chunk-local), cols with a
        # -inf left pad (pool col 0 reads conv col -1).  Stride-2 access is
        # expressed as pair-reshapes + unit slices: Mosaic lowers strided
        # slices on non-minor dims to (unsupported >2-D) gathers.
        pr = row_chunk // 2
        c_ext = jnp.concatenate(
            [conv, jnp.full((64, 1, wc), _NEG, jnp.float32)], axis=1
        )  # rows+1 = row_chunk+2
        pairs = c_ext[:, 0:2 * pr, :].reshape(64, pr, 2, wc)
        shifted = c_ext[:, 2:2 * pr + 2, :].reshape(64, pr, 2, wc)
        rmax = jnp.maximum(
            jnp.maximum(pairs[:, :, 0, :], pairs[:, :, 1, :]),
            shifted[:, :, 0, :],
        )  # (64, pr, wc)
        cpad = jnp.concatenate(
            [jnp.full((64, pr, 1), _NEG, jnp.float32), rmax,
             jnp.full((64, pr, 1), _NEG, jnp.float32)],
            axis=2,
        )  # (64, pr, wc+2)
        m3 = jnp.maximum(
            jnp.maximum(cpad[:, :, 0:wc], cpad[:, :, 1:wc + 1]),
            cpad[:, :, 2:wc + 2],
        )  # (64, pr, wc) — col q holds max over conv cols q-1..q+1
        # keep even columns via a one-hot selection matmul: Mosaic cannot
        # split a lane dim (reshape 256→128×2), but an exact 0/1 dot on the
        # MXU selects them for free
        sel = (jax.lax.broadcasted_iota(jnp.int32, (wc, wp), 0)
               == 2 * jax.lax.broadcasted_iota(jnp.int32, (wc, wp), 1)
               ).astype(jnp.float32)
        pooled = jax.lax.dot_general(
            m3.reshape(64 * pr, wc), sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(64, pr, wp)
        out_ref[0, :, c * pr:(c + 1) * pr, :] = pooled.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stem_pool(x_u8: jax.Array, wt: jax.Array, b: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """uint8 (N,H,W,3) → bf16 (N,64,H/4,W/4): normalize+conv7×7/2+BN+ReLU+
    maxpool3×3/2, fused.  ``wt``/``b`` from :func:`fold_stem_weights`."""
    n, h, w, _ = x_u8.shape
    assert h % 32 == 0 and w % 32 == 0, "H, W must divide 32"
    row_chunk = 16 if (h // 2) % 16 == 0 else 8
    kernel = functools.partial(_stem_kernel, h=h, w=w, row_chunk=row_chunk)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, 3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 192), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64, h // 4, w // 4),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 64, h // 4, w // 4), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((12, h // 2 + 4, w // 2 + 4), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (h // 2) * (w // 2) * 64 * 147,
            bytes_accessed=n * (h * w * 3 + 64 * (h // 4) * (w // 4) * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x_u8, wt, b,
      jnp.asarray(255.0 * np.asarray(IMAGENET_MEAN),
                  jnp.bfloat16).reshape(1, 3))


def xla_stem_pool_reference(x_u8, kernel, bn_scale, bn_bias, bn_mean, bn_var,
                            eps: float = BN_EPS):
    """Reference semantics in plain XLA (normalize → conv → BN → ReLU →
    maxpool), NHWC output — for parity tests."""
    from pdac_pathological_image_segmentation_tpu.ops.augment import normalize

    x = normalize(x_u8, dtype=jnp.float32)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(jnp.float32), window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    a = bn_scale * jax.lax.rsqrt(bn_var + eps)
    y = y * a + (bn_bias - bn_mean * a)
    y = jnp.maximum(y, 0.0)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )

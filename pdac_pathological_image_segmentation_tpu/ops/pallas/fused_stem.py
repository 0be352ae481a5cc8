"""Pallas kernel: fused ResNet stem — space-to-depth'd pixels → 7×7/2 conv
(as implicit GEMM) → BatchNorm → ReLU → 3×3/2 maxpool, one fused pass.

Replaces the separate XLA passes at the top of every encoder forward
(reference ``models/resunet.py:25-28`` — conv1/bn1/relu/maxpool), which at
bs=512/512² on v5e cost ~22.5 ms/step: normalize 1.9 + input layout copy
2.9 + stem conv 9.2 + maxpool(+bn+relu) 8.5 (round-2 profile).  The chain
is bandwidth-dominated because XLA materializes the stride-2 conv's
[N,256,256,64] activation in HBM (4.3 GB at bs=512) just to immediately
max-pool it down 4×.

Two-stage design (TPU-first):

1. **XLA prepass** (:func:`stem_s2d`): uint8 NHWC → mean-shifted bf16
   **space-to-depth** planes ``(N, 12, H/2+4, W/2+4)`` — the 7×7/2/pad-3
   conv on 3 channels becomes a dense 4×4/1 conv on 12 channels.  A pure
   elementwise+transpose+pad pass XLA compiles well (uint8 read, bf16
   write); doing this transpose inside a Mosaic kernel is what made the v1
   kernel uncompilable (3-lane arrays + multi-dim relayouts).
2. **Pallas kernel**: per sample (grid=(N,)), a ``lax.fori_loop`` over
   16-conv-row chunks; each chunk copies its 20-row s2d window to VMEM
   scratch once (one dynamic slice), then runs 17 static-shape implicit-GEMM
   row dots ``W[64,192] @ A[192, W/2]`` on the MXU, ReLU+bias fused, and
   max-pools rows/cols while the conv tile is still in VMEM — the
   [256,256,64] intermediate never exists in HBM.  Stride-2 column
   decimation rides a 0/1 selection matmul (Mosaic cannot split a lane
   dim); ImageNet normalization scale and inference BN fold into ``W``
   (:func:`fold_stem_weights`), the mean shift into the prepass.

Output is **CHW per sample** ([N, 64, H/4, W/4]) — the natural layout of
the channels-in-sublanes GEMM; the caller transposes to NHWC (XLA folds
that into the consumer conv's layout choice or a single copy).

Compile-cost note: the v1 kernel (fully unrolled chunks + lane-merge
reshapes) was rejected by Mosaic and OOM-killed the remote compile helper;
v2 keeps every slice static inside a single compiled ``fori_loop`` body.

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
    in (dy2,dx2,py,px,c) contraction order and ``B`` (64, 1) f32.

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
    return wt.astype(jnp.bfloat16), b.astype(jnp.float32).reshape(64, 1)


def stem_s2d(x_u8: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """uint8 (N,H,W,3) → mean-shifted space-to-depth planes
    (N, 12, H/2+4, W/2+4), plane order (py, px, c), data at offset 3 with a
    zero border (zero ≡ the normalized-zero conv padding once the 1/(255σ)
    scale is folded into the weights)."""
    n, h, w, _ = x_u8.shape
    hc, wc = h // 2, w // 2
    m255 = jnp.asarray(255.0 * np.asarray(IMAGENET_MEAN), dtype)
    x = x_u8.astype(dtype) - m255
    s = x.reshape(n, hc, 2, wc, 2, 3).transpose(0, 2, 4, 5, 1, 3)
    s = s.reshape(n, 12, hc, wc)
    return jnp.pad(s, ((0, 0), (0, 0), (3, 1), (3, 1)))


def _stem_kernel(s2d_ref, wt_ref, b_ref, sel_ref, out_ref, win_ref, conv_ref,
                 pool_ref, *, hc: int, wc: int, row_chunk: int):
    """One sample: s2d (1,12,hc+4,wc+4) bf16 → out (1,64,hc/2,wc/2) bf16."""
    pr = row_chunk // 2
    n_chunks = hc // row_chunk
    wp = wc // 2

    wt = wt_ref[:]          # (64, 192) bf16
    bias = b_ref[:]         # (64, 1) f32
    sel = sel_ref[:]        # (wc, wp) bf16 0/1 — keeps even columns

    def chunk(c, carry):
        o0 = c * row_chunk - 1  # first conv row of this chunk (−1 at c=0)
        # four lane-realigned copies of the chunk's 20-row s2d window (one
        # per dx2 column shift): the scratch stores normalize the lane
        # offset, so every tap slice below reads at offset 0 — Mosaic's
        # concatenate requires equal offsets on the non-concat (lane) dim
        for dx2 in range(4):
            win_ref[dx2] = s2d_ref[
                0, :, pl.ds(c * row_chunk, row_chunk + 4),
                dx2 + 1:dx2 + 1 + wc,
            ]

        for r in range(row_chunk + 1):  # conv rows o0 .. o0+row_chunk
            parts = []
            for dy2 in range(4):
                for dx2 in range(4):
                    parts.append(win_ref[dx2, :, r + dy2, :])
            a = jnp.concatenate(parts, axis=0)  # (192, wc)
            cr = jax.lax.dot_general(
                wt, a, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (64, wc)
            cr = jnp.maximum(cr + bias, 0.0)
            # conv row −1 (only c==0, r==0) is pool padding: must be −inf
            cr = jnp.where(o0 + r < 0, _NEG, cr)
            conv_ref[:, r, :] = cr

        # 3×3/2 maxpool.  Rows: pool row q reads conv rows 2q..2q+2
        # (chunk-local; global rows 2Q−1..2Q+1) — static slices.
        for q in range(pr):
            pool_ref[:, q, :] = jnp.maximum(
                jnp.maximum(conv_ref[:, 2 * q, :], conv_ref[:, 2 * q + 1, :]),
                conv_ref[:, 2 * q + 2, :],
            )
        # Cols: −inf lane pad, 3-tap max, then keep even columns via the
        # 0/1 selection matmul (free on the MXU).
        rmax = pool_ref[:]  # (64, pr, wc) f32
        npad = jnp.full((64, pr, 1), _NEG, jnp.float32)
        cpad = jnp.concatenate([npad, rmax, npad], axis=2)  # (64, pr, wc+2)
        m3 = jnp.maximum(
            jnp.maximum(cpad[:, :, 0:wc], cpad[:, :, 1:wc + 1]),
            cpad[:, :, 2:wc + 2],
        ).astype(jnp.bfloat16)
        pooled = jax.lax.dot_general(
            m3.reshape(64 * pr, wc), sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(64, pr, wp)
        out_ref[0, :, pl.ds(c * pr, pr), :] = pooled.astype(jnp.bfloat16)
        return carry

    jax.lax.fori_loop(0, n_chunks, chunk, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stem_pool(x_u8: jax.Array, wt: jax.Array, b: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """uint8 (N,H,W,3) → bf16 (N,64,H/4,W/4): normalize+conv7×7/2+BN+ReLU+
    maxpool3×3/2, fused.  ``wt``/``b`` from :func:`fold_stem_weights`."""
    n, h, w, _ = x_u8.shape
    assert h % 32 == 0 and w % 32 == 0, "H, W must divide 32"
    hc, wc = h // 2, w // 2
    hp, wp = h // 4, w // 4
    row_chunk = 16 if hc % 16 == 0 else 8
    s2d = stem_s2d(x_u8)  # (N, 12, hc+4, wc+4) bf16, XLA prepass
    sel = jnp.asarray(np.eye(wc, dtype=np.float32)[:, ::2], jnp.bfloat16)
    b = b.reshape(64, 1)
    kernel = functools.partial(_stem_kernel, hc=hc, wc=wc,
                               row_chunk=row_chunk)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 12, hc + 4, wc + 4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 192), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((64, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wc, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64, hp, wp), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 64, hp, wp), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((4, 12, row_chunk + 4, wc), jnp.bfloat16),   # windows
            pltpu.VMEM((64, row_chunk + 1, wc), jnp.float32),       # conv
            pltpu.VMEM((64, row_chunk // 2, wc), jnp.float32),      # rowmax
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * hc * wc * 64 * 147,
            bytes_accessed=n * (12 * (hc + 4) * (wc + 4) * 2
                                + 64 * hp * wp * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(s2d, wt, b, sel)


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

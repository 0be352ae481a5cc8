"""Pallas kernel: fused train-time augmentation — uint8 pixels →
color-jitter (random-order brightness/contrast/saturation/hue) →
ImageNet-normalize → OneOf{hflip, rot90, vflip}, one VMEM-resident pass
per sample.

Why: the XLA lowering of this chain (``ops/augment.train_transform``)
works on (H, W, 3) tensors whose 3-channel minor dim occupies 3/128 lanes
— ~16 full-image VPU passes at ~1/10th occupancy, measured **~40 ms of a
289 ms bs=256/512² train step** on v5e (round-2 profile, BASELINE.md).
Reordering layouts in XLA loses (the boundary transposes cost more than
they save — measured 318/364 vs 289 ms); inside a Pallas kernel the image
lives PLANAR (3, H, W) in VMEM with W on the 128 lanes, every pass is
full-occupancy, and the branchy per-sample control flow (jitter order
permutation, OneOf choice) runs as real scalar-predicated branches
(``pl.when`` on SMEM scalars) instead of XLA's compute-all-and-select.

Augmentation takes no gradients (it transforms *data*, upstream of every
parameter), so no custom VJP is needed — the kernel drops into the train
step as-is.

RNG contract: all random draws happen OUTSIDE the kernel with the exact
key-split structure of ``train_transform`` (:func:`draw_augment_scalars`),
so the fused path consumes the same per-sample factors/choices as the XLA
path — outputs match within bf16 tolerance (pinned by
``tests/test_fused_augment.py``).

I/O: planar uint8 images (N, 3, H, W) — the NHWC→planar / planar→NHWC
transposes happen in XLA on uint8/bf16 (cheap, ~1.5 ms total at bs=256,
vs the ~40 ms chain they replace); masks (N, H, W) uint8 share the
geometric transform.  Default-mode semantics only (jitter on [0,1] with
per-step clipping, then normalize — ``parity_mode`` keeps the XLA path).
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

import ml_dtypes as _mld


def _bf16c(v) -> float:
    """A constant pre-rounded through bf16 (so kernel math sees the same
    literal values the XLA chain's bf16 jnp.asarray constants carry)."""
    return float(np.asarray(v, _mld.bfloat16).astype(np.float32))


_T_YIQ = np.asarray(
    [[0.299, 0.587, 0.114],
     [0.59590059, -0.27455667, -0.32134392],
     [0.21153661, -0.52273617, 0.31119955]], np.float32)
# the XLA chain inverts the ALREADY-bf16-ROUNDED yiq matrix
# (augment._adjust_hue: t_yiq is created in the image dtype) — match it
_T_RGB = np.linalg.inv(
    np.asarray(_T_YIQ, _mld.bfloat16).astype(np.float32))
_GRAY_W = np.asarray([0.299, 0.587, 0.114], np.float32)


def draw_augment_scalars(key: jax.Array, n: int, *, brightness=0.3,
                         contrast=0.3, saturation=0.3, hue=0.3,
                         p_jitter=0.5, p_geom=0.3):
    """Reproduce ``train_transform``'s per-sample random draws exactly
    (same key-split structure as ``color_jitter`` + ``one_of_flip_rot``).

    Returns ``(facs (N,4) f32, ints (N,8) i32)`` with
    ``facs = [fb, fc, fs, fh]`` and
    ``ints = [perm0..perm3, jitter_apply, geom_apply, choice, rot_k]``."""
    keys = jax.random.split(key, n * 2).reshape(n, 2, -1)

    def per_sample(kj, kg):
        k_apply, k_order, k_b, k_c, k_s, k_h = jax.random.split(kj, 6)
        fb = jax.random.uniform(k_b, (), minval=1.0 - brightness,
                                maxval=1.0 + brightness)
        fc = jax.random.uniform(k_c, (), minval=1.0 - contrast,
                                maxval=1.0 + contrast)
        fs = jax.random.uniform(k_s, (), minval=1.0 - saturation,
                                maxval=1.0 + saturation)
        fh = jax.random.uniform(k_h, (), minval=-hue, maxval=hue)
        perm = jax.random.permutation(k_order, 4)
        j_apply = (jax.random.uniform(k_apply) < p_jitter).astype(jnp.int32)

        g_apply_k, g_pick, g_rot = jax.random.split(kg, 3)
        choice = jax.random.randint(g_pick, (), 0, 3)
        rot_k = jax.random.randint(g_rot, (), 0, 4)
        g_apply = (jax.random.uniform(g_apply_k) < p_geom).astype(jnp.int32)

        facs = jnp.stack([fb, fc, fs, fh]).astype(jnp.float32)
        ints = jnp.concatenate([
            perm.astype(jnp.int32),
            jnp.stack([j_apply, g_apply, choice, rot_k]),
        ])
        return facs, ints

    return jax.vmap(per_sample)(keys[:, 0], keys[:, 1])


def _augment_kernel(facs_ref, ints_ref, img_ref, mask_ref, out_ref,
                    mout_ref, buf_ref, *, h: int, w: int):
    """One sample: planar u8 (1,3,H,W) → normalized/augmented bf16
    (1,3,H,W) + mask (1,H,W) u8 → f32, shared geometric transform.

    ``facs_ref``/``ints_ref`` are whole-array scalar-prefetch refs
    ((N,4) f32 / (N,8) i32 in SMEM), indexed by the grid position."""
    i = pl.program_id(0)
    # u8 → bf16 [0,1] (Mosaic has no direct u8→bf16 cast)
    # same op forms as the XLA chain (divide, not multiply-by-inverse) so
    # bf16 roundings match bitwise; per-plane to keep the i32/f32 cast
    # temporaries at (H,W) instead of (3,H,W) (VMEM stack pressure)
    for c in range(3):
        buf_ref[c] = (img_ref[0, c].astype(jnp.int32).astype(jnp.float32)
                      .astype(jnp.bfloat16) / jnp.bfloat16(255.0))

    j_apply = ints_ref[i, 4]

    def gray():
        # match XLA's _rgb_to_grayscale: bf16 products, f32-accumulated
        # channel reduce, single bf16 rounding
        gw = _GRAY_W
        p0 = (buf_ref[0] * jnp.bfloat16(gw[0])).astype(jnp.float32)
        p1 = (buf_ref[1] * jnp.bfloat16(gw[1])).astype(jnp.float32)
        p2 = (buf_ref[2] * jnp.bfloat16(gw[2])).astype(jnp.float32)
        return (p0 + p1 + p2).astype(jnp.bfloat16)  # (H, W)

    def clip():
        buf_ref[:] = jnp.clip(buf_ref[:], 0.0, 1.0)

    for slot in range(4):
        op = ints_ref[i, slot]

        @pl.when((j_apply == 1) & (op == 0))
        def _brightness():
            buf_ref[:] = buf_ref[:] * facs_ref[i, 0].astype(jnp.bfloat16)
            clip()

        @pl.when((j_apply == 1) & (op == 1))
        def _contrast():
            m = (jnp.sum(gray().astype(jnp.float32))
                 / jnp.float32(h * w)).astype(jnp.bfloat16)
            fc = facs_ref[i, 1].astype(jnp.bfloat16)
            buf_ref[:] = m + (buf_ref[:] - m) * fc
            clip()

        @pl.when((j_apply == 1) & (op == 2))
        def _saturation():
            g = gray()
            fs = facs_ref[i, 2].astype(jnp.bfloat16)
            for c in range(3):
                buf_ref[c] = g + (buf_ref[c] - g) * fs
            clip()

        @pl.when((j_apply == 1) & (op == 3))
        def _hue():
            # XLA's einsum accumulates the 3-channel contractions in f32
            # and rounds once — match that (per-term bf16 adds differ by
            # ~1e-2 on cancelling sums)
            angle = 2.0 * np.pi * facs_ref[i, 3]
            cos = jnp.cos(angle).astype(jnp.bfloat16)
            sin = jnp.sin(angle).astype(jnp.bfloat16)
            r = buf_ref[0].astype(jnp.float32)
            g = buf_ref[1].astype(jnp.float32)
            b = buf_ref[2].astype(jnp.float32)
            ty = _T_YIQ
            tb = _bf16c
            y = r * tb(ty[0, 0]) + g * tb(ty[0, 1]) + b * tb(ty[0, 2])
            i0 = r * tb(ty[1, 0]) + g * tb(ty[1, 1]) + b * tb(ty[1, 2])
            q0 = r * tb(ty[2, 0]) + g * tb(ty[2, 1]) + b * tb(ty[2, 2])
            # rotation in bf16 exactly as the XLA chain (bf16-rounded
            # products, bf16 add/sub)
            y = y.astype(jnp.bfloat16).astype(jnp.float32)
            i0b = i0.astype(jnp.bfloat16)
            q0b = q0.astype(jnp.bfloat16)
            i1 = ((i0b * cos) - (q0b * sin)).astype(jnp.float32)
            q1 = ((i0b * sin) + (q0b * cos)).astype(jnp.float32)
            tr = _T_RGB
            for c in range(3):
                buf_ref[c] = (y * tb(tr[c, 0]) + i1 * tb(tr[c, 1])
                              + q1 * tb(tr[c, 2])).astype(jnp.bfloat16)
            clip()

    # ImageNet normalize, per plane (channel = outer dim, a cheap slice)
    for c in range(3):
        mean = jnp.bfloat16(float(IMAGENET_MEAN[c]))
        std = jnp.bfloat16(float(IMAGENET_STD[c]))
        buf_ref[c] = (buf_ref[c] - mean) / std

    # OneOf{hflip, rot90(k), vflip}.  Mosaic has no `rev`/`transpose`
    # lowering, so every geometric op rides the (otherwise idle) MXU as an
    # exact 0/1 matmul: reversal = exchange-matrix product, transpose =
    # identity contraction over the first axes.  Sums of single bf16
    # products round back to the original values — bitwise exact.
    g_apply = ints_ref[i, 5]
    choice = ints_ref[i, 6]
    rot_k = ints_ref[i, 7]
    m_in = (mask_ref[0].astype(jnp.int32).astype(jnp.float32)
            .astype(jnp.bfloat16))  # (H, W); {0,1} exact in bf16

    rows = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
    eye = (rows == cols).astype(jnp.bfloat16)
    exch = (rows + cols == h - 1).astype(jnp.bfloat16)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def tt(a):  # transpose: contract first axes with the identity
        return jax.lax.dot_general(
            a, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    identity = (g_apply == 0) | ((choice == 1) & (rot_k == 0))

    @pl.when(identity)
    def _none():
        out_ref[0] = buf_ref[:]
        mout_ref[0] = m_in.astype(jnp.float32)

    @pl.when((g_apply == 1) & (choice == 0))
    def _hflip():
        for c in range(3):
            out_ref[0, c] = mm(buf_ref[c], exch)
        mout_ref[0] = mm(m_in, exch).astype(jnp.float32)

    @pl.when((g_apply == 1) & (choice == 2))
    def _vflip():
        for c in range(3):
            out_ref[0, c] = mm(exch, buf_ref[c])
        mout_ref[0] = mm(exch, m_in).astype(jnp.float32)

    # jnp.rot90(m, 1) = flip(m.T, axis=0) = exch @ T(m);
    # rot90(m, 2) = exch @ m @ exch;  rot90(m, 3) = T(exch @ m)
    @pl.when((g_apply == 1) & (choice == 1) & (rot_k == 1))
    def _rot1():
        for c in range(3):
            out_ref[0, c] = mm(exch, tt(buf_ref[c]))
        mout_ref[0] = mm(exch, tt(m_in)).astype(jnp.float32)

    @pl.when((g_apply == 1) & (choice == 1) & (rot_k == 2))
    def _rot2():
        for c in range(3):
            out_ref[0, c] = mm(exch, mm(buf_ref[c], exch))
        mout_ref[0] = mm(exch, mm(m_in, exch)).astype(jnp.float32)

    @pl.when((g_apply == 1) & (choice == 1) & (rot_k == 3))
    def _rot3():
        for c in range(3):
            out_ref[0, c] = tt(mm(exch, buf_ref[c]))
        mout_ref[0] = tt(mm(exch, m_in)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_augment_planar(img_planar_u8: jax.Array, masks_u8: jax.Array,
                         facs: jax.Array, ints: jax.Array,
                         interpret: bool = False):
    """(N,3,H,W) u8 + (N,H,W) u8 + scalars → (N,3,H,W) bf16 normalized
    + (N,H,W) f32 — the fused augmentation pass."""
    n, _, h, w = img_planar_u8.shape
    assert h == w, "square patches only (rot90 via MXU identity/exchange)"
    kernel = functools.partial(_augment_kernel, h=h, w=w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # facs + ints ride whole in SMEM
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 3, h, w), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((3, h, w), jnp.bfloat16)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 3, h, w), jnp.bfloat16),
            jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(facs, ints, img_planar_u8, masks_u8)


def fused_train_transform(key: jax.Array, images: jax.Array,
                          masks: jax.Array, interpret: bool = False):
    """Drop-in for ``train_transform`` (default mode, native-size input):
    NHWC uint8 images + uint8 masks → (NHWC bf16 normalized+augmented,
    f32 masks).  Same per-sample RNG stream as the XLA path."""
    n = images.shape[0]
    facs, ints = draw_augment_scalars(key, n)
    planar = jnp.transpose(images, (0, 3, 1, 2))
    imgs_p, masks_f = fused_augment_planar(
        planar, masks.astype(jnp.uint8), facs, ints, interpret=interpret)
    return jnp.transpose(imgs_p, (0, 2, 3, 1)), masks_f

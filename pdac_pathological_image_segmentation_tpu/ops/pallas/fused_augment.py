"""Pallas kernel: fused train-time augmentation — uint8 pixels →
slot-matrix ColorJitter → ImageNet-normalize → OneOf{hflip, rot90,
vflip}, one VMEM-resident pass per sample.

Why a kernel at all: the XLA lowering of this chain
(``ops/augment.train_transform``) works on (H, W, 3) tensors whose
3-channel minor dim occupies 3/128 lanes — ~16 full-image VPU passes at
~1/10th occupancy, measured ~40 ms of a 289 ms bs=256/512² train step on
v5e (round-2 profile, BASELINE.md).  Inside the kernel the image lives
PLANAR (4, H, W) in VMEM — planes 0-2 RGB, plane 3 the mask riding the
same geometric transform — with W on the 128 lanes, so every pass runs at
full occupancy.

Why THIS kernel (v2, round 4): the v1 kernel expressed the per-sample
randomness as 22 ``pl.when`` regions (4 jitter slots × 4 ops + 6
geometric cases).  Probing on v5e showed each region costs ~2.5 µs/sample
in scalar-pipeline overhead *even when untaken* — 22 regions × 256
samples ≈ 14 ms of the kernel's 19 ms was branch bookkeeping, not work
(round-4 probe log in BASELINE.md).  v2 collapses the control flow into
dense math parameterized by per-sample scalars:

* **jitter = ONE region** (``j_apply``): every ColorJitter op on [0,1]
  RGB is the affine map ``x ← clip(A@x + γ·mean_gray(x))`` with a 3×3
  ``A`` and scalar ``γ`` per slot (``ops/augment.jitter_slot_params`` —
  the randomized op ORDER lives in which matrix occupies which slot);
* **geometry = THREE regions**: every OneOf case decomposes as
  ``out = (exch@)ˡ (transposeᵗ(x)) (@exch)ʳ`` (``ops/augment.geom_bits``)
  — flips/rotations ride the (otherwise idle) MXU as exact 0/1-matrix
  products, bitwise equal to ``jnp.rot90``/``flip`` (Mosaic has no
  ``rev``/``transpose`` lowering — verified again on this toolchain).

Measured (bs=256, 512², v5e): v1 18.9 ms → **v2 7.4 ms** wall
(~15 → ~3.6 ms device time next to a ~3.8 ms relay dispatch floor); the
XLA chain costs 76.8 ms.  Augmentation takes no gradients (it transforms
data, upstream of every parameter), so no custom VJP is needed.

RNG contract: all random draws happen OUTSIDE the kernel with the exact
key-split structure of ``train_transform``
(``ops/augment.draw_augment_scalars``), so the fused path consumes the
same per-sample factors/choices as the XLA path — and both paths apply
them through the SAME slot matrices, so outputs match within last-ulp
bf16 (reduction-order only; geometry bitwise — pinned by
``tests/test_fused_augment.py``).

I/O: planar uint8 images (N, 3, H, W) — the NHWC→planar / planar→NHWC
transposes happen in XLA on uint8/bf16 (cheap, ~1.5 ms total at bs=256);
masks (N, H, W) uint8 share the geometric transform.  Default-mode
semantics only (jitter on [0,1] with per-slot clipping, then normalize —
``parity_mode`` keeps the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pdac_pathological_image_segmentation_tpu.config import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from pdac_pathological_image_segmentation_tpu.ops.augment import (
    _GRAY_W,
    draw_augment_scalars,  # noqa: F401 — re-exported (RNG contract home)
    geom_bits,
    jitter_slot_params,
)

__all__ = [
    "draw_augment_scalars",
    "fused_augment_planar",
    "fused_train_transform",
]


def _augment_kernel(a_ref, g_ref, ints_ref, geom_ref, img_ref, mask_ref,
                    out_ref, mout_ref, buf_ref, *, h: int, w: int):
    """One sample: planar u8 (1,3,H,W) + mask (1,H,W) u8 → normalized/
    augmented bf16 (1,3,H,W) + f32 mask, shared geometric transform.

    ``a_ref (N,4,9) f32`` / ``g_ref (N,4) f32`` / ``ints_ref (N,8) i32`` /
    ``geom_ref (N,3) i32`` are whole-array scalar-prefetch refs in SMEM,
    indexed by the grid position.  ``buf_ref`` is (4,H,W) bf16 scratch:
    planes 0-2 image, plane 3 mask (so geometry transforms all four
    uniformly)."""
    i = pl.program_id(0)
    # u8 → bf16 [0,1] (Mosaic has no direct u8→bf16 cast); per-plane to
    # keep the i32/f32 cast temporaries at (H,W) (VMEM stack pressure).
    # Same op forms as the XLA chain (divide, not multiply-by-inverse) so
    # bf16 roundings match bitwise.
    for c in range(3):
        buf_ref[c] = (img_ref[0, c].astype(jnp.int32).astype(jnp.float32)
                      .astype(jnp.bfloat16) / jnp.bfloat16(255.0))
    buf_ref[3] = (mask_ref[0].astype(jnp.int32).astype(jnp.float32)
                  .astype(jnp.bfloat16))  # {0,1} exact in bf16

    @pl.when(ints_ref[i, 4] == 1)
    def _jitter():
        # four slots of x ← clip(A@x + γ·m); expression shapes mirror
        # ops/augment.apply_slot_jitter exactly (f32 products/sums, one
        # bf16 rounding per slot) so the two paths agree to last-ulp
        inv_hw = jnp.float32(1.0) / jnp.float32(h * w)
        for s in range(4):
            x0 = buf_ref[0].astype(jnp.float32)
            x1 = buf_ref[1].astype(jnp.float32)
            x2 = buf_ref[2].astype(jnp.float32)
            mu0 = jnp.sum(x0) * inv_hw
            mu1 = jnp.sum(x1) * inv_hw
            mu2 = jnp.sum(x2) * inv_hw
            m = (jnp.float32(_GRAY_W[0]) * mu0
                 + jnp.float32(_GRAY_W[1]) * mu1
                 + jnp.float32(_GRAY_W[2]) * mu2)
            gm = g_ref[i, s] * m
            for c in range(3):
                y = (a_ref[i, s, 3 * c + 0] * x0
                     + a_ref[i, s, 3 * c + 1] * x1
                     + a_ref[i, s, 3 * c + 2] * x2) + gm
                buf_ref[c] = jnp.clip(y.astype(jnp.bfloat16), 0.0, 1.0)

    # ImageNet normalize, per plane (channel = outer dim, a cheap slice)
    for c in range(3):
        mean = jnp.bfloat16(float(IMAGENET_MEAN[c]))
        std = jnp.bfloat16(float(IMAGENET_STD[c]))
        buf_ref[c] = (buf_ref[c] - mean) / std

    # OneOf{hflip, rot90(k), vflip} as out = (exch@)ˡ Tᵗ(x) (@exch)ʳ.
    # Every op rides the MXU as an exact 0/1 matmul (sums of single bf16
    # products round back to the original values — bitwise).  The iota/
    # exchange matrices build INSIDE each region: they cost ~2 passes but
    # only when the region is taken (p≈0.3 overall).
    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @pl.when(geom_ref[i, 0] == 1)
    def _transpose():
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
        eye = (rows == cols).astype(jnp.bfloat16)
        for p in range(4):
            # transpose = contract the FIRST axes with the identity
            buf_ref[p] = jax.lax.dot_general(
                buf_ref[p], eye, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    @pl.when(geom_ref[i, 1] == 1)
    def _left_exch():
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
        exch = (rows + cols == h - 1).astype(jnp.bfloat16)
        for p in range(4):
            buf_ref[p] = mm(exch, buf_ref[p])

    @pl.when(geom_ref[i, 2] == 1)
    def _right_exch():
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
        exch = (rows + cols == h - 1).astype(jnp.bfloat16)
        for p in range(4):
            buf_ref[p] = mm(buf_ref[p], exch)

    out_ref[0] = buf_ref[0:3]
    mout_ref[0] = buf_ref[3].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_augment_planar(img_planar_u8: jax.Array, masks_u8: jax.Array,
                         a_mats: jax.Array, gammas: jax.Array,
                         ints: jax.Array, geom: jax.Array,
                         interpret: bool = False):
    """(N,3,H,W) u8 + (N,H,W) u8 + per-sample tables → (N,3,H,W) bf16
    normalized + (N,H,W) f32 — the fused augmentation pass.

    ``a_mats (N,4,3,3)`` / ``gammas (N,4)`` come from
    :func:`ops.augment.jitter_slot_params`; ``geom (N,3)`` from
    :func:`ops.augment.geom_bits`; ``ints`` is the raw draw table (only
    column 4, ``j_apply``, is read here)."""
    n, _, h, w = img_planar_u8.shape
    assert h == w, "square patches only (rot90 via MXU identity/exchange)"
    kernel = functools.partial(_augment_kernel, h=h, w=w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # A, γ, ints, geom ride whole in SMEM
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
        scratch_shapes=[pltpu.VMEM((4, h, w), jnp.bfloat16)],
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
    )(a_mats.reshape(n, 4, 9), gammas, ints, geom,
      img_planar_u8, masks_u8)


def fused_train_transform(key: jax.Array, images: jax.Array,
                          masks: jax.Array, interpret: bool = False):
    """Drop-in for ``train_transform`` (default mode, native-size input):
    NHWC uint8 images + uint8 masks → (NHWC bf16 normalized+augmented,
    f32 masks).  Same per-sample RNG stream as the XLA path."""
    n = images.shape[0]
    facs, ints = draw_augment_scalars(key, n)
    a_mats, gammas = jitter_slot_params(facs, ints)
    geom = geom_bits(ints)
    planar = jnp.transpose(images, (0, 3, 1, 2))
    imgs_p, masks_f = fused_augment_planar(
        planar, masks.astype(jnp.uint8), a_mats, gammas, ints, geom,
        interpret=interpret)
    return jnp.transpose(imgs_p, (0, 2, 3, 1)), masks_f

"""Fused on-device augmentation pipeline.

Replaces the reference's CPU albumentations pipelines
(reference ``train_main.py:70-88``, ``test.py:62-68``) with jit-compiled
device-side transforms so the host only ships raw ``uint8`` NHWC patches over
PCIe and everything else (resize → normalize → color-jitter → OneOf
{hflip, rot90, vflip}) fuses into the train step.  All randomness comes from
explicit per-batch PRNG keys split per-sample, replacing the reference's
global ``seed_everything`` (``train_main.py:34-41``).

Reference pipeline being reproduced:

* train (``train_main.py:70-81``): Resize(img_size) → Normalize(ImageNet) →
  ColorJitter(brightness=0.3, contrast=0.3, saturation=0.3, hue=0.3, p=0.5) →
  OneOf([HFlip p=.3, RandomRotate90 p=.3, VFlip p=.3], p=0.3) — with the
  quirk that ColorJitter runs on *already-normalized* floats (SURVEY.md §5).
  ``parity_mode=True`` keeps that ordering (jitter after normalize,
  unclipped); the default applies jitter on [0,1] pixels before normalizing,
  with torchvision-style clipping.
* val/test (``train_main.py:82-88``): Resize → Normalize only.

Masks use nearest-neighbor resize (albumentations' mask default) and share
the geometric transform with their image.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.config import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from pdac_pathological_image_segmentation_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
)

# numpy on purpose: module may first be imported inside a jit trace, where
# module-level jnp ops would leak tracers into these globals
import numpy as _np

_MEAN = _np.asarray(IMAGENET_MEAN, dtype=_np.float32)
_STD = _np.asarray(IMAGENET_STD, dtype=_np.float32)


def normalize(img: jax.Array, dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """uint8/float [0,255] HWC/NHWC → ImageNet-normalized floats
    (albumentations ``A.Normalize`` semantics: /255, −mean, /std).

    ``dtype=bfloat16`` keeps the whole normalize in the model's compute
    dtype — uint8 values are exact in bf16, so this halves the HBM traffic
    of the largest pre-model tensor on the inference path."""
    img = img.astype(dtype)
    mean = jnp.asarray(_MEAN * 255.0, dtype)
    inv_std = jnp.asarray(1.0 / (_STD * 255.0), dtype)
    return (img - mean) * inv_std


def denormalize(img: jax.Array) -> jax.Array:
    """Inverse of :func:`normalize`, in [0,1] (reference ``test.py:128-131``)."""
    return jnp.clip(img * jnp.asarray(_STD, img.dtype)
                    + jnp.asarray(_MEAN, img.dtype), 0.0, 1.0)


# ---------------------------------------------------------------------------
# color jitter (torchvision-style, as wrapped by albumentations ColorJitter)
# ---------------------------------------------------------------------------


def _rgb_to_grayscale(img: jax.Array) -> jax.Array:
    w = jnp.asarray([0.299, 0.587, 0.114], dtype=img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def _adjust_brightness(img, factor, clip):
    out = img * factor
    return jnp.clip(out, 0.0, 1.0) if clip else out


def _adjust_contrast(img, factor, clip):
    # accumulate the spatial mean in f32 (a bf16 sum over 260k pixels loses
    # precision), then return to the image dtype for the elementwise math
    mean = jnp.mean(
        _rgb_to_grayscale(img).astype(jnp.float32), axis=(-3, -2),
        keepdims=True,
    ).astype(img.dtype)
    out = mean + (img - mean) * factor
    return jnp.clip(out, 0.0, 1.0) if clip else out


def _adjust_saturation(img, factor, clip):
    gray = _rgb_to_grayscale(img)
    out = gray + (img - gray) * factor
    return jnp.clip(out, 0.0, 1.0) if clip else out


def _adjust_hue(img, delta, clip):
    """Shift hue by ``delta`` (in turns, torchvision convention [-0.5, 0.5])
    via the YIQ rotation trick — a 3×3 matmul instead of an HSV round-trip,
    which keeps the op a fused elementwise+small-matmul on the VPU."""
    # RGB -> YIQ
    t_yiq = jnp.asarray(
        [[0.299, 0.587, 0.114],
         [0.59590059, -0.27455667, -0.32134392],
         [0.21153661, -0.52273617, 0.31119955]],
        dtype=img.dtype,
    )
    t_rgb = jnp.linalg.inv(t_yiq.astype(jnp.float32)).astype(img.dtype)
    yiq = jnp.einsum("...c,kc->...k", img, t_yiq)
    angle = 2.0 * jnp.pi * delta.astype(jnp.float32)
    cos = jnp.cos(angle).astype(img.dtype)
    sin = jnp.sin(angle).astype(img.dtype)
    y = yiq[..., 0:1]
    i = yiq[..., 1:2] * cos - yiq[..., 2:3] * sin
    q = yiq[..., 1:2] * sin + yiq[..., 2:3] * cos
    out = jnp.einsum("...c,kc->...k", jnp.concatenate([y, i, q], axis=-1), t_rgb)
    return jnp.clip(out, 0.0, 1.0) if clip else out


def color_jitter(
    key: jax.Array,
    img: jax.Array,
    brightness: float = 0.3,
    contrast: float = 0.3,
    saturation: float = 0.3,
    hue: float = 0.3,
    p: float = 0.5,
    clip: bool = True,
) -> jax.Array:
    """Per-image ColorJitter: each of the four adjustments applied in a
    random order with factors ~ U[1−x, 1+x] (hue ~ U[−h, h]), the whole op
    applied with probability ``p`` (albumentations default p=0.5,
    reference ``train_main.py:75``)."""
    k_apply, k_order, k_b, k_c, k_s, k_h = jax.random.split(key, 6)
    # draw factors in f32 (bf16 uniforms are coarse) but cast to the image
    # dtype before use — a stray f32 scalar would promote every elementwise
    # op on a bf16 image chain back to f32 (full-image HBM cost, measured)
    dt = img.dtype
    fb = jax.random.uniform(k_b, (), minval=1.0 - brightness,
                            maxval=1.0 + brightness).astype(dt)
    fc = jax.random.uniform(k_c, (), minval=1.0 - contrast,
                            maxval=1.0 + contrast).astype(dt)
    fs = jax.random.uniform(k_s, (), minval=1.0 - saturation,
                            maxval=1.0 + saturation).astype(dt)
    fh = jax.random.uniform(k_h, (), minval=-hue, maxval=hue).astype(dt)

    perm = jax.random.permutation(k_order, 4)

    branches = [
        lambda x: _adjust_brightness(x, fb, clip),
        lambda x: _adjust_contrast(x, fc, clip),
        lambda x: _adjust_saturation(x, fs, clip),
        lambda x: _adjust_hue(x, fh, clip),
    ]
    # UNROLLED (not fori_loop): a while-loop carrying the full image forces
    # every iteration through HBM un-fused — measured 32 ms/step of a 184 ms
    # bs=128 train step at 512².  Four static switches fuse into ~8 cheap
    # elementwise passes.
    jittered = img
    for i in range(4):
        jittered = jax.lax.switch(perm[i], branches, jittered)
    return jnp.where(jax.random.uniform(k_apply) < p, jittered, img)


# ---------------------------------------------------------------------------
# slot-matrix color jitter — the shared semantics behind the default-mode
# XLA chain AND the fused Pallas kernel (ops/pallas/fused_augment.py)
# ---------------------------------------------------------------------------
#
# Every ColorJitter adjustment on [0,1] RGB is an affine per-pixel map
#
#     x ← clip( A @ x + γ · m ),   m = mean over pixels of (w_gray · x)
#
# with a per-sample per-slot 3×3 matrix A and scalar γ:
#   brightness  A = f_b·I                         γ = 0
#   contrast    A = f_c·I                         γ = 1 − f_c
#   saturation  A = f_s·I + (1−f_s)·𝟙w_grayᵀ      γ = 0
#   hue         A = T_RGB · R(2πf_h) · T_YIQ      γ = 0
#
# The randomized application ORDER lives entirely in which matrix sits in
# which slot, so the applier is branch-free uniform dense math — exactly
# what the TPU wants.  The Pallas kernel consumes the same (A, γ) tables
# (precomputed in XLA from the same RNG draws), collapsing what used to be
# 16 scalar-predicated regions into one: on v5e each `pl.when` region costs
# ~2.5 µs/sample in scalar-pipeline overhead even when untaken (round-4
# probe log, BASELINE.md), which dominated the old kernel's 19 ms.

_GRAY_W = _np.asarray([0.299, 0.587, 0.114], _np.float32)
_T_YIQ_F32 = _np.asarray(
    [[0.299, 0.587, 0.114],
     [0.59590059, -0.27455667, -0.32134392],
     [0.21153661, -0.52273617, 0.31119955]], _np.float32)
_T_RGB_F32 = _np.linalg.inv(_T_YIQ_F32).astype(_np.float32)
_EYE3 = _np.eye(3, dtype=_np.float32)
_ONES_W = _np.ones((3, 1), _np.float32) @ _GRAY_W[None, :]  # rows = w_gray


def draw_augment_scalars(key: jax.Array, n: int, *, brightness=0.3,
                         contrast=0.3, saturation=0.3, hue=0.3,
                         p_jitter=0.5, p_geom=0.3):
    """The per-sample random draws of the train augmentation, with the
    exact key-split structure of :func:`color_jitter` +
    :func:`one_of_flip_rot` — the RNG contract shared by the XLA chain
    and the fused Pallas kernel.

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


def jitter_slot_params(facs: jax.Array, ints: jax.Array):
    """Per-sample per-slot jitter affine params from the raw draws.

    ``facs (N,4) f32`` + ``ints (N,8) i32`` → ``(A (N,4,3,3) f32,
    gamma (N,4) f32)``: slot ``s`` of sample ``i`` applies
    ``x ← clip(A[i,s] @ x + gamma[i,s] · mean_gray(x))``."""
    facs = facs.astype(jnp.float32)

    def per_slot(op, f):
        fb, fc, fs, fh = f[0], f[1], f[2], f[3]

        def brightness(_):
            return fb * _EYE3, jnp.float32(0.0)

        def contrast(_):
            return fc * _EYE3, 1.0 - fc

        def saturation(_):
            return fs * _EYE3 + (1.0 - fs) * _ONES_W, jnp.float32(0.0)

        def hue(_):
            ang = (2.0 * _np.pi) * fh
            co, si = jnp.cos(ang), jnp.sin(ang)
            one = jnp.float32(1.0)
            zero = jnp.float32(0.0)
            rot = jnp.stack([
                jnp.stack([one, zero, zero]),
                jnp.stack([zero, co, -si]),
                jnp.stack([zero, si, co]),
            ])
            return _T_RGB_F32 @ (rot @ _T_YIQ_F32), jnp.float32(0.0)

        return jax.lax.switch(op, [brightness, contrast, saturation, hue],
                              None)

    def per_sample(f, iv):
        outs = [per_slot(iv[s], f) for s in range(4)]
        return (jnp.stack([o[0] for o in outs]),
                jnp.stack([o[1] for o in outs]))

    return jax.vmap(per_sample)(facs, ints)


def geom_bits(ints: jax.Array) -> jax.Array:
    """Decompose the OneOf{hflip, rot90(k), vflip} draw into the uniform
    form ``out = L · Tᵗ(x) · R`` with ``L, R ∈ {I, exch}``:

        (t, l, r) such that  x ← (exch @)ˡ (transpose?)ᵗ(x) (@ exch)ʳ

    ``hflip = r``, ``vflip = l``, ``rot90¹ = l∘t``, ``rot90² = l∘r``,
    ``rot90³ = r∘t`` — three predicates instead of six branch regions.
    Returns ``(N,3) int32`` columns ``[t, l, r]``."""
    g_apply = ints[:, 5] == 1
    choice = ints[:, 6]
    rot_k = ints[:, 7]
    hf = g_apply & (choice == 0)
    rot = g_apply & (choice == 1)
    vf = g_apply & (choice == 2)
    t = rot & ((rot_k == 1) | (rot_k == 3))
    left = vf | (rot & ((rot_k == 1) | (rot_k == 2)))
    right = hf | (rot & ((rot_k == 2) | (rot_k == 3)))
    return jnp.stack([t, left, right], axis=1).astype(jnp.int32)


def apply_slot_jitter(imgs: jax.Array, facs: jax.Array,
                      ints: jax.Array) -> jax.Array:
    """Batch slot-matrix ColorJitter on [0,1] NHWC images (any float
    dtype).  Bit-compatible with the fused Pallas kernel's jitter section:
    identical expression shapes — f32 products/sums, one round to the
    image dtype per slot, then clip."""
    h, w = imgs.shape[1], imgs.shape[2]
    a_mats, gammas = jitter_slot_params(facs, ints)
    orig = imgs
    wg = _GRAY_W
    for s in range(4):
        xf = imgs.astype(jnp.float32)
        x0, x1, x2 = xf[..., 0], xf[..., 1], xf[..., 2]
        inv_hw = 1.0 / jnp.float32(h * w)
        mu0 = jnp.sum(x0, axis=(1, 2)) * inv_hw
        mu1 = jnp.sum(x1, axis=(1, 2)) * inv_hw
        mu2 = jnp.sum(x2, axis=(1, 2)) * inv_hw
        m = wg[0] * mu0 + wg[1] * mu1 + wg[2] * mu2  # (N,) f32
        gm = (gammas[:, s] * m)[:, None, None]
        a_s = a_mats[:, s]  # (N,3,3)

        def ch(c):
            return (a_s[:, c, 0][:, None, None] * x0
                    + a_s[:, c, 1][:, None, None] * x1
                    + a_s[:, c, 2][:, None, None] * x2) + gm

        y = jnp.stack([ch(0), ch(1), ch(2)], axis=-1).astype(imgs.dtype)
        imgs = jnp.clip(y, 0.0, 1.0)
    j_apply = (ints[:, 4] == 1)[:, None, None, None]
    return jnp.where(j_apply, imgs, orig)


def apply_one_of_geom(imgs: jax.Array, masks: jax.Array,
                      ints: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batch OneOf{hflip, rot90(k), vflip} consuming pre-drawn scalars
    (``ints`` columns 5..7) — the same transform :func:`one_of_flip_rot`
    applies from a key.  Image NHWC + mask NHW share the transform."""

    def per_sample(img, mask, g_apply, choice, rot_k):
        def hflip(args):
            im, ms = args
            return im[:, ::-1, :], ms[:, ::-1]

        def rot90(args):
            im, ms = args
            branches = [lambda a, k=k: jnp.rot90(a, k) for k in range(4)]
            return (jax.lax.switch(rot_k, branches, im),
                    jax.lax.switch(rot_k, branches, ms))

        def vflip(args):
            im, ms = args
            return im[::-1, :, :], ms[::-1, :]

        tr = jax.lax.switch(choice, [hflip, rot90, vflip], (img, mask))
        keep = g_apply == 1
        return jnp.where(keep, tr[0], img), jnp.where(keep, tr[1], mask)

    return jax.vmap(per_sample)(imgs, masks, ints[:, 5], ints[:, 6],
                                ints[:, 7])


# ---------------------------------------------------------------------------
# geometric OneOf — reference train_main.py:76-80
# ---------------------------------------------------------------------------


def one_of_flip_rot(
    key: jax.Array, img: jax.Array, mask: jax.Array, p: float = 0.3
) -> Tuple[jax.Array, jax.Array]:
    """albumentations ``OneOf([HFlip, RandomRotate90, VFlip], p=0.3)``:
    with probability ``p`` pick ONE member uniformly (inner p's 0.3/0.3/0.3
    normalize to ⅓ each) and force-apply it; RandomRotate90 then picks
    k∈{0,1,2,3} uniformly.  ``img`` is HWC, ``mask`` HW; both get the same
    transform."""
    k_apply, k_pick, k_rot = jax.random.split(key, 3)
    choice = jax.random.randint(k_pick, (), 0, 3)
    rot_k = jax.random.randint(k_rot, (), 0, 4)

    def hflip(args):
        im, ms = args
        return im[:, ::-1, :], ms[:, ::-1]

    def rot90(args):
        im, ms = args
        # lax.switch over the 4 static rotations (no dynamic shapes: H==W).
        # k=k binds each branch's rotation eagerly — a bare `lambda a:
        # jnp.rot90(a, k)` would late-bind every branch to k=3.
        branches = [lambda a, k=k: jnp.rot90(a, k) for k in range(4)]
        return (
            jax.lax.switch(rot_k, branches, im),
            jax.lax.switch(rot_k, branches, ms),
        )

    def vflip(args):
        im, ms = args
        return im[::-1, :, :], ms[::-1, :]

    transformed = jax.lax.switch(choice, [hflip, rot90, vflip], (img, mask))
    apply = jax.random.uniform(k_apply) < p
    img_out = jnp.where(apply, transformed[0], img)
    mask_out = jnp.where(apply, transformed[1], mask)
    return img_out, mask_out


# ---------------------------------------------------------------------------
# full pipelines (vmapped over the batch inside the train-step jit)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit,
                   static_argnames=("img_size", "parity_mode", "stain",
                                    "dtype"))
def train_transform(
    key: jax.Array,
    images: jax.Array,  # N,H,W,3 uint8
    masks: jax.Array,  # N,H,W  uint8/int
    img_size: int,
    parity_mode: bool = False,
    stain: str = "none",
    dtype: jnp.dtype = jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Reference train pipeline (``train_main.py:70-81``), fused on device.

    ``stain`` ∈ {none, reinhard, macenko}: optional per-image H&E stain
    normalization on [0,1] pixels before everything else (framework
    extension, BASELINE config #2; the reference has none).

    ``dtype`` is the pipeline compute dtype: pass the model's compute dtype
    (bfloat16 on TPU) so the whole augmentation chain never touches float32
    full-image tensors — uint8 pixel values are exact in bf16 and the
    augmented values feed a bf16 model anyway.

    Returns ``dtype`` normalized images (N,S,S,3) and float32 binary masks
    (N,S,S).
    """
    if images.shape[1] != img_size or images.shape[2] != img_size:
        images = resize_bilinear(images.astype(jnp.float32), img_size,
                                 img_size)
    masks = resize_nearest(masks, img_size, img_size).astype(jnp.float32)
    images = images.astype(dtype)
    if stain != "none":
        from pdac_pathological_image_segmentation_tpu.ops.stain import (
            apply_stain_batch,
        )

        images = apply_stain_batch(images / 255.0, stain).astype(dtype) * 255.0

    if parity_mode:
        # quirk-compatible: normalize first, jitter the normalized floats,
        # no clipping (SURVEY.md §5 quirk list / train_main.py:73-75)
        keys = jax.random.split(key, images.shape[0] * 2).reshape(
            images.shape[0], 2, -1)
        imgs = normalize(images, dtype=dtype)
        jit_fn = lambda k, im: color_jitter(k, im, clip=False)
        imgs = jax.vmap(jit_fn)(keys[:, 0], imgs)
        imgs, masks = jax.vmap(one_of_flip_rot)(keys[:, 1], imgs, masks)
    else:
        # default mode: slot-matrix jitter on [0,1] (same RNG stream as
        # the legacy per-op chain; same (A, γ) tables the fused Pallas
        # kernel consumes, so the two paths agree to bf16 rounding)
        facs, ints = draw_augment_scalars(key, images.shape[0])
        imgs = images / jnp.asarray(255.0, dtype)
        imgs = apply_slot_jitter(imgs, facs, ints)
        imgs = (imgs - jnp.asarray(_MEAN, dtype)) / jnp.asarray(_STD, dtype)
        imgs, masks = apply_one_of_geom(imgs, masks, ints)
    return imgs, masks


@functools.partial(jax.jit, static_argnames=("img_size", "dtype", "stain"))
def eval_transform(
    images: jax.Array, masks: jax.Array, img_size: int,
    dtype: jnp.dtype = jnp.float32,
    stain: str = "none",
) -> Tuple[jax.Array, jax.Array]:
    """Reference val/test pipeline (``train_main.py:82-88``, ``test.py:62-68``):
    Resize → Normalize only (plus the optional ``stain`` normalization hook,
    same semantics as :func:`train_transform`).  ``dtype`` controls the
    normalize output (pass the model compute dtype to keep the hot path in
    bf16 end-to-end; the common img_size==input case skips the resize
    entirely, so uint8 patches normalize straight into bf16)."""
    if images.shape[1] != img_size or images.shape[2] != img_size:
        images = resize_bilinear(images.astype(jnp.float32), img_size, img_size)
    masks = resize_nearest(masks, img_size, img_size).astype(jnp.float32)
    if stain != "none":
        from pdac_pathological_image_segmentation_tpu.ops.stain import (
            apply_stain_batch,
        )

        images = apply_stain_batch(
            images.astype(jnp.float32) / 255.0, stain
        ) * 255.0
    return normalize(images, dtype=dtype), masks

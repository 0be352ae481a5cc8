"""Bilinear / nearest resize with PyTorch ``align_corners=False`` semantics.

The reference's model head upsamples with
``nn.functional.interpolate(mode="bilinear", align_corners=False)``
(reference ``models/resunet.py:51-56``) and its data pipeline resizes with
OpenCV ``INTER_LINEAR`` / ``INTER_NEAREST`` (albumentations ``A.Resize``,
reference ``train_main.py:72``) — both are the *half-pixel-centers, no
antialias* convention.  ``jax.image.resize`` antialiases on downscale, which
breaks bit-parity, so we build the resize as two small dense matmuls
(H_out×H_in and W_in×W_out weight matrices, each row ≤2 nonzeros) — separable,
exact, and MXU-friendly: XLA lowers the einsum pair straight onto the systolic
array with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _bilinear_matrix(in_size: int, out_size: int,
                     align_corners: bool = False) -> np.ndarray:
    """Dense (out_size, in_size) interpolation matrix, edge-clamped, no
    antialiasing.  ``align_corners=False``: half-pixel centers (torch
    ``interpolate(align_corners=False)`` == cv2.INTER_LINEAR).
    ``align_corners=True``: corner-aligned (torch ``UpsamplingBilinear2d`` —
    what smp's SegmentationHead uses)."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = out_idx * scale
    else:
        scale = in_size / out_size
        src = (out_idx + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float64)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    mat[np.arange(out_size), lo] += 1.0 - frac
    mat[np.arange(out_size), hi] += frac
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=128)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """Nearest-neighbor source index per output pixel (cv2.INTER_NEAREST
    convention used by albumentations for masks: floor of center-scaled
    coordinate)."""
    out_idx = np.arange(out_size, dtype=np.float64)
    # OpenCV INTER_NEAREST: src = floor(dst * scale)
    src = np.floor(out_idx * (in_size / out_size)).astype(np.int64)
    return np.clip(src, 0, in_size - 1)


def resize_bilinear(x: jax.Array, out_h: int, out_w: int,
                    align_corners: bool = False,
                    compute_dtype=jnp.float32) -> jax.Array:
    """Bilinear resize on NHWC (or HWC / NHW / HW) arrays.

    Computed in ``compute_dtype`` (float32 default — matches torch/cv2
    bit-for-bit; bfloat16 halves the interpolation's HBM traffic on the
    serving path) and cast back to the input dtype; the two einsums contract
    the spatial axes against the precomputed interpolation matrices.
    """
    orig_dtype = x.dtype
    squeeze_batch = False
    squeeze_chan = False
    if x.ndim == 2:
        x = x[None, :, :, None]
        squeeze_batch = squeeze_chan = True
    elif x.ndim == 3:
        # Ambiguity: HWC vs NHW.  We treat 3-D input as HWC (single image).
        x = x[None]
        squeeze_batch = True
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) == (out_h, out_w):
        out = x
    else:
        mh = jnp.asarray(_bilinear_matrix(in_h, out_h, align_corners),
                         compute_dtype)
        mw = jnp.asarray(_bilinear_matrix(in_w, out_w, align_corners),
                         compute_dtype)
        xf = x.astype(compute_dtype)
        out = jnp.einsum("oh,nhwc->nowc", mh, xf, precision=jax.lax.Precision.HIGHEST)
        out = jnp.einsum("pw,nhwc->nhpc", mw, out, precision=jax.lax.Precision.HIGHEST)
        if jnp.issubdtype(orig_dtype, jnp.integer):
            out = jnp.round(out)
        out = out.astype(orig_dtype)
    if squeeze_chan:
        out = out[..., 0]
    if squeeze_batch:
        out = out[0]
    return out


def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbor resize on NHWC / NHW / HWC / HW arrays (mask path)."""
    squeeze_batch = False
    if x.ndim == 2:
        x = x[None]
        squeeze_batch = True
    # 3-D input is treated as NHW (mask batch); 4-D as NHWC.
    in_h, in_w = x.shape[1], x.shape[2]
    if (in_h, in_w) != (out_h, out_w):
        ih = jnp.asarray(_nearest_index(in_h, out_h))
        iw = jnp.asarray(_nearest_index(in_w, out_w))
        x = jnp.take(x, ih, axis=1)
        x = jnp.take(x, iw, axis=2)
    if squeeze_batch:
        x = x[0]
    return x

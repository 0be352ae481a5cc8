"""Tissue/background thresholding for WSI tiling.

Named in the BASELINE.json north star ("the OpenSlide-style patch tiler,
tissue/background thresholding, ...").  H&E background is bright and
unsaturated; tissue is stained.  The standard cheap detector (as used by
PyHIST-style pipelines) marks a pixel as tissue when its HSV saturation
exceeds a threshold and it is neither blown-out white nor pen/black:

    tissue(p) = sat(p) > sat_thresh  ∧  value(p) < white_thresh
                ∧ value(p) > black_thresh

Both a vectorized numpy host version (for the tiler's keep/skip decision)
and a jittable JAX version (for on-device pipelines) are provided.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAT_THRESH = 0.07
WHITE_THRESH = 0.95
BLACK_THRESH = 0.05


def _sat_val(rgb01):
    mx = rgb01.max(axis=-1)
    mn = rgb01.min(axis=-1)
    sat = (mx - mn) / (mx + 1e-8)
    return sat, mx


def tissue_mask_np(
    img: np.ndarray,  # H,W,3 uint8 (or [0,1] float)
    sat_thresh: float = SAT_THRESH,
    white_thresh: float = WHITE_THRESH,
    black_thresh: float = BLACK_THRESH,
) -> np.ndarray:
    rgb = img.astype(np.float32)
    if rgb.max() > 1.5:
        rgb = rgb / 255.0
    sat, val = _sat_val(rgb)
    return (sat > sat_thresh) & (val < white_thresh) & (val > black_thresh)


def tissue_fraction_np(img: np.ndarray, **kw) -> float:
    return float(tissue_mask_np(img, **kw).mean())


@jax.jit
def tissue_mask(img: jax.Array) -> jax.Array:
    """Jittable per-pixel tissue mask on uint8/float NHWC or HWC."""
    rgb = img.astype(jnp.float32)
    rgb = jnp.where(jnp.max(rgb) > 1.5, rgb / 255.0, rgb)
    sat, val = _sat_val(rgb)
    return (sat > SAT_THRESH) & (val < WHITE_THRESH) & (val > BLACK_THRESH)


@jax.jit
def tissue_fraction(tiles: jax.Array) -> jax.Array:
    """Per-tile tissue fraction for a batch (N,H,W,3) → (N,)."""
    m = tissue_mask(tiles)
    return jnp.mean(m.astype(jnp.float32), axis=(1, 2))

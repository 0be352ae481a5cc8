"""H&E stain normalization, on device.

The reference has no stain normalization (its augmentation is generic color
jitter, ``train_main.py:75``); BASELINE.json config #2 calls for it as part
of the fused preprocessing pipeline.  Two standard methods, both jittable:

* :func:`reinhard_normalize` — per-channel mean/std matching in LAB space
  (Reinhard et al. 2001), a cheap elementwise+reduction program that XLA
  fuses into the preprocessing.
* :func:`macenko_stain_matrix` / :func:`macenko_normalize` — Macenko et al.
  2009: optical-density eigenvector estimation of the H&E stain basis,
  concentration unmixing, and remapping onto a reference stain basis.  The
  eigen-decomposition is a fixed 3×3 ``jnp.linalg.eigh`` — tiny and
  TPU-compatible.  Percentiles use ``jnp.percentile`` on device.

Both operate on float RGB in [0, 1] (apply before ImageNet normalization).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as _np

# Module-level constants are NUMPY on purpose: this module may be first
# imported from inside a jit trace (the transforms import it lazily), where
# any jnp op would stage into the trace and leak tracers into these globals.
# standard reference H&E stain basis (columns = hematoxylin, eosin OD
# vectors) used when no reference slide is fitted — the widely used values
# from the original Macenko formulation
REFERENCE_STAIN_BASIS = _np.asarray(
    [[0.5626, 0.2159],
     [0.7201, 0.8012],
     [0.4062, 0.5581]], dtype=_np.float32
)
REFERENCE_MAX_CONC = _np.asarray([1.9705, 1.0308], dtype=_np.float32)

_EPS = 1e-6


# ---------------------------------------------------------------------------
# Reinhard (LAB statistics matching)
# ---------------------------------------------------------------------------

_RGB2LMS = _np.asarray(
    [[0.3811, 0.5783, 0.0402],
     [0.1967, 0.7244, 0.0782],
     [0.0241, 0.1288, 0.8444]], dtype=_np.float32
)
_LMS2LAB_A = (_np.diag(1.0 / _np.sqrt(_np.asarray([3.0, 6.0, 2.0])))
              @ _np.asarray(
    [[1.0, 1.0, 1.0],
     [1.0, 1.0, -2.0],
     [1.0, -1.0, 0.0]])).astype(_np.float32)


def _rgb_to_lab(rgb: jax.Array) -> jax.Array:
    lms = jnp.einsum("...c,kc->...k", rgb, _RGB2LMS)
    log_lms = jnp.log10(jnp.maximum(lms, _EPS))
    return jnp.einsum("...c,kc->...k", log_lms, _LMS2LAB_A)


_LAB2LMS = _np.linalg.inv(_LMS2LAB_A.astype(_np.float64)).astype(_np.float32)
_LMS2RGB = _np.linalg.inv(_RGB2LMS.astype(_np.float64)).astype(_np.float32)


def _lab_to_rgb(lab: jax.Array) -> jax.Array:
    log_lms = jnp.einsum("...c,kc->...k", lab, _LAB2LMS)
    lms = jnp.power(10.0, log_lms)
    rgb = jnp.einsum("...c,kc->...k", lms, _LMS2RGB)
    return jnp.clip(rgb, 0.0, 1.0)


class LabStats(NamedTuple):
    mean: jax.Array  # (3,)
    std: jax.Array  # (3,)


def lab_stats(rgb: jax.Array) -> LabStats:
    """Per-channel LAB mean/std of an image (or batch)."""
    lab = _rgb_to_lab(rgb)
    axes = tuple(range(lab.ndim - 1))
    return LabStats(jnp.mean(lab, axis=axes), jnp.std(lab, axis=axes) + _EPS)


@jax.jit
def reinhard_normalize(
    rgb: jax.Array, target: LabStats, source: Optional[LabStats] = None
) -> jax.Array:
    """Match each image's LAB statistics to ``target`` (fit once on a
    reference slide with :func:`lab_stats`)."""
    lab = _rgb_to_lab(rgb)
    if source is None:
        axes = tuple(range(lab.ndim - 1))
        src_mean = jnp.mean(lab, axis=axes)
        src_std = jnp.std(lab, axis=axes) + _EPS
    else:
        src_mean, src_std = source
    lab = (lab - src_mean) / src_std * target.std + target.mean
    return _lab_to_rgb(lab)


@functools.lru_cache(maxsize=1)
def reference_lab_stats() -> "LabStats":
    """LAB statistics of a canonical synthetic H&E tile generated from the
    reference stain basis via Beer-Lambert over a dense concentration grid —
    a deterministic, dependency-free Reinhard target when no reference slide
    is fitted (fit a real one with :func:`lab_stats` for production use).

    Computed (and cached) in pure numpy: this may be first called inside a
    jit trace, where any jnp op would stage into the trace and poison the
    cache with tracers."""
    import numpy as np

    max_conc = REFERENCE_MAX_CONC
    c = np.linspace(0.05, 1.0, 64)
    g1, g2 = np.meshgrid(c * max_conc[0], c * max_conc[1])
    conc = np.stack([g1.ravel(), g2.ravel()])  # (2, N)
    od = REFERENCE_STAIN_BASIS @ conc
    rgb = np.power(10.0, -od).T.astype(np.float64)  # (N, 3)
    lms = rgb @ _RGB2LMS.T
    lab = np.log10(np.maximum(lms, _EPS)) @ _LMS2LAB_A.T
    return LabStats(
        lab.mean(axis=0).astype(np.float32),
        (lab.std(axis=0) + _EPS).astype(np.float32),
    )


def apply_stain_batch(imgs01: jax.Array, method: str) -> jax.Array:
    """Per-image stain normalization of a batch of [0,1] RGB images.

    ``method`` ∈ {"none", "reinhard", "macenko"} — the config hook wired
    into the fused train/eval/WSI preprocessing (``ops/augment.py``)."""
    if method in (None, "none", ""):
        return imgs01
    if method == "reinhard":
        target = reference_lab_stats()
        return jax.vmap(lambda im: reinhard_normalize(im, target))(imgs01)
    if method == "macenko":
        def f(im):
            basis = macenko_stain_matrix(im)
            return macenko_normalize(im, basis)

        return jax.vmap(f)(imgs01)
    raise ValueError(f"unknown stain method {method!r}")


# ---------------------------------------------------------------------------
# Macenko
# ---------------------------------------------------------------------------


class StainBasis(NamedTuple):
    basis: jax.Array  # (3, 2) H&E OD vectors (columns)
    max_conc: jax.Array  # (2,) 99th-percentile stain concentrations


def _optical_density(rgb: jax.Array) -> jax.Array:
    return -jnp.log10(jnp.maximum(rgb, _EPS))


@functools.partial(jax.jit, static_argnames=("beta_mask",))
def macenko_stain_matrix(
    rgb: jax.Array, alpha: float = 1.0, beta: float = 0.15,
    beta_mask: bool = True,
) -> StainBasis:
    """Estimate the slide's H&E stain basis (Macenko).

    Works on any pixel collection (an image, a batch, or sampled tiles of a
    WSI).  Background pixels (OD below ``beta``) are soft-excluded by
    zero-weighting instead of boolean indexing, keeping shapes static for
    jit.
    """
    od = _optical_density(rgb).reshape(-1, 3)
    weight = (
        (jnp.linalg.norm(od, axis=1) > beta).astype(jnp.float32)
        if beta_mask else jnp.ones(od.shape[0], jnp.float32)
    )
    w = weight[:, None]
    n = jnp.maximum(jnp.sum(weight), 1.0)
    mean = jnp.sum(od * w, axis=0) / n
    centered = (od - mean) * w
    cov = centered.T @ centered / n
    # top-2 eigenvectors of the 3×3 OD covariance span the stain plane
    _, eigvecs = jnp.linalg.eigh(cov)
    plane = eigvecs[:, 1:3]  # ascending order → last two

    proj = od @ plane  # (N, 2)
    phi = jnp.arctan2(proj[:, 1], proj[:, 0])
    # percentile of angles over tissue pixels only: background pixels are
    # NaN-ed out and skipped via nanpercentile (plain percentile would
    # propagate the NaNs and poison the whole basis)
    phi_tissue = jnp.where(weight > 0, phi, jnp.nan)
    phi_lo = jnp.nanpercentile(phi_tissue, alpha, method="nearest")
    phi_hi = jnp.nanpercentile(phi_tissue, 100.0 - alpha, method="nearest")
    v1 = plane @ jnp.stack([jnp.cos(phi_lo), jnp.sin(phi_lo)])
    v2 = plane @ jnp.stack([jnp.cos(phi_hi), jnp.sin(phi_hi)])
    v1 = v1 * jnp.sign(jnp.sum(v1) + _EPS)
    v2 = v2 * jnp.sign(jnp.sum(v2) + _EPS)
    # hematoxylin has the larger first (red-OD) component by convention
    first_is_h = v1[0] > v2[0]
    h = jnp.where(first_is_h, v1, v2)
    e = jnp.where(first_is_h, v2, v1)
    basis = jnp.stack([h, e], axis=1)
    basis = basis / (jnp.linalg.norm(basis, axis=0, keepdims=True) + _EPS)

    conc = _concentrations(rgb, basis)
    conc_t = jnp.where(weight[None, :] > 0, conc.reshape(2, -1), jnp.nan)
    max_conc = jnp.nanpercentile(conc_t, 99.0, axis=1, method="nearest")
    return StainBasis(basis, max_conc)


def _concentrations(rgb: jax.Array, basis: jax.Array) -> jax.Array:
    """Least-squares unmix OD into 2 stain concentrations: (2, N)."""
    od = _optical_density(rgb).reshape(-1, 3).T  # (3, N)
    pinv = jnp.linalg.inv(basis.T @ basis) @ basis.T  # (2, 3)
    return pinv @ od


@jax.jit
def macenko_normalize(
    rgb: jax.Array,
    source: StainBasis,
    target: Optional[StainBasis] = None,
) -> jax.Array:
    """Remap an image from its ``source`` stain basis onto ``target``
    (default: the canonical reference basis)."""
    if target is None:
        target = StainBasis(REFERENCE_STAIN_BASIS, REFERENCE_MAX_CONC)
    shape = rgb.shape
    conc = _concentrations(rgb, source.basis)  # (2, N)
    conc = conc * (target.max_conc / jnp.maximum(source.max_conc, _EPS))[:, None]
    od = target.basis @ conc  # (3, N)
    rgb_out = jnp.power(10.0, -od).T.reshape(shape)
    return jnp.clip(rgb_out, 0.0, 1.0)

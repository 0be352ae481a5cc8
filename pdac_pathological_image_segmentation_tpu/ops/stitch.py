"""On-device overlap-blend stitching for sliding-window WSI inference.

The reference stitches on host: its (missing) overlay notebook pastes binary
tile masks at PyHIST grid coordinates over a thumbnail (SURVEY.md §3.5,
``configs/visualize_config.yaml:3-9``).  Here the whole reassembly runs on
device: predicted probability tiles are weighted by a blend window and
scatter-accumulated into a canvas with a matching weight canvas, all inside
one jit program (a ``lax.scan`` of ``dynamic_update_slice`` read-modify-
writes — XLA keeps the canvas in HBM and touches only the tile-sized
window per step).  The final mask is ``accum / weight`` — seamless across
tile boundaries when tiles overlap (the reference's 0-overlap paste is the
``blend="uniform"``, stride==tile_size special case).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _blend_window_np(tile: int, mode: str) -> np.ndarray:
    if mode == "uniform":
        return np.ones((tile, tile), dtype=np.float32)
    if mode == "hann":
        # separable raised-cosine, >0 everywhere so division is safe even
        # for non-overlapping tiles
        w1 = 0.5 - 0.5 * np.cos(2.0 * np.pi * (np.arange(tile) + 0.5) / tile)
        w1 = np.maximum(w1, 1e-3).astype(np.float32)
        return np.outer(w1, w1)
    if mode == "pyramid":
        r = np.arange(tile, dtype=np.float32)
        w1 = np.minimum(r + 1.0, tile - r)
        w1 /= w1.max()
        return np.outer(w1, w1)
    raise ValueError(f"unknown blend mode {mode!r}")


def blend_window(tile: int, mode: str = "hann") -> jax.Array:
    return jnp.asarray(_blend_window_np(tile, mode))


@functools.partial(jax.jit, static_argnames=("canvas_hw", "blend"),
                   donate_argnums=())
def stitch_tiles(
    probs: jax.Array,  # T,t,t (binary) or T,t,t,C (multi-class) float32
    coords: jax.Array,  # T,2 int32 — (y, x) top-left canvas coordinates
    canvas_hw: tuple,
    blend: str = "hann",
) -> tuple[jax.Array, jax.Array]:
    """Scatter-accumulate ``probs`` into a fresh canvas.

    Returns ``(accum, weight)`` so callers can stream tile chunks:
    run over several chunks with :func:`stitch_tiles_into`, divide once.
    Channelled tiles (softmax probabilities, num_classes > 1) get an
    ``(h, w, C)`` accumulation canvas; the weight canvas is always 2-D
    (every class shares the blend window).
    """
    h, w = canvas_hw
    shape = (h, w) if probs.ndim == 3 else (h, w, probs.shape[-1])
    accum = jnp.zeros(shape, jnp.float32)
    weight = jnp.zeros((h, w), jnp.float32)
    return stitch_tiles_into(accum, weight, probs, coords, blend=blend)


@functools.partial(jax.jit, static_argnames=("blend",),
                   donate_argnums=(0, 1))
def stitch_tiles_into(
    accum: jax.Array,
    weight: jax.Array,
    probs: jax.Array,
    coords: jax.Array,
    blend: str = "hann",
) -> tuple[jax.Array, jax.Array]:
    """Accumulate a chunk of tiles into existing (donated) canvases."""
    tile = probs.shape[1]
    win = blend_window(tile, blend)
    channelled = probs.ndim == 4
    pwin = win[..., None] if channelled else win

    def body(carry, inp):
        acc, wgt = carry
        p, yx = inp
        y, x = yx[0], yx[1]
        if channelled:
            start, size = (y, x, 0), (tile, tile, acc.shape[-1])
        else:
            start, size = (y, x), (tile, tile)
        patch = jax.lax.dynamic_slice(acc, start, size)
        acc = jax.lax.dynamic_update_slice(acc, patch + p * pwin, start)
        wpatch = jax.lax.dynamic_slice(wgt, (y, x), (tile, tile))
        wgt = jax.lax.dynamic_update_slice(wgt, wpatch + win, (y, x))
        return (acc, wgt), None

    (accum, weight), _ = jax.lax.scan(body, (accum, weight), (probs, coords))
    return accum, weight


@jax.jit
def finalize_canvas(accum: jax.Array, weight: jax.Array,
                    threshold: float = 0.5) -> tuple[jax.Array, jax.Array]:
    """Blend-normalize and decide: returns (probability map, hard mask).
    Binary canvases threshold at ``threshold`` (the reference's 0.5,
    ``test.py:143``); channelled canvases argmax over classes.  Pixels
    never covered by a tile get probability 0 (class 0)."""
    if accum.ndim == 3:  # (h, w, C) multi-class canvas, 2-D weight
        w = jnp.maximum(weight, 1e-12)[..., None]
        prob = jnp.where(weight[..., None] > 0, accum / w, 0.0)
        return prob, jnp.argmax(prob, axis=-1).astype(jnp.uint8)
    prob = jnp.where(weight > 0, accum / jnp.maximum(weight, 1e-12), 0.0)
    return prob, (prob >= threshold).astype(jnp.uint8)

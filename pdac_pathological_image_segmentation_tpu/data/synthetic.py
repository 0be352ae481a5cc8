"""Synthetic patch dataset generator for tests and benchmarks.

Creates H&E-ish PNG patches with known circular/rectangular tumor masks in the
reference's filesystem contract (``<name>.png`` + ``<name>-labelled.png``,
see ``data/discovery.py``).  The reference has no test fixtures at all
(SURVEY.md §4); this is the fixture generator our test suite builds on.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np
from PIL import Image


def _he_texture(rng: np.random.Generator, size: int) -> np.ndarray:
    """Cheap hematoxylin/eosin-looking background: pink base + purple blobs."""
    base = np.array([230, 180, 200], dtype=np.float32)  # eosin pink
    img = base + rng.normal(0, 12, size=(size, size, 3)).astype(np.float32)
    return img


# per-class tint targets: class k's blob is pulled toward _CLASS_TINTS[k-1]
# so intensity correlates with the label (learnable by a small model)
_CLASS_TINTS = np.array([
    [120, 60, 160],   # hematoxylin purple (the binary "tumor" tint)
    [60, 140, 90],    # green-ish
    [170, 120, 40],   # ochre
    [50, 90, 170],    # blue
], np.float32)


def generate_synthetic_patches(
    out_dir: str,
    n: int = 16,
    size: int = 512,
    seed: int = 0,
    tumor_fraction: float = 0.8,
    num_classes: int = 1,
) -> Tuple[int, int]:
    """Write ``n`` image/mask PNG pairs into ``out_dir``.

    Each tumor patch gets a random filled circle labeled 1 and tinted purple
    (so intensity correlates with the label — learnable).  Returns
    (n_images, n_masks).

    ``num_classes > 1``: each patch gets one blob per non-background class
    (labels ``1..num_classes-1``), each with its own tint — the multi-class
    fixture (labels may overwrite each other where blobs overlap; later
    classes win, like QuPath's label-order overwrite).
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_blob_classes = max(1, num_classes - 1)
    for i in range(n):
        img = _he_texture(rng, size)
        mask = np.zeros((size, size), dtype=np.uint8)
        for k in range(1, n_blob_classes + 1):
            if num_classes == 1 and rng.random() >= tumor_fraction:
                continue
            cy, cx = rng.integers(size // 4, 3 * size // 4, size=2)
            r = int(rng.integers(size // 8, size // 3))
            yy, xx = np.ogrid[:size, :size]
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            mask[blob] = k
            tint = _CLASS_TINTS[(k - 1) % len(_CLASS_TINTS)]
            img[blob] = img[blob] * 0.5 + tint * 0.5
        img = np.clip(img, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(out_dir, f"patch_{i:04d}.png"))
        # mask stored as 0/1 labels like the QuPath LabeledImageServer export
        Image.fromarray(mask).save(
            os.path.join(out_dir, f"patch_{i:04d}-labelled.png")
        )
    return n, n


class SyntheticSlideSource:
    """Procedural gigapixel-slide tile source — O(1) memory.

    The virtual slide is a grid of ``tile``-sized cells, each generated
    deterministically from its cell indices, so every pixel of the slide has
    one well-defined value: overlapping windows from ``get`` and arbitrary
    band reads from ``read_region`` agree exactly (the property the
    band-input runner's equality tests rely on).  Implements the tile-source
    protocol of ``infer.wsi.GridTiler`` (``len()``, ``get(i) → (tile_u8,
    (y, x))``, ``canvas_hw``) **plus** ``read_region(y, x, h, w)``, so a
    40k×40k slide streams through the sliding-window pipeline without the
    slide (4.8 GB) ever existing in host RAM — the BASELINE config #4
    harness input.

    Roughly ``background_fraction`` of cells are blank glass (bright,
    unsaturated), the rest H&E-ish tissue with a purple blob — so
    ``tissue_threshold`` has something real to skip.
    """

    def __init__(self, size: int, tile: int = 512, stride: int | None = None,
                 seed: int = 0, background_fraction: float = 0.3) -> None:
        self.size = size
        self.tile = tile
        self.stride = stride or tile
        self.seed = seed
        self.background_fraction = background_fraction
        ys = list(range(0, max(size - tile, 0) + 1, self.stride))
        if ys and ys[-1] != size - tile and size > tile:
            ys.append(size - tile)
        self.coords = [(y, x) for y in ys for x in ys]
        self.canvas_hw = (size, size)
        # overlapping windows / bands touch each cell up to ~9×; a small
        # FIFO cache keeps regeneration off the repeat touches without
        # holding more than a couple of band-rows of cells
        self._cell_cache: dict = {}
        self._cell_cache_cap = max(4 * (size // tile + 2), 64)

    def __len__(self) -> int:
        return len(self.coords)

    def _cell(self, iy: int, ix: int) -> np.ndarray:
        """The (tile×tile×3) uint8 cell at cell-grid indices (iy, ix)."""
        cached = self._cell_cache.get((iy, ix))
        if cached is not None:
            return cached
        cell = self._make_cell(iy, ix)
        if len(self._cell_cache) >= self._cell_cache_cap:
            self._cell_cache.pop(next(iter(self._cell_cache)), None)
        self._cell_cache[(iy, ix)] = cell
        return cell

    def _make_cell(self, iy: int, ix: int) -> np.ndarray:
        t = self.tile
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + iy) * 1_000_003 + ix
        )
        if rng.random() < self.background_fraction:
            return np.full((t, t, 3), 244, np.uint8)
        # low-frequency field upsampled by kron: cheap, smooth "tissue"
        coarse = rng.normal(0, 1, (t // 32, t // 32, 3)).astype(np.float32)
        field = np.kron(coarse, np.ones((32, 32, 1), np.float32))
        img = np.array([225, 170, 195], np.float32) + 18.0 * field
        cy, cx = rng.integers(t // 4, 3 * t // 4, size=2)
        r = int(rng.integers(t // 8, t // 3))
        yy, xx = np.ogrid[:t, :t]
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        img[blob] = img[blob] * 0.5 + np.array([120, 60, 160]) * 0.5
        return np.clip(img, 0, 255).astype(np.uint8)

    def read_region(self, y: int, x: int, h: int, w: int) -> np.ndarray:
        """(h, w, 3) uint8 region at pixel (y, x); zero-filled outside the
        slide — the band-input read used by ``BandedSlidingWindow``."""
        t = self.tile
        out = np.zeros((h, w, 3), np.uint8)
        if y >= self.size or x >= self.size or y + h <= 0 or x + w <= 0:
            return out
        for iy in range(max(0, y // t), min(-(-(y + h) // t),
                                            -(-self.size // t))):
            for ix in range(max(0, x // t), min(-(-(x + w) // t),
                                                -(-self.size // t))):
                cell = self._cell(iy, ix)
                y0, y1 = max(y, iy * t), min(y + h, (iy + 1) * t, self.size)
                x0, x1 = max(x, ix * t), min(x + w, (ix + 1) * t, self.size)
                if y1 <= y0 or x1 <= x0:
                    continue
                out[y0 - y:y1 - y, x0 - x:x1 - x] = \
                    cell[y0 - iy * t:y1 - iy * t, x0 - ix * t:x1 - ix * t]
        return out

    def get(self, i: int):
        y, x = self.coords[i]
        return self.read_region(y, x, self.tile, self.tile), (y, x)


class DeviceSlideSource:
    """Procedural slide whose bands are generated ON DEVICE — zero H2D.

    The harness chip sits behind a ~20 MB/s network tunnel, so any
    host-fed WSI bench measures the tunnel, not the chip (the 40k×40k
    run: 885 s, ≈19.9 GB of tile uploads ÷ ~22 MB/s — BASELINE.md round
    3).  This source implements the ``read_region`` band protocol of
    :class:`~..infer.wsi.BandedSlidingWindow`'s band-input mode but
    returns a device array computed by a tiny jitted elementwise program
    (a deterministic function of global pixel coordinates, so
    overlapping band reads agree exactly); ``jax.device_put`` of an
    on-device array is a no-op, so the runner's upload step vanishes and
    the measured wall-clock is the chip-bound infer+stitch pipeline —
    the production-host (PCIe) number, measured instead of projected.
    """

    def __init__(self, size: int, tile: int = 512,
                 stride: int | None = None, seed: int = 0) -> None:
        self.size = size
        self.tile = tile
        self.stride = stride or tile
        self.seed = seed
        ys = list(range(0, max(size - tile, 0) + 1, self.stride))
        if ys and ys[-1] != size - tile and size > tile:
            ys.append(size - tile)
        self.coords = [(y, x) for y in ys for x in ys]
        self.canvas_hw = (size, size)
        self._region_cache: dict = {}

    def __len__(self) -> int:
        return len(self.coords)

    def _region_fn(self, h: int, w: int):
        fn = self._region_cache.get((h, w))
        if fn is not None:
            return fn
        import functools

        import jax
        import jax.numpy as jnp

        seed = self.seed

        @functools.partial(jax.jit, static_argnums=())
        def region(y0, x0):
            yy = (jnp.arange(h, dtype=jnp.float32) + y0)[:, None, None]
            xx = (jnp.arange(w, dtype=jnp.float32) + x0)[None, :, None]
            phase = jnp.asarray([0.0, 2.1, 4.2], jnp.float32) + seed
            base = jnp.asarray([225.0, 170.0, 195.0], jnp.float32)
            # smooth H&E-ish field + a high-frequency ripple, elementwise
            # in global coordinates (band overlap regions agree exactly)
            v = (base
                 + 18.0 * jnp.sin(yy / 97.0 + phase) * jnp.cos(xx / 89.0)
                 - 60.0 * jnp.maximum(
                     jnp.sin(yy / 253.0 + phase) * jnp.sin(xx / 241.0) - 0.6,
                     0.0) * 2.5)
            return jnp.clip(v, 0, 255).astype(jnp.uint8)

        self._region_cache[(h, w)] = region
        return region

    def read_region(self, y: int, x: int, h: int, w: int):
        """(h, w, 3) uint8 DEVICE array at pixel (y, x)."""
        return self._region_fn(h, w)(y, x)

    def get(self, i: int):
        import numpy as np

        y, x = self.coords[i]
        return (np.asarray(self.read_region(y, x, self.tile, self.tile)),
                (y, x))

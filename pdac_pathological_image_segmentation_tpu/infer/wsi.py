"""Full-slide sliding-window inference with on-device stitching and TTA.

Supersedes the reference's missing ``visualize/predict_overlay.ipynb``
(capability inferred in SURVEY.md §3.5 from
``configs/visualize_config.yaml:3-9`` + ``README.md:26-35``): the reference
predicts PyHIST tiles one at a time (batch_size 1) and pastes binary masks on
host.  Here:

* tiles stream through the fused tile→mask step in large batches;
* optional test-time augmentation averages sigmoid probabilities over the
  8 dihedral transforms (flips × rot90), inverted on device;
* probability tiles are overlap-blended into the slide canvas on device
  (``ops/stitch.py``) — no host round-trips until the final mask fetch;
* slides larger than HBM stream through in tile chunks (the canvases are
  the only O(slide) device buffers, donated between chunks).

Two tile sources:
* :class:`GridTiler` — tile a full-resolution image array with overlap
  (stride ≤ tile), the QuPath/PyHIST tiler equivalent for in-memory slides;
* :class:`PyHISTTileSource` — the reference's visualization contract: a
  directory of tile PNGs + ``tile_selection.tsv`` grid coordinates.
"""

from __future__ import annotations

import csv
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pdac_pathological_image_segmentation_tpu.ops.stitch import (
    finalize_canvas,
    stitch_tiles,
    stitch_tiles_into,
)


# ---------------------------------------------------------------------------
# tile sources
# ---------------------------------------------------------------------------


class GridTiler:
    """Sliding-window tiler over an in-memory H×W×3 uint8 slide.

    ``tissue_threshold > 0`` skips background tiles (tiles whose tissue
    fraction per ``ops/tissue.py`` falls below the threshold) — the
    tissue/background thresholding stage of the tiling pipeline."""

    def __init__(self, slide: np.ndarray, tile: int = 512,
                 stride: Optional[int] = None,
                 tissue_threshold: float = 0.0) -> None:
        assert slide.ndim == 3 and slide.shape[2] == 3
        self.tile = tile
        self.stride = stride or tile
        self.orig_hw = tuple(slide.shape[:2])
        h, w = slide.shape[:2]
        if h < tile or w < tile:
            # slides smaller than one tile: edge-pad up to the tile so every
            # emitted tile has the static (tile, tile, 3) shape the compiled
            # infer step expects; the runner crops the canvas back to
            # ``orig_hw``
            pad_h, pad_w = max(tile - h, 0), max(tile - w, 0)
            slide = np.pad(slide, ((0, pad_h), (0, pad_w), (0, 0)),
                           mode="edge")
            h, w = slide.shape[:2]
        self.slide = slide
        ys = list(range(0, max(h - tile, 0) + 1, self.stride))
        xs = list(range(0, max(w - tile, 0) + 1, self.stride))
        # make sure the right/bottom edges are covered
        if ys[-1] != h - tile and h > tile:
            ys.append(h - tile)
        if xs[-1] != w - tile and w > tile:
            xs.append(w - tile)
        self.coords = [(y, x) for y in ys for x in xs]
        if tissue_threshold > 0.0:
            from pdac_pathological_image_segmentation_tpu.ops.tissue import (
                tissue_fraction_np,
            )

            self.coords = [
                (y, x) for (y, x) in self.coords
                if tissue_fraction_np(slide[y:y + tile, x:x + tile])
                >= tissue_threshold
            ]
        self.canvas_hw = (h, w)

    def __len__(self) -> int:
        return len(self.coords)

    def get(self, i: int) -> Tuple[np.ndarray, Tuple[int, int]]:
        y, x = self.coords[i]
        return self.slide[y:y + self.tile, x:x + self.tile], (y, x)

    def read_region(self, y: int, x: int, h: int, w: int) -> np.ndarray:
        """(h, w, 3) uint8 region at pixel (y, x) of the (edge-padded)
        slide, zero-filled outside — the band-input read used by
        ``BandedSlidingWindow``."""
        out = np.zeros((h, w, 3), np.uint8)
        sh, sw = self.slide.shape[:2]
        y1, x1 = min(y + h, sh), min(x + w, sw)
        if y1 > y and x1 > x:
            out[:y1 - y, :x1 - x] = self.slide[y:y1, x:x1]
        return out


class PyHISTTileSource:
    """The reference's visualization inputs: tile PNGs + a PyHIST
    ``tile_selection.tsv`` with grid coordinates (columns ``Tile``,
    ``Row``, ``Column``, ``Keep``; reference
    ``configs/visualize_config.yaml:6-9``)."""

    def __init__(self, tile_dir: str, tsv_path: str, tile: int = 512,
                 keep_only: bool = True,
                 tissue_threshold: float = 0.0,
                 num_workers: int = 8) -> None:
        self.tile_dir = tile_dir
        self.tile = tile
        self.entries: List[Tuple[str, int, int]] = []
        max_row = max_col = 0
        with open(tsv_path, "r") as f:
            reader = csv.DictReader(f, delimiter="\t")
            for row in reader:
                keep = str(row.get("Keep", "1")).strip()
                if keep_only and keep not in ("1", "True", "true"):
                    continue
                name = row["Tile"]
                r, c = int(row["Row"]), int(row["Column"])
                max_row, max_col = max(max_row, r), max(max_col, c)
                self.entries.append((name, r, c))
        self.canvas_hw = ((max_row + 1) * tile, (max_col + 1) * tile)
        if tissue_threshold > 0.0 and self.entries:
            # same keep/skip stage as GridTiler: decode once (threaded) and
            # drop background tiles below the tissue fraction threshold
            from pdac_pathological_image_segmentation_tpu.ops.tissue import (
                tissue_fraction_np,
            )

            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                fracs = list(pool.map(
                    lambda e: tissue_fraction_np(self._decode(e[0])),
                    self.entries,
                ))
            self.entries = [e for e, f in zip(self.entries, fracs)
                            if f >= tissue_threshold]

    def __len__(self) -> int:
        return len(self.entries)

    def _decode(self, name: str) -> np.ndarray:
        path = os.path.join(self.tile_dir, name)
        if not os.path.exists(path) and not name.endswith(".png"):
            path = path + ".png"
        return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)

    def get(self, i: int) -> Tuple[np.ndarray, Tuple[int, int]]:
        name, r, c = self.entries[i]
        img = self._decode(name)
        return img, (r * self.tile, c * self.tile)


# ---------------------------------------------------------------------------
# TTA
# ---------------------------------------------------------------------------


def _make_tta_infer(infer_step, tta: bool, with_variance: bool = False):
    """Wrap a tile→prob step with dihedral-8 TTA, averaged on device.

    ``with_variance=True`` additionally returns the per-pixel population
    variance across the 8 transform predictions — a zero-extra-forward
    uncertainty signal (transform disagreement): the step already computes
    all 8 predictions, so mean+variance come from running sum/sum-of-
    squares accumulators with no extra memory beyond one more tile batch.
    """
    if not tta:
        if with_variance:
            raise ValueError("uncertainty maps require tta=True "
                             "(variance across the dihedral-8 passes)")
        return infer_step

    def step(state, images):
        total = total_sq = None
        for flip in (False, True):
            imgs = images[:, :, ::-1, :] if flip else images
            for k in range(4):
                rot = jnp.rot90(imgs, k, axes=(1, 2))
                p = infer_step(state, rot)
                # invert: rot90 by -k, then unflip
                p = jnp.rot90(p, -k, axes=(1, 2))
                if flip:
                    p = p[:, :, ::-1]
                total = p if total is None else total + p
                if with_variance:
                    psq = p * p
                    total_sq = psq if total_sq is None else total_sq + psq
        mean = total / 8.0
        if not with_variance:
            return mean
        var = jnp.maximum(total_sq / 8.0 - mean * mean, 0.0)
        return mean, var

    return jax.jit(step)


# ---------------------------------------------------------------------------
# sliding-window runner
# ---------------------------------------------------------------------------


class SlidingWindowInference:
    """Stream tiles → fused tile→mask step (+TTA) → on-device overlap-blend
    canvas → (probability map, hard mask).

    Binary models stitch one canvas and threshold at 0.5; multi-class
    models (``num_classes > 1``) stitch an ``(H, W, C)`` softmax canvas
    and the mask is the per-pixel argmax class map (``ops/stitch.py``)."""

    def __init__(self, model, state, tile: int = 512, batch_size: int = 32,
                 tta: bool = False, blend: str = "hann",
                 num_workers: int = 8, stain: str = "none",
                 infer_step=None, uncertainty: bool = False) -> None:
        """``infer_step``: optional ``step(state, images_u8) → probs``
        override replacing the default fused tile→mask step — e.g. the
        int8 quantized path (``infer/quantized.py``).

        ``uncertainty=True`` (requires ``tta``) stitches a second canvas
        of per-pixel TTA disagreement (variance across the 8 dihedral
        predictions, overlap-blended with the same weights); ``run``
        then returns ``(prob, mask, uncertainty)``."""
        from pdac_pathological_image_segmentation_tpu.train.steps import (
            make_infer_step,
        )

        self.state = state
        self.tile = tile
        self.batch_size = batch_size
        self.blend = blend
        self.uncertainty = uncertainty
        self._infer = _make_tta_infer(
            infer_step or make_infer_step(model, tile, stain=stain), tta,
            with_variance=uncertainty,
        )
        self._pool = ThreadPoolExecutor(max_workers=num_workers)

    def _batches(self, source) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(source)
        for start in range(0, n, self.batch_size):
            idxs = list(range(start, min(start + self.batch_size, n)))
            pairs = list(self._pool.map(source.get, idxs))
            images = np.stack([p[0] for p in pairs])
            coords = np.asarray([p[1] for p in pairs], dtype=np.int32)
            # the final partial chunk compiles once for its own shape
            yield images, coords

    def run(self, source) -> Tuple[np.ndarray, ...]:
        """Returns host (prob_map, binary_mask), each canvas_hw — plus an
        uncertainty map when constructed with ``uncertainty=True``."""
        accum = weight = var_accum = var_weight = None
        for images, coords in self._batches(source):
            out = self._infer(self.state, jnp.asarray(images))
            probs, vars_ = out if self.uncertainty else (out, None)
            coords_d = jnp.asarray(coords)
            if accum is None:
                accum, weight = stitch_tiles(
                    probs, coords_d, canvas_hw=tuple(source.canvas_hw),
                    blend=self.blend,
                )
                if vars_ is not None:
                    var_accum, var_weight = stitch_tiles(
                        vars_, coords_d, canvas_hw=tuple(source.canvas_hw),
                        blend=self.blend,
                    )
            else:
                accum, weight = stitch_tiles_into(
                    accum, weight, probs, coords_d, blend=self.blend
                )
                if vars_ is not None:
                    # own weight canvas: stitch_tiles_into donates its
                    # canvas args, so the prob path's `weight` cannot be
                    # shared (it would be deleted under us)
                    var_accum, var_weight = stitch_tiles_into(
                        var_accum, var_weight, vars_, coords_d,
                        blend=self.blend,
                    )
        if accum is None:
            raise ValueError("tile source is empty")
        prob, mask = finalize_canvas(accum, weight)
        prob = np.asarray(jax.device_get(prob))
        mask = np.asarray(jax.device_get(mask))
        # crop back any tiler padding (slides smaller than one tile)
        oh, ow = getattr(source, "orig_hw", prob.shape[:2])
        if not self.uncertainty:
            return prob[:oh, :ow], mask[:oh, :ow]
        w = jnp.maximum(var_weight, 1e-12)
        unc = np.asarray(jax.device_get(var_accum / w))
        unc = np.where(np.asarray(jax.device_get(var_weight)) > 0, unc, 0.0)
        return prob[:oh, :ow], mask[:oh, :ow], unc[:oh, :ow]


class BandedSlidingWindow:
    """Single-device sliding-window inference for slides whose canvas does
    not fit HBM (or host RAM): the canvas lives as one horizontal band of
    ``band_h + tile`` rows on device; a tile belongs to the band containing
    its top edge (it spills at most ``tile`` rows into the next band, which
    are carried over as the next band's starting accumulation).  Finalized
    rows stream to a host array (``prob_dtype`` float16 by default — a
    40k×40k probability map is 3.2 GB instead of 6.4).

    Device memory is O(band) and host tile input streams from the source —
    combined with a streaming source (``data.synthetic.SyntheticSlideSource``
    or ``PyHISTTileSource``) nothing O(slide) ever materializes except the
    output itself.

    **Band input** (``band_input=True``, auto-enabled when the source has a
    ``read_region(y, x, h, w)`` method): instead of uploading each
    overlapping ``tile``×``tile`` window separately — at stride ``tile/2``
    every slide pixel crosses host→device ~4× — the band's raw pixels are
    uploaded **once** per band and the windows are sliced out on device
    (``lax.dynamic_slice``).  H2D volume drops from ``(tile/stride)²`` ×
    slide bytes to ``(1 + tile/band_h)`` × slide bytes (≈3.6× less at
    stride 256 / band 4096), and the next band's read+upload is prefetched
    while the current band computes.  Tissue filtering still applies (it
    prunes the window list; bands with no surviving windows are never
    uploaded)."""

    def __init__(self, model, state, tile: int = 512, batch_size: int = 32,
                 band_h: Optional[int] = None, tta: bool = False,
                 blend: str = "hann", num_workers: int = 8,
                 stain: str = "none", infer_step=None,
                 band_input: Optional[bool] = None,
                 uncertainty: bool = False) -> None:
        """``infer_step``: optional ``step(state, images_u8) → probs``
        override replacing the default fused tile→mask step — e.g. the
        int8 quantized path (``infer.quantized.make_quantized_infer_fn``).

        ``band_input``: upload band pixels once and slice windows on device
        (requires ``source.read_region``); ``None`` = auto-detect per
        source, ``False`` = always upload windows individually.

        ``uncertainty=True`` (requires ``tta``) streams a TTA-disagreement
        map alongside the probabilities (same banded O(band) memory — two
        extra band canvases); ``run`` returns ``(prob, mask,
        uncertainty)``."""
        from pdac_pathological_image_segmentation_tpu.train.steps import (
            make_infer_step,
        )

        if model is not None and getattr(model, "num_classes", 1) > 1:
            raise ValueError(
                "BandedSlidingWindow stitches a single 2-D band canvas; "
                "multi-class slides need SlidingWindowInference (per-class "
                "canvases)")
        self.state = state
        self.tile = tile
        self.batch_size = batch_size
        self.band_h = band_h or max(tile, 4096)
        assert self.band_h >= tile
        self.blend = blend
        self.band_input = band_input
        self.uncertainty = uncertainty
        self._infer = _make_tta_infer(
            infer_step or make_infer_step(model, tile, stain=stain), tta,
            with_variance=uncertainty,
        )
        self._pool = ThreadPoolExecutor(max_workers=num_workers)

        def extract(band, coords):
            # slice a batch of tile windows out of the device-resident band
            return jax.vmap(
                lambda c: jax.lax.dynamic_slice(
                    band, (c[0], c[1], 0), (tile, tile, 3))
            )(coords)

        self._extract = jax.jit(extract)

    def _band_batches(self, source, idxs):
        for start in range(0, len(idxs), self.batch_size):
            chunk = idxs[start:start + self.batch_size]
            pairs = list(self._pool.map(source.get, chunk))
            images = np.stack([p[0] for p in pairs])
            coords = np.asarray([p[1] for p in pairs], dtype=np.int32)
            yield images, coords

    def _band_prob_batches(self, source, coords_all, per_band_idxs, y0,
                           band_dev):
        """Band-input inner loop: slice each window batch out of the
        device-resident band and run inference — no per-window H2D.  Partial
        final chunks are padded to ``batch_size`` (so the compiled infer
        step sees one shape) and the padded probabilities dropped before
        stitching."""
        bs = self.batch_size
        for start in range(0, len(per_band_idxs), bs):
            chunk = per_band_idxs[start:start + bs]
            k = len(chunk)
            local = np.asarray(
                [(coords_all[i][0] - y0, coords_all[i][1]) for i in chunk],
                np.int32,
            )
            if k < bs:
                local = np.concatenate(
                    [local, np.zeros((bs - k, 2), np.int32)])
            imgs = self._extract(band_dev, jnp.asarray(local))
            out = self._infer(self.state, imgs)
            if isinstance(out, tuple):  # uncertainty: (mean, variance)
                yield (out[0][:k], out[1][:k]), local[:k]
            else:
                yield out[:k], local[:k]

    def run(self, source, prob_dtype=np.float16
            ) -> Tuple[np.ndarray, ...]:
        """Returns (prob, mask) — plus a TTA-disagreement map when
        constructed with ``uncertainty=True``."""
        h, w = source.canvas_hw
        tile, band_h = self.tile, self.band_h
        n = len(source)
        # band assignment by tile top edge (host-side, O(tiles))
        coords_all = getattr(source, "coords", None)
        if coords_all is None:
            coords_all = [source.get(i)[1] for i in range(n)]
        n_bands = -(-h // band_h)
        per_band: list[list[int]] = [[] for _ in range(n_bands)]
        for i, (y, x) in enumerate(coords_all):
            per_band[min(y // band_h, n_bands - 1)].append(i)

        use_band = (self.band_input if self.band_input is not None
                    else hasattr(source, "read_region"))
        if use_band and not hasattr(source, "read_region"):
            raise ValueError(
                "band_input=True requires a source with read_region(y, x, "
                "h, w); pass band_input=False for window-upload mode")

        # band-input prefetch: read+upload the NEXT non-empty band while the
        # current one computes (single worker — bands arrive in order)
        band_rows = band_h + tile
        nonempty = [b for b in range(n_bands) if per_band[b]]
        fetcher = ThreadPoolExecutor(max_workers=1) if use_band else None
        futures: dict = {}

        def _fetch(b):
            return jax.device_put(
                source.read_region(b * band_h, 0, band_rows, w))

        if use_band and nonempty:
            futures[nonempty[0]] = fetcher.submit(_fetch, nonempty[0])

        roll = jax.jit(
            lambda a: jnp.zeros_like(a).at[:tile].set(a[band_h:]),
            donate_argnums=(0,),
        )
        prob_out = np.zeros((h, w), dtype=prob_dtype)
        mask_out = np.zeros((h, w), dtype=np.uint8)
        accum = jnp.zeros((band_h + tile, w), jnp.float32)
        weight = jnp.zeros((band_h + tile, w), jnp.float32)
        unc_out = var_accum = var_weight = None
        if self.uncertainty:
            unc_out = np.zeros((h, w), dtype=prob_dtype)
            var_accum = jnp.zeros((band_h + tile, w), jnp.float32)
            var_weight = jnp.zeros((band_h + tile, w), jnp.float32)
        try:
            for b in range(n_bands):
                y0 = b * band_h
                if use_band and per_band[b]:
                    band_dev = futures.pop(b).result()
                    pos = nonempty.index(b)
                    if pos + 1 < len(nonempty):
                        nxt = nonempty[pos + 1]
                        futures[nxt] = fetcher.submit(_fetch, nxt)
                    batches = self._band_prob_batches(
                        source, coords_all, per_band[b], y0, band_dev)
                elif per_band[b]:
                    batches = (
                        (self._infer(self.state, jnp.asarray(images)),
                         coords - np.asarray([y0, 0], np.int32))
                        for images, coords
                        in self._band_batches(source, per_band[b])
                    )
                else:
                    batches = ()
                for out, local in batches:
                    probs, vars_ = (out if self.uncertainty
                                    else (out, None))
                    local_d = jnp.asarray(local)
                    accum, weight = stitch_tiles_into(
                        accum, weight, probs.astype(jnp.float32),
                        local_d, blend=self.blend,
                    )
                    if vars_ is not None:
                        # own weight canvas — stitch_tiles_into donates
                        # its canvas args (see SlidingWindowInference.run)
                        var_accum, var_weight = stitch_tiles_into(
                            var_accum, var_weight,
                            vars_.astype(jnp.float32), local_d,
                            blend=self.blend,
                        )
                rows = min(band_h, h - y0)
                prob, mask = finalize_canvas(accum[:band_h], weight[:band_h])
                prob_out[y0:y0 + rows] = np.asarray(
                    jax.device_get(prob[:rows])).astype(prob_dtype)
                mask_out[y0:y0 + rows] = np.asarray(
                    jax.device_get(mask[:rows]))
                if self.uncertainty:
                    vw = jnp.maximum(var_weight[:band_h], 1e-12)
                    band_unc = jnp.where(var_weight[:band_h] > 0,
                                         var_accum[:band_h] / vw, 0.0)
                    unc_out[y0:y0 + rows] = np.asarray(
                        jax.device_get(band_unc[:rows])).astype(prob_dtype)
                if b + 1 < n_bands:
                    accum = roll(accum)
                    weight = roll(weight)
                    if self.uncertainty:
                        var_accum = roll(var_accum)
                        var_weight = roll(var_weight)
        finally:
            if fetcher is not None:
                fetcher.shutdown(wait=False)
        oh, ow = getattr(source, "orig_hw", (h, w))
        if not self.uncertainty:
            return prob_out[:oh, :ow], mask_out[:oh, :ow]
        return (prob_out[:oh, :ow], mask_out[:oh, :ow],
                unc_out[:oh, :ow])


def overlay_figure(
    slide_thumb: np.ndarray,  # h,w,3 uint8 low-res rendering
    mask: np.ndarray,  # H,W binary (or argmax class labels) at grid res
    out_path: str,
    alpha: float = 0.4,
    num_classes: int = 1,
) -> str:
    """Reference README's overlay visualization: binary prediction pasted
    over a low-resolution slide rendering (``README.md:26-35``).  With
    ``num_classes > 1`` the mask is an argmax class map and each
    non-background class gets its own highlight color."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    th, tw = slide_thumb.shape[:2]
    # nearest-resize the mask to the thumbnail grid on host (tiny)
    ys = (np.arange(th) * (mask.shape[0] / th)).astype(np.int64).clip(0, mask.shape[0] - 1)
    xs = (np.arange(tw) * (mask.shape[1] / tw)).astype(np.int64).clip(0, mask.shape[1] - 1)
    small = mask[np.ix_(ys, xs)]

    fig, ax = plt.subplots(figsize=(10, 10 * th / max(tw, 1)))
    ax.imshow(slide_thumb)
    overlay = np.zeros((th, tw, 4), dtype=np.float32)
    if num_classes > 1:
        # distinct hue per class (class 0 = background stays transparent)
        palette = plt.get_cmap("tab10")
        for k in range(1, num_classes):
            sel = small == k
            overlay[sel, :3] = palette((k - 1) % 10)[:3]
            overlay[sel, 3] = alpha
    else:
        overlay[..., 0] = 1.0  # red tumor highlight
        overlay[..., 3] = small * alpha
    ax.imshow(overlay)
    ax.set_xticks([]), ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path, bbox_inches="tight", dpi=150)
    plt.close(fig)
    return out_path

"""Multi-chip sharded sliding-window WSI inference.

The reference handles gigapixel scale purely by host-side tiling (SURVEY.md
§2.2: its "long-context" analog is spatial, and it is single-GPU batch-1).
This module is the TPU-native scale-out: the slide canvas is sharded into
horizontal bands across the ``data`` mesh axis, every chip predicts and
stitches *its own band's tiles* locally, and tile rows that spill past a
band boundary travel to the next chip over ICI via a single
``lax.ppermute`` halo exchange per slide (halo rows only ever accumulate,
so the exchange defers to finalization) — no host round-trips, no
all-gather of tile probabilities.

Layout:

* band b ∈ [0, D) owns canvas rows ``[b·band_h, (b+1)·band_h)``;
* a tile is assigned to the band containing its top edge, so its local
  row offset is in ``[0, band_h)`` and it spills at most ``tile`` rows into
  the next band (requires ``band_h ≥ tile``);
* per chip the accumulation buffer is ``band_h + tile`` rows: the top
  ``band_h`` are the owned band, the last ``tile`` rows are the outgoing
  halo, shifted down one chip by a single finalize-time ``ppermute`` and
  added to the next band's top rows.

The per-chunk program (model forward + local scatter) and the finalize
(halo exchange + crop) each run inside one ``shard_map``-ped jit.

When the source supports region reads (``read_region(y, x, h, w)``), each
chip's band pixels are uploaded **once** as a device-sharded uint8 array and
the overlapping windows are sliced out on device — at stride ``tile/2`` this
cuts H2D/PCIe volume ~4x versus uploading every window (see
``BandedSlidingWindow`` band-input mode for the single-chip analog).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pdac_pathological_image_segmentation_tpu.ops.stitch import blend_window
from pdac_pathological_image_segmentation_tpu.parallel.mesh import DATA_AXIS


def _band_accumulate(accum, weight, probs, coords_local, valid, win,
                     var_accum=None, vars_=None):
    """Scan-accumulate tiles into the (band_h + tile)-row local buffer.

    With ``var_accum``/``vars_`` a TTA-variance canvas accumulates with
    the SAME blend weights (one shared weight canvas — everything lives
    inside one jit, so no donation aliasing)."""
    tile = probs.shape[-1]
    with_var = var_accum is not None

    def body(carry, inp):
        if with_var:
            acc, wgt, vac = carry
            p, pv, yx, v = inp
        else:
            acc, wgt = carry
            p, yx, v = inp
        y, x = yx[0], yx[1]
        w_eff = win * v.astype(jnp.float32)
        patch = jax.lax.dynamic_slice(acc, (y, x), (tile, tile))
        acc = jax.lax.dynamic_update_slice(acc, patch + p * w_eff, (y, x))
        wpatch = jax.lax.dynamic_slice(wgt, (y, x), (tile, tile))
        wgt = jax.lax.dynamic_update_slice(wgt, wpatch + w_eff, (y, x))
        if with_var:
            vpatch = jax.lax.dynamic_slice(vac, (y, x), (tile, tile))
            vac = jax.lax.dynamic_update_slice(
                vac, vpatch + pv * w_eff, (y, x))
            return (acc, wgt, vac), None
        return (acc, wgt), None

    if with_var:
        (accum, weight, var_accum), _ = jax.lax.scan(
            body, (accum, weight, var_accum),
            (probs, vars_, coords_local, valid)
        )
        return accum, weight, var_accum
    (accum, weight), _ = jax.lax.scan(
        body, (accum, weight), (probs, coords_local, valid)
    )
    return accum, weight


class ShardedSlidingWindow:
    """Data-mesh-sharded sliding-window inference + on-device banded
    stitching with ICI halo exchange."""

    def __init__(self, model, state, mesh: Mesh, tile: int = 512,
                 batch_per_device: int = 8, blend: str = "hann",
                 tta: bool = False, stain: str = "none",
                 infer_step=None, band_input: bool | None = None,
                 uncertainty: bool = False,
                 roll_h: int | None = None) -> None:
        """``infer_step``: optional raw ``step(state, images_u8) → probs``
        override replacing the default fused tile→mask step — e.g. the
        int8 quantized path (``infer.quantized.make_quantized_infer_fn``);
        it is traced inside the per-device ``shard_map`` program, so the
        override must be traceable (plain function or jitted — jit inlines
        under trace).

        ``band_input``: upload each chip's band pixels ONCE (a
        device-sharded uint8 array assembled host-shard-by-host-shard, so
        host memory stays O(band)) and slice the overlapping windows out on
        device inside the ``shard_map`` program — ~4x less H2D/PCIe at
        stride=tile/2 than per-window upload.  ``None`` = auto-enable when
        the source has ``read_region(y, x, h, w)``; ``False`` = always
        upload windows individually.

        ``roll_h``: rolled-band mode for slides whose per-chip band
        ``ceil(h/D) × W`` would not fit HBM.  Each chip still owns
        ``ceil(h/D)`` contiguous rows, but streams them through an
        O(``roll_h``)-row rolling canvas exactly like the single-chip
        :class:`~..wsi.BandedSlidingWindow` — finalized rows flush to the
        host probability map after every roll, and the single finalize-time
        ``lax.ppermute`` inter-chip halo exchange is preserved (each chip's
        region-top ``tile`` rows are held back on device until the
        neighbor's spill arrives).  Per-chip HBM becomes
        ``(2 or 3) × (roll_h + tile) × W × 4`` bytes of canvases
        + ``(roll_h + tile) × W × 3`` of band pixels (band-input mode)
        + the held ``tile``-row buffers, independent of slide height:
        e.g. a 150k×100k slide on 8 chips needs ~19k rows/chip
        (~15 GB of f32 canvases — over v5e's 16 GB) single-canvas, but
        only ~3.7 GB with ``roll_h=4096``.  ``None`` = single canvas per
        chip (default)."""
        from pdac_pathological_image_segmentation_tpu.infer.wsi import (
            _make_tta_infer,
        )
        from pdac_pathological_image_segmentation_tpu.train.steps import (
            make_infer_step,
        )

        if model is not None and getattr(model, "num_classes", 1) > 1:
            raise ValueError(
                "ShardedSlidingWindow stitches 2-D per-chip band canvases; "
                "multi-class slides need SlidingWindowInference (per-class "
                "canvases)")
        self.mesh = mesh
        self.n_devices = mesh.devices.size
        self.tile = tile
        self.batch_per_device = batch_per_device
        self.blend = blend
        self.band_input = band_input
        self.uncertainty = uncertainty
        self.roll_h = roll_h
        if roll_h is not None and roll_h < tile:
            raise ValueError(f"roll_h ({roll_h}) must be >= tile ({tile}) "
                             "so a tile spills into at most one roll")
        self.state = state
        # raw (unjitted) tile→probs fn; it is traced inside the shard_map
        raw_infer = infer_step or make_infer_step(model, tile, stain=stain)
        self._infer = _make_tta_infer(raw_infer, tta,
                                      with_variance=uncertainty)

    # ------------------------------------------------------------------

    def _plan(self, coords: np.ndarray, canvas_hw: Tuple[int, int]):
        """Assign tiles to bands by top edge; pad every band to the same
        tile count (invalid slots masked out on device)."""
        h, w = canvas_hw
        d = self.n_devices
        # band height must cover the tile so a tile spills into at most one
        # neighbor; short slides just leave the trailing bands empty (their
        # canvas rows are cropped away at the end)
        band_h = max(-(-h // d), self.tile)
        owners = np.minimum(coords[:, 0] // band_h, d - 1)
        per_band: List[List[int]] = [[] for _ in range(d)]
        for i, o in enumerate(owners):
            per_band[int(o)].append(i)
        max_n = max(len(b) for b in per_band)
        # round up to a multiple of batch_per_device for static chunking
        bpd = self.batch_per_device
        max_n = -(-max_n // bpd) * bpd
        idx = np.zeros((d, max_n), dtype=np.int64)
        valid = np.zeros((d, max_n), dtype=bool)
        for b, lst in enumerate(per_band):
            idx[b, :len(lst)] = lst
            valid[b, :len(lst)] = True
        return band_h, idx, valid

    def _build_step(self, band_h: int, canvas_w: int):
        tile, bpd = self.tile, self.batch_per_device
        win = blend_window(tile, self.blend)
        infer = self._infer
        axis = DATA_AXIS
        d = self.n_devices

        unc = self.uncertainty

        def per_device(state, accum, weight, var_accum, images,
                       coords_local, valid):
            # accum/weight: (1, band_h + tile, W); images: (1, bpd, t, t, 3)
            # Purely local: tiles accumulate into the band + its trailing
            # halo rows; the single ICI halo exchange happens once per
            # slide in the finalize step (halo contributions only ever add,
            # so deferring the ppermute is exact and uses D−1 ICI messages
            # per slide instead of per chunk).
            accum, weight = accum[0], weight[0]
            out = infer(state, images[0])  # (bpd, t, t) f32
            if unc:
                probs, vars_ = out
                accum, weight, va = _band_accumulate(
                    accum, weight, probs, coords_local[0], valid[0], win,
                    var_accum=var_accum[0], vars_=vars_,
                )
                return accum[None], weight[None], va[None]
            accum, weight = _band_accumulate(
                accum, weight, out, coords_local[0], valid[0], win
            )
            return accum[None], weight[None], var_accum

        sharded = jax.shard_map(
            per_device, mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
        )
        return jax.jit(sharded, donate_argnums=(1, 2, 3))

    def _build_step_band(self, band_h: int, canvas_w: int):
        """Band-input chunk program: windows are sliced from the chip's
        device-resident band (no per-window H2D) then inferred and
        accumulated exactly like :meth:`_build_step`."""
        tile, bpd = self.tile, self.batch_per_device
        win = blend_window(tile, self.blend)
        infer = self._infer
        axis = DATA_AXIS

        unc = self.uncertainty

        def per_device(state, accum, weight, var_accum, band,
                       coords_local, valid):
            # accum/weight: (1, band_h + tile, W); band: (1, band_h + tile,
            # W, 3) u8 — this chip's slide rows, uploaded once per run
            accum, weight = accum[0], weight[0]
            images = jax.vmap(
                lambda c: jax.lax.dynamic_slice(
                    band[0], (c[0], c[1], 0), (tile, tile, 3))
            )(coords_local[0])
            out = infer(state, images)  # (bpd, t, t) f32
            if unc:
                probs, vars_ = out
                accum, weight, va = _band_accumulate(
                    accum, weight, probs, coords_local[0], valid[0], win,
                    var_accum=var_accum[0], vars_=vars_,
                )
                return accum[None], weight[None], va[None]
            accum, weight = _band_accumulate(
                accum, weight, out, coords_local[0], valid[0], win
            )
            return accum[None], weight[None], var_accum

        sharded = jax.shard_map(
            per_device, mesh=self.mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
        )
        return jax.jit(sharded, donate_argnums=(1, 2, 3))

    def _shard_bands(self, source, band_h: int, canvas_w: int,
                     offsets=None):
        """Assemble the (D, band_h + tile, W, 3) uint8 band array directly
        from per-device shards: each host reads only the bands its local
        devices own (``source.read_region``) and uploads them one at a
        time — host memory stays O(band), and each slide pixel crosses
        H2D once (plus the ``tile``-row inter-band halo).

        ``offsets``: per-device starting row (default ``b * band_h`` —
        the single-canvas layout); rolled mode passes each chip's current
        roll offset ``b * H_own + k * roll_h``."""
        d, tile = self.n_devices, self.tile
        shard = NamedSharding(self.mesh, P(DATA_AXIS))
        bufs = []
        for b, dev in enumerate(self.mesh.devices.flat):
            if dev.process_index != jax.process_index():
                continue
            y0 = (b * band_h) if offsets is None else int(offsets[b])
            region = source.read_region(y0, 0, band_h + tile, canvas_w)
            bufs.append(jax.device_put(region[None], dev))
        return jax.make_array_from_single_device_arrays(
            (d, band_h + tile, canvas_w, 3), shard, bufs)

    def _build_finalize(self, band_h: int):
        tile = self.tile
        axis = DATA_AXIS
        d = self.n_devices

        unc = self.uncertainty

        def per_device(accum, weight, var_accum):
            accum, weight = accum[0], weight[0]
            # halo: the trailing `tile` rows belong to the NEXT band
            perm = [(i, i + 1) for i in range(d - 1)]
            recv_a = jax.lax.ppermute(accum[band_h:], axis, perm)
            recv_w = jax.lax.ppermute(weight[band_h:], axis, perm)
            accum = accum.at[:tile].add(recv_a)
            weight = weight.at[:tile].add(recv_w)
            if unc:
                va = var_accum[0]
                recv_v = jax.lax.ppermute(va[band_h:], axis, perm)
                va = va.at[:tile].add(recv_v)
                return (accum[None, :band_h], weight[None, :band_h],
                        va[None, :band_h])
            return (accum[None, :band_h], weight[None, :band_h],
                    var_accum[:, :band_h])

        sharded = jax.shard_map(
            per_device, mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis)),
        )
        return jax.jit(sharded, donate_argnums=(0, 1, 2))

    # ----------------------------------------------------- rolled-band mode

    def _build_flush_roll(self, roll_h: int, canvas_w: int):
        """Normalize + emit the finished ``roll_h`` rows and roll the
        canvases (trailing ``tile`` spill rows carry into the next roll's
        top — the sharded analog of ``BandedSlidingWindow``'s roll)."""
        tile, axis = self.tile, DATA_AXIS
        unc = self.uncertainty

        def per_device(accum, weight, var_accum):
            a, wgt = accum[0], weight[0]
            prob = jnp.where(wgt[:roll_h] > 0,
                             a[:roll_h] / jnp.maximum(wgt[:roll_h], 1e-12),
                             0.0)
            ra = jnp.zeros_like(a).at[:tile].set(a[roll_h:])
            rw = jnp.zeros_like(wgt).at[:tile].set(wgt[roll_h:])
            if unc:
                va = var_accum[0]
                u = jnp.where(wgt[:roll_h] > 0,
                              va[:roll_h] / jnp.maximum(wgt[:roll_h], 1e-12),
                              0.0)
                rv = jnp.zeros_like(va).at[:tile].set(va[roll_h:])
                return prob[None], u[None], ra[None], rw[None], rv[None]
            return (prob[None], jnp.zeros((1, 1, 1), jnp.float32),
                    ra[None], rw[None], var_accum)

        sharded = jax.shard_map(
            per_device, mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=(P(axis),) * 5,
        )
        return jax.jit(sharded, donate_argnums=(0, 1, 2))

    def _build_final_rolled(self, roll_h: int):
        """Last roll: ship each chip's outgoing ``tile`` spill rows to the
        next chip over ICI (the single finalize-time ``lax.ppermute``), add
        them onto the held-back region-top rows, and normalize both."""
        tile, axis, d = self.tile, DATA_AXIS, self.n_devices
        unc = self.uncertainty

        def norm(a, wgt):
            return jnp.where(wgt > 0, a / jnp.maximum(wgt, 1e-12), 0.0)

        def per_device(accum, weight, var_accum, held_a, held_w, held_v):
            a, wgt = accum[0], weight[0]
            perm = [(i, i + 1) for i in range(d - 1)]
            recv_a = jax.lax.ppermute(a[roll_h:], axis, perm)
            recv_w = jax.lax.ppermute(wgt[roll_h:], axis, perm)
            ha = held_a[0] + recv_a
            hw = held_w[0] + recv_w
            prob_last = norm(a[:roll_h], wgt[:roll_h])
            prob_held = norm(ha, hw)
            if unc:
                va = var_accum[0]
                recv_v = jax.lax.ppermute(va[roll_h:], axis, perm)
                hv = held_v[0] + recv_v
                return (prob_last[None], prob_held[None],
                        norm(va[:roll_h], wgt[:roll_h])[None],
                        norm(hv, hw)[None])
            dummy = jnp.zeros((1, 1, 1), jnp.float32)
            return prob_last[None], prob_held[None], dummy, dummy

        sharded = jax.shard_map(
            per_device, mesh=self.mesh,
            in_specs=(P(axis),) * 6,
            out_specs=(P(axis),) * 4,
        )
        return jax.jit(sharded, donate_argnums=(0, 1, 2, 3, 4, 5))

    def _run_rolled(self, source, coords, h: int, w: int,
                    use_band: bool, prob_dtype=np.float16
                    ) -> Tuple[np.ndarray, ...]:
        """Rolled-band execution: O(roll_h) device canvases per chip,
        probability rows streamed to host after every roll."""
        d, tile, bpd = self.n_devices, self.tile, self.batch_per_device
        roll_h = max(self.roll_h, tile)
        # each chip owns a whole number of rolls so the outgoing inter-chip
        # spill is exactly the last roll's trailing `tile` canvas rows
        h_own = -(-h // (d * roll_h)) * roll_h
        n_rolls = h_own // roll_h
        owners = np.minimum(coords[:, 0] // h_own, d - 1)
        roll_of = (coords[:, 0] - owners * h_own) // roll_h
        per: list[list[list[int]]] = [
            [[] for _ in range(n_rolls)] for _ in range(d)]
        for i, (b, k) in enumerate(zip(owners, roll_of)):
            per[int(b)][int(k)].append(i)

        band_shard = NamedSharding(self.mesh, P(DATA_AXIS))
        step = (self._build_step_band(roll_h, w) if use_band
                else self._build_step(roll_h, w))
        flush_roll = self._build_flush_roll(roll_h, w)
        final = self._build_final_rolled(roll_h)
        hold = jax.jit(lambda a: a[:, :tile].copy())

        rows = roll_h + tile
        accum = jax.device_put(jnp.zeros((d, rows, w), jnp.float32),
                               band_shard)
        weight = jax.device_put(jnp.zeros((d, rows, w), jnp.float32),
                                band_shard)
        var_shape = (d, rows, w) if self.uncertainty else (d, 1, 1)
        var_accum = jax.device_put(jnp.zeros(var_shape, jnp.float32),
                                   band_shard)

        prob_out = np.zeros((h, w), prob_dtype)
        mask_out = np.zeros((h, w), np.uint8)
        unc_out = (np.zeros((h, w), prob_dtype) if self.uncertainty
                   else None)

        def write_rows(dst, rows_h, b, y_local, skip_top=0):
            """Host-side: place device rows at chip b's global offset,
            cropping at the slide bottom."""
            y0 = b * h_own + y_local + skip_top
            if y0 >= h:
                return
            n_keep = min(rows_h.shape[0] - skip_top, h - y0)
            if n_keep > 0:
                dst[y0:y0 + n_keep] = rows_h[skip_top:skip_top + n_keep]

        def emit(prob_f32, b, y_local, skip_top=0):
            """Write probability (cast to ``prob_dtype``) AND the mask —
            thresholded on the f32 rows BEFORE the storage cast, so
            knife-edge pixels match the single-canvas runner bitwise."""
            write_rows(prob_out, prob_f32.astype(prob_dtype), b, y_local,
                       skip_top)
            write_rows(mask_out, (prob_f32 >= 0.5).astype(np.uint8), b,
                       y_local, skip_top)

        held = None
        for k in range(n_rolls):
            max_n = max(len(per[b][k]) for b in range(d))
            max_n = -(-max(max_n, 1) // bpd) * bpd if max_n else 0
            if use_band and max_n:
                offs = np.clip([b * h_own + k * roll_h for b in range(d)],
                               0, max(0, h - 1))
                band_px = self._shard_bands(source, roll_h, w, offsets=offs)
            for start in range(0, max_n, bpd):
                images = (None if use_band
                          else np.zeros((d, bpd, tile, tile, 3), np.uint8))
                cl = np.zeros((d, bpd, 2), np.int32)
                vl = np.zeros((d, bpd), bool)
                for b in range(d):
                    lst = per[b][k]
                    for j in range(bpd):
                        idx = start + j
                        if idx >= len(lst):
                            continue
                        i = lst[idx]
                        if use_band:
                            y, x = coords[i]
                        else:
                            img, (y, x) = source.get(i)
                            images[b, j] = img
                        cl[b, j] = (y - b * h_own - k * roll_h, x)
                        vl[b, j] = True
                pixels = (band_px if use_band
                          else jax.device_put(images, band_shard))
                accum, weight, var_accum = step(
                    self.state, accum, weight, var_accum, pixels,
                    jax.device_put(jnp.asarray(cl), band_shard),
                    jax.device_put(jnp.asarray(vl), band_shard),
                )
            if k == 0:
                # region-top `tile` rows stay on device until the halo
                # from the previous chip arrives at finalize
                held = (hold(accum), hold(weight),
                        hold(var_accum) if self.uncertainty else
                        jax.device_put(jnp.zeros((d, 1, 1), jnp.float32),
                                       band_shard))
            if k < n_rolls - 1:
                prob_r, unc_r, accum, weight, var_accum = flush_roll(
                    accum, weight, var_accum)
                prob_h = np.asarray(jax.device_get(prob_r))
                skip = tile if k == 0 else 0
                unc_h = (np.asarray(jax.device_get(unc_r))
                         if self.uncertainty else None)
                for b in range(d):
                    emit(prob_h[b], b, k * roll_h, skip_top=skip)
                    if self.uncertainty:
                        write_rows(unc_out, unc_h[b].astype(prob_dtype),
                                   b, k * roll_h, skip_top=skip)

        prob_last, prob_held, unc_last, unc_held = final(
            accum, weight, var_accum, *held)
        last_h = np.asarray(jax.device_get(prob_last))
        held_h = np.asarray(jax.device_get(prob_held))
        skip = tile if n_rolls == 1 else 0
        for b in range(d):
            emit(last_h[b], b, (n_rolls - 1) * roll_h, skip_top=skip)
            emit(held_h[b], b, 0)
        if self.uncertainty:
            ul = np.asarray(jax.device_get(unc_last))
            uh = np.asarray(jax.device_get(unc_held))
            for b in range(d):
                write_rows(unc_out, ul[b].astype(prob_dtype), b,
                           (n_rolls - 1) * roll_h, skip_top=skip)
                write_rows(unc_out, uh[b].astype(prob_dtype), b, 0)

        oh, ow = getattr(source, "orig_hw", (h, w))
        prob, mask = prob_out[:oh, :ow], mask_out[:oh, :ow]
        if not self.uncertainty:
            return prob, mask
        return prob, mask, unc_out[:oh, :ow]

    # ------------------------------------------------------------------

    def run(self, source) -> Tuple[np.ndarray, ...]:
        """Predict + stitch a tile source (same protocol as
        ``infer.wsi``: ``len``, ``get(i) → (tile_u8, (y, x))``,
        ``canvas_hw``).  Returns host (prob_map, binary_mask) — plus a
        TTA-disagreement map when constructed with
        ``uncertainty=True``."""
        h, w = source.canvas_hw
        n = len(source)
        # tile sources expose .coords (GridTiler, TiffSlideSource) — use it
        # so band-input mode never decodes window pixels just to plan;
        # falling back to get(i) decodes every window once on host
        coords = getattr(source, "coords", None)
        if coords is None:
            coords = [source.get(i)[1] for i in range(n)]
        coords = np.asarray(coords, np.int64)
        use_band_early = (self.band_input if self.band_input is not None
                          else hasattr(source, "read_region"))
        if self.roll_h is not None:
            return self._run_rolled(source, coords, h, w,
                                    use_band=bool(use_band_early))
        band_h, idx, valid = self._plan(coords, (h, w))
        d, max_n = idx.shape
        tile, bpd = self.tile, self.batch_per_device

        use_band = (self.band_input if self.band_input is not None
                    else hasattr(source, "read_region"))
        if use_band and not hasattr(source, "read_region"):
            raise ValueError(
                "band_input=True requires a source with read_region(y, x, "
                "h, w); pass band_input=False for window-upload mode")
        band_shard = NamedSharding(self.mesh, P(DATA_AXIS))
        if use_band:
            step = self._build_step_band(band_h, w)
            band_px = self._shard_bands(source, band_h, w)
        else:
            step = self._build_step(band_h, w)
        accum = jax.device_put(
            jnp.zeros((d, band_h + tile, w), jnp.float32), band_shard
        )
        weight = jax.device_put(
            jnp.zeros((d, band_h + tile, w), jnp.float32), band_shard
        )
        # variance canvas (same blend weights as accum); a (d, 1, 1) dummy
        # threads through the fixed program signature when uncertainty is
        # off — no O(band) memory spent
        var_shape = (d, band_h + tile, w) if self.uncertainty else (d, 1, 1)
        var_accum = jax.device_put(
            jnp.zeros(var_shape, jnp.float32), band_shard
        )

        for start in range(0, max_n, bpd):
            images = (None if use_band
                      else np.zeros((d, bpd, tile, tile, 3), np.uint8))
            cl = np.zeros((d, bpd, 2), np.int32)
            vl = np.zeros((d, bpd), bool)
            for b in range(d):
                for j in range(bpd):
                    k = start + j
                    if k >= max_n or not valid[b, k]:
                        continue
                    i = int(idx[b, k])
                    if use_band:
                        y, x = coords[i]
                    else:
                        img, (y, x) = source.get(i)
                        images[b, j] = img
                    cl[b, j] = (y - b * band_h, x)
                    vl[b, j] = True
            pixels = (band_px if use_band
                      else jax.device_put(images, band_shard))
            accum, weight, var_accum = step(
                self.state, accum, weight, var_accum, pixels,
                jax.device_put(jnp.asarray(cl), band_shard),
                jax.device_put(jnp.asarray(vl), band_shard),
            )

        finalize = self._build_finalize(band_h)
        accum, weight, var_accum = finalize(accum, weight, var_accum)
        accum_h = np.asarray(jax.device_get(accum))
        weight_h = np.asarray(jax.device_get(weight))
        accum_full = accum_h.reshape(d * band_h, w)[:h]
        weight_full = weight_h.reshape(d * band_h, w)[:h]
        prob = np.where(weight_full > 0,
                        accum_full / np.maximum(weight_full, 1e-12), 0.0)
        # crop back any tiler padding (slides smaller than one tile)
        oh, ow = getattr(source, "orig_hw", prob.shape[:2])
        prob = prob[:oh, :ow]
        mask = (prob >= 0.5).astype(np.uint8)
        if not self.uncertainty:
            return prob.astype(np.float32), mask
        var_h = np.asarray(jax.device_get(var_accum)).reshape(
            d * band_h, w)[:h]
        unc = np.where(weight_full > 0,
                       var_h / np.maximum(weight_full, 1e-12), 0.0)
        return (prob.astype(np.float32), mask,
                unc[:oh, :ow].astype(np.float32))

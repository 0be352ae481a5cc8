"""Batched multi-slide inference sweep (BASELINE.json config #5).

Runs sliding-window segmentation over a cohort of slides on one device mesh:
tiles from the *current* slide are batch-sharded across every chip (keeping
the MXU full regardless of slide size), stitching stays on device, and
slides stream through one after another with double-buffered host tiling.
Multi-host pods process disjoint slide subsets (round-robin by process
index) — embarrassingly parallel across slides, mesh-parallel within one.
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from pdac_pathological_image_segmentation_tpu.infer.wsi import (
    GridTiler,
    SlidingWindowInference,
)
from pdac_pathological_image_segmentation_tpu.infer.wsi_sharded import (
    ShardedSlidingWindow,
)


def run_sweep(
    model,
    state,
    slides: Sequence,  # items: np.ndarray slides OR tile sources
    mesh=None,
    tile: int = 512,
    stride: Optional[int] = None,
    batch_size: int = 64,
    blend: str = "hann",
    tta: bool = False,
    sharded: bool = False,
    out_dir: Optional[str] = None,
    infer_step=None,
    geojson: bool = False,
    geojson_min_area: float = 0.0,
    geojson_simplify: float = 0.0,
) -> List[Dict]:
    """Segment every slide; returns per-slide result dicts
    (mask/prob optionally saved to ``out_dir`` instead of kept in memory).

    ``geojson=True`` additionally polygonizes each slide's mask into
    QuPath-importable annotations (``data/geojson.py``): written as
    ``slide_{i:04d}_annotations.geojson`` under ``out_dir``, or returned
    under ``rec["geojson"]``.

    ``sharded=True`` uses the banded-canvas halo-exchange path
    (``wsi_sharded``) — worthwhile for slides whose canvas does not fit one
    chip's HBM; the default batch-sharded path is faster for ordinary sizes.

    ``infer_step``: optional ``step(state, images_u8) → probs`` override —
    the int8 quantized path, or a serving artifact
    (``infer/export.py``: ``lambda s, im: artifact(im)``, with
    ``model=None, state=None``).
    """
    process_index = jax.process_index()
    process_count = jax.process_count()

    if sharded:
        if mesh is None:
            from pdac_pathological_image_segmentation_tpu.parallel.mesh import (
                create_mesh,
            )

            mesh = create_mesh()
        runner = ShardedSlidingWindow(
            model, state, mesh, tile=tile,
            batch_per_device=max(1, batch_size // mesh.devices.size),
            blend=blend, tta=tta, infer_step=infer_step,
        )
    else:
        runner = SlidingWindowInference(
            model, state, tile=tile, batch_size=batch_size, blend=blend,
            tta=tta, infer_step=infer_step,
        )

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    results: List[Dict] = []
    for i, slide in enumerate(slides):
        if i % process_count != process_index:
            continue  # other hosts own this slide
        source = (
            GridTiler(slide, tile=tile, stride=stride or tile)
            if isinstance(slide, np.ndarray) else slide
        )
        t0 = time.perf_counter()
        prob, mask = runner.run(source)
        dt = time.perf_counter() - t0
        rec: Dict = {
            "slide": i,
            "n_tiles": len(source),
            "canvas_hw": tuple(source.canvas_hw),
            "tumor_fraction": float(mask.mean()),
            "seconds": dt,
        }
        if out_dir:
            np.save(os.path.join(out_dir, f"slide_{i:04d}_prob.npy"), prob)
            np.save(os.path.join(out_dir, f"slide_{i:04d}_mask.npy"), mask)
        else:
            rec["prob"] = prob
            rec["mask"] = mask
        if geojson:
            from pdac_pathological_image_segmentation_tpu.data.geojson import (
                mask_to_polygons,
                polygons_to_geojson,
                write_geojson,
            )

            fc = polygons_to_geojson(
                mask_to_polygons(mask, min_area=geojson_min_area,
                                 simplify_tol=geojson_simplify),
                measurements={"tumor_fraction": rec["tumor_fraction"]},
            )
            rec["n_regions"] = len(fc["features"])
            if out_dir:
                write_geojson(
                    os.path.join(out_dir,
                                 f"slide_{i:04d}_annotations.geojson"), fc)
            else:
                rec["geojson"] = fc
        results.append(rec)
    return results

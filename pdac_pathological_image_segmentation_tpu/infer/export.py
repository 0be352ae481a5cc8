"""Portable serving artifacts via ``jax.export`` (StableHLO).

The reference deploys by unpickling ``best.pth`` into the Python model
class (``/root/reference/test.py:94-135``) — serving a model requires
shipping the full training codebase and its torch/smp dependency stack.
Here the jitted tile→mask step — weights baked in as constants, the
normalize fold and sigmoid included — serializes to ONE self-contained
StableHLO artifact:

* loads and runs with **no model code** (``load_serving_artifact`` needs
  only jax), so a serving fleet never imports flax/models/checkpoint IO;
* **any batch size**: the batch dimension is exported symbolically, one
  artifact serves bs=1 health checks and bs=512 production batches with
  per-shape native compilation at load time;
* **multi-platform**: lowered for both ``tpu`` and ``cpu`` by default, so
  the same file serves on a v5e pod and in a CPU CI smoke;
* versioned: ``jax.export`` embeds calling-convention + custom-call
  compatibility guarantees (jax.dev export docs), unlike pickle.

The int8 path (``infer/quantized.py``) exports the same way — the baked
constants are the int8 weights and calibrated scales, so the artifact is
~4× smaller and runs the MXU int8 serving program.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pdac_pathological_image_segmentation_tpu.config import Config

# artifact layout: MAGIC, u32 little-endian JSON length, JSON metadata
# (tile/model/backbone/stain/int8/batch/platforms), jax.export bytes
MAGIC = b"PDACSRV1"


def _build_infer_fn(cfg: Config, state, tile: int, int8: bool,
                    calib_batches=None):
    """``fn(images_u8[b, tile, tile, 3]) → probs`` with weights closed over
    (they become constants of the exported module)."""
    if int8:
        from pdac_pathological_image_segmentation_tpu.infer.quantized import (
            make_quantized_infer_fn,
            quantize_from_config,
        )

        if not calib_batches:
            raise ValueError(
                "int8 export needs calibration batches (uint8 NHWC)")
        if tile != cfg.img_size:
            raise ValueError(
                f"int8 export serves at cfg.img_size={cfg.img_size} "
                f"(calibration runs there); got tile={tile}")
        bundle, forward = quantize_from_config(
            cfg, state.params, state.batch_stats, calib_batches)
        qfn = make_quantized_infer_fn(
            state.params, state.batch_stats, bundle, tile, forward=forward)
        return lambda images: qfn(None, images)

    from pdac_pathological_image_segmentation_tpu.models.registry import (
        build_model,
    )
    from pdac_pathological_image_segmentation_tpu.train.steps import (
        make_infer_step,
    )

    model = build_model(cfg)
    step = make_infer_step(model, tile, stain=cfg.stain)
    return lambda images: step(state, images)


def export_serving_artifact(
    cfg: Config,
    state,
    out_path: str,
    *,
    tile: Optional[int] = None,
    batch: Optional[int] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
    int8: bool = False,
    calib_batches=None,
) -> int:
    """Serialize the serving step for ``cfg`` + ``state`` to ``out_path``.

    ``batch=None`` exports a symbolic batch dimension (any batch size at
    load time); an int pins it.  ``tile`` defaults to ``cfg.img_size``.
    Returns the artifact size in bytes.
    """
    tile = tile or cfg.img_size
    fn = _build_infer_fn(cfg, state, tile, int8, calib_batches)
    if batch is None:
        (b,) = jax.export.symbolic_shape("b")
    else:
        b = int(batch)
    spec = jax.ShapeDtypeStruct((b, tile, tile, 3), jnp.uint8)
    exported = jax.export.export(
        jax.jit(fn), platforms=list(platforms))(spec)
    blob = exported.serialize()
    meta = json.dumps({
        "tile": int(tile),
        "model": cfg.model,
        "backbone": cfg.backbone,
        "stain": cfg.stain,
        "int8": bool(int8),
        "batch": None if batch is None else int(batch),
        "platforms": list(platforms),
    }).encode()
    payload = MAGIC + len(meta).to_bytes(4, "little") + meta + blob
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, out_path)  # readers never see a partial artifact
    return len(payload)


class ServingArtifact:
    """A deserialized artifact: ``artifact(images_u8) → probs``.

    Needs only jax — no model classes, no checkpoint IO, no config.  Each
    distinct input shape compiles natively once on first call (standard
    jit caching applies to ``Exported.call``).  ``meta`` carries the
    export-time provenance (model, backbone, stain, int8, platforms).
    """

    def __init__(self, exported, meta: dict):
        self._exported = exported
        self.meta = dict(meta)
        self.tile = int(meta["tile"])
        self.platforms = tuple(exported.platforms)
        self.in_shape = tuple(exported.in_avals[0].shape)

    def __call__(self, images) -> jax.Array:
        return self._exported.call(jnp.asarray(images, jnp.uint8))

    def aot(self, batch_size: int, *, options=None):
        """AOT-compile the artifact for one batch shape under the tuned
        serving compiler options.

        ``Exported.call`` recompiles with XLA *defaults*, leaving the
        scoped-vmem + bundle-aware-fusion win (~+4–8% on v5e, BASELINE.md
        round-3 sweep) on the table; this pins the same
        ``SERVING_COMPILER_OPTIONS`` the in-process path serves under.
        Returns ``fn(images_u8[batch_size, tile, tile, 3]) → probs``;
        falls back to the default-compiled path where the backend rejects
        the options (CPU).  int8 artifacts (``meta['int8']``) default to
        ``INT8_COMPILER_OPTIONS`` — the int8 program's scoped-vmem optimum
        sits higher than the bf16 one (80 vs 64 MiB, ~5% at bs=256;
        BASELINE.md int8 retune table).
        """
        from pdac_pathological_image_segmentation_tpu.utils.compile_options import (
            INT8_COMPILER_OPTIONS,
            compile_serving,
        )

        if options is None and self.meta.get("int8"):
            options = INT8_COMPILER_OPTIONS
        spec = jax.ShapeDtypeStruct(
            (int(batch_size), self.tile, self.tile, 3), jnp.uint8)
        return compile_serving(jax.jit(self._exported.call), spec,
                               options=options)


def load_serving_artifact(path: str) -> ServingArtifact:
    with open(path, "rb") as f:
        payload = f.read()
    if payload[: len(MAGIC)] != MAGIC:
        raise ValueError(
            f"{path} is not a serving artifact (bad magic; expected "
            f"{MAGIC!r})")
    off = len(MAGIC)
    meta_len = int.from_bytes(payload[off: off + 4], "little")
    off += 4
    if off + meta_len > len(payload):
        raise ValueError(f"{path} is truncated (header claims {meta_len} "
                         f"metadata bytes, {len(payload) - off} present)")
    try:
        meta = json.loads(payload[off: off + meta_len].decode())
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise ValueError(f"{path} has corrupt metadata: {e}") from e
    exported = jax.export.deserialize(bytearray(payload[off + meta_len:]))
    return ServingArtifact(exported, meta)


def calib_batches_from_dir(path: str, tile: int, n: int = 16,
                           batch: int = 8) -> list:
    """Calibration batches for int8 export from a patch directory (the
    reference filesystem contract, ``data/discovery.py``): the first ``n``
    images, resized host-side to ``tile`` if needed, stacked in batches."""
    from PIL import Image

    from pdac_pathological_image_segmentation_tpu.data.discovery import (
        discover_split,
    )

    img_paths, _ = discover_split(path)
    imgs = []
    for img_path in img_paths[:n]:
        im = Image.open(img_path).convert("RGB")
        if im.size != (tile, tile):
            im = im.resize((tile, tile), Image.BILINEAR)
        imgs.append(np.asarray(im, dtype=np.uint8))
    arr = np.stack(imgs)
    return [arr[i: i + batch] for i in range(0, len(arr), batch)]

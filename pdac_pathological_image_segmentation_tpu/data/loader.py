"""Host-side patch dataset + double-buffered device feeding.

Replaces the reference's ``CustomDataset`` + ``DataLoader`` +
``DistributedSampler`` stack (reference ``dataset.py:7-30``,
``train_worker.py:211-234``) with a TPU-shaped pipeline:

* PNG decode stays on the host (PIL), parallelized over a thread pool
  (``cfg.num_worker`` threads, the reference's worker-count contract);
* batches ship to the device as raw ``uint8`` NHWC (4× less PCIe/HBM traffic
  than float32) — resize/normalize/augment run *on device* inside the train
  step (see ``ops/augment.py``);
* a prefetch depth of 2 double-buffers host decode against device compute;
* multi-host sharding = per-host slice of the *globally shuffled* index
  sequence, reseeded per epoch exactly like
  ``DistributedSampler.set_epoch`` (reference ``train_worker.py:66``), with
  wrap-around padding so every host sees the same number of batches;
* under a ``Mesh``, each global batch is assembled into a single
  batch-sharded ``jax.Array`` via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, NamedTuple, Optional, Sequence, Tuple

import jax
import numpy as np
from PIL import Image

from pdac_pathological_image_segmentation_tpu.config import Config


class Batch(NamedTuple):
    image: np.ndarray | jax.Array  # B,H,W,3 uint8
    mask: np.ndarray | jax.Array  # B,H,W   uint8
    valid: np.ndarray | jax.Array  # B       bool (False = wrap-padding)


def _decode_pair(img_path: str, mask_path: str) -> Tuple[np.ndarray, np.ndarray]:
    image = np.asarray(Image.open(img_path).convert("RGB"), dtype=np.uint8)
    mask = np.asarray(Image.open(mask_path), dtype=np.uint8)
    if mask.ndim == 3:  # tolerate RGB-stored masks
        mask = mask[..., 0]
    return image, mask


class PatchDataset:
    """Path-list dataset (reference ``CustomDataset``, ``dataset.py:7-30``).

    Keeps the reference's construction-time pre-shuffle with the config seed
    (``dataset.py:14-18``) so ordering-derived behavior matches.
    """

    def __init__(
        self,
        img_paths: Sequence[str],
        mask_paths: Sequence[str],
        cfg: Config,
        pre_shuffle: bool = True,
    ) -> None:
        if len(img_paths) != len(mask_paths):
            raise ValueError("img/mask path count mismatch")
        self.img_paths = np.asarray(img_paths)
        self.mask_paths = np.asarray(mask_paths)
        self.cfg = cfg
        if pre_shuffle and len(img_paths):
            rng = np.random.RandomState(cfg.seed)
            idxs = rng.permutation(len(img_paths))
            self.img_paths = self.img_paths[idxs]
            self.mask_paths = self.mask_paths[idxs]

    def __len__(self) -> int:
        return len(self.img_paths)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        return _decode_pair(str(self.img_paths[i]), str(self.mask_paths[i]))


def _epoch_indices(
    n: int, epoch: int, seed: int, shuffle: bool,
    process_index: int, process_count: int,
) -> np.ndarray:
    """DistributedSampler-equivalent global order + per-host slice
    (shuffle=True reseeds with seed+epoch like ``sampler.set_epoch``)."""
    if shuffle:
        order = np.random.RandomState(seed + epoch).permutation(n)
    else:
        order = np.arange(n)
    # wrap-pad so every host gets ceil(n / world) samples (DistributedSampler
    # padding semantics)
    per_host = -(-n // process_count)
    total = per_host * process_count
    if total > n:
        order = np.concatenate([order, order[: total - n]])
    return order[process_index::process_count]


class PatchLoader:
    """Epoch-based loader producing device-ready global batches.

    ``batch_size`` is the GLOBAL batch (the reference divides it by world
    size per rank, ``train_worker.py:208``; we do the same per host).
    """

    def __init__(
        self,
        dataset: PatchDataset,
        batch_size: int,
        shuffle: bool,
        num_workers: int = 8,
        drop_last: bool = False,
        sharding: Optional[jax.sharding.NamedSharding] = None,
        seed: Optional[int] = None,
        prefetch: int = 2,
    ) -> None:
        self.dataset = dataset
        self.global_batch = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sharding = sharding
        self.seed = dataset.cfg.seed if seed is None else seed
        self.prefetch = prefetch
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        if batch_size % self.process_count:
            raise ValueError("global batch_size must divide by process count")
        self.host_batch = batch_size // self.process_count
        self.num_workers = max(1, num_workers // self.process_count)
        self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        # native fast path: enabled when the C++ decoder is present and the
        # first image/mask pair agrees on dimensions (per-image failures
        # still fall back inside decode_batch)
        self._native_hw = None
        if len(dataset):
            from pdac_pathological_image_segmentation_tpu.data import (
                native_loader,
            )

            if native_loader.native_available():
                hw_img = native_loader.png_info(str(dataset.img_paths[0]))
                hw_mask = native_loader.png_info(str(dataset.mask_paths[0]))
                if hw_img is not None and hw_img == hw_mask:
                    self._native_hw = hw_img

    def __len__(self) -> int:
        n = len(self.dataset)
        per_host = -(-n // self.process_count)
        if self.drop_last:
            return per_host // self.host_batch
        return -(-per_host // self.host_batch)

    def _decode_chunk(self, chunk: np.ndarray):
        """Decode one batch worth of image/mask pairs.

        Fast path: the native C++ thread-pool PNG decoder
        (``data/native_loader.py``) filling NHWC uint8 buffers directly;
        falls back to per-pair PIL via the dataset on any failure."""
        img_paths = [str(self.dataset.img_paths[i]) for i in chunk]
        mask_paths = [str(self.dataset.mask_paths[i]) for i in chunk]
        if self._native_hw is not None:
            try:
                from pdac_pathological_image_segmentation_tpu.data import (
                    native_loader,
                )

                h, w = self._native_hw
                images = native_loader.decode_batch(
                    img_paths, h, w, 3, threads=self.num_workers
                )
                masks = native_loader.decode_batch(
                    mask_paths, h, w, 1, threads=self.num_workers
                )[..., 0]
                return images, masks
            except Exception:
                self._native_hw = None  # permanent fallback for this loader
        pairs = list(self._pool.map(self.dataset.__getitem__, chunk))
        return np.stack([p[0] for p in pairs]), np.stack([p[1] for p in pairs])

    def _host_batches(self, epoch: int) -> Iterator[Batch]:
        idxs = _epoch_indices(
            len(self.dataset), epoch, self.seed, self.shuffle,
            self.process_index, self.process_count,
        )
        nb = len(self)
        for b in range(nb):
            chunk = idxs[b * self.host_batch : (b + 1) * self.host_batch]
            valid = np.ones(self.host_batch, dtype=bool)
            if len(chunk) < self.host_batch:  # final partial batch: wrap-pad
                pad = self.host_batch - len(chunk)
                valid[len(chunk):] = False
                chunk = np.concatenate([chunk, idxs[:pad]])
            images, masks = self._decode_chunk(chunk)
            yield Batch(images, masks, valid)

    def _to_device(self, batch: Batch) -> Batch:
        if self.sharding is None:
            return Batch(*(jax.device_put(x) for x in batch))
        if self.process_count > 1:
            make = lambda x: jax.make_array_from_process_local_data(
                self.sharding, x
            )
        else:
            make = lambda x: jax.device_put(x, self.sharding)
        return Batch(make(batch.image), make(batch.mask), make(batch.valid))

    def epoch(self, epoch: int) -> Iterator[Batch]:
        """Iterate one epoch with background decode + transfer (depth-2
        pipeline: while the device crunches batch i, the host decodes and
        uploads batch i+1)."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        error: list = []

        def producer():
            try:
                for hb in self._host_batches(epoch):
                    q.put(self._to_device(hb))
            except BaseException as e:  # surface decode errors to the consumer
                error.append(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()
        if error:
            raise error[0]

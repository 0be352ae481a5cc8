"""Device mesh + sharding: the TPU-native replacement for the reference's
NCCL DistributedDataParallel stack.

Mapping from the reference (SURVEY.md §2.2):

* ``mp.spawn`` one process per GPU + TCP rendezvous
  (``train_main.py:103-110``, ``train_worker.py:140-145``)
  → ``jax.distributed.initialize()`` (coordinator discovered from the TPU
  environment; multi-host for free) + a 1-D ``Mesh(('data',))``;
* ``DistributedDataParallel`` gradient bucketing all-reduce
  (``train_worker.py:204-206``) → grads of a batch-sharded loss lower to
  ``psum`` over ICI, inserted and overlapped with the backward pass by XLA —
  no ``find_unused_parameters`` problem because the unused fc/avgpool head
  is simply never instantiated (``models/resnet.py``);
* ``dist.barrier()`` (``train_worker.py:132``) →
  ``multihost_utils.sync_global_devices``;
* per-rank metric averages that are never all-reduced (reference quirk,
  SURVEY.md §5) → metrics are computed on the global batch under jit, so
  every host sees identical values by construction.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed() -> None:
    """Multi-host init (replaces ``dist.init_process_group``,
    ``train_worker.py:140-145``).  No-op when single-process or already
    initialized.  On TPU pods the coordinator address/ranks come from the
    runtime environment (``jax.distributed.initialize()`` auto-detects) —
    no ``tcp://`` config key needed; for manual launches (including the
    2-process CPU smoke, ``tests/test_multihost.py``) set
    ``JAX_COORDINATOR_ADDRESS`` plus ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``."""
    # NOTE: must not touch jax.process_count()/jax.devices() here — any
    # backend query initializes the runtime single-process and makes a
    # later distributed.initialize() a no-op.
    if jax.distributed.is_initialized():
        return
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # Tolerate only a lost already-initialized race: a genuine
        # rendezvous failure must not silently degrade an N-host launch
        # into N independent single-process runs racing on the same
        # checkpoint directory.
        if not jax.distributed.is_initialized():
            raise


def create_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the first ``num_devices``)
    devices.  The reference's world is its local GPU count
    (``train_main.py:104``); ours is the full multi-host device set."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding — the DistributedSampler equivalent."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding for params/opt state (pure data parallel;
    the models are resnet18-scale, SURVEY.md §2.2 — no need for FSDP)."""
    return NamedSharding(mesh, P())


def sync_global_devices(name: str = "barrier") -> None:
    """Cross-host barrier (replaces ``dist.barrier()``,
    ``train_worker.py:132``)."""
    if jax.process_count() > 1:
        multihost_utils.sync_global_devices(name)

"""One process of the 2-process ``jax.distributed`` CPU smoke
(``tests/test_multihost.py`` spawns two of these).  Exercises the one
distributed surface the single-process 8-device virtual mesh cannot reach
(SURVEY.md §2.2 communication-backend row):

* ``initialize_distributed`` manual rendezvous (env-var coordinator);
* cross-process collectives (global-batch psum, allgather, barrier);
* per-host ``_epoch_indices`` slicing at process_count=2 (disjoint,
  covering, wrap-padded — DistributedSampler semantics,
  reference ``train_worker.py:211-216``);
* a real 2-epoch ``Trainer`` run: sharded global batches via
  ``make_array_from_process_local_data``, identical global metrics on
  both ranks, chief-only logging, all-process Orbax checkpoint save;
* resume from the checkpoint at process_count=2
  (reference ``train_worker.py:186-201`` contract).

Usage: ``python distributed_worker.py <rank> <nproc> <port> <workdir>``.
Prints ``MULTIHOST_OK rank=<r> ...`` on success; any assertion kills the
process with a traceback (rc != 0).
"""

import json
import os
import sys


def main() -> None:
    rank, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, workdir = sys.argv[3], sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    # generous collective timeouts: the 1-core CI VM can take a while to
    # gather all participants under load (see tests/conftest.py)
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2"
        " --xla_cpu_collective_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=600")
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(rank)

    from pdac_pathological_image_segmentation_tpu.parallel.mesh import (
        create_mesh,
        initialize_distributed,
        sync_global_devices,
    )

    initialize_distributed()

    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == rank
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * nproc

    # ---- per-host epoch slicing: disjoint + covering (+ wrap padding) ----
    from pdac_pathological_image_segmentation_tpu.data.loader import (
        _epoch_indices,
    )

    mine = _epoch_indices(10, epoch=3, seed=41, shuffle=True,
                          process_index=rank, process_count=nproc)
    assert len(mine) == 5
    gathered = multihost_utils.process_allgather(np.sort(mine))
    assert set(gathered.flatten().tolist()) == set(range(10)), gathered
    # n=9: wrap-padded to 10 → exactly one duplicate across hosts
    mine9 = _epoch_indices(9, epoch=0, seed=41, shuffle=False,
                           process_index=rank, process_count=nproc)
    gathered9 = multihost_utils.process_allgather(np.sort(mine9))
    flat9 = gathered9.flatten().tolist()
    assert set(flat9) == set(range(9)) and len(flat9) == 10, flat9

    # ---- real training: 2 epochs, sharded global batches, ckpt save ----
    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.data.discovery import (
        discover_split,
    )
    from pdac_pathological_image_segmentation_tpu.data.loader import (
        PatchDataset,
    )
    from pdac_pathological_image_segmentation_tpu.data.synthetic import (
        generate_synthetic_patches,
    )
    from pdac_pathological_image_segmentation_tpu.train.loop import Trainer

    data_dir = os.path.join(workdir, "data")
    if rank == 0:
        generate_synthetic_patches(os.path.join(data_dir, "train"), n=8,
                                   size=32, seed=0)
        generate_synthetic_patches(os.path.join(data_dir, "val"), n=4,
                                   size=32, seed=1)
    sync_global_devices("data_ready")

    cfg = Config(model="unet", img_size=32, batch_size=4, epochs=2, seed=41,
                 num_worker=2, compute_dtype="float32",
                 train_path=os.path.join(data_dir, "train"),
                 val_path=os.path.join(data_dir, "val"))
    train_set = PatchDataset(*discover_split(cfg.train_path), cfg)
    val_set = PatchDataset(*discover_split(cfg.val_path), cfg)

    save = os.path.join(workdir, "out")
    trainer = Trainer(cfg, save, train_set, val_set)
    mesh = create_mesh()
    assert mesh.devices.size == 2 * nproc
    result = trainer.train()
    assert result["last_epoch"] == 1, result
    # global metrics must be identical on every rank (the reference never
    # reduces its meters — SURVEY.md §5 quirk we fix)
    my_val = np.asarray([result["history"][-1]["val_score"]], np.float32)
    all_val = multihost_utils.process_allgather(my_val)
    assert np.all(all_val == all_val[0]), all_val

    # chief-only logging: exactly one process holds a writer (the file
    # itself is visible to both ranks on this shared filesystem)
    wrote = np.asarray([trainer.writer is not None], np.int32)
    n_writers = int(multihost_utils.process_allgather(wrote).sum())
    assert n_writers == 1, n_writers
    assert os.path.exists(os.path.join(save, "log_dir", "scalars.csv"))

    # ---- resume at process_count=2 (reference train_worker.py:186-201) ----
    import dataclasses

    cfg_resume = dataclasses.replace(cfg, epochs=3)
    trainer2 = Trainer(cfg_resume, save, train_set, val_set)
    result2 = trainer2.train()
    assert result2["last_epoch"] == 2, result2
    assert len(result2["history"]) == 1  # only epoch 3 ran

    sync_global_devices("done")
    print("MULTIHOST_OK " + json.dumps({
        "rank": rank,
        "devices": jax.device_count(),
        "val_score": float(all_val[0][0]),
        "resumed_to": result2["last_epoch"],
    }), flush=True)


if __name__ == "__main__":
    main()

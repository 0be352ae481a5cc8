"""Async checkpoint saver: overlap-with-compute semantics.

The reference blocks training on ``torch.save`` every epoch
(``/root/reference/train_worker.py:116-125``); ``AsyncCheckpointSaver``
snapshots on device and writes on a background thread.  These tests pin:
the written checkpoint equals the state *at save time* (donation-safe
snapshot), latest/best gating, one-in-flight ordering, and error
surfacing on the next ``wait()``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.models.registry import build_model
from pdac_pathological_image_segmentation_tpu.train.checkpoint import (
    AsyncCheckpointSaver,
    has_checkpoint,
    restore_checkpoint,
)
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)

SCHED = {"lr": 1e-3, "best": 0.5, "num_bad_epochs": 1}
ES = {"patience": 3, "delta": 0.0, "best_score": 0.5, "counter": 0,
      "early_stop": False}


@pytest.fixture(scope="module")
def small_state():
    cfg = Config(model="unet", backbone="resnet18", img_size=32,
                 compute_dtype="float32")
    model = build_model(cfg)
    return model, create_train_state(cfg, model, jax.random.PRNGKey(0))


def test_async_save_restores_state_at_save_time(tmp_path, small_state):
    """Mutating (or donating) the live state AFTER save() must not change
    what lands on disk — the on-device snapshot decouples them."""
    _, state = small_state
    saver = AsyncCheckpointSaver()
    saver.save(str(tmp_path), state, epoch=4, previous_best=0.5,
               scheduler_state=SCHED, earlystop_state=ES, is_best=True)
    # immediately clobber the live buffers the way the next donating train
    # step would
    clobbered = jax.tree_util.tree_map(
        lambda a: a * 0 if isinstance(a, jax.Array) else a, state.params
    )
    state_live = state.replace(params=clobbered)
    del state_live
    saver.wait()
    assert has_checkpoint(str(tmp_path), "latest")
    assert has_checkpoint(str(tmp_path), "best")
    restored, meta = restore_checkpoint(str(tmp_path), state)
    assert meta["epoch"] == 4
    assert meta["previous_best"] == 0.5
    assert meta["scheduler"] == SCHED
    a = jax.device_get(state.params)
    b = jax.device_get(restored.params)
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_save_not_best_skips_best(tmp_path, small_state):
    _, state = small_state
    saver = AsyncCheckpointSaver()
    saver.save(str(tmp_path), state, epoch=0, previous_best=0.1,
               scheduler_state=SCHED, earlystop_state=ES, is_best=False)
    saver.wait()
    assert has_checkpoint(str(tmp_path), "latest")
    assert not has_checkpoint(str(tmp_path), "best")


def test_async_saves_serialize_last_wins(tmp_path, small_state):
    """Back-to-back saves: the second joins the first; 'latest' ends at
    the last epoch written."""
    _, state = small_state
    saver = AsyncCheckpointSaver()
    for epoch in range(3):
        saver.save(str(tmp_path), state, epoch=epoch, previous_best=0.0,
                   scheduler_state=SCHED, earlystop_state=ES, is_best=False)
    saver.wait()
    _, meta = restore_checkpoint(str(tmp_path), state)
    assert meta["epoch"] == 2


def test_async_save_error_surfaces_on_wait(tmp_path, small_state):
    """A failing background write raises on the next wait(), not silently."""
    _, state = small_state
    saver = AsyncCheckpointSaver()
    target = tmp_path / "not_a_dir"
    target.write_text("file blocks the checkpoint directory")
    saver.save(str(target), state, epoch=0, previous_best=0.0,
               scheduler_state=SCHED, earlystop_state=ES, is_best=False)
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        saver.wait()
    # the error is consumed — the saver is reusable afterwards
    saver.save(str(tmp_path), state, epoch=1, previous_best=0.0,
               scheduler_state=SCHED, earlystop_state=ES, is_best=False)
    saver.wait()
    assert has_checkpoint(str(tmp_path), "latest")


def test_trainer_uses_async_saver(tmp_path, small_state):
    """The Trainer owns an AsyncCheckpointSaver and its train() waits for
    the final write (checkpoint must be durable when train() returns) —
    pinned structurally here, end-to-end by test_train_integration."""
    from pdac_pathological_image_segmentation_tpu.train.loop import Trainer

    assert hasattr(Trainer, "train")
    import inspect

    src = inspect.getsource(Trainer.train)
    epochs_src = inspect.getsource(Trainer._train_epochs)
    assert "_ckpt_saver.save" in epochs_src
    # the wait lives in train()'s finally so a mid-epoch exception still
    # drains the in-flight write (test_train_integration pins it e2e)
    assert "finally" in src and "_ckpt_saver.wait" in src

"""Checkpoint subsystem unit tests (save/restore API directly; the
Trainer-level resume behavior is covered in test_train_integration.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.models import build_model
from pdac_pathological_image_segmentation_tpu.train.checkpoint import (
    BEST,
    LATEST,
    has_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from pdac_pathological_image_segmentation_tpu.train.state import (
    create_train_state,
)


def _state():
    cfg = Config(model="unet", img_size=32, compute_dtype="float32")
    model = build_model(cfg)
    return create_train_state(cfg, model, jax.random.PRNGKey(0))


def test_save_restore_roundtrip(tmp_path):
    state = _state()
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    sched = {"lr": 5e-5, "best": 0.71, "num_bad_epochs": 1}
    es = {"patience": 30, "delta": 0.02, "best_score": 0.7, "counter": 2,
          "early_stop": False}
    save_checkpoint(str(tmp_path), state, epoch=4, previous_best=0.71,
                    scheduler_state=sched, earlystop_state=es, is_best=True)
    assert has_checkpoint(str(tmp_path), LATEST)
    assert has_checkpoint(str(tmp_path), BEST)

    fresh = _state()
    restored, meta = restore_checkpoint(str(tmp_path), fresh)
    assert int(restored.step) == 7
    assert int(meta["epoch"]) == 4
    assert float(meta["previous_best"]) == 0.71
    assert float(meta["scheduler"]["lr"]) == 5e-5
    assert int(meta["earlystop"]["counter"]) == 2
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_not_written_without_improvement(tmp_path):
    state = _state()
    save_checkpoint(str(tmp_path), state, epoch=0, previous_best=0.1,
                    scheduler_state={"lr": 1e-4, "best": 0.1,
                                     "num_bad_epochs": 0},
                    earlystop_state={"patience": 3, "delta": 0.0,
                                     "best_score": 0.1, "counter": 0,
                                     "early_stop": False},
                    is_best=False)
    assert has_checkpoint(str(tmp_path), LATEST)
    assert not has_checkpoint(str(tmp_path), BEST)


def test_restore_missing_returns_none(tmp_path):
    assert restore_checkpoint(str(tmp_path), _state()) is None

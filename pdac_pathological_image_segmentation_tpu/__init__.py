"""TPU-native PDAC pathological image segmentation framework.

A brand-new JAX/XLA/Pallas/pjit rebuild of the capabilities of
``moksu27/PDAC_pathological_image_segmentation`` (see ``/root/reference``):
training + evaluating binary tumor/normal segmentation models (ResUNet, FPN,
DeepLabV3+, PSPNet on a ResNet encoder) on H&E patches tiled from pancreatic
cancer whole-slide images, with

* data-parallel multi-chip training over a ``jax.sharding.Mesh``
  (replacing the reference's NCCL DistributedDataParallel,
  reference ``train_worker.py:139-261``),
* a fused on-device preprocessing pipeline (resize / normalize / color-jitter
  / flip-rot90, replacing albumentations, reference ``train_main.py:70-88``),
* Dice loss/score (reference ``util.py:6-26``), early stopping and plateau LR
  scheduling (reference ``train_worker.py:236-244``),
* latest/best checkpointing with auto-resume (reference
  ``train_worker.py:116-125,186-201``),
* a per-patch evaluation harness with figure output (reference
  ``test.py:137-186``), and
* full-slide sliding-window inference with on-device overlap-blend stitching
  and TTA (superseding the reference's missing
  ``visualize/predict_overlay.ipynb``).
"""

__version__ = "0.1.0"

from pdac_pathological_image_segmentation_tpu.config import (  # noqa: F401
    Config,
    load_config,
)

# Short alias so users can `import pdac_pathological_image_segmentation_tpu as pst`.

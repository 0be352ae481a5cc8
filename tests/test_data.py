import numpy as np
import pytest

import jax

from pdac_pathological_image_segmentation_tpu.config import Config
from pdac_pathological_image_segmentation_tpu.data import (
    PatchDataset,
    PatchLoader,
    discover_split,
    generate_synthetic_patches,
)
from pdac_pathological_image_segmentation_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
)


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("patches")
    generate_synthetic_patches(str(d), n=10, size=64, seed=0)
    return str(d)


def test_discover_split_suffix_contract(synth_dir):
    imgs, masks = discover_split(synth_dir)
    assert len(imgs) == len(masks) == 10
    assert all(m.endswith("labelled.png") for m in masks)
    assert not any(i.endswith("labelled.png") for i in imgs)


def test_dataset_preshuffle_is_seeded(synth_dir):
    imgs, masks = discover_split(synth_dir)
    cfg = Config(model="unet", seed=41, img_size=64)
    ds1 = PatchDataset(imgs, masks, cfg)
    ds2 = PatchDataset(imgs, masks, cfg)
    assert list(ds1.img_paths) == list(ds2.img_paths)
    # pairs stay aligned after the shuffle
    for ip, mp in zip(ds1.img_paths, ds1.mask_paths):
        assert str(mp) == str(ip).replace(".png", "-labelled.png")


def test_dataset_getitem_decodes(synth_dir):
    imgs, masks = discover_split(synth_dir)
    cfg = Config(model="unet", seed=41, img_size=64)
    ds = PatchDataset(imgs, masks, cfg)
    image, mask = ds[0]
    assert image.shape == (64, 64, 3) and image.dtype == np.uint8
    assert mask.shape == (64, 64) and set(np.unique(mask)).issubset({0, 1})


def test_loader_shapes_padding_and_epoch_reshuffle(synth_dir):
    imgs, masks = discover_split(synth_dir)
    cfg = Config(model="unet", seed=41, img_size=64, batch_size=8)
    ds = PatchDataset(imgs, masks, cfg)
    loader = PatchLoader(ds, batch_size=8, shuffle=True, num_workers=2)
    batches = list(loader.epoch(0))
    # 10 samples, batch 8 → 2 batches, last one wrap-padded with 6 valid
    assert len(batches) == 2
    assert batches[0].image.shape == (8, 64, 64, 3)
    assert bool(np.all(np.asarray(batches[0].valid)))
    assert int(np.asarray(batches[1].valid).sum()) == 2
    # set_epoch-style reshuffle: different epochs → different order
    b0 = np.asarray(jax.device_get(batches[0].image))
    b0_again = np.asarray(jax.device_get(next(iter(loader.epoch(0))).image))
    b1 = np.asarray(jax.device_get(next(iter(loader.epoch(1))).image))
    np.testing.assert_array_equal(b0, b0_again)
    assert not np.array_equal(b0, b1)


def test_loader_drop_last(synth_dir):
    imgs, masks = discover_split(synth_dir)
    cfg = Config(model="unet", seed=41, img_size=64)
    ds = PatchDataset(imgs, masks, cfg)
    loader = PatchLoader(ds, batch_size=8, shuffle=True, num_workers=2,
                         drop_last=True)
    assert len(list(loader.epoch(0))) == 1


def test_loader_shards_batch_over_mesh(synth_dir):
    imgs, masks = discover_split(synth_dir)
    cfg = Config(model="unet", seed=41, img_size=64)
    ds = PatchDataset(imgs, masks, cfg)
    mesh = create_mesh()  # 8 fake CPU devices (conftest)
    loader = PatchLoader(ds, batch_size=8, shuffle=False, num_workers=2,
                         drop_last=True, sharding=batch_sharding(mesh))
    batch = next(iter(loader.epoch(0)))
    assert isinstance(batch.image, jax.Array)
    assert len(batch.image.sharding.device_set) == 8
    assert batch.image.addressable_shards[0].data.shape[0] == 1  # 8/8

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pdac_pathological_image_segmentation_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
)


@pytest.mark.parametrize("in_size,out_size", [(128, 512), (32, 128), (64, 48), (512, 512)])
def test_bilinear_matches_torch_align_corners_false(in_size, out_size):
    # the model head semantics: interpolate(mode=bilinear, align_corners=False)
    # reference models/resunet.py:51-56
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, in_size, in_size, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_size, out_size))
    ref = (
        F.interpolate(
            torch.as_tensor(x).permute(0, 3, 1, 2),
            size=(out_size, out_size),
            mode="bilinear",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


def test_bilinear_identity():
    x = jnp.arange(2 * 8 * 8 * 1, dtype=jnp.float32).reshape(2, 8, 8, 1)
    np.testing.assert_array_equal(np.asarray(resize_bilinear(x, 8, 8)), np.asarray(x))


def test_nearest_mask_resize_preserves_labels():
    rng = np.random.default_rng(1)
    m = rng.integers(0, 2, size=(3, 100, 100)).astype(np.uint8)
    out = np.asarray(resize_nearest(jnp.asarray(m), 64, 64))
    assert out.shape == (3, 64, 64)
    assert set(np.unique(out)).issubset({0, 1})


def test_bilinear_hwc_single_image():
    x = jnp.ones((16, 16, 3), dtype=jnp.float32)
    out = resize_bilinear(x, 32, 32)
    assert out.shape == (32, 32, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)

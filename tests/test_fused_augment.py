"""Fused Pallas augmentation kernel vs the XLA train_transform chain
(interpret mode, CPU): same key → same augmentation stream."""

import numpy as np

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.ops.augment import (
    train_transform,
)
from pdac_pathological_image_segmentation_tpu.ops.pallas.fused_augment import (
    draw_augment_scalars,
    fused_train_transform,
)

RNG = np.random.default_rng(11)
S = 64


def test_fused_matches_xla_chain():
    """Across several keys (covering jitter on/off, every OneOf branch and
    rotation), the fused kernel must reproduce the XLA chain's outputs
    within bf16 tolerance — identical per-sample RNG stream by
    construction."""
    images = jnp.asarray(RNG.integers(0, 256, (6, S, S, 3), dtype=np.uint8))
    masks = jnp.asarray(RNG.integers(0, 2, (6, S, S), dtype=np.uint8))
    geom_seen = set()
    for seed in range(6):
        key = jax.random.PRNGKey(seed)
        ref_i, ref_m = train_transform(key, images, masks, img_size=S,
                                       dtype=jnp.bfloat16)
        got_i, got_m = fused_train_transform(key, images, masks,
                                             interpret=True)
        # geometry must be bitwise identical (masks pin it); image values
        # match the XLA chain except for a handful of last-ulp bf16
        # double-roundings deep in the hue/contrast chains (two compilers'
        # contraction groupings) — bound both magnitude AND count
        gi = np.asarray(got_i, np.float32)
        ri = np.asarray(ref_i, np.float32)
        viol = np.abs(gi - ri) > (0.06 + 0.02 * np.abs(ri))
        assert viol.mean() < 5e-4, (
            f"seed {seed}: {viol.sum()} pixels beyond tolerance "
            f"(max |Δ| {np.abs(gi - ri).max():.4f})"
        )
        np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))
        _, ints = draw_augment_scalars(key, images.shape[0])
        for row in np.asarray(ints):
            if row[5]:  # geometric applied
                geom_seen.add((int(row[6]), int(row[7])))
    # the masks matching exactly across many samples pins the geometric
    # branches; make sure we actually exercised several distinct ones
    assert len(geom_seen) >= 3, geom_seen


def test_scalar_draws_match_xla_stream():
    """draw_augment_scalars reproduces color_jitter/one_of_flip_rot's
    internal draws for the same key (the contract that makes the fused
    path a drop-in)."""
    key = jax.random.PRNGKey(3)
    n = 4
    facs, ints = draw_augment_scalars(key, n)
    keys = jax.random.split(key, n * 2).reshape(n, 2, -1)
    for i in range(n):
        k_apply, k_order, k_b, k_c, k_s, k_h = jax.random.split(
            keys[i, 0], 6)
        fb = jax.random.uniform(k_b, (), minval=0.7, maxval=1.3)
        np.testing.assert_allclose(float(facs[i, 0]), float(fb), rtol=1e-6)
        perm = jax.random.permutation(k_order, 4)
        np.testing.assert_array_equal(np.asarray(ints[i, :4]),
                                      np.asarray(perm))
        g_apply_k, g_pick, g_rot = jax.random.split(keys[i, 1], 3)
        choice = jax.random.randint(g_pick, (), 0, 3)
        assert int(ints[i, 6]) == int(choice)

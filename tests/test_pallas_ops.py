"""Pallas kernel correctness tests (interpret mode on CPU).

The same kernels compile to Mosaic on TPU; interpret mode checks the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

RNG = np.random.default_rng(0)


def test_group_norm_relu_matches_flax():
    import flax.linen as nn

    from pdac_pathological_image_segmentation_tpu.ops.pallas.group_norm import (
        group_norm_relu,
        xla_group_norm_relu,
    )

    x = jnp.asarray(RNG.normal(size=(2, 16, 16, 128)), jnp.float32)
    gamma = jnp.asarray(RNG.normal(size=(128,)), jnp.float32)
    beta = jnp.asarray(RNG.normal(size=(128,)), jnp.float32)
    out = group_norm_relu(x, gamma, beta, interpret=True)
    ref = xla_group_norm_relu(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    fl = nn.relu(gn.apply({"params": {"scale": gamma, "bias": beta}}, x))
    np.testing.assert_allclose(np.asarray(out), np.asarray(fl),
                               rtol=1e-4, atol=1e-5)


def test_group_norm_no_relu():
    from pdac_pathological_image_segmentation_tpu.ops.pallas.group_norm import (
        group_norm_relu,
        xla_group_norm_relu,
    )

    x = jnp.asarray(RNG.normal(size=(1, 8, 8, 64)), jnp.float32)
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)
    out = group_norm_relu(x, gamma, beta, num_groups=16, relu=False,
                          interpret=True)
    ref = xla_group_norm_relu(x, gamma, beta, num_groups=16, relu=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert float(out.min()) < 0  # relu really off


def test_group_norm_trainable_grads():
    """custom-VJP GroupNorm (Pallas fwd, analytic XLA bwd) must produce the
    same cotangents as differentiating the plain-XLA reference."""
    from pdac_pathological_image_segmentation_tpu.ops.pallas.group_norm import (
        group_norm_relu_trainable,
        xla_group_norm_relu,
    )

    x = jnp.asarray(RNG.normal(size=(2, 8, 8, 64)), jnp.float32)
    gamma = jnp.asarray(RNG.normal(size=(64,)) * 0.5 + 1.0, jnp.float32)
    beta = jnp.asarray(RNG.normal(size=(64,)) * 0.1, jnp.float32)
    dy = jnp.asarray(RNG.normal(size=(2, 8, 8, 64)), jnp.float32)

    def loss_ref(x, g, b):
        return jnp.sum(xla_group_norm_relu(x, g, b, num_groups=32) * dy)

    def loss_pallas(x, g, b):
        return jnp.sum(
            group_norm_relu_trainable(x, g, b, 32, 1e-6, True, True) * dy)

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gamma, beta)
    for r, g_ in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(r),
                                   rtol=1e-4, atol=1e-4)


def test_group_norm_trainable_bf16():
    from pdac_pathological_image_segmentation_tpu.ops.pallas.group_norm import (
        group_norm_relu_trainable,
    )

    x = jnp.asarray(RNG.normal(size=(1, 8, 8, 64)), jnp.bfloat16)
    gamma = jnp.ones((64,), jnp.float32)
    beta = jnp.zeros((64,), jnp.float32)

    def loss(x):
        return jnp.sum(group_norm_relu_trainable(
            x, gamma, beta, 32, 1e-5, True, True).astype(jnp.float32))

    dx = jax.grad(loss)(x)
    assert dx.shape == x.shape and dx.dtype == jnp.bfloat16

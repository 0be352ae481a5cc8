"""Pallas kernel correctness tests (interpret mode on CPU).

The same kernels compile to Mosaic on TPU; interpret mode checks the math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdac_pathological_image_segmentation_tpu.ops.pallas.fused_head import (
    fused_head_probs,
    xla_head_probs,
)

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("h,s", [(32, 128), (16, 16)])
def test_fused_head_matches_xla(h, s):
    x = jnp.asarray(RNG.normal(size=(2, h, h, 64)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(1, 1, 64, 1)), jnp.float32)
    b = jnp.asarray(RNG.normal(size=(1,)), jnp.float32)
    ref = xla_head_probs(x, w, b, s)
    out = fused_head_probs(x, w, b, out_size=s, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_head_bf16_features():
    x = jnp.asarray(RNG.normal(size=(1, 16, 16, 64)), jnp.bfloat16)
    w = jnp.asarray(RNG.normal(size=(1, 1, 64, 1)), jnp.float32)
    b = jnp.zeros((1,), jnp.float32)
    out = fused_head_probs(x, w, b, out_size=64, interpret=True)
    assert out.shape == (1, 64, 64) and out.dtype == jnp.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


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

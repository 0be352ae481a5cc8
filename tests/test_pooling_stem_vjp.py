"""Custom-VJP train-path ops (ops/pooling.py, ops/stem_conv.py): forwards
and gradients must match XLA's stock lowerings bit-for-bit-in-semantics —
including max-pool TIE cases (post-ReLU zeros everywhere), where
select_and_scatter routes the cotangent to the FIRST max in scan order."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from pdac_pathological_image_segmentation_tpu.ops.pooling import (
    _plain_pool,
    maxpool_3x3_s2,
)
from pdac_pathological_image_segmentation_tpu.ops.stem_conv import (
    stem_conv_7x7_s2,
)

RNG = np.random.default_rng(3)


def _pool_grads(x, dy, mode):
    def f(x_):
        return jnp.sum(maxpool_3x3_s2(x_, mode) * dy)

    return jax.grad(f)(x)


def _stock_pool_grads(x, dy):
    def f(x_):
        return jnp.sum(_plain_pool(x_) * dy)

    return jax.grad(f)(x)


@pytest.mark.parametrize("shape", [(2, 16, 16, 8), (1, 32, 8, 4)])
def test_packed_pool_forward_matches(shape):
    x = jnp.asarray(
        np.maximum(RNG.normal(size=shape), 0.0), jnp.bfloat16)
    out_packed = maxpool_3x3_s2(x, "packed")
    # the packed forward under differentiation must also match
    out_fwd, _ = jax.vjp(lambda x_: maxpool_3x3_s2(x_, "packed"), x)
    ref = _plain_pool(x)
    np.testing.assert_array_equal(np.asarray(out_packed, np.float32),
                                  np.asarray(ref, np.float32))
    np.testing.assert_array_equal(np.asarray(out_fwd, np.float32),
                                  np.asarray(ref, np.float32))


@pytest.mark.parametrize("case", ["random", "ties", "flat_zero"])
def test_packed_pool_backward_matches_select_and_scatter(case):
    shape = (2, 16, 16, 8)
    if case == "random":
        x = np.maximum(RNG.normal(size=shape), 0.0)
    elif case == "ties":
        # few distinct values → many in-window ties
        x = RNG.integers(0, 3, size=shape).astype(np.float32)
    else:
        x = np.zeros(shape, np.float32)  # everything ties at 0
    x = jnp.asarray(x, jnp.bfloat16)
    dy = jnp.asarray(RNG.normal(size=(2, 8, 8, 8)), jnp.bfloat16)

    got = _pool_grads(x, dy, "packed")
    ref = _stock_pool_grads(x, dy)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))


def test_auto_mode_fallback_matches_on_cpu():
    x = jnp.asarray(np.maximum(RNG.normal(size=(1, 8, 8, 4)), 0.0),
                    jnp.float32)
    dy = jnp.asarray(RNG.normal(size=(1, 4, 4, 4)), jnp.float32)
    got = _pool_grads(x, dy, "auto")  # cpu backend → fallback branch
    ref = _stock_pool_grads(x, dy)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_stem_conv_forward_and_grads_match():
    x = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)), jnp.float32)
    k = jnp.asarray(RNG.normal(size=(7, 7, 3, 16)) * 0.1, jnp.float32)
    dy_shape = (2, 16, 16, 16)
    dy = jnp.asarray(RNG.normal(size=dy_shape), jnp.float32)

    def stock(x_, k_):
        return lax.conv_general_dilated(
            x_, k_, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    out = stem_conv_7x7_s2(x, k)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(stock(x, k)))

    def loss_custom(x_, k_):
        return jnp.sum(stem_conv_7x7_s2(x_, k_) * dy)

    def loss_stock(x_, k_):
        return jnp.sum(stock(x_, k_) * dy)

    gx, gk = jax.grad(loss_custom, argnums=(0, 1))(x, k)
    rx, rk = jax.grad(loss_stock, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                               rtol=1e-4, atol=1e-4)


def test_stem_conv_bf16_grads_close():
    x = jnp.asarray(RNG.normal(size=(2, 32, 32, 3)), jnp.bfloat16)
    k = jnp.asarray(RNG.normal(size=(7, 7, 3, 16)) * 0.1, jnp.bfloat16)
    dy = jnp.asarray(RNG.normal(size=(2, 16, 16, 16)), jnp.bfloat16)

    def stock(x_, k_):
        return lax.conv_general_dilated(
            x_, k_, (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    gk = jax.grad(lambda x_, k_: jnp.sum(
        (stem_conv_7x7_s2(x_, k_) * dy).astype(jnp.float32)),
        argnums=1)(x, k)
    rk = jax.grad(lambda x_, k_: jnp.sum(
        (stock(x_, k_) * dy).astype(jnp.float32)), argnums=1)(x, k)
    np.testing.assert_allclose(np.asarray(gk, np.float32),
                               np.asarray(rk, np.float32),
                               rtol=0.05, atol=0.05)

"""Custom-VJP max-pool (ops/pooling.py): forward and gradients must match
XLA's stock lowerings bit-for-bit-in-semantics — including TIE cases
(post-ReLU zeros everywhere), where select_and_scatter routes the
cotangent to the FIRST max in scan order."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pdac_pathological_image_segmentation_tpu.ops.pooling import (
    _plain_pool,
    maxpool_3x3_s2,
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

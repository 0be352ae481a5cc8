"""Custom-VJP 7×7/2 stem convolution — fast weight gradient.

XLA computes the stem's weight gradient as a convolution whose contraction
dimension is the input's **3 channels** — far too narrow for the MXU's
128-lane systolic array, costing 8.7 ms of the 223 ms bs=256 train step
(round-2 profile, BASELINE.md).  This op keeps the forward and the input
gradient on XLA's native lowerings (both are fine: their contractions are
64-wide) and replaces only the weight gradient with an im2col matmul:

    patches  (N·OH·OW, 7·7·3=147)  =  lax.conv_general_dilated_patches
    dW (147, 64)  =  patchesᵀ @ dy (N·OH·OW, 64)

— a single dense ``dot_general`` contracting the 4.2M-row batch-spatial
axis, which the MXU executes at full tilt (≈40 GFLOP ≈ 0.2 ms) plus one
materialization of the 1.2 GB patch tensor (≈3 ms HBM round-trip at
bs=256), vs 8.7 ms for the narrow-channel conv.

Numerics: identical contraction order class as XLA's wgrad (f32
accumulation via ``preferred_element_type``); pinned against the stock
gradient by ``tests/test_pooling_stem_vjp.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x: jax.Array, kernel: jax.Array) -> jax.Array:
    return lax.conv_general_dilated(
        x, kernel, (2, 2), ((3, 3), (3, 3)), dimension_numbers=_DN)


@jax.custom_vjp
def stem_conv_7x7_s2(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """7×7 stride-2 pad-3 conv (torchvision stem), NHWC·HWIO→NHWC."""
    return _conv(x, kernel)


def _fwd(x, kernel):
    return _conv(x, kernel), (x, kernel)


def _bwd(res, dy):
    x, kernel = res
    # input gradient: XLA's transposed-conv lowering is already efficient
    _, vjp_x = jax.vjp(lambda x_: _conv(x_, kernel), x)
    (dx,) = vjp_x(dy)

    # weight gradient: im2col + one wide matmul on the MXU
    n, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    patches = lax.conv_general_dilated_patches(
        x, filter_shape=(kh, kw), window_strides=(2, 2),
        padding=((3, 3), (3, 3)), dimension_numbers=_DN,
    )  # (N, OH, OW, Cin*kh*kw), feature order (cin, ky, kx)
    oh, ow = patches.shape[1], patches.shape[2]
    p2 = patches.reshape(n * oh * ow, cin * kh * kw)
    d2 = dy.reshape(n * oh * ow, cout)
    dw = lax.dot_general(
        p2, d2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Cin*kh*kw, Cout)
    dw = dw.reshape(cin, kh, kw, cout).transpose(1, 2, 0, 3)
    return dx, dw.astype(kernel.dtype)


stem_conv_7x7_s2.defvjp(_fwd, _bwd)

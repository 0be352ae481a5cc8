"""Custom-VJP 3×3/2 max-pool — kills the train step's select-and-scatter.

XLA lowers max-pool's backward as ``select_and_scatter``, which the TPU
backend executes inefficiently (8.8 ms of the 223 ms bs=256 train step,
round-2 profile in BASELINE.md).  This op keeps the forward identical
(``lax.reduce_window`` max — the serving path never changes) but, under
differentiation, records the argmax of every window via a single packed
``reduce_window`` over ``uint32`` keys and computes the backward as four
masked gathers — one read of (dy, idx) and one write of dx instead of the
scatter's strided read-modify-write walk.

Packing (the bf16 fast path):
* post-ReLU activations are non-negative, and the IEEE bit pattern of a
  non-negative float is **monotonic** in its value — so ``bitcast(x,
  uint16)`` compares like ``x``;
* ``key = bits << 16 | (0xFFFF − flat_index)``: the window max over keys
  is the window max over values, ties broken toward the SMALLEST flat
  index — exactly XLA ``select_and_scatter``'s first-match semantics (and
  torch's), so gradients are bit-identical to the stock backward;
* the low half decodes to the argmax position, stored as ``uint16``
  residuals (needs ``H·W ≤ 65536`` — true for the 512² stem path, 256²).

Backward: input row ``iy`` is covered by window rows ``iy//2`` and (odd
rows only) ``(iy+1)//2`` — ≤4 windows per input position — so ``dx``
assembles from four ``take``-gathered (dy·(idx==flat)) terms that XLA
fuses into one output pass.

Ineligible cases (f32 parity path, CPU tests, oversized grids) fall back
to the stock ``select_and_scatter`` backward via ``jax.vjp`` inside the
custom bwd — same numbers as before, by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_WINDOW = (1, 3, 3, 1)
_STRIDES = (1, 2, 2, 1)
_PADDING = ((0, 0), (1, 1), (1, 1), (0, 0))


def _plain_pool(x: jax.Array) -> jax.Array:
    return lax.reduce_window(x, -jnp.inf, lax.max, _WINDOW, _STRIDES,
                             _PADDING)


def _packed_eligible(x: jax.Array, mode: str) -> bool:
    if mode == "packed":
        return True
    if mode == "fallback":
        return False
    n, h, w, c = x.shape
    return (
        x.dtype == jnp.bfloat16
        and h * w <= 65536
        and h % 2 == 0 and w % 2 == 0
        and jax.default_backend() in ("tpu", "axon")
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def maxpool_3x3_s2(x: jax.Array, mode: str = "auto") -> jax.Array:
    """3×3 stride-2 same-padded max pool (torchvision stem semantics).

    ``x`` must be non-negative on the packed path (post-ReLU — the only
    call site, ``models/resnet.py``).  ``mode``: ``auto`` (packed when
    eligible), ``packed``, ``fallback`` (tests)."""
    return _plain_pool(x)


def _fwd(x: jax.Array, mode: str):
    if not _packed_eligible(x, mode):
        out = _plain_pool(x)
        return out, (x, None)
    n, h, w, c = x.shape
    flat = (jnp.arange(h, dtype=jnp.uint32)[:, None] * w
            + jnp.arange(w, dtype=jnp.uint32)[None, :])  # (H, W)
    bits = lax.bitcast_convert_type(x, jnp.uint16).astype(jnp.uint32)
    key = (bits << 16) | (0xFFFF - flat)[None, :, :, None]
    out_key = lax.reduce_window(key, jnp.uint32(0), lax.max, _WINDOW,
                                _STRIDES, _PADDING)
    out = lax.bitcast_convert_type(
        (out_key >> 16).astype(jnp.uint16), jnp.bfloat16)
    idx = (0xFFFF - (out_key & 0xFFFF)).astype(jnp.uint16)
    return out, (None, idx)


def _bwd(mode: str, res, dy: jax.Array):
    x, idx = res
    if idx is None:
        # stock select_and_scatter backward (f32 parity / CPU path)
        _, vjp_fn = jax.vjp(_plain_pool, x)
        (dx,) = vjp_fn(dy)
        return (dx,)

    n, oh, ow, c = dy.shape
    h, w = oh * 2, ow * 2
    idx = idx.astype(jnp.int32)

    iy = jnp.arange(h)
    ix = jnp.arange(w)
    # window rows covering input row iy: iy//2 always; (iy+1)//2 for odd iy
    oy_a = iy // 2
    oy_b = jnp.minimum((iy + 1) // 2, oh - 1)
    my_b = ((iy % 2) == 1) & ((iy + 1) // 2 <= oh - 1)
    ox_a = ix // 2
    ox_b = jnp.minimum((ix + 1) // 2, ow - 1)
    mx_b = ((ix % 2) == 1) & ((ix + 1) // 2 <= ow - 1)

    flat = (iy[:, None] * w + ix[None, :]).astype(jnp.int32)  # (H, W)
    flat = flat[None, :, :, None]

    def term(oy, ox, valid):
        d = jnp.take(jnp.take(dy, oy, axis=1), ox, axis=2)
        i = jnp.take(jnp.take(idx, oy, axis=1), ox, axis=2)
        hit = (i == flat) & valid
        return jnp.where(hit, d, jnp.zeros((), dy.dtype))

    ones_y = jnp.ones((h,), bool)
    ones_x = jnp.ones((w,), bool)

    def vmask(my, mx):
        return (my[:, None] & mx[None, :])[None, :, :, None]

    dx = (
        term(oy_a, ox_a, vmask(ones_y, ones_x))
        + term(oy_a, ox_b, vmask(ones_y, mx_b))
        + term(oy_b, ox_a, vmask(my_b, ones_x))
        + term(oy_b, ox_b, vmask(my_b, mx_b))
    )
    return (dx,)


maxpool_3x3_s2.defvjp(_fwd, _bwd)

"""Custom-VJP 3×3/2 max-pool — kills the train step's select-and-scatter.

XLA lowers max-pool's backward as ``select_and_scatter``, which the TPU
backend executes inefficiently (8.8 ms of the 223 ms bs=256 train step,
round-2 profile in BASELINE.md).  This op keeps the forward EXACTLY the
stock ``lax.reduce_window`` max (serving path and forward cost never
change) and replaces only the backward.

Backward (recompute-based, elementwise-only):
* residuals are ``(x, out)`` — both already live in the training backward
  (``x`` is the stem ReLU output needed by the ReLU VJP; ``out`` feeds
  layer1), so saving them costs nothing;
* for each of the 9 in-window offsets ``(ry, rx)`` (window ``(oy, ox)``
  covers input position ``(2·oy−1+ry, 2·ox−1+rx)``), a shifted stride-2
  view of the padded input is compared against ``out``; a running ``seen``
  mask keeps only the FIRST position per window that attains the max —
  exactly ``select_and_scatter``'s first-match scan-order semantics (and
  torch's), so gradients are bit-identical to the stock backward;
* ``dx`` assembles from the 9 masked ``dy`` terms by output PARITY: even
  rows receive only ry=1 terms, odd rows ry∈{2, 0-shifted} (likewise for
  columns), and the four (N, OH, OW, C) parity planes interleave with
  stack + reshape.

Everything is elementwise + strided slices + concatenate: no gathers, no
scatters, no interior-dilated pads, no batch-sized integer temporaries.
(Three rejected formulations, measured on v5e at bs=256: packed u32
value|index keys OOMed at compile whole-batch — 17 GB of s32 temps;
the same chunked over the batch with ``lax.map`` compiled but serialized
into a 97 ms while-loop of layout copies; 9 interior-dilated ``lax.pad``s
materialized 9× 2 GB buffers — XLA:TPU refuses to fuse dilated pads into
an add chain.)

Ineligible cases (f32 parity path, CPU tests, odd spatial sizes) fall
back to the stock ``select_and_scatter`` backward via ``jax.vjp`` inside
the custom bwd — same numbers as before, by construction.
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


def _fast_eligible(x: jax.Array, mode: str) -> bool:
    if mode == "packed":
        return True
    if mode == "fallback":
        return False
    n, h, w, c = x.shape
    return (
        x.dtype == jnp.bfloat16
        and h % 2 == 0 and w % 2 == 0
        and jax.default_backend() in ("tpu", "axon")
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def maxpool_3x3_s2(x: jax.Array, mode: str = "auto") -> jax.Array:
    """3×3 stride-2 same-padded max pool (torchvision stem semantics).

    ``x`` must be non-negative on the fast path (post-ReLU — the only
    call site, ``models/resnet.py``).  ``mode``: ``auto`` (fast backward
    when eligible), ``packed`` (force fast), ``fallback`` (tests)."""
    return _plain_pool(x)


def _fwd(x: jax.Array, mode: str):
    out = _plain_pool(x)
    if not _fast_eligible(x, mode):
        return out, (x, None)
    return out, (x, out)


def _bwd(mode: str, res, dy: jax.Array):
    x, out = res
    if out is None:
        # stock select_and_scatter backward (f32 parity / CPU path)
        _, vjp_fn = jax.vjp(_plain_pool, x)
        (dx,) = vjp_fn(dy)
        return (dx,)

    n, oh, ow, c = dy.shape
    h, w = oh * 2, ow * 2
    # pad with −1: x is post-ReLU (≥ 0) so the pad never attains the max
    # (even an all-zero window's max is 0 > −1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-1.0)

    def view(ry: int, rx: int) -> jax.Array:
        # xs[n, oy, ox, c] = x[n, 2·oy−1+ry, 2·ox−1+rx, c]  (−1 off-image)
        return lax.slice(
            xp,
            (0, ry, rx, 0),
            (n, ry + 2 * oh - 1, rx + 2 * ow - 1, c),
            (1, 2, 2, 1),
        )

    zero = jnp.zeros((), dy.dtype)
    # first-max-wins scan over the window in select_and_scatter's order
    seen = jnp.zeros(dy.shape, bool)
    terms = {}
    for ry in range(3):
        for rx in range(3):
            is_max = view(ry, rx) == out
            terms[(ry, rx)] = jnp.where(is_max & ~seen, dy, zero)
            seen = seen | is_max

    def shift_r(v: jax.Array) -> jax.Array:  # window row oy = k+1
        return jnp.concatenate([v[:, 1:], jnp.zeros_like(v[:, :1])], axis=1)

    def shift_c(v: jax.Array) -> jax.Array:  # window col ox = l+1
        return jnp.concatenate([v[:, :, 1:], jnp.zeros_like(v[:, :, :1])],
                               axis=2)

    # add order per position = ascending (oy, ox) — matches
    # select_and_scatter's accumulation, keeping multi-hit bf16 sums
    # bit-identical to the stock backward
    ee = terms[(1, 1)]
    eo = terms[(1, 2)] + shift_c(terms[(1, 0)])
    oe = terms[(2, 1)] + shift_r(terms[(0, 1)])
    oo = (terms[(2, 2)] + shift_c(terms[(2, 0)])
          + shift_r(terms[(0, 2)]) + shift_r(shift_c(terms[(0, 0)])))
    even = jnp.stack([ee, eo], axis=3)  # (N, OH, OW, 2, C)
    odd = jnp.stack([oe, oo], axis=3)
    dx = jnp.stack([even, odd], axis=2).reshape(n, h, w, c)
    return (dx,)


maxpool_3x3_s2.defvjp(_fwd, _bwd)

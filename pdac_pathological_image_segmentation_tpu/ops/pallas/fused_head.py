"""Pallas kernel: fused segmentation head (1×1 conv → bilinear 4× upsample
→ sigmoid).

Every model in this framework ends with the same tail (the reference's
``models/resunet.py:48-56``): a 1×1 conv to ``num_classes`` at reduced
resolution, a bilinear ``align_corners=False`` upsample to full resolution,
and (in the callers) a sigmoid.  Under XLA these are 3-4 separate HBM-bound
ops on a [N, 512, 512] output (~3 ms/step at batch 128 on v5e, per the
round-1 profile).  This kernel computes the whole tail per sample in VMEM:

    probs[n] = sigmoid( M_h @ (x[n] · w + b) @ M_wᵀ )

where ``M_h``/``M_w`` are the dense half-pixel bilinear interpolation
matrices from ``ops/resize.py`` (each row ≤2 nonzeros, but dense matmul is
MXU-native and the matrices are tiny).  One grid step per sample: read the
[H, W, C] feature block once, write the [S, S] probability tile once —
everything in between never touches HBM.

**Round-1 measurement (v5e, batch 128):** the Pallas kernel runs 0.95 ms but
XLA inserts a 1.27 ms layout copy to feed it (the feature tensor lives in a
batch-minor tile layout Pallas can't consume directly), while the pure-XLA
ops fuse to 0.83 ms — so per the build plan's keep-whichever-wins rule
(SURVEY.md §7 step 9) the XLA path stays the default and this kernel is
opt-in (``fused_head_probs``).  Revisit if the surrounding layout changes or
once Pallas accepts tiled input layouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pdac_pathological_image_segmentation_tpu.ops.resize import (
    _bilinear_matrix,
)


def _head_kernel(x_ref, w_ref, b_ref, mh_ref, mw_ref, out_ref):
    h, wdim, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    x = x_ref[0].reshape(h * wdim, c).astype(jnp.float32)
    w = w_ref[:, :].astype(jnp.float32)  # (C, 1) -> use column 0
    logits = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(h, wdim) + b_ref[0, 0]
    mh = mh_ref[:, :]  # (S, H)
    mw = mw_ref[:, :]  # (S, W)
    up = jnp.dot(mh, logits, preferred_element_type=jnp.float32)  # (S, W)
    up = jax.lax.dot_general(
        up, mw, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, S)
    out_ref[0] = jax.nn.sigmoid(up)


@functools.partial(jax.jit, static_argnames=("out_size", "interpret"))
def fused_head_probs(
    x: jax.Array,  # (N, H, W, C) features (bf16/f32)
    w: jax.Array,  # (1, 1, C, 1) or (C, 1) 1×1-conv kernel
    b: jax.Array,  # (1,) bias
    out_size: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """sigmoid(bilinear_resize(conv1x1(x, w, b), out_size)) — fused.

    Returns (N, S, S) float32 probabilities, numerically equal (≤1e-5) to
    the unfused XLA ops.
    """
    n, h, wdim, c = x.shape
    w2 = w.reshape(c, -1)[:, :1].astype(jnp.float32)
    b2 = jnp.reshape(b.astype(jnp.float32), (1, 1))
    mh = jnp.asarray(_bilinear_matrix(h, out_size))
    mw = jnp.asarray(_bilinear_matrix(wdim, out_size))

    return pl.pallas_call(
        _head_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wdim, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((out_size, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_size, wdim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_size, out_size), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_size, out_size), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (h * wdim * c + out_size * h * wdim
                           + out_size * out_size * wdim),
            bytes_accessed=n * (h * wdim * c * 2 + out_size * out_size * 4),
            transcendentals=n * out_size * out_size,
        ),
        interpret=interpret,
    )(x, w2, b2, mh, mw)


def xla_head_probs(x, w, b, out_size=512):
    """Reference implementation: the unfused XLA ops (1×1 conv → resize →
    sigmoid).  Used for correctness tests and the pallas-vs-XLA bench."""
    from pdac_pathological_image_segmentation_tpu.ops.resize import (
        resize_bilinear,
    )

    c = x.shape[-1]
    logits = jnp.einsum(
        "nhwc,co->nhwo", x.astype(jnp.float32), w.reshape(c, -1)[:, :1]
    ) + b.astype(jnp.float32)
    logits = resize_bilinear(logits, out_size, out_size)
    return jax.nn.sigmoid(logits[..., 0])

"""Pallas kernel: fused GroupNorm + ReLU.

The FPN segmentation blocks run GroupNorm(32) over [N, 128, 128, 128]
activations — the single most expensive op in the round-1 FPN profile
(3.15 ms/step at batch 128 on v5e for the stats pass alone): XLA lowers GN
as a reduce pass plus a separate normalize pass, each touching HBM.  This
kernel keeps one sample's activation block resident in VMEM and does
stats → normalize → scale/bias → ReLU in a single HBM read + write.

Inference-path only (no custom VJP yet); training uses the identical-math
flax GroupNorm.

**Round-1 measurements (v5e, [128,128,128,128] bf16):** standalone the DMA
variant runs 1.65 ms vs XLA's 3.06 ms (1.85×, near the 1.3 ms one-read-
one-write roofline).  Embedded in the FPN forward it *loses* (59.9 vs
52.1 ms/step end-to-end): Mosaic custom calls pin operands/results to the
standard {3,2,1,0} layout, so XLA inserts two full-tensor layout copies
around each of the FPN's seven GN sites.  Hence opt-in
(``fpn_pallas_gn: true``) until Pallas accepts tiled input layouts; the
kernel is the right shape for standalone/streaming uses (e.g. the WSI
stitch pipeline) where it owns its layouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_relu_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, num_groups: int,
                    eps: float, relu: bool, row_chunk: int):
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    g = num_groups
    cg = c // g
    n_chunks = h // row_chunk

    # pass 1: running channel sums over row chunks (the full-sample f32
    # temporary would blow the 16 MB VMEM budget at 128³ blocks)
    def stat_body(i, carry):
        s, s2 = carry
        rows = x_ref[0, pl.ds(i * row_chunk, row_chunk)]
        xf = rows.reshape(row_chunk * w, c).astype(jnp.float32)
        return (s + jnp.sum(xf, axis=0, keepdims=True),
                s2 + jnp.sum(xf * xf, axis=0, keepdims=True))

    s, s2 = jax.lax.fori_loop(
        0, n_chunks, stat_body,
        (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32)),
    )
    # channel→group reduction as a tiny matmul (Mosaic rejects the
    # lane-crossing (1,C)→(G,C/G) reshape): onehot[c, g] = 1 iff c//cg == g
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0) // cg
    grp_ids = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    onehot = (ch_ids == grp_ids).astype(jnp.float32)  # (C, G)
    gs = jnp.dot(s, onehot, preferred_element_type=jnp.float32)  # (1, G)
    gs2 = jnp.dot(s2, onehot, preferred_element_type=jnp.float32)
    n = jnp.float32(h * w * cg)
    mean = gs / n
    var = gs2 / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)  # (1, G)
    # group→channel broadcast via the transposed one-hot
    inv_c = jax.lax.dot_general(
        inv, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, C)
    mean_c = jax.lax.dot_general(
        mean, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gamma = gamma_ref[:, :].astype(jnp.float32)  # (1, C)
    beta = beta_ref[:, :].astype(jnp.float32)
    scale = gamma * inv_c
    shift = beta - mean_c * scale

    # pass 2: normalize + scale/bias (+ReLU) chunkwise, VMEM-resident
    def apply_body(i, _):
        rows = x_ref[0, pl.ds(i * row_chunk, row_chunk)]
        xf = rows.reshape(row_chunk * w, c).astype(jnp.float32)
        y = xf * scale + shift
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0, pl.ds(i * row_chunk, row_chunk)] = (
            y.astype(o_ref.dtype).reshape(row_chunk, w, c)
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, apply_body, 0)


def _gn_relu_dma_kernel(x_hbm, gamma_ref, beta_ref, o_hbm, xbuf, in_sem,
                        out_sem, *, num_groups: int, eps: float, relu: bool,
                        row_chunk: int):
    """Manual double-buffered variant for blocks too big to pipeline
    (in+out VMEM windows would exceed the 16 MB budget): samples stream
    HBM→VMEM with a 2-slot prefetch, are normalized **in place**, and
    stream back — one HBM read + one write per element, with sample i+1's
    inbound DMA overlapping sample i's compute."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    h, w, c = xbuf.shape[1], xbuf.shape[2], xbuf.shape[3]
    g = num_groups
    cg = c // g
    n_chunks = h // row_chunk

    def in_dma(sample, slot):
        return pltpu.make_async_copy(
            x_hbm.at[sample], xbuf.at[slot], in_sem.at[slot]
        )

    def out_dma(sample, slot):
        return pltpu.make_async_copy(
            xbuf.at[slot], o_hbm.at[sample], out_sem.at[slot]
        )

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        in_dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        # the next sample reuses the slot written out two steps ago — drain
        # that outbound DMA before overwriting
        @pl.when(i >= 1)
        def _():
            out_dma(i - 1, next_slot).wait()

        in_dma(i + 1, next_slot).start()

    in_dma(i, slot).wait()

    def stat_body(k, carry):
        s, s2 = carry
        rows = xbuf[slot, pl.ds(k * row_chunk, row_chunk)]
        xf = rows.reshape(row_chunk * w, c).astype(jnp.float32)
        return (s + jnp.sum(xf, axis=0, keepdims=True),
                s2 + jnp.sum(xf * xf, axis=0, keepdims=True))

    s, s2 = jax.lax.fori_loop(
        0, n_chunks, stat_body,
        (jnp.zeros((1, c), jnp.float32), jnp.zeros((1, c), jnp.float32)),
    )
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0) // cg
    grp_ids = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    onehot = (ch_ids == grp_ids).astype(jnp.float32)
    gs = jnp.dot(s, onehot, preferred_element_type=jnp.float32)
    gs2 = jnp.dot(s2, onehot, preferred_element_type=jnp.float32)
    cnt = jnp.float32(h * w * cg)
    mean = gs / cnt
    var = gs2 / cnt - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    inv_c = jax.lax.dot_general(inv, onehot, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    mean_c = jax.lax.dot_general(mean, onehot, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    gamma = gamma_ref[:, :].astype(jnp.float32)
    beta = beta_ref[:, :].astype(jnp.float32)
    scale = gamma * inv_c
    shift = beta - mean_c * scale

    def apply_body(k, _):
        rows = xbuf[slot, pl.ds(k * row_chunk, row_chunk)]
        xf = rows.reshape(row_chunk * w, c).astype(jnp.float32)
        y = xf * scale + shift
        if relu:
            y = jnp.maximum(y, 0.0)
        xbuf[slot, pl.ds(k * row_chunk, row_chunk)] = (
            y.astype(xbuf.dtype).reshape(row_chunk, w, c)
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, apply_body, 0)
    out_dma(i, slot).start()

    @pl.when(i == n - 1)
    def _():
        out_dma(i, slot).wait()

        @pl.when(i >= 1)
        def _():
            out_dma(i - 1, next_slot).wait()


def _group_norm_relu_dma(x, gamma, beta, num_groups, eps, relu, row_chunk,
                         interpret):
    n, h, w, c = x.shape
    kernel = functools.partial(
        _gn_relu_dma_kernel, num_groups=num_groups, eps=eps, relu=relu,
        row_chunk=row_chunk,
    )
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, h, w, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * h * w * c,
            bytes_accessed=2 * n * h * w * c * x.dtype.itemsize,
            transcendentals=n * num_groups,
        ),
        interpret=interpret,
    )(x, gamma.reshape(1, c), beta.reshape(1, c))


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "relu", "interpret"),
)
def group_norm_relu(
    x: jax.Array,  # (N, H, W, C)
    gamma: jax.Array,  # (C,)
    beta: jax.Array,  # (C,)
    num_groups: int = 32,
    eps: float = 1e-6,
    relu: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Fused per-sample GroupNorm(+ReLU); matches
    ``flax.linen.GroupNorm(num_groups, epsilon=eps)`` followed by ``relu``."""
    n, h, w, c = x.shape
    assert c % num_groups == 0
    row_chunk = 1
    for cand in (16, 8, 4, 2):
        if h % cand == 0:
            row_chunk = cand
            break
    block_bytes = h * w * c * x.dtype.itemsize
    if 4 * block_bytes > 15 * 1024 * 1024:
        # pipelined in+out windows (double buffered) would blow the 16 MB
        # VMEM budget → manual 2-slot DMA streaming with in-place normalize
        return _group_norm_relu_dma(
            x, gamma, beta, num_groups, eps, relu, row_chunk, interpret
        )
    kernel = functools.partial(
        _gn_relu_kernel, num_groups=num_groups, eps=eps, relu=relu,
        row_chunk=row_chunk,
    )
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * h * w * c,
            bytes_accessed=2 * n * h * w * c * x.dtype.itemsize,
            transcendentals=n * num_groups,
        ),
        interpret=interpret,
    )(x, gamma.reshape(1, c), beta.reshape(1, c))


def xla_group_norm_relu(x, gamma, beta, num_groups=32, eps=1e-6, relu=True):
    """Reference: flax GroupNorm semantics in plain XLA ops."""
    n, h, w, c = x.shape
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(n, h * w, num_groups, cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(n, h, w, c) * gamma.reshape(1, 1, 1, c) + beta.reshape(1, 1, 1, c)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# trainable wrapper: Pallas forward + analytic XLA backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def group_norm_relu_trainable(x, gamma, beta, num_groups=32, eps=1e-6,
                              relu=True, interpret=False):
    """``group_norm_relu`` with a custom VJP so the fused Pallas forward is
    usable in training (the kernel itself has no differentiation rule).
    The backward is the analytic GroupNorm gradient in plain XLA —
    numerically the same cotangents as differentiating
    :func:`xla_group_norm_relu` (pinned by
    ``tests/test_pallas_ops.py::test_group_norm_trainable_grads``)."""
    return group_norm_relu(x, gamma, beta, num_groups=num_groups, eps=eps,
                           relu=relu, interpret=interpret)


def _gn_trainable_fwd(x, gamma, beta, num_groups, eps, relu, interpret):
    out = group_norm_relu(x, gamma, beta, num_groups=num_groups, eps=eps,
                          relu=relu, interpret=interpret)
    # residuals: mean/rstd are recomputed in the backward (one cheap reduce
    # pass) instead of being saved — the Pallas kernel doesn't emit them
    return out, (x, gamma, out)


def _gn_trainable_bwd(num_groups, eps, relu, interpret, res, dy):
    x, gamma, out = res
    n, h, w, c = x.shape
    g, cg = num_groups, c // num_groups

    dyf = dy.astype(jnp.float32)
    if relu:
        # pre-ReLU zero crossings are measure-zero: mask on the saved output
        dyf = dyf * (out > 0).astype(jnp.float32)

    xf = x.astype(jnp.float32).reshape(n, h * w, g, cg)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd

    dyr = dyf.reshape(n, h * w, g, cg)
    dgamma = jnp.sum(dyr * xhat, axis=(0, 1)).reshape(c).astype(gamma.dtype)
    dbeta = jnp.sum(dyr, axis=(0, 1)).reshape(c).astype(gamma.dtype)

    dxhat = dyr * gamma.astype(jnp.float32).reshape(1, 1, g, cg)
    m1 = jnp.mean(dxhat, axis=(1, 3), keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=(1, 3), keepdims=True)
    dx = ((dxhat - m1 - xhat * m2) * rstd).reshape(n, h, w, c).astype(x.dtype)
    return dx, dgamma, dbeta


group_norm_relu_trainable.defvjp(_gn_trainable_fwd, _gn_trainable_bwd)

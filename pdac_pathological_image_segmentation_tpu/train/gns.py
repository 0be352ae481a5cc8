"""Gradient-noise-scale (GNS) measurement for data-parallel training.

The reference has no analog — its DDP loop never inspects gradient
statistics.  On TPU pods the GNS is the quantity that tells you whether
the next 2× of data parallelism will still buy ~2× faster convergence
(McCandlish et al., "An Empirical Model of Large-Batch Training", 2018):

    B_simple = tr(Σ) / |G|²

estimated from two gradient norms that data-parallel training computes
almost for free:

* ``|g_small|²`` — the mean of the **per-device** (per-shard) gradient
  squared-norms, i.e. gradients of batch ``b = B / n_dev``;
* ``|g_big|²``  — the squared norm of the **global** (psum-averaged)
  gradient of batch ``B``.

Both are biased estimates of ``|G|²`` with noise ``tr(Σ)/batch``; solving
the pair gives unbiased estimators (ibid., appendix A.1):

    S_est  = (|g_small|² − |g_big|²) / (1/b − 1/B)          (≈ tr(Σ))
    G2_est = (B·|g_big|² − b·|g_small|²) / (B − b)          (≈ |G|²)
    B_simple = S_est / G2_est

Implementation: the fused train step already computes per-device partial
gradients that XLA psums by construction (``train/steps.py``).  To read the
*pre-psum* shard norms without materializing per-device gradients at the
JAX level, ``make_gns_stats`` wraps the gradient function in ``shard_map``
over the data axis: each shard reduces its gradient to one scalar norm
in-kernel, so the only extra collectives are two scalar psums.

Because GNS is a diagnostic, it runs on a sampled cadence (config extra
``gns_every: N`` — every N-th step) as a *separate* jitted program over the
same donated state layout, not as a branch inside the hot step.

Single-estimate values are noisy (ibid. §A.2); :class:`GnsEma` keeps the
standard separate EMAs of S and G² and reports their ratio.

Caveat: the estimator's derivation assumes the loss is a *mean of
per-sample losses*.  The Dice objective is a batch-global ratio, so for
``dice``/``dice_ce`` the per-shard gradients are "batch-b Dice gradients"
rather than means of per-sample gradients — B_simple is then a consistent
scaling diagnostic (same quantity at every scale) but not exactly
tr(Σ)/|G|² of a per-sample decomposition.  The trend over training, which
is what batch-size decisions use, is unaffected.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pdac_pathological_image_segmentation_tpu.parallel.mesh import DATA_AXIS


class GnsStats(NamedTuple):
    """One step's raw pair of gradient norms + derived estimates."""
    g_small_sq: jax.Array   # E_dev |g_dev|²  (batch b gradients)
    g_big_sq: jax.Array     # |g_global|²     (batch B gradient)
    s_est: jax.Array        # ≈ tr(Σ)
    g2_est: jax.Array       # ≈ |G|²
    b_simple: jax.Array     # S / G²  (the gradient noise scale)


def _tree_sq_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.vdot(x.astype(jnp.float32), x.astype(jnp.float32)).real
               for x in leaves)


def make_gns_stats(grad_fn: Callable, mesh: Mesh, batch_size: int,
                   n_repl_args: int = 0):
    """Build ``stats(params, repl_args..., batch_args...) → GnsStats``.

    ``grad_fn(params, *repl_args, *batch_args) → grads`` must be a pure
    per-shard gradient function (NO psum inside — the wrapper owns the
    reductions); the first ``n_repl_args`` extra arguments are replicated
    (e.g. BatchNorm running stats), the rest lead with a batch axis sharded
    over ``mesh``'s data axis.  The same ``grad_fn`` under plain
    jit-with-sharded-inputs would compute exactly the psum-averaged
    gradient the train step uses, so the measured norms correspond to the
    real training gradients.
    """
    n_dev = mesh.devices.size
    if batch_size % n_dev:
        raise ValueError(
            f"batch {batch_size} must be divisible by {n_dev} devices")
    b_small = batch_size // n_dev
    b_big = batch_size

    @jax.jit
    def stats(params, *args) -> GnsStats:
        n_batch = len(args) - n_repl_args

        def shard_body(params, *args):
            g_local = grad_fn(params, *args)
            local_sq = _tree_sq_norm(g_local)
            # mean over shards of the per-shard (batch-b) norm²
            g_small_sq = jax.lax.pmean(local_sq, DATA_AXIS)
            # global batch-B gradient = mean of shard gradients
            g_mean = jax.tree_util.tree_map(
                lambda g: jax.lax.pmean(g, DATA_AXIS), g_local
            )
            g_big_sq = _tree_sq_norm(g_mean)
            return g_small_sq, g_big_sq

        in_specs = ((P(),) + (P(),) * n_repl_args
                    + (P(DATA_AXIS),) * n_batch)
        g_small_sq, g_big_sq = jax.shard_map(
            shard_body, mesh=mesh, in_specs=in_specs,
            out_specs=(P(), P()), check_vma=False,
        )(params, *args)

        if n_dev == 1:
            # degenerate: b == B, the pair carries no noise split — report
            # the raw norm and NaN estimates rather than a 0/0
            nan = jnp.float32(jnp.nan)
            return GnsStats(g_small_sq, g_big_sq, nan, nan, nan)

        s_est = (g_small_sq - g_big_sq) / (1.0 / b_small - 1.0 / b_big)
        g2_est = (b_big * g_big_sq - b_small * g_small_sq) / (b_big - b_small)
        b_simple = s_est / jnp.maximum(g2_est, 1e-30)
        return GnsStats(g_small_sq, g_big_sq, s_est, g2_est, b_simple)

    return stats


class GnsEma:
    """EMA smoothing of the (noisy) per-step estimates; tracks S and G²
    separately and reports their ratio (McCandlish §A.2)."""

    def __init__(self, alpha: float = 0.9) -> None:
        self.alpha = alpha
        self.s = None
        self.g2 = None

    def update(self, stats: GnsStats) -> float:
        s, g2 = float(stats.s_est), float(stats.g2_est)
        if not (s == s and g2 == g2):  # NaN guard (single-device mesh)
            return float("nan")
        self.s = s if self.s is None else self.alpha * self.s + (1 - self.alpha) * s
        self.g2 = g2 if self.g2 is None else self.alpha * self.g2 + (1 - self.alpha) * g2
        if self.g2 is None or self.g2 <= 0:
            return float("nan")
        return self.s / max(self.g2, 1e-30)

    def state_dict(self) -> dict:
        return {"alpha": self.alpha, "s": self.s, "g2": self.g2}

    def load_state_dict(self, d: dict) -> None:
        self.alpha = d["alpha"]
        self.s = d["s"]
        self.g2 = d["g2"]

"""Gradient-noise-scale estimator (train/gns.py).

Pins the McCandlish B_simple estimator on a model where every quantity is
known in closed form: a linear least-squares loss whose per-sample
gradients are iid with analytically-known mean and covariance trace, so
S_est ≈ tr(Σ) and G2_est ≈ |G|² are checkable against ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdac_pathological_image_segmentation_tpu.parallel.mesh import create_mesh
from pdac_pathological_image_segmentation_tpu.train.gns import (
    GnsEma,
    GnsStats,
    make_gns_stats,
)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(8)


def _linear_grad_fn(params, x, y):
    # per-shard mean-squared-error gradient — the mean over the SHARD, so
    # the wrapper's pmean of shard grads equals the global-batch gradient
    def loss(w):
        pred = x @ w
        return jnp.mean((pred - y) ** 2)

    return {"w": jax.grad(lambda w: loss(w))(params["w"])}


def test_estimator_recovers_known_noise(mesh):
    # data model: x ~ N(0, I_d), y = x·w* + eps.  At w=w0 the per-sample
    # gradient is 2(x·(w0-w*) - eps)x with computable mean/trace; we check
    # the estimator against empirical per-sample statistics instead of the
    # closed form to avoid finite-batch bias in the comparison itself.
    d, B = 16, 512
    rng = np.random.default_rng(0)
    w_star = rng.normal(size=(d,))
    w0 = w_star + 0.5 * rng.normal(size=(d,))
    x = rng.normal(size=(B, d)).astype(np.float32)
    eps = rng.normal(size=(B,)).astype(np.float32)
    y = (x @ w_star + eps).astype(np.float32)

    params = {"w": jnp.asarray(w0, jnp.float32)}
    stats_fn = make_gns_stats(_linear_grad_fn, mesh, B)
    stats = stats_fn(params, jnp.asarray(x), jnp.asarray(y))
    assert isinstance(stats, GnsStats)

    # empirical per-sample gradients: g_i = 2(x_i·w0 - y_i) x_i
    resid = x @ w0 - y
    g_i = 2.0 * resid[:, None] * x  # (B, d)
    G = g_i.mean(0)
    Sigma_tr = g_i.var(0, ddof=1).sum()

    # the pair of norms the estimator consumed
    b = B // mesh.devices.size
    shard_means = g_i.reshape(mesh.devices.size, b, d).mean(1)
    exp_small = float((shard_means ** 2).sum(1).mean())
    exp_big = float((G ** 2).sum())
    np.testing.assert_allclose(float(stats.g_small_sq), exp_small, rtol=1e-4)
    np.testing.assert_allclose(float(stats.g_big_sq), exp_big, rtol=1e-4)

    # derived estimates: unbiased up to sampling noise — generous tolerance
    assert float(stats.s_est) == pytest.approx(float(Sigma_tr), rel=0.3)
    assert float(stats.g2_est) == pytest.approx(float((G ** 2).sum()), rel=0.3)
    assert float(stats.b_simple) > 0


def test_zero_noise_gradients_give_zero_s(mesh):
    # identical samples on every shard → per-shard grads identical →
    # g_small_sq == g_big_sq → S ≈ 0 and B_simple ≈ 0
    d, B = 8, 64
    x = np.tile(np.linspace(-1, 1, d, dtype=np.float32)[None, :], (B, 1))
    y = np.ones((B,), np.float32)
    params = {"w": jnp.zeros((d,), jnp.float32)}
    stats = make_gns_stats(_linear_grad_fn, mesh, B)(
        params, jnp.asarray(x), jnp.asarray(y)
    )
    np.testing.assert_allclose(
        float(stats.g_small_sq), float(stats.g_big_sq), rtol=1e-5
    )
    assert abs(float(stats.s_est)) < 1e-3 * max(float(stats.g2_est), 1.0)


def test_replicated_args_pass_through(mesh):
    # n_repl_args routes a replicated argument (e.g. batch_stats) unsharded
    d, B = 4, 32
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, d)).astype(np.float32)
    y = rng.normal(size=(B,)).astype(np.float32)
    scale = jnp.float32(3.0)

    def grad_fn(params, scale, x, y):
        def loss(w):
            return jnp.mean((scale * (x @ w) - y) ** 2)

        return {"w": jax.grad(loss)(params["w"])}

    params = {"w": jnp.ones((d,), jnp.float32)}
    stats = make_gns_stats(grad_fn, mesh, B, n_repl_args=1)(
        params, scale, jnp.asarray(x), jnp.asarray(y)
    )
    assert np.isfinite(float(stats.g_big_sq))


def test_ema_tracks_ratio():
    ema = GnsEma(alpha=0.5)
    mk = lambda s, g2: GnsStats(
        np.float32(0), np.float32(0), np.float32(s), np.float32(g2),
        np.float32(s / g2),
    )
    v1 = ema.update(mk(10.0, 2.0))
    assert v1 == pytest.approx(5.0)
    v2 = ema.update(mk(20.0, 2.0))
    assert v2 == pytest.approx((0.5 * 10 + 0.5 * 20) / 2.0)
    # NaN stats (single-device mesh) leave the EMA untouched
    nan_stats = GnsStats(*([np.float32("nan")] * 5))
    assert np.isnan(ema.update(nan_stats))
    assert ema.s == pytest.approx(15.0)
    # round-trip
    d = ema.state_dict()
    ema2 = GnsEma()
    ema2.load_state_dict(d)
    assert ema2.s == ema.s and ema2.g2 == ema.g2


@pytest.mark.slow
def test_trainer_logs_gns(tmp_path):
    # end-to-end: gns_every=1 produces a Diagnostics/GNS scalar row
    from pdac_pathological_image_segmentation_tpu.config import Config
    from pdac_pathological_image_segmentation_tpu.data.discovery import (
        discover_split,
    )
    from pdac_pathological_image_segmentation_tpu.data.loader import (
        PatchDataset,
    )
    from pdac_pathological_image_segmentation_tpu.data.synthetic import (
        generate_synthetic_patches,
    )
    from pdac_pathological_image_segmentation_tpu.train.loop import Trainer

    root = tmp_path / "data"
    generate_synthetic_patches(str(root / "train"), n=16, size=32, seed=0)
    generate_synthetic_patches(str(root / "val"), n=8, size=32, seed=1)
    cfg = Config(
        model="unet", backbone="resnet18", img_size=32, batch_size=8,
        epochs=1, lr=1e-4, seed=0, num_worker=0,
        train_path=str(root / "train"), val_path=str(root / "val"),
        compute_dtype="float32",
        extras={"gns_every": 1, "augment": False},
    )
    out = tmp_path / "out"
    train_set = PatchDataset(*discover_split(cfg.train_path), cfg)
    val_set = PatchDataset(*discover_split(cfg.val_path), cfg)
    tr = Trainer(cfg, str(out), train_set, val_set)
    tr.train()
    scalars = (out / "log_dir" / "scalars.csv").read_text()
    assert "Diagnostics/GNS" in scalars

import jax.numpy as jnp
import numpy as np

from pdac_pathological_image_segmentation_tpu.ops.stain import (
    REFERENCE_MAX_CONC,
    REFERENCE_STAIN_BASIS,
    StainBasis,
    lab_stats,
    macenko_normalize,
    macenko_stain_matrix,
    reinhard_normalize,
)


def _synthetic_he(rng, n=4096, basis=None, max_c=(1.5, 0.9)):
    """Pixels generated from a known H&E stain basis via Beer-Lambert."""
    basis = REFERENCE_STAIN_BASIS if basis is None else basis
    conc = rng.uniform(0.05, 1.0, size=(2, n)) * np.asarray(max_c)[:, None]
    od = np.asarray(basis) @ conc
    rgb = np.power(10.0, -od).T  # (n, 3)
    return jnp.asarray(rgb.reshape(64, 64, 3), jnp.float32)


def test_reinhard_matches_target_stats():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(0.2, 0.9, (64, 64, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0.3, 0.8, (64, 64, 3)), jnp.float32)
    target_stats = lab_stats(tgt)
    out = reinhard_normalize(src, target_stats)
    out_stats = lab_stats(out)
    np.testing.assert_allclose(np.asarray(out_stats.mean),
                               np.asarray(target_stats.mean), atol=0.05)
    np.testing.assert_allclose(np.asarray(out_stats.std),
                               np.asarray(target_stats.std), atol=0.08)
    assert out.shape == src.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_macenko_recovers_known_basis():
    rng = np.random.default_rng(1)
    img = _synthetic_he(rng)
    est = macenko_stain_matrix(img, beta_mask=False)
    ref = np.asarray(REFERENCE_STAIN_BASIS)
    got = np.asarray(est.basis)
    # column order fixed by the hematoxylin-first convention; compare up to
    # small angular error
    for c in range(2):
        cos = abs(float(got[:, c] @ ref[:, c]))
        assert cos > 0.98, f"stain column {c}: cos={cos}"


def test_macenko_normalize_identity_when_source_is_reference():
    rng = np.random.default_rng(2)
    img = _synthetic_he(rng)
    src = StainBasis(REFERENCE_STAIN_BASIS, REFERENCE_MAX_CONC)
    out = macenko_normalize(img, src)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_macenko_beta_mask_with_background_pixels():
    """Regression: background pixels (norm(OD) <= beta — present in
    virtually every real H&E tile) are NaN-ed out of the angle percentiles;
    plain percentile would propagate them and poison the whole basis."""
    rng = np.random.default_rng(7)
    img = np.array(_synthetic_he(rng))
    # paste in a white-ish background region (low optical density)
    img[:16] = rng.uniform(0.97, 1.0, size=(16, 64, 3))
    img = jnp.asarray(img, jnp.float32)
    est = macenko_stain_matrix(img, beta_mask=True)
    assert np.isfinite(np.asarray(est.basis)).all()
    assert np.isfinite(np.asarray(est.max_conc)).all()
    ref = np.asarray(REFERENCE_STAIN_BASIS)
    got = np.asarray(est.basis)
    for c in range(2):
        cos = abs(float(got[:, c] @ ref[:, c]))
        assert cos > 0.97, f"stain column {c}: cos={cos}"
    out = macenko_normalize(img, est)
    assert np.isfinite(np.asarray(out)).all()


def test_macenko_normalize_maps_shifted_stain_to_reference():
    rng = np.random.default_rng(3)
    # a "different scanner": perturbed basis
    pert = np.asarray(REFERENCE_STAIN_BASIS) + rng.normal(0, 0.05, (3, 2))
    pert = np.abs(pert)
    pert /= np.linalg.norm(pert, axis=0, keepdims=True)
    img = _synthetic_he(rng, basis=pert)
    est = macenko_stain_matrix(img, beta_mask=False)
    out = macenko_normalize(img, est)
    # after normalization, the re-estimated basis should be near reference
    est2 = macenko_stain_matrix(out, beta_mask=False)
    ref = np.asarray(REFERENCE_STAIN_BASIS)
    got = np.asarray(est2.basis)
    for c in range(2):
        assert abs(float(got[:, c] @ ref[:, c])) > 0.97

"""Spherical-harmonic transform tests: quadrature, roundtrip, isotropy."""

import jax
import jax.numpy as jnp
import numpy as np

from graph_weather_tpu.ops.sht import (
    generate_isotropic_noise,
    isht,
    legendre_gauss_weights,
    power_spectrum,
    sht,
)


def test_fejer_quadrature_exact():
    theta, w = legendre_gauss_weights(32)
    x = np.cos(theta)
    assert abs(w.sum() - 2.0) < 1e-12  # integral of 1
    assert abs((w * x**2).sum() - 2.0 / 3.0) < 1e-12
    assert abs((w * x**10).sum() - 2.0 / 11.0) < 1e-12


def test_sht_isht_roundtrip():
    lmax = mmax = 16
    nlat, nlon = 32, 64
    rng = np.random.default_rng(0)
    tri = np.tril(np.ones((lmax, mmax), np.float32))
    cc = jnp.asarray(rng.normal(size=(2, lmax, mmax)).astype(np.float32) * tri)
    cs = jnp.asarray(
        rng.normal(size=(2, lmax, mmax)).astype(np.float32)
        * tri
        * (np.arange(mmax) > 0)
    )
    field = isht(cc, cs, nlat, nlon)
    cc2, cs2 = sht(field, lmax, mmax)
    np.testing.assert_allclose(np.asarray(cc2), np.asarray(cc), atol=2e-5)
    np.testing.assert_allclose(np.asarray(cs2), np.asarray(cs), atol=2e-5)


def test_parseval_power():
    """Orthonormality: mean square of field == total power / (4 pi)."""
    lmax = mmax = 8
    nlat, nlon = 32, 64
    rng = np.random.default_rng(1)
    tri = np.tril(np.ones((lmax, mmax), np.float32))
    cc = jnp.asarray(rng.normal(size=(lmax, mmax)).astype(np.float32) * tri)
    cs = jnp.asarray(
        rng.normal(size=(lmax, mmax)).astype(np.float32) * tri * (np.arange(mmax) > 0)
    )
    field = np.asarray(isht(cc, cs, nlat, nlon))
    _, w = legendre_gauss_weights(nlat)
    mean_sq = (np.mean(field**2, axis=1) @ w) / w.sum()
    total_power = float(power_spectrum(cc, cs).sum())
    np.testing.assert_allclose(mean_sq, total_power / (4 * np.pi), rtol=1e-4)


def test_isotropic_noise_unit_variance_uniform():
    noise = np.asarray(
        generate_isotropic_noise(jax.random.PRNGKey(0), 128, 64, num_samples=16)
    )
    assert noise.shape == (128, 64, 16)
    # variance ~1 everywhere, including poles (non-isotropic would blow up there)
    assert abs(np.var(noise) - 1.0) < 0.05
    assert abs(np.var(noise[:, :4]) - 1.0) < 0.15
    assert abs(np.var(noise[:, 30:34]) - 1.0) < 0.15


def test_isotropic_noise_grid_constraint():
    import pytest

    with pytest.raises(ValueError):
        generate_isotropic_noise(jax.random.PRNGKey(0), 100, 64)
    # 2N x (N+1) accepted
    out = generate_isotropic_noise(jax.random.PRNGKey(0), 64, 33)
    assert out.shape == (64, 33, 1)


def test_isotropic_noise_np_matches_jax_statistics():
    """The host-side NumPy twin (used by dataset workers) has the same
    construction: unit pointwise variance everywhere, same grid rules."""
    import pytest

    from graph_weather_tpu.ops.sht import generate_isotropic_noise_np

    rng = np.random.default_rng(0)
    noise = generate_isotropic_noise_np(rng, 128, 64, num_samples=16)
    assert noise.shape == (128, 64, 16) and noise.dtype == np.float32
    assert abs(np.var(noise) - 1.0) < 0.05
    assert abs(np.var(noise[:, :4]) - 1.0) < 0.15  # poles included
    with pytest.raises(ValueError):
        generate_isotropic_noise_np(rng, 100, 64)
    assert generate_isotropic_noise_np(rng, 64, 33).shape == (64, 33, 1)
    flat = generate_isotropic_noise_np(rng, 100, 64, isotropic=False)
    assert flat.shape == (100, 64, 1)

"""Spherical harmonic transforms as batched Legendre matmuls.

TPU-native replacement for torch_harmonics' RealSHT/InverseRealSHT (used by
the reference for isotropic diffusion noise, models/gencast/utils/noise.py:
9-51, and the AMSE spectral loss, models/losses.py:98-195). The associated
Legendre tables are precomputed on the host once per (grid, lmax); analysis
and synthesis are then pure einsums — exactly the shape of computation the
MXU is built for.

Conventions: orthonormal REAL spherical harmonics
    Y_{l0} = Nbar_{l0} P_l(cos th)
    Y_{lm}^c = sqrt(2) Nbar_{lm} P_l^m(cos th) cos(m ph),  m >= 1
    Y_{lm}^s = sqrt(2) Nbar_{lm} P_l^m(cos th) sin(m ph),  m >= 1
with int |Y|^2 dOmega = 1. Coefficients are packed as complex c_lm with
c_l0 real and c_lm = (a_lm - i b_lm)/sqrt(2) so Parseval holds:
sum |c|^2 (m=0) + 2 sum |c|^2 (m>0) = integral of x^2 / (4 pi) ... (power
utilities below handle the weighting).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def legendre_gauss_weights(nlat: int) -> tuple[np.ndarray, np.ndarray]:
    """Cell-center colatitudes theta_j = pi (j + 1/2)/nlat and Fejer-1 weights.

    cos(theta_j) are first-kind Chebyshev nodes, so Fejer's first quadrature
    rule integrates int_{-1}^{1} f(x) dx = int_0^pi f(cos th) sin th dth
    exactly for polynomials f up to degree nlat - 1 — sufficient for SH
    analysis at lmax <= nlat.
    """
    theta = np.pi * (np.arange(nlat) + 0.5) / nlat
    k = np.arange(1, nlat // 2 + 1)
    w = (2.0 / nlat) * (
        1.0
        - 2.0
        * np.sum(
            np.cos(2.0 * k[None, :] * theta[:, None]) / (4.0 * k[None, :] ** 2 - 1.0),
            axis=1,
        )
    )
    return theta, w


def _legendre_table(lmax: int, mmax: int, cos_theta: np.ndarray) -> np.ndarray:
    """Orthonormalized associated Legendre Nbar_lm P_l^m at given points.

    Returns [mmax, lmax, n_theta] (zero where m > l). Uses the standard
    stable recurrence on the fully normalized functions.
    """
    x = np.asarray(cos_theta, dtype=np.float64)
    n = x.shape[0]
    sin_theta = np.sqrt(np.maximum(1.0 - x * x, 0.0))
    table = np.zeros((mmax, lmax, n), dtype=np.float64)

    # P̄_mm via recurrence: P̄_00 = 1/sqrt(4π);
    # P̄_mm = -sqrt((2m+1)/(2m)) sinθ P̄_{m-1,m-1}  (Condon-Shortley phase)
    pmm = np.full(n, 1.0 / np.sqrt(4.0 * np.pi))
    for m in range(mmax):
        if m > 0:
            pmm = -np.sqrt((2.0 * m + 1.0) / (2.0 * m)) * sin_theta * pmm
        if m < lmax:
            table[m, m] = pmm
        # P̄_{m+1,m} = sqrt(2m+3) x P̄_mm
        if m + 1 < lmax:
            table[m, m + 1] = np.sqrt(2.0 * m + 3.0) * x * pmm
        for ell in range(m + 2, lmax):
            a = np.sqrt(
                (4.0 * ell * ell - 1.0) / (ell * ell - m * m)
            )
            b = np.sqrt(
                ((ell - 1.0) ** 2 - m * m) / (4.0 * (ell - 1.0) ** 2 - 1.0)
            )
            table[m, ell] = a * (x * table[m, ell - 1] - b * table[m, ell - 2])
    return table


@lru_cache(maxsize=8)
def _synthesis_tables(nlat: int, nlon: int, lmax: int, mmax: int):
    theta = np.pi * (np.arange(nlat) + 0.5) / nlat
    leg = _legendre_table(lmax, mmax, np.cos(theta))  # [mmax, lmax, nlat]
    phi = 2.0 * np.pi * np.arange(nlon) / nlon
    m = np.arange(mmax)
    cosmphi = np.cos(m[:, None] * phi[None, :])  # [mmax, nlon]
    sinmphi = np.sin(m[:, None] * phi[None, :])
    # NOTE: cached as NumPy — converting to jnp inside a traced function
    # and caching would leak tracers across jit traces.
    return (
        leg.astype(np.float32),
        cosmphi.astype(np.float32),
        sinmphi.astype(np.float32),
    )


@lru_cache(maxsize=8)
def _analysis_tables(nlat: int, nlon: int, lmax: int, mmax: int):
    theta, w = legendre_gauss_weights(nlat)
    leg = _legendre_table(lmax, mmax, np.cos(theta))  # [mmax, lmax, nlat]
    leg_w = leg * w[None, None, :]  # fold quadrature weights in
    phi = 2.0 * np.pi * np.arange(nlon) / nlon
    m = np.arange(mmax)
    cosmphi = np.cos(m[:, None] * phi[None, :])
    sinmphi = np.sin(m[:, None] * phi[None, :])
    return (
        leg_w.astype(np.float32),
        cosmphi.astype(np.float32),
        sinmphi.astype(np.float32),
    )


def isht(
    coeffs_cos: jnp.ndarray,
    coeffs_sin: jnp.ndarray,
    nlat: int,
    nlon: int,
) -> jnp.ndarray:
    """Real SH synthesis: coefficient arrays -> [..., nlat, nlon] field.

    Args:
        coeffs_cos: [..., lmax, mmax] coefficients of the cos(m phi) (and
            m=0) orthonormal harmonics.
        coeffs_sin: [..., lmax, mmax] coefficients of the sin(m phi)
            harmonics (column m=0 ignored).
    """
    lmax, mmax = coeffs_cos.shape[-2], coeffs_cos.shape[-1]
    leg, cosmphi, sinmphi = _synthesis_tables(nlat, nlon, lmax, mmax)
    # f_m(theta): [..., mmax, nlat]
    gc = jnp.einsum("...lm,mlt->...mt", coeffs_cos, leg)
    gs = jnp.einsum("...lm,mlt->...mt", coeffs_sin, leg)
    sqrt2 = jnp.sqrt(jnp.asarray(2.0, gc.dtype))
    scale = jnp.concatenate(
        [jnp.ones((1,), gc.dtype), jnp.full((mmax - 1,), sqrt2)]
    )
    field = jnp.einsum("...mt,mp,m->...tp", gc, cosmphi, scale)
    field += jnp.einsum("...mt,mp,m->...tp", gs, sinmphi, scale * (jnp.arange(mmax) > 0))
    return field


def sht(field: jnp.ndarray, lmax: int, mmax: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real SH analysis: [..., nlat, nlon] -> (coeffs_cos, coeffs_sin).

    Inverse of `isht` for band-limited fields (lmax <= nlat, mmax <= nlon/2).
    """
    nlat, nlon = field.shape[-2], field.shape[-1]
    leg_w, cosmphi, sinmphi = _analysis_tables(nlat, nlon, lmax, mmax)
    # Longitude integrals (FFT-like projections): [..., mmax, nlat]
    dphi = 2.0 * np.pi / nlon
    fc = jnp.einsum("...tp,mp->...mt", field, cosmphi) * dphi
    fs = jnp.einsum("...tp,mp->...mt", field, sinmphi) * dphi
    sqrt2 = jnp.sqrt(jnp.asarray(2.0, field.dtype))
    m = jnp.arange(mmax)
    scale = jnp.where(m == 0, 1.0, sqrt2)
    coeffs_cos = jnp.einsum("...mt,mlt,m->...lm", fc, leg_w, scale)
    coeffs_sin = jnp.einsum("...mt,mlt,m->...lm", fs, leg_w, scale * (m > 0))
    return coeffs_cos, coeffs_sin


def power_spectrum(coeffs_cos: jnp.ndarray, coeffs_sin: jnp.ndarray) -> jnp.ndarray:
    """Per-degree power: [..., lmax] = sum over m of squared coefficients."""
    return (coeffs_cos**2).sum(-1) + (coeffs_sin**2).sum(-1)


def _noise_lmax(num_lon: int, num_lat: int) -> int:
    if 2 * num_lat == num_lon:
        return num_lat
    if 2 * (num_lat - 1) == num_lon:
        return num_lat - 1
    raise ValueError(
        "Isotropic noise requires grid's shape to be 2N x N or 2N x (N+1): "
        f"got {num_lon} x {num_lat}. Pass isotropic=False otherwise."
    )


def generate_isotropic_noise_np(
    rng: np.random.Generator,
    num_lon: int,
    num_lat: int,
    num_samples: int = 1,
    isotropic: bool = True,
) -> np.ndarray:
    """Host-side NumPy twin of `generate_isotropic_noise`.

    Data pipelines must stay off-device: in the axon environment every
    jnp op in a dataset worker is a remote-TPU round trip (eager dispatch
    compiles per op), which made per-item noise generation take seconds.
    Same construction (iid N(0, 4 pi / lmax^2) coefficients over
    orthonormal real harmonics); only the RNG stream differs.
    """
    if not isotropic:
        return rng.standard_normal((num_lon, num_lat, num_samples)).astype(
            np.float32
        )
    lmax = _noise_lmax(num_lon, num_lat)
    mmax = lmax
    sigma = np.sqrt(4.0 * np.pi) / lmax
    tri = np.tril(np.ones((lmax, mmax), np.float32))
    cc = rng.standard_normal((num_samples, lmax, mmax)).astype(np.float32) * sigma * tri
    cs = rng.standard_normal((num_samples, lmax, mmax)).astype(np.float32) * sigma * tri
    leg, cosmphi, sinmphi = _synthesis_tables(num_lat, num_lon, lmax, mmax)
    gc = np.einsum("slm,mlt->smt", cc, leg, optimize=True)
    gs = np.einsum("slm,mlt->smt", cs, leg, optimize=True)
    scale = np.concatenate(
        [np.ones((1,), np.float32), np.full((mmax - 1,), np.sqrt(2.0, dtype=np.float32))]
    )
    field = np.einsum("smt,mp,m->stp", gc, cosmphi, scale, optimize=True)
    field += np.einsum(
        "smt,mp,m->stp", gs, sinmphi, scale * (np.arange(mmax) > 0), optimize=True
    )
    return np.transpose(field, (2, 1, 0)).astype(np.float32)  # [lon, lat, S]


def generate_isotropic_noise(
    key, num_lon: int, num_lat: int, num_samples: int = 1, isotropic: bool = True
) -> jnp.ndarray:
    """Unit-variance noise field [num_lon, num_lat, num_samples].

    Isotropic: white spectrum over orthonormal real harmonics up to
    lmax = num_lat (statistically rotation-invariant by construction; the
    reference gets the same property via torch_harmonics' ISHT,
    models/gencast/utils/noise.py:9-51). Coefficients are iid
    N(0, 4 pi / lmax^2), which by the addition theorem gives pointwise
    variance sum_l (2l+1)/lmax^2 = 1 exactly.

    Matches the reference's grid constraint (2N x N or 2N x (N+1)).
    """
    import jax

    if not isotropic:
        return jax.random.normal(key, (num_lon, num_lat, num_samples))
    if 2 * num_lat == num_lon:
        lmax = num_lat
    elif 2 * (num_lat - 1) == num_lon:
        lmax = num_lat - 1
    else:
        raise ValueError(
            "Isotropic noise requires grid's shape to be 2N x N or 2N x (N+1): "
            f"got {num_lon} x {num_lat}. Pass isotropic=False otherwise."
        )
    mmax = lmax
    kc, ks = jax.random.split(key)
    sigma = jnp.sqrt(4.0 * jnp.pi) / lmax
    tri = jnp.tril(jnp.ones((lmax, mmax)))  # only m <= l modes
    coeffs_cos = jax.random.normal(kc, (num_samples, lmax, mmax)) * sigma * tri
    coeffs_sin = jax.random.normal(ks, (num_samples, lmax, mmax)) * sigma * tri
    field = isht(coeffs_cos, coeffs_sin, num_lat, num_lon)  # [S, nlat, nlon]
    return jnp.transpose(field, (2, 1, 0))  # [lon, lat, samples]

"""GenCast diffusion sampler: DPMSolver++2S with stochastic churn.

Equivalent of reference models/gencast/sampler.py:11-130 (Karras Alg. 2
churn/inflation + Lu et al. DPMSolver++2S midpoint steps, final Euler step),
but the whole num_steps trajectory runs inside ONE jitted `lax.scan` — per-
step noise comes from the on-device isotropic SHT generator instead of host
numpy, so autoregressive rollouts never leave the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from graph_weather_tpu.ops.sht import generate_isotropic_noise


class Sampler:
    """Sampler over a Denoiser handle."""

    def __init__(
        self,
        S_noise: float = 1.05,
        S_tmin: float = 0.75,
        S_tmax: float = 80.0,
        S_churn: float = 2.5,
        r: float = 0.5,
        sigma_max: float = 80.0,
        sigma_min: float = 0.03,
        rho: float = 7,
        num_steps: int = 20,
    ):
        self.S_noise = S_noise
        self.S_tmin = S_tmin
        self.S_tmax = S_tmax
        self.S_churn = S_churn
        self.r = r
        self.sigma_max = sigma_max
        self.sigma_min = sigma_min
        self.rho = rho
        self.num_steps = num_steps

    def sigmas(self) -> jnp.ndarray:
        u = jnp.arange(self.num_steps) / (self.num_steps - 1)
        return (
            self.sigma_max ** (1 / self.rho)
            + u * (self.sigma_min ** (1 / self.rho) - self.sigma_max ** (1 / self.rho))
        ) ** self.rho

    def _noise(self, key, denoiser, batch: int) -> jnp.ndarray:
        # [lon, lat, F] -> [B, lon, lat, F] (independent per batch element)
        keys = jax.random.split(key, batch)

        def one(k):
            return generate_isotropic_noise(
                k,
                num_lon=denoiser.num_lon,
                num_lat=denoiser.num_lat,
                num_samples=denoiser.output_features_dim,
            )

        return jax.vmap(one)(keys)

    def _make_traj(self, denoiser, compute_dtype=None):
        """Shared DPMSolver++2S trajectory over EXPLICIT per-step noise.

        Returns traj(params, prev_inputs, init_noise, churn_noises) where
        init_noise is [B, lon, lat, F] and churn_noises is
        [num_steps-1, B, lon, lat, F] (one per solver iteration, pre-scaled
        by nothing — S_noise inflation is applied here). Both the key-driven
        `sample_fn` and the injected-noise parity path (`sample_fn_injected`)
        run this exact function, so testing the injected path tests the
        production solver math."""
        fwd = denoiser.forward_fn(compute_dtype=compute_dtype)
        sigmas = self.sigmas()
        gamma_const = min(self.S_churn / self.num_steps, 2**0.5 - 1)

        def traj(params, prev_inputs, init_noise, churn_noises):
            batch = prev_inputs.shape[0]
            x = sigmas[0] * init_noise
            ones = jnp.ones((batch, 1))

            def churn(x, noise, sigma_i):
                gamma = jnp.where(
                    (self.S_tmin <= sigma_i) & (sigma_i <= self.S_tmax),
                    gamma_const,
                    0.0,
                )
                sigma_hat = sigma_i * (gamma + 1.0)
                x = x + jnp.sqrt(
                    jnp.maximum(sigma_hat**2 - sigma_i**2, 0.0)
                ) * (self.S_noise * noise)
                return x, sigma_hat

            def step(carry, inp):
                # DPMSolver++2S midpoint step (all but the last iteration).
                i, noise = inp
                (x,) = carry
                x, sigma_hat = churn(x, noise, sigmas[i])
                sigma_next = sigmas[i + 1]
                denoised = fwd(params, x, prev_inputs, sigma_hat * ones)

                lambda_hat = -jnp.log(sigma_hat)
                lambda_next = -jnp.log(sigma_next)
                h = lambda_next - lambda_hat
                lambda_mid = lambda_hat + self.r * h
                sigma_mid = jnp.exp(-lambda_mid)
                u = sigma_mid / sigma_hat * x - (jnp.exp(-self.r * h) - 1.0) * denoised
                denoised_2 = fwd(params, u, prev_inputs, sigma_mid * ones)
                D = (1.0 - 1.0 / (2.0 * self.r)) * denoised + denoised_2 / (2.0 * self.r)
                x = sigma_next / sigma_hat * x - (jnp.exp(-h) - 1.0) * D
                return (x,), None

            if self.num_steps > 2:
                (x,), _ = jax.lax.scan(
                    step,
                    (x,),
                    (jnp.arange(self.num_steps - 2),
                     churn_noises[: self.num_steps - 2]),
                )
            # Final iteration is a single-eval Euler step — unrolled outside
            # the scan so the midpoint denoiser eval is never computed
            # (matches the reference's 2(N-2)+1 eval count,
            # reference models/gencast/sampler.py:90-128).
            x, sigma_hat = churn(
                x, churn_noises[self.num_steps - 2], sigmas[self.num_steps - 2]
            )
            denoised = fwd(params, x, prev_inputs, sigma_hat * ones)
            d = (x - denoised) / sigma_hat
            x = x + d * (sigmas[self.num_steps - 1] - sigma_hat)
            return x

        return traj

    def sample_fn(self, denoiser, compute_dtype=None):
        """Pure jittable (params, key, prev_inputs) -> residual sample fn.

        compute_dtype=jnp.bfloat16 runs each denoiser evaluation in bf16
        (solver math — sigmas, Euler/DPM updates — stays f32)."""
        traj = self._make_traj(denoiser, compute_dtype=compute_dtype)

        def fn(params, key, prev_inputs):
            batch = prev_inputs.shape[0]
            keys = jax.random.split(key, self.num_steps)
            init_noise = self._noise(keys[0], denoiser, batch)
            churn_noises = jax.vmap(
                lambda k: self._noise(k, denoiser, batch)
            )(keys[1:])
            return traj(params, prev_inputs, init_noise, churn_noises)

        return fn

    def sample_fn_injected(self, denoiser, compute_dtype=None):
        """(params, prev_inputs, init_noise, churn_noises) -> sample, with
        the per-step isotropic noise passed EXPLICITLY (un-inflated; the
        S_noise factor is applied inside). Runs the same trajectory as
        `sample_fn` — used for reference-trajectory parity (injecting the
        reference run's noise draws) and reproducible re-sampling."""
        return self._make_traj(denoiser, compute_dtype=compute_dtype)

    def sample(self, denoiser, params, prev_inputs, key=None, compute_dtype=None):
        """Generate one residual sample conditioned on the previous 2 steps.

        The jitted sampler program is cached per denoiser (params are a
        traced argument, not baked-in constants), so repeated sampling —
        e.g. an autoregressive rollout — compiles once.

        Args:
            denoiser: Denoiser handle.
            params: denoiser parameters.
            prev_inputs: [B, lon, lat, 2 F_in].
            key: jax PRNG key (defaults to PRNGKey(0)).
            compute_dtype: optional dtype (e.g. jnp.bfloat16) for the
                denoiser network evaluations; solver math stays f32.
        """
        key = key if key is not None else jax.random.PRNGKey(0)
        cache_key = (id(denoiser), jnp.dtype(compute_dtype).name if compute_dtype else None)
        if not hasattr(self, "_jit_cache"):
            self._jit_cache = {}
        if cache_key not in self._jit_cache:
            # Keep a strong reference to the denoiser alongside the jitted
            # program: the cache is keyed on id(), and a garbage-collected
            # denoiser's id could be recycled by a new instance, aliasing a
            # program compiled against the old model's graphs.
            self._jit_cache[cache_key] = (
                denoiser,
                jax.jit(self.sample_fn(denoiser, compute_dtype=compute_dtype)),
            )
        return self._jit_cache[cache_key][1](params, key, prev_inputs)

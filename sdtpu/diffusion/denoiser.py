"""Denoiser formulations: sigma spaces, model-output scalings, noise scaling.

Behavioral parity with the reference denoisers (src/runtime/denoiser.hpp:1008-
1418): CompVis eps/v prediction on the DDPM sigma table, EDM-v, discrete flow
(SD3) with SNR time-shift, Flux flow shift, MiniT2I linear flow.  All tables
are precomputed host-side in numpy; the sampling loop consumes plain float
arrays, so everything downstream stays jit-friendly.
"""
from __future__ import annotations

import numpy as np

TIMESTEPS = 1000


def compvis_alphas_cumprod(
    beta_start: float = 0.00085, beta_end: float = 0.012, n: int = TIMESTEPS
) -> np.ndarray:
    """DDPM ᾱ table with the CompVis sqrt-linear beta schedule."""
    i = np.arange(n, dtype=np.float32)
    betas = (
        np.sqrt(np.float32(beta_start))
        + (np.sqrt(np.float32(beta_end)) - np.sqrt(np.float32(beta_start))) * (i / (n - 1))
    ) ** 2
    return np.cumprod(1.0 - betas.astype(np.float64))


class Denoiser:
    """Base: maps model raw output to denoised x0 via
    denoised = c_skip*x + c_out*model(c_in*x, t)."""

    prediction = "eps"
    is_flow = False

    def sigma_min(self) -> float:
        raise NotImplementedError

    def sigma_max(self) -> float:
        raise NotImplementedError

    def sigma_to_t(self, sigma):
        raise NotImplementedError

    def t_to_sigma(self, t):
        raise NotImplementedError

    def get_scalings(self, sigma: np.ndarray):
        """→ (c_skip, c_out, c_in) arrays matching sigma's shape."""
        raise NotImplementedError

    def noise_scaling(self, sigma, noise, latent):
        """Initial noising of a (possibly zero) latent at level sigma."""
        raise NotImplementedError

    def inverse_noise_scaling(self, sigma, latent):
        return latent

    def noise_level_to_sigma(self, noise_level: float) -> float:
        raise NotImplementedError


class CompVisDenoiser(Denoiser):
    """eps-prediction on the DDPM table (SD1.x/2.x-eps, SDXL)."""

    prediction = "eps"

    def __init__(self):
        ac = compvis_alphas_cumprod()
        self.sigmas = np.sqrt((1.0 - ac) / ac).astype(np.float32)
        self.log_sigmas = np.log(self.sigmas)
        self.sigma_data = 1.0

    def sigma_min(self) -> float:
        return float(self.sigmas[0])

    def sigma_max(self) -> float:
        return float(self.sigmas[-1])

    def sigma_to_t(self, sigma):
        log_sigma = np.log(sigma)
        dists = log_sigma - self.log_sigmas
        low_idx = int(np.clip((dists >= 0).sum() - 1, 0, TIMESTEPS - 2))
        high_idx = low_idx + 1
        low, high = self.log_sigmas[low_idx], self.log_sigmas[high_idx]
        w = np.clip((low - log_sigma) / (low - high), 0.0, 1.0)
        return (1.0 - w) * low_idx + w * high_idx

    def t_to_sigma(self, t):
        t = np.asarray(t, dtype=np.float32)
        low_idx = np.floor(t).astype(np.int64)
        high_idx = np.ceil(t).astype(np.int64)
        w = t - low_idx
        log_sigma = (1.0 - w) * self.log_sigmas[low_idx] + w * self.log_sigmas[high_idx]
        return np.exp(log_sigma)

    def get_scalings(self, sigma):
        sigma = np.asarray(sigma, dtype=np.float32)
        c_skip = np.ones_like(sigma)
        c_out = -sigma
        c_in = 1.0 / np.sqrt(sigma**2 + self.sigma_data**2)
        return c_skip, c_out, c_in

    def noise_scaling(self, sigma, noise, latent):
        return latent + noise * sigma

    def noise_level_to_sigma(self, noise_level: float) -> float:
        return noise_level / (1.0 - noise_level)

    # --- on-device variants (traced sigmas inside the sampling scan) ---

    def sigma_to_t_jnp(self, sigma):
        import jax.numpy as jnp

        log_sigmas = jnp.asarray(self.log_sigmas)
        log_sigma = jnp.log(sigma)
        low_idx = jnp.clip(
            jnp.sum((log_sigma - log_sigmas >= 0).astype(jnp.int32)) - 1, 0, TIMESTEPS - 2
        )
        high_idx = low_idx + 1
        low, high = log_sigmas[low_idx], log_sigmas[high_idx]
        w = jnp.clip((low - log_sigma) / (low - high), 0.0, 1.0)
        return (1.0 - w) * low_idx + w * high_idx

    def get_scalings_jnp(self, sigma):
        import jax.numpy as jnp

        c_in = 1.0 / jnp.sqrt(sigma**2 + self.sigma_data**2)
        return jnp.float32(1.0), -sigma, c_in


class CompVisVDenoiser(CompVisDenoiser):
    """v-prediction (SD2.x-v, some SDXL refiners)."""

    prediction = "v"

    def get_scalings(self, sigma):
        sigma = np.asarray(sigma, dtype=np.float32)
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = -sigma * self.sigma_data / np.sqrt(sigma**2 + sd2)
        c_in = 1.0 / np.sqrt(sigma**2 + sd2)
        return c_skip, c_out, c_in

    def get_scalings_jnp(self, sigma):
        import jax.numpy as jnp

        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = -sigma * self.sigma_data / jnp.sqrt(sigma**2 + sd2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + sd2)
        return c_skip, c_out, c_in


class EDMVDenoiser(CompVisVDenoiser):
    """EDM-style continuous sigma (e.g. Playground v2.5)."""

    prediction = "edm_v"

    def __init__(self, min_sigma: float = 0.002, max_sigma: float = 120.0):
        super().__init__()
        self._min_sigma = min_sigma
        self._max_sigma = max_sigma

    def sigma_min(self) -> float:
        return self._min_sigma

    def sigma_max(self) -> float:
        return self._max_sigma

    def t_to_sigma(self, t):
        return np.exp(np.asarray(t, dtype=np.float32) * 4.0 / TIMESTEPS)

    def sigma_to_t(self, sigma):
        return 0.25 * np.log(sigma)

    def sigma_to_t_jnp(self, sigma):
        import jax.numpy as jnp

        return 0.25 * jnp.log(sigma)


def time_snr_shift(alpha: float, t):
    if alpha == 1.0:
        return t
    return alpha * t / (1 + (alpha - 1) * t)


def flux_time_shift(mu: float, sigma: float, t):
    return np.exp(mu) / (np.exp(mu) + (1.0 / t - 1.0) ** sigma)


class DiscreteFlowDenoiser(Denoiser):
    """Rectified-flow sigma∈(0,1] with SNR shift (SD3.x)."""

    prediction = "flow"
    is_flow = True

    def __init__(self, shift: float = 3.0):
        self.shift = shift

    def set_shift(self, shift: float):
        self.shift = shift

    def sigma_min(self) -> float:
        return float(self.t_to_sigma(np.float32(0.0)))

    def sigma_max(self) -> float:
        return float(self.t_to_sigma(np.float32(TIMESTEPS - 1)))

    def sigma_to_t(self, sigma):
        return np.asarray(sigma) * 1000.0

    def t_to_sigma(self, t):
        t = np.asarray(t, dtype=np.float32) + 1.0
        return time_snr_shift(self.shift, t / 1000.0)

    def get_scalings(self, sigma):
        sigma = np.asarray(sigma, dtype=np.float32)
        return np.ones_like(sigma), -sigma, np.ones_like(sigma)

    def get_scalings_jnp(self, sigma):
        import jax.numpy as jnp

        return jnp.float32(1.0), -sigma, jnp.float32(1.0)

    def sigma_to_t_jnp(self, sigma):
        return sigma * 1000.0

    def noise_scaling(self, sigma, noise, latent):
        return latent * (1.0 - sigma) + noise * sigma

    def inverse_noise_scaling(self, sigma, latent):
        return latent / (1.0 - sigma)

    def noise_level_to_sigma(self, noise_level: float) -> float:
        return noise_level


class FluxFlowDenoiser(DiscreteFlowDenoiser):
    """Flux-style flow: exp time shift, t == sigma."""

    def __init__(self, shift: float = 1.15):
        super().__init__(shift)

    def sigma_to_t(self, sigma):
        return np.asarray(sigma)

    def sigma_to_t_jnp(self, sigma):
        return sigma

    def t_to_sigma(self, t):
        t = np.asarray(t, dtype=np.float32) + 1.0
        return flux_time_shift(self.shift, 1.0, t / TIMESTEPS)


class SefiFlowDenoiser(FluxFlowDenoiser):
    """SeFi-Image dual-schedule flow (reference SefiFlowDenoiser,
    denoiser.hpp:1279-1351): semantic channels run delta_t ahead of the
    texture channels; the model receives a [t_sem, t_tex] timestep vector
    (raw 1..1000 values) while scalings use the texture sigma."""

    SEM_CHANNELS = 16

    def __init__(self, alpha: float = 1.0, delta_t: float = 0.1):
        super().__init__(shift=1.0)
        self.alpha = alpha
        self.delta_t = delta_t

    def sigma_to_t(self, sigma):
        return np.asarray(sigma) * 1000.0

    def sigma_to_t_jnp(self, sigma):
        return sigma * 1000.0

    def get_scalings_jnp(self, sigma):
        import jax.numpy as jnp

        tex = sigma[-1] if getattr(sigma, "ndim", 0) else sigma
        return jnp.float32(1.0), -tex, jnp.float32(1.0)


class MiniT2IFlowDenoiser(Denoiser):
    """MiniT2I linear flow: model predicts x0 directly; start = noise*2."""

    prediction = "x0"
    is_flow = True

    def sigma_min(self) -> float:
        return 0.0

    def sigma_max(self) -> float:
        return 1.0

    def sigma_to_t(self, sigma):
        return 1.0 - np.asarray(sigma)

    def t_to_sigma(self, t):
        return 1.0 - np.asarray(t)

    def get_scalings(self, sigma):
        sigma = np.asarray(sigma, dtype=np.float32)
        return np.zeros_like(sigma), np.ones_like(sigma), np.ones_like(sigma)

    def get_scalings_jnp(self, sigma):
        import jax.numpy as jnp

        z = jnp.zeros_like(sigma)
        return z, z + 1.0, z + 1.0

    def sigma_to_t_jnp(self, sigma):
        return 1.0 - sigma

    def noise_scaling(self, sigma, noise, latent):
        return noise * 2.0

    def noise_level_to_sigma(self, noise_level: float) -> float:
        return 1.0

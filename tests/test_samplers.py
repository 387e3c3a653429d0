"""Sampler scan programs vs numpy oracle transcriptions of the reference loops.

Toy model: denoised = tanh(x * w) with a fixed weight — nonlinear enough to
expose ordering/coefficient bugs, cheap enough to run every method.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.diffusion.denoiser import CompVisDenoiser, FluxFlowDenoiser, compvis_alphas_cumprod
from sdtpu.diffusion.samplers import SAMPLE_METHODS, sample
from sdtpu.diffusion.schedule import get_sigmas

from tests.torch_ref import samplers_oracle as oracle

SHAPE = (2, 8, 8, 4)


def _toy_model_np(w=0.9):
    def model(x, sigma, i):
        den = np.tanh(x * w / (1 + sigma))
        return den, den * 0.8  # fake "uncond"

    return model


def _toy_model_jax(w=0.9):
    def model(x, sigma, i):
        den = jnp.tanh(x * w / (1 + sigma))
        return den, den * 0.8

    return model


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    d = CompVisDenoiser()
    sigmas = get_sigmas(d, 8, scheduler="karras")
    noises = rng.standard_normal((8,) + SHAPE).astype(np.float32)
    return x0, sigmas, noises


ORACLES = {
    "euler": lambda m, x, s, nz, eta, flow: oracle.sample_euler(m, x, s),
    "euler_a": lambda m, x, s, nz, eta, flow: oracle.sample_euler_ancestral(m, x, s, nz, eta, flow),
    "ddim_trailing": lambda m, x, s, nz, eta, flow: oracle.sample_euler_ancestral(m, x, s, nz, eta, flow),
    "heun": lambda m, x, s, nz, eta, flow: oracle.sample_heun(m, x, s),
    "dpm2": lambda m, x, s, nz, eta, flow: oracle.sample_dpm2(m, x, s),
    "dpm++2s_a": lambda m, x, s, nz, eta, flow: oracle.sample_dpmpp_2s_a(m, x, s, nz, eta),
    "dpm++2m": lambda m, x, s, nz, eta, flow: oracle.sample_dpmpp_2m(m, x, s, v2=False),
    "dpm++2m_v2": lambda m, x, s, nz, eta, flow: oracle.sample_dpmpp_2m(m, x, s, v2=True),
    "dpm++2m_sde": lambda m, x, s, nz, eta, flow: oracle.sample_dpmpp_2m_sde(m, x, s, nz, eta),
    "ipndm": lambda m, x, s, nz, eta, flow: oracle.sample_ipndm(m, x, s, variable=False),
    "ipndm_v": lambda m, x, s, nz, eta, flow: oracle.sample_ipndm(m, x, s, variable=True),
    "lcm": lambda m, x, s, nz, eta, flow: oracle.sample_lcm(m, x, s, nz, flow),
    "euler_cfg_pp": lambda m, x, s, nz, eta, flow: oracle.sample_euler_cfg_pp(m, x, s),
    "euler_a_cfg_pp": lambda m, x, s, nz, eta, flow: oracle.sample_euler_a_cfg_pp(m, x, s, nz, eta),
    "euler_ge": lambda m, x, s, nz, eta, flow: oracle.sample_euler_ge(m, x, s, nz, eta, flow),
    "res_multistep": lambda m, x, s, nz, eta, flow: oracle.sample_res_multistep(m, x, s, nz, eta, flow),
    "res_2s": lambda m, x, s, nz, eta, flow: oracle.sample_res_2s(m, x, s, nz, eta, flow),
    "er_sde": lambda m, x, s, nz, eta, flow: oracle.sample_er_sde(m, x, s, nz, eta, flow),
    "tcd": lambda m, x, s, nz, eta, flow: oracle.sample_tcd(
        m, x, s, nz, eta, compvis_alphas_cumprod()
    ),
}


# dpm++2m_sde_bt shares the sde oracle; sefi_euler needs its own dual
# schedule (covered against the reference recurrence in test_sefi.py)
@pytest.mark.parametrize("method", [m for m in SAMPLE_METHODS
                                    if m not in ("dpm++2m_sde_bt", "sefi_euler")])
@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_sampler_matches_oracle(setup, method, eta):
    x0, sigmas, noises = setup
    want = ORACLES[method](_toy_model_np(), x0.copy(), sigmas, noises, eta, False)
    got = np.asarray(
        jax.jit(
            lambda x, nz: sample(
                _toy_model_jax(), x, sigmas, method=method, noises=nz, eta=eta, is_flow=False
            )
        )(jnp.asarray(x0), jnp.asarray(noises))
    )
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("method", ["euler_a", "dpm++2s_a", "lcm", "res_multistep", "res_2s", "er_sde", "euler_ge"])
@pytest.mark.parametrize("eta", [0.0, 1.0])
def test_flow_sampler_matches_oracle(method, eta):
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal(SHAPE).astype(np.float32)
    f = FluxFlowDenoiser()
    sigmas = get_sigmas(f, 8, scheduler="flux", image_seq_len=1024)
    noises = rng.standard_normal((8,) + SHAPE).astype(np.float32)
    if method == "dpm++2s_a":
        want = _oracle_2s_a_flow(_toy_model_np(), x0.copy(), sigmas, noises, eta)
    else:
        want = ORACLES[method](_toy_model_np(), x0.copy(), sigmas, noises, eta, True)
    got = np.asarray(
        jax.jit(
            lambda x, nz: sample(
                _toy_model_jax(), x, sigmas, method=method, noises=nz, eta=eta, is_flow=True
            )
        )(jnp.asarray(x0), jnp.asarray(noises))
    )
    np.testing.assert_allclose(got, np.asarray(want), rtol=3e-4, atol=3e-4)


def _oracle_2s_a_flow(model, x, sigmas, noises, eta):
    """Reference sample_dpmpp_2s_ancestral_flow (denoiser.hpp:1672-1764)."""
    import math

    for i in range(len(sigmas) - 1):
        sigma, sigma_to = float(sigmas[i]), float(sigmas[i + 1])
        den, _ = model(x, sigma, i)
        if sigma_to == 0.0:
            x = den
        else:
            sd, su, al = oracle.ancestral_step_flow(sigma, sigma_to, eta)
            if 1.0 - sigma < 1e-6:
                d_i = den
            else:
                exp_s = math.sqrt(((1 - sigma) / sigma) * ((1 - sd) / sd))
                sigma_s = 1.0 / (exp_s + 1.0)
                r = sigma_s / sigma
                u = x * r + den * (1 - r)
                d_i, _ = model(u, sigma_s, i)
            rd = sd / sigma
            x = x * rd + d_i * (1 - rd)
            if sigma_to > 0 and eta > 0 and su > 0:
                x = al * x + noises[i] * su
    return x

"""k-diffusion samplers as on-device lax.scan programs.

Behavioral parity with the reference's 21 samplers (src/runtime/denoiser.hpp:
1488-2726), re-architected TPU-first: every per-step scalar coefficient
(sigmas, ancestral splits, DPM h/a/b terms, ER-SDE integrals, TCD alpha
lookups) is precomputed host-side in numpy float32, and the entire denoise
loop runs as a single jit-compiled ``lax.scan`` — the per-step host↔device
round-trip that dominates the reference's overhead does not exist here.

``model_fn(x, sigma, step_index) -> (denoised, uncond_denoised)`` is traced
once; second-order samplers keep both model calls in the step's main trace
(the final sigma==0 step discards the second result via a where-select) so
cross-step model state (StatefulModel, e.g. APG momentum) threads cleanly
through the scan carry.  Stochastic samplers consume a precomputed
``noises[steps, ...]`` stack (host Philox for webui parity).
"""
from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


def ancestral_steps(sigmas: np.ndarray, eta: float, is_flow: bool):
    """Per-step (sigma_down, sigma_up, alpha_scale) arrays; float32 math
    mirrors the reference get_ancestral_step/_flow (denoiser.hpp:1422-1485)."""
    sigmas = np.asarray(sigmas, dtype=np.float32)
    n = len(sigmas) - 1
    down = sigmas[1 : n + 1].copy()
    up = np.zeros(n, dtype=np.float32)
    alpha = np.ones(n, dtype=np.float32)
    for i in range(n):
        s_from, s_to = float(sigmas[i]), float(sigmas[i + 1])
        if is_flow:
            if eta <= 0.0 or s_from <= 0.0 or s_to <= 0.0:
                continue
            e = min(eta, 1.0)
            ratio = s_to / s_from
            sd = s_to * (1.0 + (ratio - 1.0) * e)
            sd = max(0.0, min(s_to, sd))
            denom = 1.0 - sd
            if denom <= 0.0:
                down[i] = s_to
                continue
            a = (1.0 - s_to) / denom
            term = max(-1.0, min(1.0, (sd / s_to) * a))
            up[i] = s_to * math.sqrt(max(1.0 - term * term, 0.0))
            down[i] = sd
            alpha[i] = a
        else:
            if eta <= 0.0:
                continue
            if s_from > 0.0:
                term = s_to**2 * (s_from**2 - s_to**2) / s_from**2
                up[i] = min(s_to, eta * math.sqrt(max(term, 0.0)))
            sd_sq = s_to**2 - up[i] ** 2
            down[i] = math.sqrt(sd_sq) if sd_sq > 0 else 0.0
    return down, up, alpha


def _scan(step_fn, carry, per_step: Dict[str, jnp.ndarray]):
    carry, _ = jax.lax.scan(lambda c, s: (step_fn(c, s), None), carry, per_step)
    return carry


def _noise_term(x, s, key="noise"):
    return s[key] if key in s else jnp.zeros_like(x)


# ---------------------------------------------------------------- euler family


def _euler_step(model_fn):
    def step(carry, s):
        x = carry["x"]
        den, _ = model_fn(x, s["sigma"], s["i"])
        d = (x - den) / s["sigma"]
        return {"x": x + d * (s["sigma_next"] - s["sigma"])}

    return step


def _sefi_euler_step(model_fn, sem_channels: int):
    """SeFi dual-schedule euler (reference sample_sefi_euler,
    denoiser.hpp:1523-1555): one velocity from the texture sigma, semantic
    and texture channel groups integrated with their own sigma deltas.  The
    model receives the stacked [sem_sigma, tex_sigma] so its dual timestep
    embedder sees both raw t values."""

    def step(carry, s):
        x = carry["x"]
        sig_vec = jnp.stack([s["sem_sigma"], s["sigma"]])
        den, _ = model_fn(x, sig_vec, s["i"])
        v = (x - den) / s["sigma"]
        x_sem = (x[..., :sem_channels]
                 + v[..., :sem_channels] * (s["sem_sigma_next"] - s["sem_sigma"]))
        x_tex = (x[..., sem_channels:]
                 + v[..., sem_channels:] * (s["sigma_next"] - s["sigma"]))
        return {"x": jnp.concatenate([x_sem, x_tex], axis=-1)}

    return step


def _euler_a_step(model_fn, is_flow):
    def step(carry, s):
        x = carry["x"]
        den, _ = model_fn(x, s["sigma"], s["i"])
        ratio = s["sigma_down"] / s["sigma"]
        x_new = ratio * x + (1.0 - ratio) * den
        if is_flow:
            x_new = jnp.where(s["sigma_up"] > 0, x_new * s["alpha_scale"], x_new)
        x_new = x_new + _noise_term(x, s) * s["sigma_up"]
        # final step (sigma_next == 0): x = denoised exactly
        x_new = jnp.where(s["sigma_next"] == 0.0, den, x_new)
        return {"x": x_new}

    return step


def _euler_cfg_pp_step(model_fn):
    def step(carry, s):
        x = carry["x"]
        den, den_u = model_fn(x, s["sigma"], s["i"])
        d = (x - den_u) / s["sigma"]
        return {"x": den + d * s["sigma_next"]}

    return step


def _euler_a_cfg_pp_step(model_fn):
    def step(carry, s):
        x = carry["x"]
        den, den_u = model_fn(x, s["sigma"], s["i"])
        d = (x - den_u) / s["sigma"]
        x_new = den + d * s["sigma_down"]
        x_new = x_new + _noise_term(x, s) * jnp.where(s["sigma_next"] > 0, s["sigma_up"], 0.0)
        return {"x": x_new}

    return step


def _euler_ge_step(model_fn, is_flow, gamma):
    def step(carry, s):
        x, old_d, has_old = carry["x"], carry["old_d"], carry["has_old"]
        den, _ = model_fn(x, s["sigma"], s["i"])
        d = (x - den) / s["sigma"]
        dt = s["sigma_down"] - s["sigma"]
        d_bar = jnp.where(has_old > 0, d * gamma + old_d * (1.0 - gamma), d)
        x_new = x + d_bar * dt
        if is_flow:
            x_new = jnp.where(s["sigma_up"] > 0, x_new * s["alpha_scale"], x_new)
        x_new = x_new + _noise_term(x, s) * s["sigma_up"]
        x_new = jnp.where(s["sigma_next"] == 0.0, den, x_new)
        return {"x": x_new, "old_d": d, "has_old": jnp.float32(1.0)}

    return step


# ------------------------------------------------------------- 2nd order (2 calls)


def _heun_step(model_fn):
    # second model call hoisted out of control flow (it runs on the final
    # sigma_next==0 step too and is discarded by the where-select) so
    # threaded model state stays in the step's main trace
    def step(carry, s):
        x = carry["x"]
        den, _ = model_fn(x, s["sigma"], s["i"])
        d = (x - den) / s["sigma"]
        dt = s["sigma_next"] - s["sigma"]
        x_euler = x + d * dt

        is_last = s["sigma_next"] == 0.0
        safe_next = jnp.where(is_last, 1.0, s["sigma_next"])
        den2, _ = model_fn(x_euler, safe_next, s["i"])
        d2 = (d + (x_euler - den2) / safe_next) / 2.0
        x_new = jnp.where(is_last, x_euler, x + d2 * dt)
        return {"x": x_new}

    return step


def _dpm2_step(model_fn):
    def step(carry, s):
        x = carry["x"]
        den, _ = model_fn(x, s["sigma"], s["i"])
        d = (x - den) / s["sigma"]

        is_last = s["sigma_next"] == 0.0
        safe_next = jnp.where(is_last, s["sigma"], s["sigma_next"])
        sigma_mid = jnp.exp(0.5 * (jnp.log(s["sigma"]) + jnp.log(safe_next)))
        x2 = x + d * (sigma_mid - s["sigma"])
        den2, _ = model_fn(x2, sigma_mid, s["i"])
        x_mid = x + ((x2 - den2) / sigma_mid) * (s["sigma_next"] - s["sigma"])
        x_last = x + d * (s["sigma_next"] - s["sigma"])
        return {"x": jnp.where(is_last, x_last, x_mid)}

    return step


def _dpmpp_2s_a_step(model_fn):
    def step(carry, s):
        x = carry["x"]
        den, _ = model_fn(x, s["sigma"], s["i"])

        is_last = s["sigma_down"] == 0.0
        safe_down = jnp.where(is_last, 1.0, s["sigma_down"])
        t = -jnp.log(s["sigma"])
        t_next = -jnp.log(safe_down)
        h = t_next - t
        sigma_s = jnp.exp(-(t + 0.5 * h))
        x2 = (sigma_s / s["sigma"]) * x - (jnp.exp(-h * 0.5) - 1.0) * den
        den2, _ = model_fn(x2, sigma_s, s["i"])
        x_sec = (s["sigma_down"] / s["sigma"]) * x - (jnp.exp(-h) - 1.0) * den2
        x_new = jnp.where(is_last, den, x_sec)
        x_new = x_new + _noise_term(x, s) * jnp.where(s["sigma_next"] > 0, s["sigma_up"], 0.0)
        return {"x": x_new}

    return step


def _dpmpp_2s_a_flow_step(model_fn):
    def step(carry, s):
        x = carry["x"]
        den, _ = model_fn(x, s["sigma"], s["i"])
        first = 1.0 - s["sigma"] < 1e-6
        is_last = s["sigma_next"] == 0.0

        safe_down = jnp.where(s["sigma_down"] <= 0.0, 0.5, s["sigma_down"])
        exp_s = jnp.sqrt(
            ((1.0 - s["sigma"]) / s["sigma"]) * ((1.0 - safe_down) / safe_down)
        )
        sigma_s = 1.0 / (exp_s + 1.0)
        r = sigma_s / s["sigma"]
        u = x * r + den * (1.0 - r)
        den2, _ = model_fn(u, sigma_s, s["i"])
        d_i = jnp.where(first, den, den2)
        rd = s["sigma_down"] / s["sigma"]
        x_new = x * rd + d_i * (1.0 - rd)
        noisy = s["alpha_scale"] * x_new + _noise_term(x, s) * s["sigma_up"]
        x_new = jnp.where(s["sigma_up"] > 0, noisy, x_new)
        return {"x": jnp.where(is_last, den, x_new)}

    return step


def _res_2s_step(model_fn, is_flow):
    def step(carry, s):
        x = carry["x"]
        den, _ = model_fn(x, s["sigma"], s["i"])

        is_last = jnp.logical_or(s["sigma_down"] == 0.0, s["sigma"] == 0.0)
        safe_sigma = jnp.where(s["sigma"] <= 0.0, 1.0, s["sigma"])
        safe_down = jnp.where(s["sigma_down"] <= 0.0, 1.0, s["sigma_down"])
        c2 = 0.5
        t = -jnp.log(safe_sigma)
        t_next = -jnp.log(safe_down)
        h = t_next - t
        a21 = c2 * _phi1(-h * c2)
        phi1_v = _phi1(-h)
        phi2_v = _phi2(-h)
        b2 = phi2_v / c2
        b1 = phi1_v - b2
        sigma_c2 = jnp.exp(-(t + h * c2))
        eps1 = den - x
        x2 = x + eps1 * (h * a21)
        den2, _ = model_fn(x2, sigma_c2, s["i"])
        eps2 = den2 - x
        x_body = x + h * (b1 * eps1 + b2 * eps2)

        x_new = jnp.where(is_last, den, x_body)
        if is_flow:
            x_new = jnp.where(s["sigma_up"] > 0, x_new * s["alpha_scale"], x_new)
        x_new = x_new + _noise_term(x, s) * jnp.where(s["sigma_next"] > 0, s["sigma_up"], 0.0)
        return {"x": x_new}

    return step


def _phi1(t):
    safe = (jnp.exp(t) - 1.0) / jnp.where(jnp.abs(t) < 1e-6, 1.0, t)
    taylor = 1.0 + t * 0.5 + (t * t) / 6.0
    return jnp.where(jnp.abs(t) < 1e-6, taylor, safe)


def _phi2(t):
    safe = (_phi1(t) - 1.0) / jnp.where(jnp.abs(t) < 1e-6, 1.0, t)
    taylor = 0.5 + t / 6.0 + (t * t) / 24.0
    return jnp.where(jnp.abs(t) < 1e-6, taylor, safe)


# --------------------------------------------------------------- multistep


def _dpmpp_2m_step(model_fn, v2: bool):
    def step(carry, s):
        x, old_den = carry["x"], carry["old_denoised"]
        den, _ = model_fn(x, s["sigma"], s["i"])
        a = s["a"]
        first_or_last = jnp.logical_or(s["i"] == 0, s["sigma_next"] == 0.0)
        b_first = s["b_first"]
        b_multi = s["b_multi"]
        r = s["r"]
        den_d = (1.0 + 1.0 / (2.0 * r)) * den - (1.0 / (2.0 * r)) * old_den
        x_new = jnp.where(
            first_or_last, a * x - b_first * den, a * x - b_multi * den_d
        )
        return {"x": x_new, "old_denoised": den}

    return step


def _dpmpp_2m_sde_step(model_fn):
    def step(carry, s):
        x, old_den, have_old = carry["x"], carry["old_denoised"], carry["have_old"]
        h_last = carry["h_last"]
        den, _ = model_fn(x, s["sigma"], s["i"])

        t = -jnp.log(s["sigma"])
        t2 = -jnp.log(jnp.maximum(s["sigma_next"], 1e-20))
        h = t2 - t
        eta_h = s["eta"] * h
        a = s["sigma_next"] / s["sigma"] * jnp.exp(-eta_h)
        b = -jnp.expm1(-h - eta_h)
        x_new = a * x + b * den
        r = h_last / h
        x_new = x_new + jnp.where(have_old > 0, (0.5 * b / r) * (den - old_den), 0.0)
        noise_amt = s["sigma_next"] * jnp.sqrt(-jnp.expm1(-2.0 * eta_h))
        x_new = x_new + jnp.where(s["eta"] > 0, _noise_term(x, s) * noise_amt, 0.0)
        is_last = s["sigma_next"] == 0.0
        x_new = jnp.where(is_last, den, x_new)
        h_new = jnp.where(is_last, h_last, h)
        return {
            "x": x_new,
            "old_denoised": den,
            "have_old": jnp.float32(1.0),
            "h_last": h_new,
        }

    return step


def _ipndm_step(model_fn, variable_step: bool):
    def step(carry, s):
        x, hist = carry["x"], carry["hist"]  # hist: [3, ...] newest last
        den, _ = model_fn(x, s["sigma"], s["i"])
        d = (x - den) / s["sigma"]
        h_n = s["sigma_next"] - s["sigma"]
        h1, h2, h3 = hist[2], hist[1], hist[0]

        if variable_step:
            rr = h_n / s["h_prev"]
            o2 = ((2.0 + rr) * d - rr * h1) / 2.0
        else:
            o2 = (3.0 * d - h1) / 2.0
        o1 = d
        o3 = (23.0 * d - 16.0 * h1 + 5.0 * h2) / 12.0
        o4 = (55.0 * d - 59.0 * h1 + 37.0 * h2 - 9.0 * h3) / 24.0
        order = jnp.minimum(s["i"] + 1, 4)
        upd = jnp.where(
            order == 1, o1, jnp.where(order == 2, o2, jnp.where(order == 3, o3, o4))
        )
        x_new = x + upd * h_n
        hist_new = jnp.stack([hist[1], hist[2], d])
        return {"x": x_new, "hist": hist_new}

    return step


def _lcm_step(model_fn, is_flow, noise_scales):
    def step(carry, s):
        x = carry["x"]
        den, _ = model_fn(x, s["sigma"], s["i"])
        x_new = den
        if is_flow:
            x_new = jnp.where(s["sigma_next"] > 0, x_new * (1.0 - s["sigma_next"]), x_new)
        x_new = x_new + jnp.where(
            s["sigma_next"] > 0, _noise_term(x, s) * (s["sigma_next"] * s["noise_scale"]), 0.0
        )
        return {"x": x_new}

    return step


def _tcd_step(model_fn):
    def step(carry, s):
        x = carry["x"]
        den, _ = model_fn(x, s["sigma"], s["i"])
        d = (x - den) / s["sigma"]
        x_new = s["coef_den"] * den + s["coef_d"] * d
        x_new = x_new + jnp.where(
            s["sigma_next"] > 0,
            s["coef_renoise_x"] * x_new - x_new + s["coef_noise"] * _noise_term(x, s),
            0.0,
        )
        return {"x": x_new}

    return step


def _res_multistep_step(model_fn, is_flow):
    def step(carry, s):
        x, old_den, have_old = carry["x"], carry["old_denoised"], carry["have_old"]
        old_sigma_down = carry["old_sigma_down"]
        den, _ = model_fn(x, s["sigma"], s["i"])

        euler_x = x + ((x - den) / s["sigma"]) * (s["sigma_down"] - s["sigma"])

        t = -jnp.log(s["sigma"])
        t_old = -jnp.log(jnp.maximum(old_sigma_down, 1e-20))
        t_next = -jnp.log(jnp.maximum(s["sigma_down"], 1e-20))
        t_prev = -jnp.log(jnp.maximum(s["sigma_prev"], 1e-20))
        h = t_next - t
        c2 = (t_prev - t_old) / h
        phi1_v = _phi1(-h)
        phi2_v = _phi2(-h)
        b1 = phi1_v - phi2_v / c2
        b2 = phi2_v / c2
        b1 = jnp.where(jnp.isfinite(b1), b1, 0.0)
        b2 = jnp.where(jnp.isfinite(b2), b2, 0.0)
        multi_x = jnp.exp(-h) * x + h * (b1 * den + b2 * old_den)

        use_euler = jnp.logical_or(s["sigma_down"] == 0.0, have_old == 0)
        x_new = jnp.where(use_euler, euler_x, multi_x)
        if is_flow:
            x_new = jnp.where(s["sigma_up"] > 0, x_new * s["alpha_scale"], x_new)
        x_new = x_new + jnp.where(
            jnp.logical_and(s["sigma_next"] > 0, s["sigma_up"] > 0),
            _noise_term(x, s) * s["sigma_up"],
            0.0,
        )
        return {
            "x": x_new,
            "old_denoised": den,
            "have_old": jnp.float32(1.0),
            "old_sigma_down": s["sigma_down"],
        }

    return step


def _er_sde_step(model_fn):
    def step(carry, s):
        x, old_den, have_old = carry["x"], carry["old_denoised"], carry["have_old"]
        old_den_d, have_old_d = carry["old_denoised_d"], carry["have_old_d"]
        den, _ = model_fn(x, s["sigma"], s["i"])

        x1 = s["r_alpha"] * s["r"] * x + s["alpha_t"] * (1.0 - s["r"]) * den

        den_d = (den - old_den) / jnp.where(s["denom_d"] == 0, 1.0, s["denom_d"])
        stage2 = jnp.logical_and(s["use_stage2"] > 0, have_old > 0)
        x2 = x1 + jnp.where(stage2, s["coeff_d"] * den_d, 0.0)

        den_u = (den_d - old_den_d) / jnp.where(s["denom_u"] == 0, 1.0, s["denom_u"])
        stage3 = jnp.logical_and(
            jnp.logical_and(s["use_stage3"] > 0, stage2), have_old_d > 0
        )
        x3 = x2 + jnp.where(stage3, s["coeff_u"] * den_u, 0.0)

        x_new = x3 + jnp.where(s["noise_scale"] > 0, _noise_term(x, s) * s["noise_scale"], 0.0)
        x_new = jnp.where(s["sigma_next"] == 0.0, den, x_new)
        return {
            "x": x_new,
            "old_denoised": den,
            "have_old": jnp.float32(1.0),
            "old_denoised_d": jnp.where(stage2, den_d, old_den_d),
            "have_old_d": jnp.where(stage2, jnp.float32(1.0), have_old_d),
        }

    return step


# ------------------------------------------------------------------ dispatch

NOISY_METHODS = {
    "euler_a", "dpm++2s_a", "dpm++2m_sde", "dpm++2m_sde_bt", "lcm", "ddim_trailing",
    "tcd", "euler_a_cfg_pp", "euler_ge", "res_multistep", "res_2s", "er_sde",
}

SAMPLE_METHODS = [
    "euler", "sefi_euler", "euler_a", "heun", "dpm2", "dpm++2s_a", "dpm++2m", "dpm++2m_v2",
    "dpm++2m_sde", "dpm++2m_sde_bt", "ipndm", "ipndm_v", "lcm", "ddim_trailing",
    "tcd", "res_multistep", "res_2s", "er_sde", "euler_cfg_pp", "euler_a_cfg_pp",
    "euler_ge",
]


def _per_step_common(sigmas: np.ndarray, eta: float, is_flow: bool):
    sigmas = np.asarray(sigmas, dtype=np.float32)
    n = len(sigmas) - 1
    down, up, alpha = ancestral_steps(sigmas, eta, is_flow)
    return {
        "i": np.arange(n, dtype=np.int32),
        "sigma": sigmas[:n],
        "sigma_next": sigmas[1 : n + 1],
        "sigma_prev": np.concatenate([sigmas[:1], sigmas[: n - 1]]),
        "sigma_down": down,
        "sigma_up": up,
        "alpha_scale": alpha,
    }


def _dpmpp_2m_coeffs(sigmas: np.ndarray, v2: bool):
    sigmas = np.asarray(sigmas, dtype=np.float32)
    n = len(sigmas) - 1
    a = np.zeros(n, dtype=np.float32)
    b_first = np.zeros(n, dtype=np.float32)
    b_multi = np.zeros(n, dtype=np.float32)
    r_arr = np.ones(n, dtype=np.float32)
    t_fn = lambda s: -math.log(max(float(s), 1e-20))
    for i in range(n):
        t, t_next = t_fn(sigmas[i]), t_fn(sigmas[i + 1])
        h = t_next - t
        a[i] = sigmas[i + 1] / sigmas[i]
        b_first[i] = math.exp(-h) - 1.0
        if i > 0 and sigmas[i + 1] != 0:
            h_last = t - t_fn(sigmas[i - 1])
            if v2:
                h_min, h_max = min(h_last, h), max(h_last, h)
                r_arr[i] = h_max / h_min
                b_multi[i] = math.exp(-(h_max + h_min) / 2.0) - 1.0
            else:
                r_arr[i] = h_last / h
                b_multi[i] = b_first[i]
    return {"a": a, "b_first": b_first, "b_multi": b_multi, "r": r_arr}


def _ipndm_h_prev(sigmas: np.ndarray):
    sigmas = np.asarray(sigmas, dtype=np.float32)
    n = len(sigmas) - 1
    h_prev = np.zeros(n, dtype=np.float32)
    for i in range(n):
        h_n = sigmas[i + 1] - sigmas[i]
        h_prev[i] = (sigmas[i] - sigmas[i - 1]) if i > 0 else h_n
    return h_prev


def _tcd_coeffs(sigmas: np.ndarray, eta: float):
    from .denoiser import compvis_alphas_cumprod

    sigmas = np.asarray(sigmas, dtype=np.float32)
    n = len(sigmas) - 1
    ac = compvis_alphas_cumprod()
    compvis_sigmas = np.sqrt((1 - ac) / ac)
    coef_den = np.zeros(n, dtype=np.float32)
    coef_d = np.zeros(n, dtype=np.float32)
    coef_renoise_x = np.ones(n, dtype=np.float32)
    coef_noise = np.zeros(n, dtype=np.float32)
    for i in range(n):
        sigma, sigma_to = float(sigmas[i]), float(sigmas[i + 1])
        idx = int(np.searchsorted(compvis_sigmas, sigma_to))
        if idx == 0:
            prev_timestep = 0
        elif idx >= len(compvis_sigmas):
            prev_timestep = len(compvis_sigmas) - 1
        else:
            lo, hi = idx - 1, idx
            prev_timestep = hi if abs(compvis_sigmas[hi] - sigma_to) < abs(
                compvis_sigmas[lo] - sigma_to
            ) else lo
        timestep_s = int(math.floor((1 - eta) * prev_timestep))
        alpha_prod_t_prev = 1.0 / (sigma_to**2 + 1.0)
        alpha_prod_s = float(ac[timestep_s])
        beta_prod_s = 1.0 - alpha_prod_s
        coef_den[i] = math.sqrt(alpha_prod_s / alpha_prod_t_prev)
        coef_d[i] = math.sqrt(beta_prod_s / alpha_prod_t_prev)
        if eta > 0 and sigma_to > 0:
            coef_renoise_x[i] = math.sqrt(alpha_prod_t_prev / alpha_prod_s)
            coef_noise[i] = math.sqrt(
                max(1.0 / alpha_prod_t_prev - 1.0 / alpha_prod_s, 0.0)
            )
    return {
        "coef_den": coef_den,
        "coef_d": coef_d,
        "coef_renoise_x": coef_renoise_x,
        "coef_noise": coef_noise,
    }


def _er_sde_coeffs(sigmas: np.ndarray, eta: float, is_flow: bool):
    """Reference sample_er_sde host math (denoiser.hpp:2355-2488)."""
    sigmas = np.asarray(sigmas, dtype=np.float32).copy()
    n = len(sigmas) - 1

    def flow_sigma(s):
        return min(max(s, 1e-6), 1.0 - 1e-4)

    def to_lambda(s):
        if is_flow:
            s = flow_sigma(s)
            return s / max(1.0 - s, 1e-6)
        return max(s, 1e-6)

    def to_alpha(s):
        if is_flow:
            return 1.0 - flow_sigma(s)
        return 1.0

    def noise_scaler(x):
        x = max(x, 0.0)
        return x * (math.exp(x**0.3) + 10.0)

    if is_flow:
        for i in range(n):
            if sigmas[i] > 1.0:
                sigmas[i] = flow_sigma(sigmas[i])
    lambdas = np.asarray([to_lambda(float(s)) for s in sigmas], dtype=np.float32)

    out = {
        "r_alpha": np.ones(n, np.float32),
        "r": np.ones(n, np.float32),
        "alpha_t": np.ones(n, np.float32),
        "coeff_d": np.zeros(n, np.float32),
        "coeff_u": np.zeros(n, np.float32),
        "denom_d": np.zeros(n, np.float32),
        "denom_u": np.zeros(n, np.float32),
        "use_stage2": np.zeros(n, np.float32),
        "use_stage3": np.zeros(n, np.float32),
        "noise_scale": np.zeros(n, np.float32),
    }
    num_pts = 200
    for i in range(n):
        if sigmas[i + 1] == 0.0:
            continue
        l_s, l_t = float(lambdas[i]), float(lambdas[i + 1])
        a_s, a_t = to_alpha(float(sigmas[i])), to_alpha(float(sigmas[i + 1]))
        sc_s, sc_t = noise_scaler(l_s), noise_scaler(l_t)
        r_alpha = a_t / a_s if a_s > 0 else 0.0
        r = sc_t / sc_s if sc_s > 0 else 0.0
        out["r_alpha"][i] = r_alpha
        out["r"][i] = r
        out["alpha_t"][i] = a_t
        stage = min(3, i + 1)
        if stage >= 2:
            dt = l_t - l_s
            step_sz = -dt / num_pts
            ssum = 0.0
            s_u = 0.0
            for p in range(num_pts):
                pos = l_t + p * step_sz
                sp = noise_scaler(pos)
                if sp <= 0:
                    continue
                ssum += 1.0 / sp
                if stage >= 3:
                    s_u += (pos - l_s) / sp
            ssum *= step_sz
            denom_d = l_s - float(lambdas[i - 1])
            if abs(denom_d) > 1e-12:
                out["use_stage2"][i] = 1.0
                out["denom_d"][i] = denom_d
                out["coeff_d"][i] = a_t * (dt + ssum * sc_t)
                if stage >= 3:
                    denom_u = (l_s - float(lambdas[i - 2])) * 0.5
                    if abs(denom_u) > 1e-12:
                        out["use_stage3"][i] = 1.0
                        out["denom_u"][i] = denom_u
                        s_u *= step_sz
                        out["coeff_u"][i] = a_t * (0.5 * dt * dt + s_u * sc_t)
        nsq = l_t * l_t - l_s * l_s * r * r
        if eta > 0 and nsq > 0:
            out["noise_scale"][i] = a_t * math.sqrt(max(nsq, 0.0))
    return out


def sample(
    model_fn: Callable,
    x: jnp.ndarray,
    sigmas: np.ndarray,
    method: str = "euler",
    noises: Optional[jnp.ndarray] = None,
    eta: float = 0.0,
    is_flow: bool = False,
    extra_args: Optional[dict] = None,
) -> jnp.ndarray:
    """Run the full denoise loop as one on-device scan.

    model_fn(x, sigma, i) → (denoised, uncond_denoised); sigma is a traced
    scalar. noises: [steps, *x.shape] (required for stochastic methods when
    eta/default noise injection applies). Returns the final latent.
    """
    step, carry, per_step = build_sampler(model_fn, x, sigmas, method, noises, eta, is_flow, extra_args)
    out = _scan(step, carry, per_step)
    return out["x"]


def sample_stepwise(
    model_fn: Callable,
    x: jnp.ndarray,
    sigmas: np.ndarray,
    method: str = "euler",
    noises: Optional[jnp.ndarray] = None,
    eta: float = 0.0,
    is_flow: bool = False,
    extra_args: Optional[dict] = None,
    step_callback: Optional[Callable] = None,
    jit_step: bool = False,
) -> jnp.ndarray:
    """Host-driven variant of sample(): same step functions, python loop.

    Used when host interaction per step is needed (preview callbacks, step
    caches, cancellation). step_callback(i, x) is invoked after each step;
    returning False cancels. jit_step=True compiles the step function ONCE
    (per-step values are traced args with constant shapes), so the python
    loop only pays a dispatch per step — use for production progress/preview;
    leave False for step caches whose model_fn skips steps host-side.
    """
    step, carry, per_step = build_sampler(model_fn, x, sigmas, method, noises, eta, is_flow, extra_args)
    if jit_step:
        import jax

        step = jax.jit(step)
    n = len(np.asarray(sigmas)) - 1
    for i in range(n):
        s = {k: jnp.asarray(v[i]) for k, v in per_step.items()}
        carry = step(carry, s)
        if step_callback is not None:
            if step_callback(i, carry["x"]) is False:
                break  # cancellation
    return carry["x"]


class StatefulModel:
    """model_fn with cross-step state threaded through the sampler carry.

    fn(x, sigma, i, state) → (denoised, uncond_denoised, new_state).  Used for
    guidance state that must persist across steps inside the on-device scan —
    e.g. the APG momentum buffer (reference guidance.h:43-98 keeps it as
    mutable member state; here it lives in the scan carry).  build_sampler
    threads the state into every model call of a step (second-order samplers
    update it once per forward, matching the reference's per-denoise update)
    without any per-sampler changes: tracing is sequential, so a Python cell
    chains the traced state between calls within one step trace.
    """

    def __init__(self, fn: Callable, init_state):
        self.fn = fn
        self.init_state = init_state


def build_sampler(
    model_fn: Callable,
    x: jnp.ndarray,
    sigmas: np.ndarray,
    method: str = "euler",
    noises: Optional[jnp.ndarray] = None,
    eta: float = 0.0,
    is_flow: bool = False,
    extra_args: Optional[dict] = None,
):
    """→ (step_fn, initial carry, per-step arrays) — shared by both drivers."""
    extra_args = extra_args or {}
    stateful = model_fn if isinstance(model_fn, StatefulModel) else None
    if stateful is not None:
        _cell = {"s": None}

        def model_fn(xx, sigma, i, _fn=stateful.fn, _cell=_cell):
            den, unc, new_s = _fn(xx, sigma, i, _cell["s"])
            _cell["s"] = new_s
            return den, unc

    sigmas = np.asarray(sigmas, dtype=np.float32)
    n = len(sigmas) - 1
    per = _per_step_common(sigmas, eta if method != "dpm++2m_sde" else eta, is_flow)

    method = {"ddim_trailing": "euler_a"}.get(method, method)

    carry = {"x": x}
    if method == "euler":
        step = _euler_step(model_fn)
    elif method == "sefi_euler":
        from sdtpu.diffusion.schedule import sefi_dual_schedule

        sem, _ = sefi_dual_schedule(n, extra_args.get("alpha", 1.0),
                                    extra_args.get("delta_t", 0.1))
        per["sem_sigma"] = sem[:n]
        per["sem_sigma_next"] = sem[1 : n + 1]
        step = _sefi_euler_step(model_fn,
                                int(extra_args.get("sem_channels", 16)))
    elif method == "euler_a":
        # reference euler_a with eta==0 uses the deterministic ratio form
        if eta == 0.0:
            per["sigma_down"] = per["sigma_next"]
            per["sigma_up"] = np.zeros(n, dtype=np.float32)
        step = _euler_a_step(model_fn, is_flow)
    elif method == "euler_cfg_pp":
        step = _euler_cfg_pp_step(model_fn)
    elif method == "euler_a_cfg_pp":
        d, u, _ = ancestral_steps(sigmas, eta, False)
        per["sigma_down"], per["sigma_up"] = d, u
        step = _euler_a_cfg_pp_step(model_fn)
    elif method == "euler_ge":
        gamma = float(extra_args.get("gamma", 2.0))
        step = _euler_ge_step(model_fn, is_flow, gamma)
        carry.update(old_d=jnp.zeros_like(x), has_old=jnp.float32(0.0))
    elif method == "heun":
        step = _heun_step(model_fn)
    elif method == "dpm2":
        step = _dpm2_step(model_fn)
    elif method == "dpm++2s_a":
        if is_flow:
            d, u, a = ancestral_steps(sigmas, eta, True)
            per["sigma_down"], per["sigma_up"], per["alpha_scale"] = d, u, a
            step = _dpmpp_2s_a_flow_step(model_fn)
        else:
            d, u, _ = ancestral_steps(sigmas, eta, False)
            per["sigma_down"], per["sigma_up"] = d, u
            step = _dpmpp_2s_a_step(model_fn)
    elif method in ("dpm++2m", "dpm++2m_v2"):
        per.update(_dpmpp_2m_coeffs(sigmas, v2=method.endswith("v2")))
        step = _dpmpp_2m_step(model_fn, v2=method.endswith("v2"))
        carry.update(old_denoised=x)
    elif method in ("dpm++2m_sde", "dpm++2m_sde_bt"):
        per["eta"] = np.full(n, eta, dtype=np.float32)
        step = _dpmpp_2m_sde_step(model_fn)
        carry.update(old_denoised=x, have_old=jnp.float32(0.0), h_last=jnp.float32(1.0))
    elif method in ("ipndm", "ipndm_v"):
        per["h_prev"] = _ipndm_h_prev(sigmas)
        step = _ipndm_step(model_fn, variable_step=method == "ipndm_v")
        carry.update(hist=jnp.zeros((3,) + x.shape, dtype=x.dtype))
    elif method == "lcm":
        ns_start = float(extra_args.get("noise_scale_start", 1.0))
        ns_end = float(extra_args.get("noise_scale_end", ns_start))
        t = np.arange(n, dtype=np.float32) / max(n - 1, 1)
        per["noise_scale"] = (ns_start + (ns_end - ns_start) * t).astype(np.float32)
        step = _lcm_step(model_fn, is_flow, None)
    elif method == "tcd":
        per.update(_tcd_coeffs(sigmas, eta))
        step = _tcd_step(model_fn)
    elif method == "res_multistep":
        step = _res_multistep_step(model_fn, is_flow)
        carry.update(
            old_denoised=x, have_old=jnp.float32(0.0), old_sigma_down=jnp.float32(1.0)
        )
    elif method == "res_2s":
        step = _res_2s_step(model_fn, is_flow)
    elif method == "er_sde":
        per.update(_er_sde_coeffs(sigmas, eta, is_flow))
        step = _er_sde_step(model_fn)
        carry.update(
            old_denoised=x,
            have_old=jnp.float32(0.0),
            old_denoised_d=jnp.zeros_like(x),
            have_old_d=jnp.float32(0.0),
        )
    else:
        raise ValueError(f"unknown sample method {method!r}")

    if stateful is not None:
        carry["mstate"] = stateful.init_state
        inner_step = step

        def step(c, s):
            c = dict(c)
            _cell["s"] = c.pop("mstate")
            nc = dict(inner_step(c, s))
            nc["mstate"] = _cell["s"]
            return nc

    per_step = {k: jnp.asarray(v) for k, v in per.items()}
    if noises is not None:
        per_step["noise"] = noises
    return step, carry, per_step

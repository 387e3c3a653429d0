"""Test-only numpy transcriptions of the reference sampler loops
(src/runtime/denoiser.hpp:1488-2726) used as oracles for the scan versions."""
import math

import numpy as np


def ancestral_step(sigma_from, sigma_to, eta=1.0):
    sigma_up = 0.0
    sigma_down = sigma_to
    if eta <= 0.0:
        return sigma_down, sigma_up
    if sigma_from**2 > 0:
        term = sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2
        sigma_up = min(sigma_to, eta * math.sqrt(max(term, 0.0)))
    sd_sq = sigma_to**2 - sigma_up**2
    sigma_down = math.sqrt(sd_sq) if sd_sq > 0 else 0.0
    return sigma_down, sigma_up


def ancestral_step_flow(sigma_from, sigma_to, eta=1.0):
    sigma_down, sigma_up, alpha_scale = sigma_to, 0.0, 1.0
    if eta <= 0.0 or sigma_from <= 0.0 or sigma_to <= 0.0:
        return sigma_down, sigma_up, alpha_scale
    eta = min(eta, 1.0)
    ratio = sigma_to / sigma_from
    sigma_down = sigma_to * (1.0 + (ratio - 1.0) * eta)
    sigma_down = max(0.0, min(sigma_to, sigma_down))
    denom = 1.0 - sigma_down
    if denom <= 0.0:
        return sigma_to, sigma_up, alpha_scale
    alpha_scale = (1.0 - sigma_to) / denom
    term = max(-1.0, min(1.0, (sigma_down / sigma_to) * alpha_scale))
    sigma_up = sigma_to * math.sqrt(max(1.0 - term * term, 0.0))
    return sigma_down, sigma_up, alpha_scale


def sample_euler(model, x, sigmas):
    for i in range(len(sigmas) - 1):
        den, _ = model(x, sigmas[i], i)
        d = (x - den) / sigmas[i]
        x = x + d * (sigmas[i + 1] - sigmas[i])
    return x


def sample_euler_ancestral(model, x, sigmas, noises, eta=0.0, is_flow=False):
    for i in range(len(sigmas) - 1):
        sigma, sigma_to = sigmas[i], sigmas[i + 1]
        den, _ = model(x, sigma, i)
        if sigma_to == 0.0:
            x = den
        elif eta == 0.0:
            r = sigma_to / sigma
            x = r * x + (1 - r) * den
        else:
            if is_flow:
                sd, su, al = ancestral_step_flow(sigma, sigma_to, eta)
            else:
                sd, su = ancestral_step(sigma, sigma_to, eta)
                al = 1.0
            r = sd / sigma
            x = r * x + (1 - r) * den
            if su > 0:
                if is_flow:
                    x = x * al
                x = x + noises[i] * su
    return x


def sample_heun(model, x, sigmas):
    for i in range(len(sigmas) - 1):
        den, _ = model(x, sigmas[i], i)
        d = (x - den) / sigmas[i]
        dt = sigmas[i + 1] - sigmas[i]
        if sigmas[i + 1] == 0:
            x = x + d * dt
        else:
            x2 = x + d * dt
            den2, _ = model(x2, sigmas[i + 1], i)
            d2 = (d + (x2 - den2) / sigmas[i + 1]) / 2.0
            x = x + d2 * dt
    return x


def sample_dpm2(model, x, sigmas):
    for i in range(len(sigmas) - 1):
        den, _ = model(x, sigmas[i], i)
        d = (x - den) / sigmas[i]
        if sigmas[i + 1] == 0:
            x = x + d * (sigmas[i + 1] - sigmas[i])
        else:
            sigma_mid = math.exp(0.5 * (math.log(sigmas[i]) + math.log(sigmas[i + 1])))
            x2 = x + d * (sigma_mid - sigmas[i])
            den2, _ = model(x2, sigma_mid, i)
            x = x + ((x2 - den2) / sigma_mid) * (sigmas[i + 1] - sigmas[i])
    return x


def sample_dpmpp_2s_a(model, x, sigmas, noises, eta=0.0):
    for i in range(len(sigmas) - 1):
        den, _ = model(x, sigmas[i], i)
        sd, su = ancestral_step(sigmas[i], sigmas[i + 1], eta)
        if sd == 0:
            x = den
        else:
            t, t_next = -math.log(sigmas[i]), -math.log(sd)
            h = t_next - t
            s = t + 0.5 * h
            sigma_s = math.exp(-s)
            x2 = (sigma_s / math.exp(-t)) * x - (math.exp(-h * 0.5) - 1) * den
            den2, _ = model(x2, sigma_s, i)
            x = (math.exp(-t_next) / math.exp(-t)) * x - (math.exp(-h) - 1) * den2
        if sigmas[i + 1] > 0:
            x = x + noises[i] * su
    return x


def sample_dpmpp_2m(model, x, sigmas, v2=False):
    old_den = x
    t_fn = lambda s: -math.log(s)
    for i in range(len(sigmas) - 1):
        den, _ = model(x, sigmas[i], i)
        t, t_next = t_fn(sigmas[i]), t_fn(max(sigmas[i + 1], 1e-20))
        h = t_next - t
        a = sigmas[i + 1] / sigmas[i]
        if i == 0 or sigmas[i + 1] == 0:
            b = math.exp(-h) - 1.0
            x = a * x - b * den
        else:
            h_last = t - t_fn(sigmas[i - 1])
            if v2:
                h_min, h_max = min(h_last, h), max(h_last, h)
                r = h_max / h_min
                b = math.exp(-(h_max + h_min) / 2) - 1.0
            else:
                r = h_last / h
                b = math.exp(-h) - 1.0
            den_d = (1 + 1 / (2 * r)) * den - (1 / (2 * r)) * old_den
            x = a * x - b * den_d
        old_den = den
    return x


def sample_dpmpp_2m_sde(model, x, sigmas, noises, eta):
    old_den, have_old, h_last = None, False, 0.0
    for i in range(len(sigmas) - 1):
        den, _ = model(x, sigmas[i], i)
        if sigmas[i + 1] == 0:
            x = den
        else:
            t, s = -math.log(sigmas[i]), -math.log(sigmas[i + 1])
            h = s - t
            eta_h = eta * h
            a = sigmas[i + 1] / sigmas[i] * math.exp(-eta_h)
            b = -math.expm1(-h - eta_h)
            x = a * x + b * den
            if have_old:
                r = h_last / h
                x = x + (0.5 * b / r) * (den - old_den)
            if eta > 0:
                x = x + noises[i] * (sigmas[i + 1] * math.sqrt(-math.expm1(-2 * eta_h)))
            h_last = h
        old_den, have_old = den, True
    return x


def sample_ipndm(model, x, sigmas, variable=False):
    hist = []
    for i in range(len(sigmas) - 1):
        den, _ = model(x, sigmas[i], i)
        d = (x - den) / sigmas[i]
        order = min(4, i + 1)
        h_n = sigmas[i + 1] - sigmas[i]
        h_n_1 = (sigmas[i] - sigmas[i - 1]) if i > 0 else h_n
        if order == 1:
            x = x + d * h_n
        elif order == 2:
            if variable:
                x = x + (((2 + h_n / h_n_1) * d - (h_n / h_n_1) * hist[-1]) / 2) * h_n
            else:
                x = x + ((3 * d - hist[-1]) / 2) * h_n
        elif order == 3:
            x = x + ((23 * d - 16 * hist[-1] + 5 * hist[-2]) / 12) * h_n
        else:
            x = x + ((55 * d - 59 * hist[-1] + 37 * hist[-2] - 9 * hist[-3]) / 24) * h_n
        if len(hist) == 3:
            hist.pop(0)
        hist.append(d)
    return x


def sample_lcm(model, x, sigmas, noises, is_flow=False):
    for i in range(len(sigmas) - 1):
        den, _ = model(x, sigmas[i], i)
        x = den
        if sigmas[i + 1] > 0:
            if is_flow:
                x = x * (1 - sigmas[i + 1])
            x = x + noises[i] * sigmas[i + 1]
    return x


def sample_euler_cfg_pp(model, x, sigmas):
    for i in range(len(sigmas) - 1):
        den, den_u = model(x, sigmas[i], i)
        d = (x - den_u) / sigmas[i]
        x = den + d * sigmas[i + 1]
    return x


def sample_euler_a_cfg_pp(model, x, sigmas, noises, eta):
    for i in range(len(sigmas) - 1):
        den, den_u = model(x, sigmas[i], i)
        d = (x - den_u) / sigmas[i]
        sd, su = ancestral_step(sigmas[i], sigmas[i + 1], eta)
        x = den + d * sd
        if sigmas[i + 1] > 0:
            x = x + noises[i] * su
    return x


def sample_euler_ge(model, x, sigmas, noises, eta, is_flow, gamma=2.0):
    old_d, has_old = None, False
    for i in range(len(sigmas) - 1):
        sigma, sigma_to = sigmas[i], sigmas[i + 1]
        den, _ = model(x, sigma, i)
        if sigma_to == 0:
            x = den
        else:
            if is_flow:
                sd, su, al = ancestral_step_flow(sigma, sigma_to, eta)
            else:
                sd, su = ancestral_step(sigma, sigma_to, eta)
                al = 1.0
            d = (x - den) / sigma
            dt = sd - sigma
            if has_old:
                x = x + (d * gamma + old_d * (1 - gamma)) * dt
            else:
                x = x + d * dt
            old_d, has_old = d, True
            if su > 0:
                if is_flow:
                    x = x * al
                x = x + noises[i] * su
    return x


def sample_res_multistep(model, x, sigmas, noises, eta, is_flow):
    old_den, have_old, old_sd = x, False, 0.0

    def phi1(t):
        if abs(t) < 1e-6:
            return 1 + t / 2 + t * t / 6
        return (math.exp(t) - 1) / t

    def phi2(t):
        if abs(t) < 1e-6:
            return 0.5 + t / 6 + t * t / 24
        return (phi1(t) - 1) / t

    for i in range(len(sigmas) - 1):
        den, _ = model(x, sigmas[i], i)
        if is_flow:
            sd, su, al = ancestral_step_flow(sigmas[i], sigmas[i + 1], eta)
        else:
            sd, su = ancestral_step(sigmas[i], sigmas[i + 1], eta)
            al = 1.0
        if sd == 0 or not have_old:
            x = x + ((x - den) / sigmas[i]) * (sd - sigmas[i])
        else:
            t = -math.log(sigmas[i])
            t_old = -math.log(old_sd)
            t_next = -math.log(sd)
            t_prev = -math.log(sigmas[i - 1])
            h = t_next - t
            c2 = (t_prev - t_old) / h
            b1 = phi1(-h) - phi2(-h) / c2
            b2 = phi2(-h) / c2
            if not math.isfinite(b1):
                b1 = 0.0
            if not math.isfinite(b2):
                b2 = 0.0
            x = math.exp(-h) * x + h * (b1 * den + b2 * old_den)
        if sigmas[i + 1] > 0 and su > 0:
            if is_flow:
                x = x * al
            x = x + noises[i] * su
        old_den, old_sd, have_old = den, sd, True
    return x


def sample_res_2s(model, x, sigmas, noises, eta, is_flow):
    c2 = 0.5

    def phi1(t):
        if abs(t) < 1e-6:
            return 1 + t / 2 + t * t / 6
        return (math.exp(t) - 1) / t

    def phi2(t):
        if abs(t) < 1e-6:
            return 0.5 + t / 6 + t * t / 24
        return (phi1(t) - 1) / t

    for i in range(len(sigmas) - 1):
        den, _ = model(x, sigmas[i], i)
        if is_flow:
            sd, su, al = ancestral_step_flow(sigmas[i], sigmas[i + 1], eta)
        else:
            sd, su = ancestral_step(sigmas[i], sigmas[i + 1], eta)
            al = 1.0
        x0 = x
        if sd == 0 or sigmas[i] == 0:
            x = den
        else:
            t = -math.log(sigmas[i])
            t_next = -math.log(sd)
            h = t_next - t
            a21 = c2 * phi1(-h * c2)
            b2 = phi2(-h) / c2
            b1 = phi1(-h) - b2
            sigma_c2 = math.exp(-(t + h * c2))
            eps1 = den - x0
            x2 = x0 + eps1 * (h * a21)
            den2, _ = model(x2, sigma_c2, i)
            eps2 = den2 - x0
            x = x0 + h * (b1 * eps1 + b2 * eps2)
        if sigmas[i + 1] > 0 and su > 0:
            if is_flow:
                x = x * al
            x = x + noises[i] * su
    return x


def sample_er_sde(model, x, sigmas, noises, eta, is_flow):
    sigmas = list(np.asarray(sigmas, dtype=np.float32))
    max_stage, num_pts = 3, 200
    s_noise = eta

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

    def scaler(v):
        v = max(v, 0.0)
        return v * (math.exp(v**0.3) + 10.0)

    if is_flow:
        for i in range(len(sigmas) - 1):
            if sigmas[i] > 1.0:
                sigmas[i] = flow_sigma(sigmas[i])
    lam = [to_lambda(float(s)) for s in sigmas]

    old_den = old_den_d = None
    have_old = have_old_d = False
    for i in range(len(sigmas) - 1):
        den, _ = model(x, sigmas[i], i)
        stage = min(max_stage, i + 1)
        if sigmas[i + 1] == 0:
            x = den
        else:
            l_s, l_t = lam[i], lam[i + 1]
            a_s, a_t = to_alpha(float(sigmas[i])), to_alpha(float(sigmas[i + 1]))
            sc_s, sc_t = scaler(l_s), scaler(l_t)
            r_alpha = a_t / a_s if a_s > 0 else 0.0
            r = sc_t / sc_s if sc_s > 0 else 0.0
            x = r_alpha * r * x + a_t * (1 - r) * den
            if stage >= 2 and have_old:
                dt = l_t - l_s
                step_sz = -dt / num_pts
                ssum = s_u = 0.0
                for p in range(num_pts):
                    pos = l_t + p * step_sz
                    sp = scaler(pos)
                    if sp <= 0:
                        continue
                    ssum += 1 / sp
                    if stage >= 3 and have_old_d:
                        s_u += (pos - l_s) / sp
                ssum *= step_sz
                denom_d = l_s - lam[i - 1]
                if abs(denom_d) > 1e-12:
                    coeff_d = a_t * (dt + ssum * sc_t)
                    den_d = (den - old_den) / denom_d
                    x = x + coeff_d * den_d
                    if stage >= 3 and have_old_d:
                        denom_u = (l_s - lam[i - 2]) * 0.5
                        if abs(denom_u) > 1e-12:
                            s_u *= step_sz
                            coeff_u = a_t * (0.5 * dt * dt + s_u * sc_t)
                            den_u = (den_d - old_den_d) / denom_u
                            x = x + coeff_u * den_u
                    old_den_d, have_old_d = den_d, True
            nsq = l_t * l_t - l_s * l_s * r * r
            if s_noise > 0 and nsq > 0:
                x = x + noises[i] * (a_t * math.sqrt(max(nsq, 0.0)))
        old_den, have_old = den, True
    return x


def sample_tcd(model, x, sigmas, noises, eta, alphas_cumprod):
    compvis_sigmas = np.sqrt((1 - alphas_cumprod) / alphas_cumprod)
    for i in range(len(sigmas) - 1):
        sigma, sigma_to = sigmas[i], sigmas[i + 1]
        idx = int(np.searchsorted(compvis_sigmas, sigma_to))
        if idx == 0:
            prev_t = 0
        elif idx >= len(compvis_sigmas):
            prev_t = len(compvis_sigmas) - 1
        else:
            prev_t = idx if abs(compvis_sigmas[idx] - sigma_to) < abs(compvis_sigmas[idx - 1] - sigma_to) else idx - 1
        timestep_s = int(math.floor((1 - eta) * prev_t))
        den, _ = model(x, sigma, i)
        d = (x - den) / sigma
        ap_t_prev = 1.0 / (sigma_to**2 + 1.0)
        ap_s = float(alphas_cumprod[timestep_s])
        bp_s = 1.0 - ap_s
        x = math.sqrt(ap_s / ap_t_prev) * den + math.sqrt(bp_s / ap_t_prev) * d
        if eta > 0 and sigma_to > 0:
            x = math.sqrt(ap_t_prev / ap_s) * x + math.sqrt(1.0 / ap_t_prev - 1.0 / ap_s) * noises[i]
    return x

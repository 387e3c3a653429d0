"""Step caches — skip whole diffusion forwards by reusing cached residuals.

Reference analog: src/runtime/{sample-cache.h,easycache.hpp,ucache.hpp}.
EasyCache: tracks the input change rate vs. output change rate of an anchor
condition; when the accumulated predicted output change stays under a reuse
threshold, the step's model call is skipped and the cached input→output diff
is re-applied (easycache.hpp:146-204).

These wrap model_fn for the host-driven sampler (sample_stepwise) — the skip
decision is data-dependent host control flow, which is exactly the case where
a python-driven loop beats a traced scan.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np


@dataclasses.dataclass
class EasyCacheConfig:
    reuse_threshold: float = 0.2
    start_percent: float = 0.15
    end_percent: float = 0.95


class EasyCache:
    """Wraps model_fn(x, sigma, i) → (pred, uncond) with forward-skipping."""

    def __init__(self, model_fn: Callable, config: EasyCacheConfig, denoiser, total_steps: int):
        self.model_fn = model_fn
        self.config = config
        # sigma window from percents (reference percent_to_sigma)
        self.start_sigma = self._percent_to_sigma(denoiser, config.start_percent)
        self.end_sigma = self._percent_to_sigma(denoiser, config.end_percent)
        self.reset()

    @staticmethod
    def _percent_to_sigma(denoiser, percent: float) -> float:
        if percent <= 0.0:
            return float("inf")
        if percent >= 1.0:
            return 0.0
        t = (1.0 - percent) * 999.0
        return float(denoiser.t_to_sigma(np.float32(t)))

    def reset(self):
        self.prev_input = None
        self.prev_output = None
        self.cache_diff = None
        self.output_prev_norm = None
        self.relative_rate = None
        self.cumulative_change = 0.0
        self.steps_skipped = 0

    def __call__(self, x, sigma, i):
        s = float(sigma) if not hasattr(sigma, "shape") or sigma.shape == () else float(np.asarray(sigma))
        active = self.start_sigma >= s > self.end_sigma
        if not active:
            out = self.model_fn(x, sigma, i)
            return out

        xin = np.asarray(x, dtype=np.float32)
        self._last_input_change = None
        if self.prev_input is not None and self.cache_diff is not None:
            input_change = float(np.abs(xin - self.prev_input).mean())
            self._last_input_change = input_change
            if self.output_prev_norm and self.relative_rate is not None and input_change > 0:
                approx_rate = self.relative_rate * input_change / self.output_prev_norm
                self.cumulative_change += approx_rate
                if self.cumulative_change < self.config.reuse_threshold:
                    self.steps_skipped += 1
                    pred = xin + self.cache_diff
                    return pred, pred
                self.cumulative_change = 0.0

        pred, uncond = self.model_fn(x, sigma, i)
        out = np.asarray(pred, dtype=np.float32)
        self.cache_diff = out - xin
        if self.prev_output is not None and self._last_input_change:
            output_change = float(np.abs(out - self.prev_output).mean())
            if self._last_input_change > 0 and output_change > 0:
                rate = output_change / self._last_input_change
                if np.isfinite(rate):
                    self.relative_rate = rate
        self.prev_input = xin
        self.prev_output = out
        self.output_prev_norm = float(np.abs(out).mean())
        self.cumulative_change = 0.0
        return pred, uncond


@dataclasses.dataclass
class UCacheConfig:
    threshold: float = 0.1
    start_percent: float = 0.1
    end_percent: float = 0.95


class UCache:
    """Residual + accumulated-error cache (reference ucache.hpp): skip while
    the accumulated relative input drift stays below the threshold."""

    def __init__(self, model_fn: Callable, config: UCacheConfig, denoiser, total_steps: int):
        self.model_fn = model_fn
        self.config = config
        self.start_sigma = EasyCache._percent_to_sigma(denoiser, config.start_percent)
        self.end_sigma = EasyCache._percent_to_sigma(denoiser, config.end_percent)
        self.reset()

    def reset(self):
        self.prev_input = None
        self.cache_diff = None
        self.acc_error = 0.0
        self.steps_skipped = 0

    def __call__(self, x, sigma, i):
        s = float(np.asarray(sigma))
        active = self.start_sigma >= s > self.end_sigma
        xin = np.asarray(x, dtype=np.float32)
        if active and self.prev_input is not None and self.cache_diff is not None:
            denom = float(np.abs(self.prev_input).mean()) or 1.0
            drift = float(np.abs(xin - self.prev_input).mean()) / denom
            self.acc_error += drift
            if self.acc_error < self.config.threshold:
                self.steps_skipped += 1
                pred = xin + self.cache_diff
                return pred, pred
            self.acc_error = 0.0
        pred, uncond = self.model_fn(x, sigma, i)
        out = np.asarray(pred, dtype=np.float32)
        if active:
            self.cache_diff = out - xin
            self.prev_input = xin
        return pred, uncond


CACHE_TYPES = {"easycache": (EasyCache, EasyCacheConfig), "ucache": (UCache, UCacheConfig)}


def make_step_cache(kind: str, model_fn, denoiser, total_steps: int, **kwargs):
    if kind not in CACHE_TYPES:
        raise ValueError(f"unknown step cache {kind!r}; choose from {sorted(CACHE_TYPES)}")
    cls, cfg_cls = CACHE_TYPES[kind]
    cfg_fields = {f.name for f in dataclasses.fields(cfg_cls)}
    cfg = cfg_cls(**{k: v for k, v in kwargs.items() if k in cfg_fields})
    return cls(model_fn, cfg, denoiser, total_steps)

"""LoRA / LoCon loading and weight merging.

Reference analog: LoraModel::apply merge graphs (src/model/adapter/lora.hpp:
845-865) — the "immediately" apply mode: w' = w + mult * (alpha/rank) * up@down.
Runtime-patch mode (MultiLoraAdapter analog) is layered on top in a later
round; on TPU, merge-on-load is usually the right call because weights live in
HBM and re-merging is a cheap one-time device pass per LoRA-set epoch
(reference ModelManager lora epochs, src/model_manager.h:73).

Supported key styles: kohya (lora_unet_*/lora_te_* with lora_down/lora_up +
alpha), PEFT (lora_A/lora_B), diffusers-attn-processor.
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np


def _flatten_key(name: str) -> str:
    return name.replace(".", "_")


def group_lora_tensors(tensors: Dict[str, np.ndarray]):
    """Group raw LoRA checkpoint tensors → {module_key: {down, up, alpha, mid}}."""
    groups: Dict[str, dict] = {}
    for name, arr in tensors.items():
        m = re.match(
            r"(.*)\.(lora_down|lora_up|lora_A|lora_B|alpha|lora_mid|dora_scale"
            r"|hada_w1_a|hada_w1_b|hada_t1|hada_w2_a|hada_w2_b|hada_t2"
            r"|lokr_w1_a|lokr_w1_b|lokr_w1|lokr_w2_a|lokr_w2_b|lokr_w2"
            r")\.?(weight)?$", name)
        if not m:
            m2 = re.match(r"(.*)\.alpha$", name)
            if m2:
                groups.setdefault(m2.group(1), {})["alpha"] = float(np.asarray(arr).reshape(-1)[0])
            continue
        key, kind = m.group(1), m.group(2)
        g = groups.setdefault(key, {})
        if kind in ("lora_down", "lora_A"):
            g["down"] = arr
        elif kind in ("lora_up", "lora_B"):
            g["up"] = arr
        elif kind == "lora_mid":
            g["mid"] = arr
        elif kind == "alpha":
            g["alpha"] = float(np.asarray(arr).reshape(-1)[0])
        else:  # LoHa / LoKr factors keep their own names
            g[kind] = arr
    return groups


_KOHYA_PREFIXES = (
    ("lora_unet_", "diffusion"),
    ("lora_te1_", "clip_l"),
    ("lora_te2_", "clip_g"),
    ("lora_te_", "clip_l"),
    ("unet.", "diffusion"),
    ("text_encoder.", "clip_l"),
)


def resolve_target(
    lora_key: str, param_names_by_module: Dict[str, Dict[str, str]]
) -> Optional[Tuple[str, str]]:
    """LoRA module key → (module, canonical param name of the .weight)."""
    for prefix, module in _KOHYA_PREFIXES:
        if not lora_key.startswith(prefix):
            continue
        flat = lora_key[len(prefix) :]
        lookup = param_names_by_module.get(module)
        if lookup and flat in lookup:
            return module, lookup[flat]
    # diffusers processor style: unet.<path>.processor.to_q_lora etc.
    m = re.match(r"unet\.(.*)\.processor\.(to_[qkv]|to_out)_lora", lora_key)
    if m:
        path = m.group(1) + "." + m.group(2) + (".0" if m.group(2) == "to_out" else "")
        lookup = param_names_by_module.get("diffusion", {})
        flat = _flatten_key(path)
        if flat in lookup:
            return "diffusion", lookup[flat]
    return None


def build_lookup(param_names_by_module: Dict[str, list]) -> Dict[str, Dict[str, str]]:
    """module → {flattened_name_without_weight: canonical name}."""
    out: Dict[str, Dict[str, str]] = {}
    for module, names in param_names_by_module.items():
        d = {}
        for n in names:
            if n.endswith(".weight"):
                d[_flatten_key(n[: -len(".weight")])] = n
        out[module] = d
    return out


def _loha_delta(g: dict, mult: float) -> Optional[np.ndarray]:
    """LoHa: (w1_a @ w1_b) ⊙ (w2_a @ w2_b) * alpha/rank (reference
    get_loha_weight_diff, lora.hpp:302-404; tucker t1/t2 variants)."""
    parts = []
    for k in ("1", "2"):
        a = g.get(f"hada_w{k}_a")
        b = g.get(f"hada_w{k}_b")
        if a is None or b is None:
            return None
        t = g.get(f"hada_t{k}")
        a = a.astype(np.float32)
        b = b.astype(np.float32)
        if t is not None:
            # tucker: t [r, r, kh, kw]; a/b [r, dim]
            w = np.einsum("rsxy,ro,si->oixy", t.astype(np.float32), a, b)
        elif b.ndim > 2:
            r = b.shape[0]
            w = (a.reshape(-1, r) @ b.reshape(r, -1)).reshape((a.shape[0],) + b.shape[1:])
        else:
            w = a @ b
        parts.append(w)
    if parts[0].shape != parts[1].shape:
        return None
    rank = g["hada_w1_b"].shape[0]
    alpha = g.get("alpha", float(rank))
    return parts[0] * parts[1] * (mult * alpha / rank)


def _lokr_delta(g: dict, mult: float) -> Optional[np.ndarray]:
    """LoKr: kron(w1, w2) * alpha/rank (reference get_lokr_weight_diff,
    lora.hpp:405-524); either factor may itself be low-rank (a @ b)."""
    rank = 1

    def factor(k):
        nonlocal rank
        w = g.get(f"lokr_w{k}")
        if w is not None:
            return w.astype(np.float32)
        a, b = g.get(f"lokr_w{k}_a"), g.get(f"lokr_w{k}_b")
        if a is None or b is None:
            return None
        rank = b.shape[0]
        a = a.astype(np.float32)
        b = b.astype(np.float32)
        if b.ndim > 2:
            r = b.shape[0]
            return (a.reshape(-1, r) @ b.reshape(r, -1)).reshape(
                (a.shape[0],) + b.shape[1:])
        return a @ b

    w1, w2 = factor(1), factor(2)
    if w1 is None or w2 is None:
        return None
    alpha = g.get("alpha", float(rank))
    scale = 1.0 if rank == 1 else alpha / rank
    if w2.ndim > 2:  # conv kron: w1 [o1,i1], w2 [o2,i2,kh,kw]
        out = np.einsum("ab,cdxy->acbdxy", w1, w2)
        out = out.reshape(w1.shape[0] * w2.shape[0], w1.shape[1] * w2.shape[1],
                          *w2.shape[2:])
    else:
        out = np.kron(w1, w2)
    return out * (mult * scale)


def lora_delta(g: dict, mult: float) -> Optional[np.ndarray]:
    """delta W for one group: mult * (alpha/rank) * up @ (mid?) @ down.
    Falls through to LoHa / LoKr compositions by key presence."""
    down, up = g.get("down"), g.get("up")
    if down is None or up is None:
        if "hada_w1_a" in g:
            return _loha_delta(g, mult)
        if any(k.startswith("lokr_") for k in g):
            return _lokr_delta(g, mult)
        return None
    rank = down.shape[0]
    alpha = g.get("alpha", float(rank))
    scale = mult * alpha / rank
    if down.ndim == 2:
        delta = (up.astype(np.float32) @ down.astype(np.float32)) * scale
    else:
        # conv LoRA / LoCon: down [r, in, kh, kw], up [out, r, 1, 1]
        r, in_c, kh, kw = down.shape
        mid = g.get("mid")
        if mid is not None:
            # tucker (LoCon mid): delta = up · (mid composed with down)
            # mid [r, r, kh, kw] contracted with down [r, in, 1, 1]
            m_ = mid.astype(np.float32)
            dn_ = down.astype(np.float32).reshape(r, in_c)
            mid_down = np.einsum("rsxy,si->rixy", m_, dn_)
            u = up.astype(np.float32).reshape(-1, r)
            return np.einsum("or,rixy->oixy", u, mid_down) * scale
        u = up.astype(np.float32).reshape(-1, r)
        dn = down.astype(np.float32).reshape(r, -1)
        delta = (u @ dn).reshape(u.shape[0], in_c, kh, kw) * scale
    return delta


def _lowrank_factors(g: dict, multiplier: float, w_shape):
    """(down [r,in], up·scale [out,r]) for runtime attachment, or None when
    the group isn't plain-LoRA-shaped (LoHa/LoKr/conv always merge)."""
    if "down" not in g or "up" not in g:
        return None
    if g["down"].ndim != 2 and g["down"].shape[2:] != (1, 1):
        return None
    down = np.asarray(g["down"], dtype=np.float32).reshape(
        g["down"].shape[0], -1)
    up = np.asarray(g["up"], dtype=np.float32).reshape(g["up"].shape[0], -1)
    rank = down.shape[0]
    up = up * (multiplier * (g.get("alpha", rank) / rank))
    if down.shape[1] != w_shape[1] or up.shape[0] != w_shape[0]:
        return None
    return down, up


def apply_lora(
    params_by_module: Dict[str, Dict[str, "np.ndarray"]],
    lora_tensors: Dict[str, np.ndarray],
    multiplier: float = 1.0,
    mode: str = "auto",
) -> Tuple[int, int]:
    """Merge a LoRA into module param dicts in place. Returns (applied, total).

    mode (reference --lora-apply-mode, common.cpp:664):
    - "auto": quantized bases attach runtime low-rank factors, dense bases
      merge immediately (the reference's auto resolution).
    - "immediately": always fold into the base — quantized weights dequant →
      merge → requantize on their own grid (QuantTensor per-row int8,
      Q4Tensor 4-bit blocks, GroupQuantTensor ggml group grid).
    - "at_runtime": always attach factors — dense bases become LoraTensor
      (base untouched; detachable/stackable).  Grids with no runtime path
      (Q4/Group conv, LoHa/LoKr) fall back to their merge form.
    """
    import jax.numpy as jnp

    groups = group_lora_tensors(lora_tensors)
    lookup = build_lookup({m: list(p.keys()) for m, p in params_by_module.items()})
    applied = 0
    for key, g in groups.items():
        target = resolve_target(key, lookup)
        if target is None:
            continue
        module, pname = target
        w = params_by_module[module][pname]
        tname = type(w).__name__
        if tname == "Q4Tensor":
            # packed 4-bit base: dequant → merge → requant on the same grid
            # (sub-8-bit has no runtime path; both explicit modes merge)
            from sdtpu.ops.quant import dequantize_q4, quantize_q4

            delta = lora_delta(g, multiplier)
            if delta is None or tuple(delta.shape) != tuple(w.shape):
                continue
            dense = np.asarray(dequantize_q4(w, jnp.float32)) + np.asarray(delta)
            params_by_module[module][pname] = quantize_q4(dense)
            applied += 1
            continue
        if tname == "GroupQuantTensor":
            # ggml-grid base (keep-quant GGUF): dequant → merge → requant on
            # the checkpoint's own group size
            from sdtpu.ops.quant import dequantize_group, quantize_group

            delta = lora_delta(g, multiplier)
            if delta is None or tuple(delta.shape) != tuple(w.shape):
                continue
            dense = (np.asarray(dequantize_group(w, jnp.float32))
                     + np.asarray(delta))
            params_by_module[module][pname] = quantize_group(dense,
                                                             group=w.group)
            applied += 1
            continue
        if tname in ("QuantTensor", "QuantLoraTensor"):
            if mode == "immediately":
                # fold everything (incl. previously attached runtime ranks)
                # into a fresh per-row int8 base (reference immediately mode
                # requantizes, stable-diffusion.cpp:928-957)
                from sdtpu.ops.quant import (QuantTensor, dequantize,
                                             quantize_per_channel)

                delta = lora_delta(g, multiplier)
                if delta is None or tuple(delta.shape) != tuple(w.shape):
                    continue
                dense = np.asarray(
                    dequantize(QuantTensor(w.q, w.scale), jnp.float32),
                    dtype=np.float32)
                if tname == "QuantLoraTensor":
                    dense = dense + (np.asarray(w.lora_up, np.float32)
                                     @ np.asarray(w.lora_down, np.float32))
                params_by_module[module][pname] = quantize_per_channel(
                    dense + np.asarray(delta))
                applied += 1
                continue
            # default: attach runtime low-rank factors instead of merging
            # (reference at_runtime mode for quantized weights)
            from sdtpu.ops.quant import QuantLoraTensor

            fac = _lowrank_factors(g, multiplier, w.shape)
            if fac is None:
                continue
            down, up = fac
            if tname == "QuantLoraTensor":  # stack ranks
                down = np.concatenate([np.asarray(w.lora_down), down], axis=0)
                up = np.concatenate([np.asarray(w.lora_up), up], axis=1)
            params_by_module[module][pname] = QuantLoraTensor(
                q=w.q, scale=w.scale,
                lora_down=jnp.asarray(down), lora_up=jnp.asarray(up),
            )
            applied += 1
            continue
        if mode == "at_runtime" and getattr(w, "ndim", 0) == 2 or \
                tname == "LoraTensor":
            # dense base, runtime attachment requested (or already attached)
            from sdtpu.ops.quant import LoraTensor

            base = w.w if tname == "LoraTensor" else w
            fac = _lowrank_factors(g, multiplier, base.shape)
            if fac is None:
                # non-plain composition — fall through to merge on the base
                delta = lora_delta(g, multiplier)
                if delta is None or tuple(delta.shape) != tuple(base.shape):
                    continue
                merged = (jnp.asarray(base, dtype=jnp.float32)
                          + jnp.asarray(delta)).astype(base.dtype)
                params_by_module[module][pname] = (
                    LoraTensor(merged, w.lora_down, w.lora_up)
                    if tname == "LoraTensor" else merged)
                applied += 1
                continue
            down, up = fac
            if tname == "LoraTensor":  # stack ranks
                down = np.concatenate([np.asarray(w.lora_down), down], axis=0)
                up = np.concatenate([np.asarray(w.lora_up), up], axis=1)
            params_by_module[module][pname] = LoraTensor(
                w=base, lora_down=jnp.asarray(down), lora_up=jnp.asarray(up))
            applied += 1
            continue
        delta = lora_delta(g, multiplier)
        if delta is None:
            continue
        if tuple(delta.shape) != tuple(w.shape):
            if delta.ndim == 2 and w.ndim == 4 and delta.shape == tuple(w.shape[:2]):
                delta = delta.reshape(delta.shape + (1, 1))
            else:
                continue
        params_by_module[module][pname] = (
            jnp.asarray(w, dtype=jnp.float32) + jnp.asarray(delta)
        ).astype(w.dtype)
        applied += 1
    return applied, len(groups)

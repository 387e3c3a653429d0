"""Krea2: a single-stream GQA DiT with sigmoid-gated attention, a SHARED
per-block 6-way modulation (a learned bias added to the projected timestep
vector), a text-fusion transformer that first attends ACROSS the selected
LLM layers per token and then across tokens, and flux-style RoPE with
theta 1000.

Reference analog: Krea2::Krea2Model / Krea2Runner
(src/model/diffusion/krea2.hpp:594,697).  Checkpoint names: ``first``,
``tmlp.{0,2}``, ``tproj.1``, ``txtfusion.{layerwise_blocks,refiner_blocks}.N.
{prenorm.scale, postnorm.scale, attn.{wq,wk,wv,gate,qknorm.{qnorm,knorm}.
scale,wo}, mlp.{gate,up,down}}``, ``txtfusion.projector``, ``txtmlp.{0.scale,
1,3}``, ``blocks.N.{mod.lin, prenorm.scale, postnorm.scale, attn.*, mlp.*}``,
``last.{norm.scale, linear, modulation.lin}``.

Krea RMS norms store their scale as (1 + weight) offsets (KreaRMSNorm,
krea2.hpp:164).  Latents are Wan-VAE 16-ch (image mode); flow uses the
flux-flow denoiser with default shift 1.15.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.models.flux import apply_rope, rope_freqs
from sdtpu.ops import attention, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import gelu, gelu_tanh, silu


@dataclasses.dataclass(frozen=True)
class Krea2Config:
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    features: int = 6144
    timestep_dim: int = 256
    text_dim: int = 2560
    text_layers: int = 12
    layers: int = 28
    heads: int = 48
    kv_heads: int = 12
    text_heads: int = 20
    text_kv_heads: int = 20
    mlp_multiplier: int = 4
    theta: float = 1000.0
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.features // self.heads

    @property
    def axes_dim(self) -> Tuple[int, int, int]:
        unit = self.head_dim // 16
        return (self.head_dim - 12 * unit, 6 * unit, 6 * unit)


KREA2_CONFIG = Krea2Config()


def detect_krea2_config(names, shapes) -> Krea2Config:
    names = set(names)
    kw = {}
    fw = shapes.get("first.weight")
    if fw:
        kw["features"] = fw[0]
        kw["in_channels"] = fw[1] // 4
        kw["out_channels"] = kw["in_channels"]
    hd = shapes.get("blocks.0.attn.qknorm.qnorm.scale")
    if hd:
        hd = hd[0]
        kw["heads"] = kw.get("features", 6144) // hd
        wk = shapes.get("blocks.0.attn.wk.weight")
        if wk:
            kw["kv_heads"] = wk[0] // hd
    proj = shapes.get("txtfusion.projector.weight")
    if proj:
        kw["text_layers"] = proj[1]
    td = shapes.get("txtfusion.layerwise_blocks.0.prenorm.scale")
    if td:
        kw["text_dim"] = td[0]
        thd = shapes.get("txtfusion.layerwise_blocks.0.attn.qknorm.qnorm.scale")
        if thd:
            kw["text_heads"] = td[0] // thd[0]
            twk = shapes.get("txtfusion.layerwise_blocks.0.attn.wk.weight")
            if twk:
                kw["text_kv_heads"] = twk[0] // thd[0]
    lw = shapes.get("last.linear.weight")
    if lw:
        kw["out_channels"] = lw[0] // 4
    layers = 0
    for n in names:
        if n.startswith("blocks."):
            layers = max(layers, int(n.split(".")[1]) + 1)
    kw["layers"] = max(1, layers)
    return dataclasses.replace(KREA2_CONFIG, **kw)


def _ceil_mult(v, m):
    return (v + m - 1) // m * m


def _krea_rms(p, name, x, eps=1e-5):
    """KreaRMSNorm: scale applied as (1 + weight) (krea2.hpp:164)."""
    return rms_norm(x, p[name] + 1.0, eps=eps)


def _krea_attn(p, pre, x, rot, heads, kv_heads, head_dim, eps=1e-5):
    """KreaAttention (krea2.hpp:211): GQA + per-head qk (1+w) RMS norm +
    sigmoid gate on the attention output."""
    b, l, _ = x.shape
    q = linear(x, p[f"{pre}.wq.weight"]).reshape(b, l, heads, head_dim)
    k = linear(x, p[f"{pre}.wk.weight"]).reshape(b, l, kv_heads, head_dim)
    v = linear(x, p[f"{pre}.wv.weight"]).reshape(b, l, kv_heads, head_dim)
    q = _krea_rms(p, f"{pre}.qknorm.qnorm.scale", q, eps).transpose(0, 2, 1, 3)
    k = _krea_rms(p, f"{pre}.qknorm.knorm.scale", k, eps).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if rot is not None:
        q = apply_rope(q, rot)
        k = apply_rope(k, rot)
    if kv_heads != heads:
        k = jnp.repeat(k, heads // kv_heads, axis=1)
        v = jnp.repeat(v, heads // kv_heads, axis=1)
    o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(b, l, heads * head_dim)
    gate = jax.nn.sigmoid(linear(x, p[f"{pre}.gate.weight"]).astype(jnp.float32))
    o = o * gate.astype(o.dtype)
    return linear(o, p[f"{pre}.wo.weight"])


def _krea_mlp(p, pre, x):
    gated = silu(linear(x, p[f"{pre}.gate.weight"]))
    up = linear(x, p[f"{pre}.up.weight"])
    return linear(gated * up, p[f"{pre}.down.weight"])


def _fusion_block(p, pre, x, heads, kv_heads, head_dim, eps):
    h = _krea_rms(p, f"{pre}.prenorm.scale", x, eps)
    x = x + _krea_attn(p, f"{pre}.attn", h, None, heads, kv_heads, head_dim, eps)
    h = _krea_rms(p, f"{pre}.postnorm.scale", x, eps)
    return x + _krea_mlp(p, f"{pre}.mlp", h)


def krea2_text_fusion(p, context: jnp.ndarray, cfg: Krea2Config) -> jnp.ndarray:
    """context [B, L, text_layers*text_dim] (layer-major) -> fused
    [B, L, text_dim] (KreaTextFusionTransformer, krea2.hpp:361): two blocks
    attending across the LAYER axis per token, a layer-mixing projection,
    then two blocks across tokens."""
    b, l, _ = context.shape
    thd = cfg.text_dim // cfg.text_heads
    x = context.reshape(b * l, cfg.text_layers, cfg.text_dim)
    for i in range(2):
        x = _fusion_block(p, f"txtfusion.layerwise_blocks.{i}", x,
                          cfg.text_heads, cfg.text_kv_heads, thd, cfg.norm_eps)
    # project across layers: [B*L, layers, D] -> [B*L, 1, D]
    x = jnp.einsum("nld,kl->nkd", x,
                   p["txtfusion.projector.weight"].astype(x.dtype))
    x = x.reshape(b, l, cfg.text_dim)
    for i in range(2):
        x = _fusion_block(p, f"txtfusion.refiner_blocks.{i}", x,
                          cfg.text_heads, cfg.text_kv_heads, thd, cfg.norm_eps)
    return x


def krea2_rope(hp: int, wp: int, n_txt: int, cfg: Krea2Config):
    """txt ids zeros, img grid uncentered (gen_krea2_pe, krea2.hpp:677)."""
    ids = np.zeros((n_txt + hp * wp, 3), dtype=np.float64)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ids[n_txt:, 1] = ii.reshape(-1)
    ids[n_txt:, 2] = jj.reshape(-1)
    return jnp.asarray(rope_freqs(ids, cfg.axes_dim, cfg.theta))


def krea2_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    cfg: Krea2Config = KREA2_CONFIG,
) -> jnp.ndarray:
    """x: [B, H, W, 16] Wan-VAE latent; timesteps: [B] flow t in [0,1];
    context: [B, L, text_layers*text_dim] stacked Qwen3-VL hidden layers."""
    b, hh, ww, c = x.shape
    ps = cfg.patch_size
    pad_h, pad_w = (-hh) % ps, (-ww) % ps
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = (hh + pad_h) // ps, (ww + pad_w) // ps

    # patch_last=true layout: feature (c, py, px) (krea2.hpp:631)
    img = x.reshape(b, hp, ps, wp, ps, c).transpose(0, 1, 3, 5, 2, 4)
    img = img.reshape(b, hp * wp, c * ps * ps)
    img = linear(img, p["first.weight"], p["first.bias"])

    t_emb = timestep_embedding(timesteps * 1000.0, cfg.timestep_dim).astype(img.dtype)
    t = linear(t_emb, p["tmlp.0.weight"], p["tmlp.0.bias"])
    t = linear(gelu_tanh(t), p["tmlp.2.weight"], p["tmlp.2.bias"])  # [B, F]
    tvec = linear(gelu_tanh(t), p["tproj.1.weight"], p["tproj.1.bias"])  # [B, 6F]

    txt = krea2_text_fusion(p, context, cfg)
    txt = _krea_rms(p, "txtmlp.0.scale", txt, cfg.norm_eps)
    txt = linear(txt, p["txtmlp.1.weight"], p["txtmlp.1.bias"])
    txt = linear(gelu_tanh(txt), p["txtmlp.3.weight"], p["txtmlp.3.bias"])
    n_txt = txt.shape[1]

    h = jnp.concatenate([txt, img], axis=1)
    rot = krea2_rope(hp, wp, n_txt, cfg)
    hd = cfg.head_dim
    for i in range(cfg.layers):
        pre = f"blocks.{i}"
        mods = (tvec + p[f"{pre}.mod.lin"][None].astype(tvec.dtype))
        m = jnp.split(mods[:, None], 6, axis=-1)  # shift,scale,gate x2
        a_in = _krea_rms(p, f"{pre}.prenorm.scale", h, cfg.norm_eps)
        a_in = a_in * (1.0 + m[0]) + m[1]
        a = _krea_attn(p, f"{pre}.attn", a_in, rot, cfg.heads, cfg.kv_heads,
                       hd, cfg.norm_eps)
        h = h + a * m[2]
        m_in = _krea_rms(p, f"{pre}.postnorm.scale", h, cfg.norm_eps)
        m_in = m_in * (1.0 + m[3]) + m[4]
        h = h + _krea_mlp(p, f"{pre}.mlp", m_in) * m[5]

    out = h[:, n_txt:]
    # final modulation from t (not tvec): lin [2, F] + t (krea2.hpp:316)
    fm = p["last.modulation.lin"][None].astype(t.dtype) + t[:, None]
    out = _krea_rms(p, "last.norm.scale", out, cfg.norm_eps)
    out = out * (1.0 + fm[:, 0:1]) + fm[:, 1:2]  # scale=row0, shift=row1
    out = linear(out, p["last.linear.weight"], p["last.linear.bias"])
    out = out.reshape(b, hp, wp, cfg.out_channels, ps, ps)
    out = out.transpose(0, 1, 4, 2, 5, 3).reshape(b, hp * ps, wp * ps,
                                                  cfg.out_channels)
    if pad_h or pad_w:
        out = out[:, :hh, :ww]
    return out


def init_krea2_params(cfg: Krea2Config, seed: int = 0, dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def lin(p, pre, din, dout, bias=False):
        p[f"{pre}.weight"] = wt(dout, din)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((dout,), dtype=dtype)

    def attn_w(p, pre, dim, heads, kv_heads):
        hd = dim // heads
        lin(p, f"{pre}.wq", dim, heads * hd)
        lin(p, f"{pre}.wk", dim, kv_heads * hd)
        lin(p, f"{pre}.wv", dim, kv_heads * hd)
        lin(p, f"{pre}.gate", dim, dim)
        p[f"{pre}.qknorm.qnorm.scale"] = jnp.zeros((hd,), dtype=dtype)
        p[f"{pre}.qknorm.knorm.scale"] = jnp.zeros((hd,), dtype=dtype)
        lin(p, f"{pre}.wo", dim, dim)

    def mlp_w(p, pre, dim):
        md = _ceil_mult(2 * dim // 3 * cfg.mlp_multiplier, 128)
        lin(p, f"{pre}.gate", dim, md)
        lin(p, f"{pre}.up", dim, md)
        lin(p, f"{pre}.down", md, dim)

    f = cfg.features
    p: dict = {}
    lin(p, "first", cfg.patch_size**2 * cfg.in_channels, f, bias=True)
    lin(p, "tmlp.0", cfg.timestep_dim, f, bias=True)
    lin(p, "tmlp.2", f, f, bias=True)
    lin(p, "tproj.1", f, 6 * f, bias=True)
    for kind in ("layerwise_blocks", "refiner_blocks"):
        for i in range(2):
            pre = f"txtfusion.{kind}.{i}"
            p[f"{pre}.prenorm.scale"] = jnp.zeros((cfg.text_dim,), dtype=dtype)
            p[f"{pre}.postnorm.scale"] = jnp.zeros((cfg.text_dim,), dtype=dtype)
            attn_w(p, f"{pre}.attn", cfg.text_dim, cfg.text_heads,
                   cfg.text_kv_heads)
            mlp_w(p, f"{pre}.mlp", cfg.text_dim)
    lin(p, "txtfusion.projector", cfg.text_layers, 1)
    p["txtmlp.0.scale"] = jnp.zeros((cfg.text_dim,), dtype=dtype)
    lin(p, "txtmlp.1", cfg.text_dim, f, bias=True)
    lin(p, "txtmlp.3", f, f, bias=True)
    for i in range(cfg.layers):
        pre = f"blocks.{i}"
        p[f"{pre}.mod.lin"] = wt(6 * f, scale=0.1)
        p[f"{pre}.prenorm.scale"] = jnp.zeros((f,), dtype=dtype)
        p[f"{pre}.postnorm.scale"] = jnp.zeros((f,), dtype=dtype)
        attn_w(p, f"{pre}.attn", f, cfg.heads, cfg.kv_heads)
        mlp_w(p, f"{pre}.mlp", f)
    p["last.norm.scale"] = jnp.zeros((f,), dtype=dtype)
    lin(p, "last.linear", f, cfg.patch_size**2 * cfg.out_channels, bias=True)
    p["last.modulation.lin"] = wt(2, f, scale=0.1)
    return p

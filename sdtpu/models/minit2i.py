"""MiniT2I: a small PIXEL-SPACE double-stream DiT (no VAE — patch 16 over
RGB), with a bottleneck (PCA) patch embed, additive 2-D sincos position
embedding, text-preamble self-attention blocks, and a learned mask token
substituted at padded prompt positions.  The model predicts x0 directly and
is conditioned only on text — the t_embedder / pooled_embedder weights exist
in checkpoints but are unused by the forward pass (reference MMJiT::forward
takes no timestep, minit2i.hpp:421).

Reference analog: MiniT2I::MMJiT / MiniT2IRunner
(src/model/diffusion/minit2i.hpp:374,462).  Checkpoint names:
``img_embedder.{proj1,proj2}``, ``txt_embedder``, ``t_embedder.mlp.{0,2}``,
``pooled_embedder``, ``mask_token``, ``txt_preamble_blocks.N.{norm1,norm2,
qkv,attn_proj,q_norm,k_norm,mlp.{w1,w2,w3}}``, ``double_blocks.N.{img_norm1,
img_norm2,txt_norm1,txt_norm2,img_qkv,txt_qkv,q_norm,k_norm,img_attn_proj,
txt_attn_proj,img_mlp.*,txt_mlp.*}``, ``final_layer.{norm_final,linear}``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, linear, rms_norm
from sdtpu.ops.basic import matmul_precision, silu


@dataclasses.dataclass(frozen=True)
class MiniT2IConfig:
    image_size: int = 512
    patch_size: int = 16
    in_channels: int = 3
    txt_input_size: int = 1024
    hidden_size: int = 768
    txt_hidden_size: int = 768
    cond_vec_size: int = 768
    depth_double: int = 17
    txt_preamble_depth: int = 2
    num_heads: int = 12
    head_dim: int = 64
    mlp_ratio: float = 2.6667
    pca_channels: int = 128
    prompt_length: int = 256


MINIT2I_CONFIG = MiniT2IConfig()


def detect_minit2i_config(names, shapes) -> MiniT2IConfig:
    names = set(names)
    kw = {}
    p1 = shapes.get("img_embedder.proj1.weight")  # [pca, in, p, p]
    if p1:
        kw["pca_channels"], kw["in_channels"] = p1[0], p1[1]
        kw["patch_size"] = p1[3]
    p2 = shapes.get("img_embedder.proj2.weight")  # [hidden, pca, 1, 1]
    if p2:
        kw["hidden_size"] = p2[0]
    te = shapes.get("txt_embedder.weight")
    if te:
        kw["txt_hidden_size"], kw["txt_input_size"] = te
    pe = shapes.get("pooled_embedder.weight")
    if pe:
        kw["cond_vec_size"] = pe[0]
    mt = shapes.get("mask_token")
    qkv = shapes.get("double_blocks.0.img_qkv.weight")
    hid = kw.get("hidden_size", 768)
    if qkv:
        inner = qkv[0] // 3
        hd = 52 if hid == 1248 else 64
        kw["head_dim"] = hd
        kw["num_heads"] = max(1, inner // hd)
    dd = tp = 0
    for n in names:
        if n.startswith("double_blocks."):
            dd = max(dd, int(n.split(".")[1]) + 1)
        elif n.startswith("txt_preamble_blocks."):
            tp = max(tp, int(n.split(".")[1]) + 1)
    kw["depth_double"] = dd or (23 if hid == 1248 else 17)
    kw["txt_preamble_depth"] = tp or 2
    return dataclasses.replace(MINIT2I_CONFIG, **kw)


def sincos_pos_embed_2d(grid: int, dim: int) -> np.ndarray:
    """[grid*grid, dim] layout [sin(x)|cos(x)|sin(y)|cos(y)]
    (make_2d_sincos_pos_embed, minit2i.hpp:124)."""
    half = dim // 2
    quarter = half // 2
    omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))
    y, x = np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij")
    ax = x.reshape(-1, 1) * omega[None]
    ay = y.reshape(-1, 1) * omega[None]
    return np.concatenate([np.sin(ax), np.cos(ax), np.sin(ay), np.cos(ay)],
                          axis=1).astype(np.float32)


def text_rope(length: int, head_dim: int):
    """(cos, sin) [L, head_dim/2] standard 1-D rope."""
    half = head_dim // 2
    omega = 1.0 / (10000.0 ** (np.arange(half, dtype=np.float64) * 2 / head_dim))
    ang = np.arange(length, dtype=np.float64)[:, None] * omega[None]
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def vision_rope(side: int, head_dim: int):
    """(cos, sin) [side*side, head_dim/2]: first quarter slots rotate by y,
    second by x (make_vision_rope, minit2i.hpp:153)."""
    dim = head_dim // 2
    quarter = dim // 2
    freqs = 1.0 / (10000.0 ** (2 * np.arange(quarter, dtype=np.float64) / dim))
    y, x = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    ay = y.reshape(-1, 1) * freqs[None]
    ax = x.reshape(-1, 1) * freqs[None]
    ang = np.concatenate([ay, ax], axis=1)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _rope_halves(x, cos, sin):
    """Non-interleaved split-half rotation. x: [B, H, L, D]."""
    d = x.shape[-1]
    half = d // 2
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., :half], xf[..., half:]
    o1 = x1 * cos[None, None] - x2 * sin[None, None]
    o2 = x1 * sin[None, None] + x2 * cos[None, None]
    return jnp.concatenate([o1, o2], axis=-1).astype(x.dtype)


def _swiglu(p, pre, x):
    gate = silu(linear(x, p[f"{pre}.w1.weight"]))
    up = linear(x, p[f"{pre}.w3.weight"])
    return linear(gate * up, p[f"{pre}.w2.weight"])


def _split_heads(x, nh, hd):
    b, l, _ = x.shape
    return x.reshape(b, l, nh, hd).transpose(0, 2, 1, 3)


def minit2i_forward(
    p,
    x: jnp.ndarray,
    timesteps,
    context: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    cfg: MiniT2IConfig = MINIT2I_CONFIG,
) -> jnp.ndarray:
    """x: [B, H, W, 3] pixel-space input; context: [B, L, 1024] T5 states;
    mask: [B, L] 1=real token, 0=padding (replaced by the learned
    mask_token).  timesteps are accepted for API parity but unused."""
    import jax

    b, hh, ww, c = x.shape
    ps = cfg.patch_size
    hp, wp = hh // ps, ww // ps
    nh, hd = cfg.num_heads, cfg.head_dim

    if mask is not None:
        mt = p["mask_token"].reshape(1, 1, -1).astype(context.dtype)
        m = mask[..., None].astype(context.dtype)
        context = context * m + mt * (1.0 - m)

    # bottleneck patch embed (conv p16 -> pca, then 1x1 -> hidden)
    xp = x.reshape(b, hp, ps, wp, ps, c).transpose(0, 1, 3, 5, 2, 4)
    xp = xp.reshape(b, hp * wp, c * ps * ps)
    w1 = p["img_embedder.proj1.weight"].reshape(cfg.pca_channels, -1)
    img = linear(xp, w1)
    img = linear(img, p["img_embedder.proj2.weight"].reshape(cfg.hidden_size, -1),
                 p.get("img_embedder.proj2.bias"))
    img = img + jnp.asarray(sincos_pos_embed_2d(hp, cfg.hidden_size))[None].astype(img.dtype)

    txt = linear(context, p["txt_embedder.weight"])
    lt = txt.shape[1]
    tcos, tsin = text_rope(lt, hd)
    tcos, tsin = jnp.asarray(tcos), jnp.asarray(tsin)
    vcos, vsin = vision_rope(hp, hd)
    jcos = jnp.concatenate([tcos, jnp.asarray(vcos)], axis=0)
    jsin = jnp.concatenate([tsin, jnp.asarray(vsin)], axis=0)

    for i in range(cfg.txt_preamble_depth):
        pre = f"txt_preamble_blocks.{i}"
        h = rms_norm(txt, p[f"{pre}.norm1.weight"], eps=1e-6)
        qkv = linear(h, p[f"{pre}.qkv.weight"], p.get(f"{pre}.qkv.bias"))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rms_norm(_split_heads(q, nh, hd), p[f"{pre}.q_norm.weight"], eps=1e-6)
        k = rms_norm(_split_heads(k, nh, hd), p[f"{pre}.k_norm.weight"], eps=1e-6)
        q = _rope_halves(q, tcos, tsin)
        k = _rope_halves(k, tcos, tsin)
        o = attention(q, k, v=_split_heads(v, nh, hd))
        o = o.transpose(0, 2, 1, 3).reshape(b, lt, nh * hd)
        txt = txt + linear(o, p[f"{pre}.attn_proj.weight"], p.get(f"{pre}.attn_proj.bias"))
        txt = txt + _swiglu(p, f"{pre}.mlp",
                            rms_norm(txt, p[f"{pre}.norm2.weight"], eps=1e-6))

    for i in range(cfg.depth_double):
        pre = f"double_blocks.{i}"
        hi = rms_norm(img, p[f"{pre}.img_norm1.weight"], eps=1e-6)
        ht = rms_norm(txt, p[f"{pre}.txt_norm1.weight"], eps=1e-6)
        iqkv = linear(hi, p[f"{pre}.img_qkv.weight"], p.get(f"{pre}.img_qkv.bias"))
        tqkv = linear(ht, p[f"{pre}.txt_qkv.weight"], p.get(f"{pre}.txt_qkv.bias"))
        iq, ik, iv = [_split_heads(t, nh, hd) for t in jnp.split(iqkv, 3, axis=-1)]
        tq, tk, tv = [_split_heads(t, nh, hd) for t in jnp.split(tqkv, 3, axis=-1)]
        q = jnp.concatenate([
            rms_norm(tq, p[f"{pre}.q_norm.weight"], eps=1e-6),
            rms_norm(iq, p[f"{pre}.q_norm.weight"], eps=1e-6)], axis=2)
        k = jnp.concatenate([
            rms_norm(tk, p[f"{pre}.k_norm.weight"], eps=1e-6),
            rms_norm(ik, p[f"{pre}.k_norm.weight"], eps=1e-6)], axis=2)
        v = jnp.concatenate([tv, iv], axis=2)
        q = _rope_halves(q, jcos, jsin)
        k = _rope_halves(k, jcos, jsin)
        o = attention(q, k, v).transpose(0, 2, 1, 3)
        o = o.reshape(b, lt + hp * wp, nh * hd)
        txt = txt + linear(o[:, :lt], p[f"{pre}.txt_attn_proj.weight"],
                           p.get(f"{pre}.txt_attn_proj.bias"))
        img = img + linear(o[:, lt:], p[f"{pre}.img_attn_proj.weight"],
                           p.get(f"{pre}.img_attn_proj.bias"))
        img = img + _swiglu(p, f"{pre}.img_mlp",
                            rms_norm(img, p[f"{pre}.img_norm2.weight"], eps=1e-6))
        txt = txt + _swiglu(p, f"{pre}.txt_mlp",
                            rms_norm(txt, p[f"{pre}.txt_norm2.weight"], eps=1e-6))

    combined = jnp.concatenate([txt, img], axis=1)
    out = rms_norm(combined, p["final_layer.norm_final.weight"], eps=1e-6)
    out = linear(out, p["final_layer.linear.weight"], p.get("final_layer.linear.bias"))
    out = out[:, lt:]
    # patch_last=false layout: feature (py, px, c) (minit2i.hpp:458)
    out = out.reshape(b, hp, wp, ps, ps, cfg.in_channels)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, cfg.in_channels)
    return out


def init_minit2i_params(cfg: MiniT2IConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def lin(p, pre, din, dout, bias=True):
        p[f"{pre}.weight"] = wt(dout, din)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((dout,), dtype=dtype)

    hid, thid = cfg.hidden_size, cfg.txt_hidden_size
    nh, hd = cfg.num_heads, cfg.head_dim
    inner = nh * hd
    mlp_h = ((int(hid * cfg.mlp_ratio) + 7) // 8) * 8
    tmlp_h = ((int(thid * cfg.mlp_ratio) + 7) // 8) * 8
    p: dict = {
        "mask_token": wt(1, 1, cfg.txt_input_size),
        "img_embedder.proj1.weight": wt(cfg.pca_channels, cfg.in_channels,
                                        cfg.patch_size, cfg.patch_size),
        "img_embedder.proj2.weight": wt(hid, cfg.pca_channels, 1, 1),
        "img_embedder.proj2.bias": jnp.zeros((hid,), dtype=dtype),
        "final_layer.norm_final.weight": jnp.ones((hid,), dtype=dtype),
    }
    lin(p, "txt_embedder", cfg.txt_input_size, thid, bias=False)
    lin(p, "pooled_embedder", cfg.txt_input_size, cfg.cond_vec_size, bias=False)
    lin(p, "t_embedder.mlp.0", 256, cfg.cond_vec_size)
    lin(p, "t_embedder.mlp.2", cfg.cond_vec_size, cfg.cond_vec_size)
    for i in range(cfg.txt_preamble_depth):
        pre = f"txt_preamble_blocks.{i}"
        p[f"{pre}.norm1.weight"] = jnp.ones((thid,), dtype=dtype)
        p[f"{pre}.norm2.weight"] = jnp.ones((thid,), dtype=dtype)
        lin(p, f"{pre}.qkv", thid, 3 * inner)
        lin(p, f"{pre}.attn_proj", inner, thid)
        p[f"{pre}.q_norm.weight"] = jnp.ones((hd,), dtype=dtype)
        p[f"{pre}.k_norm.weight"] = jnp.ones((hd,), dtype=dtype)
        lin(p, f"{pre}.mlp.w1", thid, tmlp_h, bias=False)
        lin(p, f"{pre}.mlp.w2", tmlp_h, thid, bias=False)
        lin(p, f"{pre}.mlp.w3", thid, tmlp_h, bias=False)
    for i in range(cfg.depth_double):
        pre = f"double_blocks.{i}"
        for nm, d in (("img_norm1", hid), ("img_norm2", hid),
                      ("txt_norm1", thid), ("txt_norm2", thid)):
            p[f"{pre}.{nm}.weight"] = jnp.ones((d,), dtype=dtype)
        lin(p, f"{pre}.img_qkv", hid, 3 * inner)
        lin(p, f"{pre}.txt_qkv", thid, 3 * inner)
        p[f"{pre}.q_norm.weight"] = jnp.ones((hd,), dtype=dtype)
        p[f"{pre}.k_norm.weight"] = jnp.ones((hd,), dtype=dtype)
        lin(p, f"{pre}.img_attn_proj", inner, hid)
        lin(p, f"{pre}.txt_attn_proj", inner, thid)
        lin(p, f"{pre}.img_mlp.w1", hid, mlp_h, bias=False)
        lin(p, f"{pre}.img_mlp.w2", mlp_h, hid, bias=False)
        lin(p, f"{pre}.img_mlp.w3", hid, mlp_h, bias=False)
        lin(p, f"{pre}.txt_mlp.w1", thid, tmlp_h, bias=False)
        lin(p, f"{pre}.txt_mlp.w2", tmlp_h, thid, bias=False)
        lin(p, f"{pre}.txt_mlp.w3", thid, tmlp_h, bias=False)
    lin(p, "final_layer.linear", hid, cfg.patch_size**2 * cfg.in_channels)
    return p

"""FLUX.1 — double/single-stream rectified-flow DiT.

Reference analog: FluxRunner (src/model/diffusion/flux.hpp:1397; upstream
black-forest-labs/flux).  Checkpoint naming: ``double_blocks.N.{img,txt}_
{mod.lin,attn.qkv,attn.norm.{query,key}_norm.scale,attn.proj,mlp.0,mlp.2}``,
``single_blocks.N.{linear1,linear2,norm.…,modulation.lin}``, ``img_in``,
``txt_in``, ``time_in/vector_in/guidance_in.{in_layer,out_layer}``,
``final_layer.{linear,adaLN_modulation.1}``.

Latents are packed 2×2 (16ch → 64-dim tokens); 3-axis RoPE (id, y, x) with
axes_dim (16,56,56).  Serves FLUX.1 dev/schnell; Chroma/FLUX.2 variants layer
on config detection in later rounds.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import conv2d, gelu_tanh, silu


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    in_channels: int = 64  # packed 16ch × 2×2
    # concat variants (Fill/Controls/Flex.2) read more channels than they
    # predict; None → same as in_channels (reference flux.hpp out_channels)
    out_channels: Optional[int] = None
    hidden_size: int = 3072
    mlp_ratio: float = 4.0
    num_heads: int = 24
    depth: int = 19
    depth_single: int = 38
    axes_dim: Tuple[int, ...] = (16, 56, 56)
    theta: int = 10000
    context_in_dim: int = 4096
    vec_in_dim: int = 768
    guidance_embed: bool = True  # dev; schnell = False
    is_chroma: bool = False  # Chroma: distilled modulation + T5 mask
    # model_args 'chroma_use_dit_mask': drop the T5 mask from the DiT
    # attention when false (reference flux.hpp:1417-1425)
    chroma_use_dit_mask: bool = True
    # FLUX.2 variants (reference flux.hpp:83-95)
    share_modulation: bool = False  # global per-stream modulation blocks
    disable_bias: bool = False  # all linears bias-less
    mlp_silu: bool = False  # SwiGLU MLPs (silu(gate)·x) instead of GELU
    qkv_bias: bool = True
    txt_arange_axes: Tuple[int, ...] = ()  # txt RoPE ids: arange on these axes
    patch_size: int = 2  # FLUX.2 runs patch 1 over pre-packed 128ch latents
    # Ovis-Image variants (reference flux.hpp:79-82)
    yak_mlp: bool = False  # separate gate/up/down swiglu projections
    semantic_txt_norm: bool = False  # RMSNorm on raw context before txt_in
    # LongCat rope: txt token arange on BOTH spatial axes, img grid offset by
    # context_len with axis-0 index 1 (reference rope.hpp:120-128, 408-412)
    longcat_rope: bool = False
    # SeFi-Image: dual [sem, tex] timesteps into a split embedder; the first
    # 16 latent channels are the semantic group (reference sefi_image.hpp)
    is_sefi: bool = False
    sefi_sem_channels: int = 16
    # Chroma-Radiance: pixel-space chroma with a conv patch embed and a NeRF
    # pixel decoder head (reference ChromaRadianceConfig, flux.hpp:19-24)
    is_radiance: bool = False
    nerf_hidden: int = 64
    nerf_mlp_ratio: int = 4
    nerf_depth: int = 4
    nerf_max_freqs: int = 8
    radiance_x0: bool = False  # __x0__ marker: convert x0 pred to velocity
    fake_patch_x2: bool = False  # __32x32__ marker: half-res conv embed
    # Kontext-style reference latents appended to the img token stream.
    # FIXED (default): every ref shares axis-0 id 1 and tiles diagonally in
    # (h, w) id space; INCREASE (FLUX.2/SeFi): ref k gets axis-0 id
    # (k+1)*ref_index_scale at origin (reference rope.hpp:351-397,
    # flux.hpp:1543-1545)
    ref_index_increase: bool = False
    ref_index_scale: float = 1.0


FLUX_DEV_CONFIG = FluxConfig()
FLUX_SCHNELL_CONFIG = FluxConfig(guidance_embed=False)
FLUX2_DEV_CONFIG = FluxConfig(
    in_channels=128, mlp_ratio=3.0, theta=2000, axes_dim=(32, 32, 32, 32),
    vec_in_dim=0, guidance_embed=True, share_modulation=True, disable_bias=True,
    mlp_silu=True, qkv_bias=False, txt_arange_axes=(3,), depth=8, depth_single=48,
    patch_size=1, context_in_dim=15360, ref_index_increase=True,
    ref_index_scale=10.0,
)
FLUX2_KLEIN_CONFIG = dataclasses.replace(
    FLUX2_DEV_CONFIG, depth=5, depth_single=20, guidance_embed=False,
    context_in_dim=7680,
)
# Ovis-Image: Qwen3 context, yak swiglu MLPs, semantic txt RMSNorm, txt rope
# arange on the spatial axes (reference flux.hpp:79-82 + flux.hpp:1546)
OVIS_IMAGE_CONFIG = FluxConfig(
    vec_in_dim=0, guidance_embed=False, yak_mlp=True, semantic_txt_norm=True,
    txt_arange_axes=(1, 2),
)
# LongCat-Image: Qwen2.5-VL context (3584), longcat rope
LONGCAT_CONFIG = FluxConfig(
    context_in_dim=3584, vec_in_dim=0, guidance_embed=False, longcat_rope=True,
)
# SeFi-Image: FLUX.2-shaped body over 16 semantic + 128 packed texture
# channels with a dual timestep embedder (reference flux.hpp:96-111)
SEFI_CONFIG = dataclasses.replace(
    FLUX2_DEV_CONFIG, in_channels=144, guidance_embed=False, is_sefi=True,
    context_in_dim=7680,
)


def radiance_dct_basis(patch_size: int, max_freqs: int) -> np.ndarray:
    """[P*P, max_freqs^2] cosine positional table (reference fetch_dct_pos,
    flux.hpp:1444-1492): cos(px*fx*pi)*cos(py*fy*pi)/(1+fx*fy)."""
    pos = np.arange(patch_size, dtype=np.float64) / (patch_size - 1)
    py, px = np.meshgrid(pos, pos, indexing="ij")  # row-major (y outer)
    f = np.arange(max_freqs, dtype=np.float64)
    cx = np.cos(px.reshape(-1, 1) * f[None] * np.pi)  # [P*P, F]
    cy = np.cos(py.reshape(-1, 1) * f[None] * np.pi)
    coeff = 1.0 / (1.0 + f[:, None] * f[None])  # [Fx, Fy]
    dct = cx[:, :, None] * cy[:, None, :] * coeff[None]  # [P*P, Fx, Fy]
    return dct.reshape(patch_size * patch_size, max_freqs * max_freqs).astype(np.float32)


def detect_flux2_config(names, shapes) -> FluxConfig:
    """Shape-driven FLUX.2 config (reference FluxConfig::detect_from_weights,
    flux.hpp:62-130: block counts + head_dim from qk norm scales)."""
    names = set(names)
    kw = {}
    w = shapes.get("img_in.weight")
    if w:
        kw["hidden_size"] = w[0]
        kw["in_channels"] = w[1]
    w = shapes.get("txt_in.weight")
    if w:
        kw["context_in_dim"] = w[1]
    hd = shapes.get("double_blocks.0.img_attn.norm.query_norm.scale")
    if hd and kw.get("hidden_size"):
        kw["num_heads"] = kw["hidden_size"] // hd[0]
    kw["guidance_embed"] = "guidance_in.in_layer.weight" in names
    depth = depth_single = 0
    for n in names:
        if n.startswith("double_blocks."):
            depth = max(depth, int(n.split(".")[1]) + 1)
        elif n.startswith("single_blocks."):
            depth_single = max(depth_single, int(n.split(".")[1]) + 1)
    if depth:
        kw["depth"] = depth
    if depth_single:
        kw["depth_single"] = depth_single
    return dataclasses.replace(FLUX2_DEV_CONFIG, **kw)
CHROMA_CONFIG = FluxConfig(guidance_embed=False, vec_in_dim=0, is_chroma=True)
# Chroma-Radiance: chroma distilled modulation in PIXEL space, 16x16 conv
# patch embed, NeRF per-patch pixel decoder (reference flux.hpp:76-78)
CHROMA_RADIANCE_CONFIG = dataclasses.replace(
    CHROMA_CONFIG, in_channels=3, patch_size=16, is_radiance=True,
)

# Chroma distilled-modulation table layout (reference flux.hpp:480-489,637,722):
#   single block i      → 1 mod  at 3*i
#   double block i, img → 2 mods at 6*i + 3*n_single
#   double block i, txt → 2 mods at 6*i + 6*n_double + 3*n_single
#   final layer         → (shift, scale) at the last 2 rows
CHROMA_APPROX_DEPTH = 5
CHROMA_APPROX_INNER = 5120


def _chroma_mod_vectors(p, timesteps, guidance, cfg, dtype):
    """→ [B, 344, hidden] modulation table from the ChromaApproximator
    (reference flux.hpp:759,1029-1049)."""
    n_mod = 3 * cfg.depth_single + 12 * cfg.depth + 2
    b = timesteps.shape[0]
    dt = timestep_embedding(timesteps * 1000.0, 16)  # [B,16]
    dg = timestep_embedding(
        (guidance if guidance is not None else jnp.zeros_like(timesteps)) * 1000.0, 16
    )
    idx = timestep_embedding(jnp.arange(n_mod, dtype=jnp.float32) * 1000.0, 32)  # [n,32]
    tg = jnp.concatenate([dt, dg], axis=-1)  # [B,32]
    x = jnp.concatenate(
        [jnp.broadcast_to(tg[:, None, :], (b, n_mod, 32)),
         jnp.broadcast_to(idx[None], (b, n_mod, 32))],
        axis=-1,
    ).astype(dtype)  # [B, n_mod, 64]
    pre = "distilled_guidance_layer"
    h = linear(x, p[f"{pre}.in_proj.weight"], p[f"{pre}.in_proj.bias"])
    for i in range(CHROMA_APPROX_DEPTH):
        hn = rms_norm(h, p[f"{pre}.norms.{i}.scale"], eps=1e-6)
        h = h + _mlp_embed(p, f"{pre}.layers.{i}", hn)
    return linear(h, p[f"{pre}.out_proj.weight"], p[f"{pre}.out_proj.bias"])


def rope_freqs(ids: np.ndarray, axes_dim, theta: int) -> np.ndarray:
    """ids: [L, n_axes] int → [L, sum(dim)/2, 2, 2] rotation (host, static)."""
    outs = []
    for a, dim in enumerate(axes_dim):
        pos = ids[:, a].astype(np.float64)  # [L]
        scale = np.arange(0, dim, 2, dtype=np.float64) / dim
        omega = 1.0 / (theta**scale)  # [dim/2]
        out = pos[:, None] * omega[None, :]  # [L, dim/2]
        cos, sin = np.cos(out), np.sin(out)
        # rotation matrix [[cos, -sin], [sin, cos]]
        rot = np.stack(
            [np.stack([cos, -sin], axis=-1), np.stack([sin, cos], axis=-1)], axis=-2
        )  # [L, dim/2, 2, 2]
        outs.append(rot)
    return np.concatenate(outs, axis=1).astype(np.float32)  # [L, D/2, 2, 2]


def apply_rope(x: jnp.ndarray, rot: jnp.ndarray) -> jnp.ndarray:
    """x: [B, H, L, D], rot: [L, D/2, 2, 2]."""
    b, h, l, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, l, d // 2, 1, 2)
    # out_even = rot[0,0]*x0 + rot[0,1]*x1 ; out_odd = rot[1,0]*x0 + rot[1,1]*x1
    x0 = xf[..., 0, 0]
    x1 = xf[..., 0, 1]
    o0 = rot[None, None, :, :, 0, 0] * x0 + rot[None, None, :, :, 0, 1] * x1
    o1 = rot[None, None, :, :, 1, 0] * x0 + rot[None, None, :, :, 1, 1] * x1
    return jnp.stack([o0, o1], axis=-1).reshape(b, h, l, d).astype(x.dtype)


def _mlp_embed(p, pre, x):
    h = linear(x, p[f"{pre}.in_layer.weight"], p.get(f"{pre}.in_layer.bias"))
    return linear(silu(h), p[f"{pre}.out_layer.weight"], p.get(f"{pre}.out_layer.bias"))


def _mlp_act(h, cfg):
    """GELU-tanh, or SwiGLU when cfg.mlp_silu (in-proj emits 2× hidden:
    [gate, x] → silu(gate)·x); yak_mlp flips the halves ([x, gate],
    reference ggml_ext_silu_act gate_first=false, flux.hpp:687-692)."""
    if cfg.yak_mlp:
        val, gate = jnp.split(h, 2, axis=-1)
        return silu(gate) * val
    if cfg.mlp_silu:
        gate, val = jnp.split(h, 2, axis=-1)
        return silu(gate) * val
    return gelu_tanh(h)


def _double_mlp(p, pre, h, cfg):
    """Double-block MLP: fused mlp.0/mlp.2, or separate gate/up/down swiglu
    projections when cfg.yak_mlp (reference YakMLP, flux.hpp:343-363)."""
    if cfg.yak_mlp:
        gate = silu(linear(h, p[f"{pre}.gate_proj.weight"],
                           p.get(f"{pre}.gate_proj.bias")))
        up = linear(h, p[f"{pre}.up_proj.weight"], p.get(f"{pre}.up_proj.bias"))
        return linear(gate * up, p[f"{pre}.down_proj.weight"],
                      p.get(f"{pre}.down_proj.bias"))
    h = linear(h, p[f"{pre}.0.weight"], p.get(f"{pre}.0.bias"))
    return linear(_mlp_act(h, cfg), p[f"{pre}.2.weight"], p.get(f"{pre}.2.bias"))


def _qkv_norm(p, pre, x, num_heads):
    b, l, c = x.shape
    d = c // num_heads
    qkv = linear(x, p[f"{pre}.qkv.weight"], p.get(f"{pre}.qkv.bias"))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)
    q = rms_norm(q, p[f"{pre}.norm.query_norm.scale"], eps=1e-6)
    k = rms_norm(k, p[f"{pre}.norm.key_norm.scale"], eps=1e-6)
    return q, k, v


def _modulation(p, pre, vec, n: int):
    m = linear(silu(vec), p[f"{pre}.lin.weight"], p.get(f"{pre}.lin.bias"))
    return jnp.split(m, n, axis=-1)


def _radiance_nerf_decode(p, tokens, x_pad, cfg: FluxConfig) -> jnp.ndarray:
    """NeRF pixel decoder (reference flux.hpp:1232-1259): each DiT output
    token generates per-patch GLU MLP weights that refine the raw noisy
    pixels + a cosine positional table into the final RGB patch."""
    b, hh, ww, c = x_pad.shape
    ps = cfg.patch_size
    hp, wp = hh // ps, ww // ps
    nh, ratio = cfg.nerf_hidden, cfg.nerf_mlp_ratio

    # per-patch pixel matrix [B, N, P*P, C], positions row-major (y outer)
    pix = (x_pad.reshape(b, hp, ps, wp, ps, c).transpose(0, 1, 3, 2, 4, 5)
           .reshape(b, hp * wp, ps * ps, c))
    dct = jnp.asarray(radiance_dct_basis(ps, cfg.nerf_max_freqs))
    feat = jnp.concatenate(
        [pix, jnp.broadcast_to(dct[None, None], pix.shape[:2] + dct.shape)
         .astype(pix.dtype)], axis=-1)
    xx = linear(feat, p["nerf_image_embedder.embedder.0.weight"],
                p.get("nerf_image_embedder.embedder.0.bias"))  # [B,N,P²,nh]

    def _l2(w):
        return w * jax.lax.rsqrt(
            jnp.sum(jnp.square(w), axis=-1, keepdims=True) + 1e-12)

    for i in range(cfg.nerf_depth):
        pre = f"nerf_blocks.{i}"
        params = linear(tokens, p[f"{pre}.param_generator.weight"],
                        p.get(f"{pre}.param_generator.bias"))  # [B,N,3·nh·nh·r]
        c0, c1, c2 = jnp.split(params, 3, axis=-1)
        # torch reshape (nh, nh·r) then transpose → [out, in], rows
        # l2-normalized over the input axis (reference NerfGLUBlock)
        w1 = _l2(c0.reshape(b, -1, nh, nh * ratio).swapaxes(-1, -2))
        w2 = _l2(c1.reshape(b, -1, nh, nh * ratio).swapaxes(-1, -2))
        w3 = _l2(c2.reshape(b, -1, nh * ratio, nh).swapaxes(-1, -2))
        xn = rms_norm(xx, p[f"{pre}.norm.weight"])
        x1 = silu(jnp.einsum("bnpc,bnoc->bnpo", xn, w1))
        x2 = jnp.einsum("bnpc,bnoc->bnpo", xn, w2)
        xx = xx + jnp.einsum("bnpo,bnco->bnpc", x1 * x2, w3)

    # unpatchify to [B, H, W, nh], channel-wise RMS norm, 3x3 conv to RGB
    xx = (xx.reshape(b, hp, wp, ps, ps, nh).transpose(0, 1, 3, 2, 4, 5)
          .reshape(b, hh, ww, nh))
    xx = rms_norm(xx, p["nerf_final_layer_conv.norm.weight"])
    return conv2d(xx, p["nerf_final_layer_conv.conv.weight"],
                  p.get("nerf_final_layer_conv.conv.bias"), padding=1)


def _pulid_ca(p, idx: int, id_emb, img, weight):
    """PuLID perceiver cross-attn injection (reference
    PuLIDPerceiverAttentionCA, pulid.hpp:7 + flux.hpp:1120-1160):
    img += weight * to_out(attn(q=norm(img), kv=norm(id)))."""
    pre = f"pulid_ca.{idx}"
    b, l, hid = img.shape
    idn = layer_norm(id_emb.astype(img.dtype), p[f"{pre}.norm1.weight"],
                     p[f"{pre}.norm1.bias"])
    imn = layer_norm(img, p[f"{pre}.norm2.weight"], p[f"{pre}.norm2.bias"])
    q = linear(imn, p[f"{pre}.to_q.weight"])
    kv = linear(idn, p[f"{pre}.to_kv.weight"])
    inner = q.shape[-1]
    k, v = kv[..., :inner], kv[..., inner:]
    heads = max(1, inner // 128)
    d = inner // heads

    def hs(t):
        return t.reshape(b, t.shape[1], heads, d).transpose(0, 2, 1, 3)

    o = attention(hs(q), hs(k), hs(v)).transpose(0, 2, 1, 3).reshape(b, l, inner)
    o = linear(o, p[f"{pre}.to_out.weight"])
    w = weight if weight is not None else 1.0
    if hasattr(w, "ndim") and w.ndim == 1:
        w = w[:, None, None]
    return img + o * w


def _k(pre: str, name: str) -> str:
    return f"{pre}.{name}" if pre else name


def flux_double_block(p, pre, img, txt, vec, rot, attn_mask, cfg: FluxConfig,
                      mods=None):
    """One MMDiT double-stream block (reference flux.hpp DoubleStreamBlock).

    p may be the full param dict (pre='double_blocks.i') or a block-local
    dict (pre='') — the same function serves flux_forward's loop and the
    weight-streamed path.  mods overrides the per-block modulation (chroma
    distilled table / FLUX.2 shared modulation)."""
    b = img.shape[0]
    hidden = cfg.hidden_size
    nh = cfg.num_heads
    l_txt = txt.shape[1]
    if mods is None:
        img_mods = _modulation(p, _k(pre, "img_mod"), vec, 6)
        txt_mods = _modulation(p, _k(pre, "txt_mod"), vec, 6)
    else:
        img_mods, txt_mods = mods
    img_n = layer_norm(img, eps=1e-6) * (1 + img_mods[1][:, None]) + img_mods[0][:, None]
    txt_n = layer_norm(txt, eps=1e-6) * (1 + txt_mods[1][:, None]) + txt_mods[0][:, None]
    iq, ik, iv = _qkv_norm(p, _k(pre, "img_attn"), img_n, nh)
    tq, tk, tv = _qkv_norm(p, _k(pre, "txt_attn"), txt_n, nh)
    q = jnp.concatenate([tq, iq], axis=2)
    k = jnp.concatenate([tk, ik], axis=2)
    v = jnp.concatenate([tv, iv], axis=2)
    q = apply_rope(q, rot)
    k = apply_rope(k, rot)
    att = attention(q, k, v, mask=attn_mask).transpose(0, 2, 1, 3).reshape(b, -1, hidden)
    txt_att, img_att = att[:, :l_txt], att[:, l_txt:]
    img = img + img_mods[2][:, None] * linear(
        img_att, p[_k(pre, "img_attn.proj.weight")], p.get(_k(pre, "img_attn.proj.bias"))
    )
    img_m = layer_norm(img, eps=1e-6) * (1 + img_mods[4][:, None]) + img_mods[3][:, None]
    img = img + img_mods[5][:, None] * _double_mlp(p, _k(pre, "img_mlp"), img_m, cfg)
    txt = txt + txt_mods[2][:, None] * linear(
        txt_att, p[_k(pre, "txt_attn.proj.weight")], p.get(_k(pre, "txt_attn.proj.bias"))
    )
    txt_m = layer_norm(txt, eps=1e-6) * (1 + txt_mods[4][:, None]) + txt_mods[3][:, None]
    txt = txt + txt_mods[5][:, None] * _double_mlp(p, _k(pre, "txt_mlp"), txt_m, cfg)
    return img, txt


def flux_single_block(p, pre, xx, vec, rot, attn_mask, cfg: FluxConfig,
                      mods=None):
    """One single-stream block (reference flux.hpp SingleStreamBlock); same
    dual full-dict / block-local usage as flux_double_block."""
    b = xx.shape[0]
    hidden = cfg.hidden_size
    nh = cfg.num_heads
    d_head = hidden // nh
    if mods is None:
        mods = _modulation(p, _k(pre, "modulation"), vec, 3)
    xn = layer_norm(xx, eps=1e-6) * (1 + mods[1][:, None]) + mods[0][:, None]
    h1 = linear(xn, p[_k(pre, "linear1.weight")], p.get(_k(pre, "linear1.bias")))
    qkv, mlp = h1[..., : 3 * hidden], h1[..., 3 * hidden :]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    L = xx.shape[1]
    q = q.reshape(b, L, nh, d_head).transpose(0, 2, 1, 3)
    k = k.reshape(b, L, nh, d_head).transpose(0, 2, 1, 3)
    v = v.reshape(b, L, nh, d_head).transpose(0, 2, 1, 3)
    q = rms_norm(q, p[_k(pre, "norm.query_norm.scale")], eps=1e-6)
    k = rms_norm(k, p[_k(pre, "norm.key_norm.scale")], eps=1e-6)
    q = apply_rope(q, rot)
    k = apply_rope(k, rot)
    att = attention(q, k, v, mask=attn_mask).transpose(0, 2, 1, 3).reshape(b, L, hidden)
    out = linear(
        jnp.concatenate([att, _mlp_act(mlp, cfg)], axis=-1),
        p[_k(pre, "linear2.weight")],
        p.get(_k(pre, "linear2.bias")),
    )
    return xx + mods[2][:, None] * out


def flux_prologue(p, x, timesteps, context, y, guidance, cfg: FluxConfig):
    """Embedding stage of the standard FLUX path (no chroma/sefi/radiance,
    no reference latents) — the resident prefix for the weight-streamed
    forward (reference streams any model under a VRAM budget,
    ggml_graph_cut.h:125; this is the flux split).
    Returns (img, txt, vec, rot, shared_mods)."""
    assert not (cfg.is_chroma or cfg.is_sefi or cfg.is_radiance), \
        "streamed path covers the standard FLUX family"
    b, h, w, c = x.shape
    ps = cfg.patch_size
    hidden = cfg.hidden_size
    hp, wp = h // ps, w // ps
    img = (x.reshape(b, hp, ps, wp, ps, c).transpose(0, 1, 3, 2, 4, 5)
           .reshape(b, hp * wp, ps * ps * c))
    img = linear(img, p["img_in.weight"], p.get("img_in.bias"))
    ctx_in = context.astype(x.dtype)
    if cfg.semantic_txt_norm:
        ctx_in = rms_norm(ctx_in, p["txt_norm.weight"], eps=1e-6)
    txt = linear(ctx_in, p["txt_in.weight"], p.get("txt_in.bias"))
    l_txt = txt.shape[1]

    t_emb = timestep_embedding(timesteps * 1000.0, 256).astype(x.dtype)
    vec = _mlp_embed(p, "time_in", t_emb)
    if cfg.guidance_embed and guidance is not None:
        g_emb = timestep_embedding(guidance * 1000.0, 256).astype(x.dtype)
        vec = vec + _mlp_embed(p, "guidance_in", g_emb)
    if cfg.vec_in_dim > 0 and y is not None:
        vec = vec + _mlp_embed(p, "vector_in", y.astype(x.dtype))

    n_axes = len(cfg.axes_dim)
    ids = np.zeros((l_txt + hp * wp, n_axes), dtype=np.int64)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    if cfg.longcat_rope:
        ids[:l_txt, 1] = np.arange(l_txt)
        ids[:l_txt, 2] = np.arange(l_txt)
        ids[l_txt:, 0] = 1
        ids[l_txt:, 1] = ii.reshape(-1) + l_txt
        ids[l_txt:, 2] = jj.reshape(-1) + l_txt
    else:
        ids[l_txt:, 1] = ii.reshape(-1)
        ids[l_txt:, 2] = jj.reshape(-1)
        for a in cfg.txt_arange_axes:
            ids[:l_txt, a] = np.arange(l_txt)
    rot = jnp.asarray(rope_freqs(ids, cfg.axes_dim, cfg.theta))

    shared = None
    if cfg.share_modulation:
        shared = (
            _modulation(p, "double_stream_modulation_img", vec, 6),
            _modulation(p, "double_stream_modulation_txt", vec, 6),
            _modulation(p, "single_stream_modulation", vec, 3),
        )
    return img, txt, vec, rot, shared


def flux_head(p, img, vec, dims, cfg: FluxConfig):
    """Final adaLN + unpatchify of the standard FLUX path; dims is the
    static (b, h, w, c) of the MODEL INPUT — concat variants predict fewer
    channels (cfg.out_channels) than they read."""
    b, h, w, c = dims
    ps = cfg.patch_size
    hp, wp = h // ps, w // ps
    oc = (cfg.out_channels // (ps * ps)) if cfg.out_channels else c
    mf = linear(
        silu(vec),
        p["final_layer.adaLN_modulation.1.weight"],
        p.get("final_layer.adaLN_modulation.1.bias"),
    )
    shift, scale = jnp.split(mf, 2, axis=-1)
    img = layer_norm(img, eps=1e-6) * (1 + scale[:, None]) + shift[:, None]
    img = linear(img, p["final_layer.linear.weight"], p.get("final_layer.linear.bias"))
    return (img.reshape(b, hp, wp, ps, ps, oc).transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h, w, oc))


def flux_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    y: jnp.ndarray,
    guidance: Optional[jnp.ndarray] = None,
    cfg: FluxConfig = FLUX_DEV_CONFIG,
    skip_layers: Tuple[int, ...] = (),
    pulid_id: Optional[jnp.ndarray] = None,
    pulid_weight: Optional[jnp.ndarray] = None,
    ref_latents=None,
) -> jnp.ndarray:
    """x: [B,H,W,16] latent NHWC; timesteps: [B] (sigma in [0,1]);
    context: [B,L,4096] T5; y: [B,768] clip pooled; guidance: [B] distilled
    guidance scale; ref_latents: list of [B,rh,rw,C] Kontext reference
    latents appended to the img token stream (reference flux.hpp:1320-1335).
    Returns velocity [B,H,W,16]."""
    b, h, w, c = x.shape
    ps = cfg.patch_size
    hidden = cfg.hidden_size

    x_pad = x
    if cfg.is_radiance:
        # pixel-space input: pad to the patch grid, conv patch embed
        # (reference forward_chroma_radiance, flux.hpp:1190-1232)
        pad_h, pad_w = (-h) % ps, (-w) % ps
        if pad_h or pad_w:
            x_pad = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = (h + pad_h) // ps, (w + pad_w) // ps
        src = x_pad
        k = ps
        if cfg.fake_patch_x2:
            # __32x32__ checkpoints: bilinear half-size, conv k=16 over it
            src = jax.image.resize(
                x_pad, (b, x_pad.shape[1] // 2, x_pad.shape[2] // 2, c),
                method="bilinear")
            k = ps // 2
        img = conv2d(src, p["img_in_patch.weight"], p.get("img_in_patch.bias"),
                     stride=k, padding=0)
        img = img.reshape(b, hp * wp, hidden)
    else:
        hp, wp = h // ps, w // ps
        img = (x.reshape(b, hp, ps, wp, ps, c).transpose(0, 1, 3, 2, 4, 5)
               .reshape(b, hp * wp, ps * ps * c))
        img = linear(img, p["img_in.weight"], p.get("img_in.bias"))
    n_img = img.shape[1]
    ref_grids = []
    if ref_latents and not cfg.is_radiance:
        toks = [img]
        for r in ref_latents:
            rb, rh, rw, rc = r.shape
            rhp, rwp = rh // ps, rw // ps
            rt = (r.astype(x.dtype)
                  .reshape(rb, rhp, ps, rwp, ps, rc).transpose(0, 1, 3, 2, 4, 5)
                  .reshape(rb, rhp * rwp, ps * ps * rc))
            toks.append(linear(rt, p["img_in.weight"], p.get("img_in.bias")))
            ref_grids.append((rhp, rwp, rh, rw))
        img = jnp.concatenate(toks, axis=1)
    ctx_in = context.astype(x.dtype)
    if cfg.semantic_txt_norm:
        ctx_in = rms_norm(ctx_in, p["txt_norm.weight"], eps=1e-6)
    txt = linear(ctx_in, p["txt_in.weight"], p.get("txt_in.bias"))
    l_txt = txt.shape[1]

    attn_mask = None
    if cfg.is_chroma:
        # distilled modulation table replaces time/vector embeds; y carries
        # the T5 token mask (0 / -inf) padded over the img tokens
        # (reference flux.hpp:1029-1053)
        modt = _chroma_mod_vectors(p, timesteps, guidance, cfg, x.dtype)
        vec = None
        if y is not None and cfg.chroma_use_dit_mask:
            pad = jnp.zeros((b, img.shape[1]), dtype=y.dtype)
            attn_mask = (
                jnp.concatenate([y, pad], axis=1).astype(jnp.float32)[:, None, None, :]
            )
    elif cfg.is_sefi:
        # timesteps: [B, 2] raw [t_sem, t_tex] (1..1000); each half of the
        # hidden vector comes from its own silu MLP (SefiDualTimestepEmbeddings)
        modt = None

        def _sefi_embed(pre, t):
            e = timestep_embedding(t, 256).astype(x.dtype)
            e = linear(e, p[f"{pre}.linear_1.weight"])
            return linear(silu(e), p[f"{pre}.linear_2.weight"])

        vec = jnp.concatenate(
            [_sefi_embed("dual_time_embed.semantic_embedder", timesteps[:, 0]),
             _sefi_embed("dual_time_embed.texture_embedder", timesteps[:, 1])],
            axis=-1)
    else:
        modt = None
        t_emb = timestep_embedding(timesteps * 1000.0, 256).astype(x.dtype)
        vec = _mlp_embed(p, "time_in", t_emb)
        if cfg.guidance_embed and guidance is not None:
            g_emb = timestep_embedding(guidance * 1000.0, 256).astype(x.dtype)
            vec = vec + _mlp_embed(p, "guidance_in", g_emb)
        if cfg.vec_in_dim > 0 and y is not None:
            vec = vec + _mlp_embed(p, "vector_in", y.astype(x.dtype))

    # RoPE ids: txt zeros (or arange on txt_arange_axes — FLUX.2/Ovis);
    # img (…, i, j, …) — static per shape
    n_axes = len(cfg.axes_dim)
    ids = np.zeros((l_txt + hp * wp, n_axes), dtype=np.int64)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    if cfg.longcat_rope:
        # txt tokens count along BOTH spatial axes; the img grid continues
        # after them with axis-0 index 1 (reference gen_longcat_txt_ids)
        ids[:l_txt, 1] = np.arange(l_txt)
        ids[:l_txt, 2] = np.arange(l_txt)
        ids[l_txt:, 0] = 1
        ids[l_txt:, 1] = ii.reshape(-1) + l_txt
        ids[l_txt:, 2] = jj.reshape(-1) + l_txt
    else:
        ids[l_txt:, 1] = ii.reshape(-1)
        ids[l_txt:, 2] = jj.reshape(-1)
        for a in cfg.txt_arange_axes:
            ids[:l_txt, a] = np.arange(l_txt)
    if ref_grids:
        # FIXED: refs share axis-0 id (x_index+1), tiling diagonally with
        # offsets accumulated in RAW latent units; INCREASE: ref k at origin
        # with axis-0 id (x_index+1+k)*scale (reference rope.hpp:351-397)
        base_off = l_txt if cfg.longcat_rope else 0
        x_index = 1 if cfg.longcat_rope else 0
        index = x_index + 1
        curr_h = curr_w = 0
        ref_id_list = [ids]
        for rhp, rwp, rh, rw in ref_grids:
            h_off = w_off = 0
            if not cfg.ref_index_increase:
                if rh + curr_h > rw + curr_w:
                    w_off = curr_w
                else:
                    h_off = curr_h
            rid = np.zeros((rhp * rwp, n_axes), dtype=np.int64)
            ri, rj = np.meshgrid(np.arange(rhp), np.arange(rwp), indexing="ij")
            rid[:, 0] = int(index * cfg.ref_index_scale)
            rid[:, 1] = ri.reshape(-1) + h_off + base_off
            rid[:, 2] = rj.reshape(-1) + w_off + base_off
            if cfg.ref_index_increase:
                index += 1
            curr_h = max(curr_h, rh + h_off)
            curr_w = max(curr_w, rw + w_off)
            ref_id_list.append(rid)
        ids = np.concatenate(ref_id_list, axis=0)
    rot = jnp.asarray(rope_freqs(ids, cfg.axes_dim, cfg.theta))

    nh = cfg.num_heads
    ns, nd = cfg.depth_single, cfg.depth

    def _mods(base, n):
        return [modt[:, base + j] for j in range(n)]

    shared_img = shared_txt = shared_ss = None
    if cfg.share_modulation:
        # one modulation per stream, shared across ALL blocks
        # (reference flux.hpp:987-990)
        shared_img = _modulation(p, "double_stream_modulation_img", vec, 6)
        shared_txt = _modulation(p, "double_stream_modulation_txt", vec, 6)
        shared_ss = _modulation(p, "single_stream_modulation", vec, 3)

    pulid_run = pulid_id is not None and not skip_layers
    pulid_ca_idx = 0
    for i in range(cfg.depth):
        pre = f"double_blocks.{i}"
        if pulid_run and i % 2 == 0:  # pulid_double_interval (flux.hpp:59)
            img = _pulid_ca(p, pulid_ca_idx, pulid_id, img, pulid_weight)
            pulid_ca_idx += 1
        if cfg.share_modulation:
            mods = (shared_img, shared_txt)
        elif cfg.is_chroma:
            mods = (_mods(6 * i + 3 * ns, 6), _mods(6 * i + 6 * nd + 3 * ns, 6))
        else:
            mods = None
        img, txt = flux_double_block(p, pre, img, txt, vec, rot, attn_mask,
                                     cfg, mods=mods)

    xx = jnp.concatenate([txt, img], axis=1)
    mlp_hidden = int(hidden * cfg.mlp_ratio)
    d_head = hidden // nh
    for i in range(cfg.depth_single):
        if (i + cfg.depth) in skip_layers:
            continue
        if pulid_run and i % 4 == 0:  # pulid_single_interval (flux.hpp:60)
            img_part = _pulid_ca(p, pulid_ca_idx, pulid_id, xx[:, l_txt:],
                                 pulid_weight)
            pulid_ca_idx += 1
            xx = jnp.concatenate([xx[:, :l_txt], img_part], axis=1)
        pre = f"single_blocks.{i}"
        if cfg.share_modulation:
            mods = shared_ss
        elif cfg.is_chroma:
            mods = _mods(3 * i, 3)
        else:
            mods = None
        xx = flux_single_block(p, pre, xx, vec, rot, attn_mask, cfg, mods=mods)

    img = xx[:, l_txt:l_txt + n_img]
    if cfg.is_radiance:
        out = _radiance_nerf_decode(p, img, x_pad, cfg)
        if cfg.radiance_x0:
            # __x0__ checkpoints predict x0; convert to the velocity the
            # flow sampler expects (reference _apply_x0_residual)
            out = (x_pad - out) / timesteps[:, None, None, None]
        return out[:, :h, :w]
    if cfg.is_chroma:
        shift, scale = modt[:, -2], modt[:, -1]
    else:
        mf = linear(
            silu(vec),
            p["final_layer.adaLN_modulation.1.weight"],
            p.get("final_layer.adaLN_modulation.1.bias"),
        )
        shift, scale = jnp.split(mf, 2, axis=-1)
    img = layer_norm(img, eps=1e-6) * (1 + scale[:, None]) + shift[:, None]
    img = linear(img, p["final_layer.linear.weight"], p.get("final_layer.linear.bias"))
    oc = (cfg.out_channels // (ps * ps)) if cfg.out_channels else c
    img = (img.reshape(b, hp, wp, ps, ps, oc).transpose(0, 1, 3, 2, 4, 5)
           .reshape(b, h, w, oc))
    return img


def init_flux_params_quantized(cfg: FluxConfig = FLUX_DEV_CONFIG, seed: int = 0, dtype=jnp.bfloat16):
    """Random-init with large linears stored as int8 QuantTensors directly
    (benchmarks at full scale without materializing f32 weights)."""
    from sdtpu.ops.quant import QuantTensor

    g = np.random.default_rng(seed)
    dense = init_flux_params  # reuse the shape walk below via a patched lin

    p = {}
    hid = cfg.hidden_size
    d_head = hid // cfg.num_heads
    mlp_h = int(hid * cfg.mlp_ratio)

    def lin(name, o, i, bias=True):
        if o * i >= (1 << 16):
            q = g.integers(-127, 128, size=(o, i), dtype=np.int8)
            s = np.full((o,), 0.02 / 127, dtype=np.float32)
            p[f"{name}.weight"] = QuantTensor(q=jnp.asarray(q), scale=jnp.asarray(s))
        else:
            p[f"{name}.weight"] = jnp.asarray(
                g.standard_normal((o, i), dtype=np.float32) * 0.02, dtype=dtype
            )
        if bias:
            p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

    def scale(name, dim=None):
        p[name] = jnp.ones((dim or d_head,), dtype=dtype)

    _flux_param_walk(cfg, lin, scale, conv)
    return p


def _flux_param_walk(cfg: FluxConfig, lin0, scale, conv=None):
    hid = cfg.hidden_size
    mlp_h = int(hid * cfg.mlp_ratio)
    mlp_mult = 2 if (cfg.mlp_silu or cfg.yak_mlp) else 1
    bias = not cfg.disable_bias

    def lin(name, o, i, bias=bias):
        lin0(name, o, i, bias=bias)

    if cfg.is_radiance:
        k = cfg.patch_size // (2 if cfg.fake_patch_x2 else 1)
        conv("img_in_patch", hid, cfg.in_channels, k)
        nh, r = cfg.nerf_hidden, cfg.nerf_mlp_ratio
        lin("nerf_image_embedder.embedder.0", nh,
            cfg.in_channels + cfg.nerf_max_freqs**2)
        for i in range(cfg.nerf_depth):
            lin(f"nerf_blocks.{i}.param_generator", 3 * nh * nh * r, hid)
            scale(f"nerf_blocks.{i}.norm.weight", nh)
        scale("nerf_final_layer_conv.norm.weight", nh)
        conv("nerf_final_layer_conv.conv", cfg.in_channels, nh, 3)
    else:
        lin("img_in", hid, cfg.in_channels)
    if cfg.semantic_txt_norm:
        scale("txt_norm.weight", cfg.context_in_dim)
    lin("txt_in", hid, cfg.context_in_dim)
    if cfg.is_chroma:
        pre = "distilled_guidance_layer"
        lin(f"{pre}.in_proj", CHROMA_APPROX_INNER, 64)
        for i in range(CHROMA_APPROX_DEPTH):
            scale(f"{pre}.norms.{i}.scale", CHROMA_APPROX_INNER)
            lin(f"{pre}.layers.{i}.in_layer", CHROMA_APPROX_INNER, CHROMA_APPROX_INNER)
            lin(f"{pre}.layers.{i}.out_layer", CHROMA_APPROX_INNER, CHROMA_APPROX_INNER)
        lin(f"{pre}.out_proj", hid, CHROMA_APPROX_INNER)
    elif cfg.is_sefi:
        for emb in ("semantic_embedder", "texture_embedder"):
            lin(f"dual_time_embed.{emb}.linear_1", hid // 2, 256, bias=False)
            lin(f"dual_time_embed.{emb}.linear_2", hid // 2, hid // 2, bias=False)
    else:
        lin("time_in.in_layer", hid, 256)
        lin("time_in.out_layer", hid, hid)
        if cfg.vec_in_dim > 0:
            lin("vector_in.in_layer", hid, cfg.vec_in_dim)
            lin("vector_in.out_layer", hid, hid)
        if cfg.guidance_embed:
            lin("guidance_in.in_layer", hid, 256)
            lin("guidance_in.out_layer", hid, hid)
    if cfg.share_modulation:
        lin("double_stream_modulation_img.lin", 6 * hid, hid)
        lin("double_stream_modulation_txt.lin", 6 * hid, hid)
        lin("single_stream_modulation.lin", 3 * hid, hid)
    for i in range(cfg.depth):
        for s in ("img", "txt"):
            pre = f"double_blocks.{i}.{s}"
            if not (cfg.is_chroma or cfg.share_modulation):
                lin(f"{pre}_mod.lin", 6 * hid, hid)
            lin(f"{pre}_attn.qkv", 3 * hid, hid, bias=cfg.qkv_bias and bias)
            scale(f"{pre}_attn.norm.query_norm.scale")
            scale(f"{pre}_attn.norm.key_norm.scale")
            lin(f"{pre}_attn.proj", hid, hid)
            if cfg.yak_mlp:
                lin(f"{pre}_mlp.gate_proj", mlp_h, hid)
                lin(f"{pre}_mlp.up_proj", mlp_h, hid)
                lin(f"{pre}_mlp.down_proj", hid, mlp_h)
            else:
                lin(f"{pre}_mlp.0", mlp_h * mlp_mult, hid)
                lin(f"{pre}_mlp.2", hid, mlp_h)
    for i in range(cfg.depth_single):
        pre = f"single_blocks.{i}"
        if not (cfg.is_chroma or cfg.share_modulation):
            lin(f"{pre}.modulation.lin", 3 * hid, hid)
        lin(f"{pre}.linear1", 3 * hid + mlp_h * mlp_mult, hid)
        lin(f"{pre}.linear2", hid, hid + mlp_h)
        scale(f"{pre}.norm.query_norm.scale")
        scale(f"{pre}.norm.key_norm.scale")
    if cfg.is_radiance:
        return  # NeRF head replaces the final layer
    if not cfg.is_chroma:
        lin("final_layer.adaLN_modulation.1", 2 * hid, hid)
    lin("final_layer.linear", cfg.out_channels or cfg.in_channels, hid)


def init_flux_params(cfg: FluxConfig = FLUX_DEV_CONFIG, seed: int = 0, dtype=jnp.float32):
    g = np.random.default_rng(seed)
    d_head = cfg.hidden_size // cfg.num_heads
    p = {}

    def lin(name, o, i, bias=True):
        p[f"{name}.weight"] = jnp.asarray(
            g.standard_normal((o, i), dtype=np.float32) * 0.02, dtype=dtype
        )
        if bias:
            p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

    def conv(name, o, i, k):
        p[f"{name}.weight"] = jnp.asarray(
            g.standard_normal((o, i, k, k), dtype=np.float32) * 0.02, dtype=dtype
        )
        p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

    def scale(name, dim=None):
        p[name] = jnp.ones((dim or d_head,), dtype=dtype)

    _flux_param_walk(cfg, lin, scale, conv)
    return p

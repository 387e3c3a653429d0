"""Boogu-Image: a Lumina-style GQA DiT with context/noise/ref-image refiner
stages, double-stream img<->instruction blocks, single-stream joint blocks,
tanh-gated RMSNormZero modulation, and an image-index embedding for up to 5
reference images.

Reference analog: Boogu::BooguImageModel / BooguImageRunner
(src/model/diffusion/boogu.hpp:527,750).  Checkpoint names: ``x_embedder``,
``ref_image_patch_embedder``, ``image_index_embedding``,
``time_caption_embed.{timestep_embedder.linear_{1,2}, caption_embedder.{0,1}}``,
``{context_refiner,noise_refiner,ref_image_refiner,single_stream_layers}.N.
{attn.{to_q,to_k,to_v,norm_q,norm_k,to_out.0}, feed_forward.linear_{1,2,3},
norm1(.{linear,norm}), norm2, ffn_norm1, ffn_norm2}``,
``double_stream_layers.N.{img_instruct_attn.{norm_q,norm_k,to_out.0,
processor.*}, img_self_attn.*, img_feed_forward.*, instruct_feed_forward.*,
img_norm{1,2,3}.*, instruct_norm{1,2}.*, img_attn_norm, img_self_attn_norm,
img_ffn_norm{1,2}, instruct_attn_norm, instruct_ffn_norm{1,2}}``,
``norm_out.{linear_1,norm,linear_2}``.

The model predicts the NEGATED velocity and inverts its timestep input
internally (timestep = 1 - t, boogu.hpp:633; callers pass t/1000,
prepare_sample_timesteps stable-diffusion.cpp:2330).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sdtpu.models.flux import apply_rope, rope_freqs
from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import silu


@dataclasses.dataclass(frozen=True)
class BooguConfig:
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 3360
    num_layers: int = 32
    num_double_stream_layers: int = 8
    num_refiner_layers: int = 2
    num_heads: int = 28
    num_kv_heads: int = 7
    head_dim: int = 120
    multiple_of: int = 256
    instruction_feat_dim: int = 4096
    theta: int = 10000
    timestep_scale: float = 1000.0
    norm_eps: float = 1e-5
    axes_dim: Tuple[int, ...] = (40, 40, 40)

    @property
    def temb_dim(self) -> int:
        return min(self.hidden_size, 1024)


BOOGU_CONFIG = BooguConfig()


def detect_boogu_config(names, shapes) -> BooguConfig:
    names = set(names)
    kw = {}
    xe = shapes.get("x_embedder.weight")
    if xe:
        kw["hidden_size"] = xe[0]
        kw["in_channels"] = xe[1] // 4
    ce = shapes.get("time_caption_embed.caption_embedder.1.weight")
    if ce:
        kw["instruction_feat_dim"] = ce[1]
    no = shapes.get("norm_out.linear_2.weight")
    if no:
        kw["out_channels"] = no[0] // 4
    nq = (shapes.get("single_stream_layers.0.attn.norm_q.weight")
          or shapes.get("double_stream_layers.0.img_self_attn.norm_q.weight"))
    kv = (shapes.get("single_stream_layers.0.attn.to_k.weight")
          or shapes.get("double_stream_layers.0.img_instruct_attn.processor.img_to_k.weight"))
    if nq:
        hd = nq[0]
        kw["head_dim"] = hd
        kw["num_heads"] = kw.get("hidden_size", 3360) // hd
        if kv:
            kw["num_kv_heads"] = kv[0] // hd
        if hd % 3 == 0:
            kw["axes_dim"] = (hd // 3,) * 3

    def count(prefix):
        n = 0
        for name in names:
            if name.startswith(prefix):
                n = max(n, int(name[len(prefix):].split(".")[0]) + 1)
        return n

    kw["num_layers"] = max(1, count("single_stream_layers."))
    kw["num_double_stream_layers"] = count("double_stream_layers.")
    kw["num_refiner_layers"] = max(1, count("noise_refiner."),
                                   count("context_refiner."),
                                   count("ref_image_refiner."))
    return dataclasses.replace(BOOGU_CONFIG, **kw)


def boogu_rope(hp: int, wp: int, n_txt: int, cfg: BooguConfig,
               ref_sizes=()):
    """rotation matrices [S, head_dim/2, 2, 2]: txt ids (i,i,i); refs and the
    noise image at increasing pe_shift on axis 0 with (h, w) grids
    (gen_boogu_pe, boogu.hpp:718)."""
    blocks = [np.stack([np.arange(n_txt)] * 3, axis=1).astype(np.float64)]
    shift = n_txt
    for rh, rw in ref_sizes:
        ii, jj = np.meshgrid(np.arange(rh), np.arange(rw), indexing="ij")
        ids = np.zeros((rh * rw, 3))
        ids[:, 0] = shift
        ids[:, 1] = ii.reshape(-1)
        ids[:, 2] = jj.reshape(-1)
        blocks.append(ids)
        shift += max(rh, rw)
    ii, jj = np.meshgrid(np.arange(hp), np.arange(wp), indexing="ij")
    ids = np.zeros((hp * wp, 3))
    ids[:, 0] = shift
    ids[:, 1] = ii.reshape(-1)
    ids[:, 2] = jj.reshape(-1)
    blocks.append(ids)
    return jnp.asarray(rope_freqs(np.concatenate(blocks, axis=0),
                                  cfg.axes_dim, cfg.theta))


def _gqa(q, k, v, rot, nh, nkv):
    if rot is not None:
        q = apply_rope(q, rot)
        k = apply_rope(k, rot)
    if nkv != nh:
        k = jnp.repeat(k, nh // nkv, axis=1)
        v = jnp.repeat(v, nh // nkv, axis=1)
    return attention(q, k, v)


def _attn(p, pre, x, rot, cfg: BooguConfig):
    """Boogu::Attention (boogu.hpp:235): GQA with per-head q/k RMS norm."""
    b, l, _ = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = linear(x, p[f"{pre}.to_q.weight"]).reshape(b, l, nh, hd)
    k = linear(x, p[f"{pre}.to_k.weight"]).reshape(b, l, nkv, hd)
    v = linear(x, p[f"{pre}.to_v.weight"]).reshape(b, l, nkv, hd)
    q = rms_norm(q, p[f"{pre}.norm_q.weight"], eps=1e-5).transpose(0, 2, 1, 3)
    k = rms_norm(k, p[f"{pre}.norm_k.weight"], eps=1e-5).transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    o = _gqa(q, k, v, rot, nh, nkv).transpose(0, 2, 1, 3).reshape(b, l, nh * hd)
    return linear(o, p[f"{pre}.to_out.0.weight"])


def _ff(p, pre, x):
    h1 = linear(x, p[f"{pre}.linear_1.weight"])
    h2 = linear(x, p[f"{pre}.linear_3.weight"])
    return linear(silu(h1) * h2, p[f"{pre}.linear_2.weight"])


def _norm_zero(p, pre, x, temb, cfg: BooguConfig):
    """LuminaRMSNormZero (boogu.hpp:166) -> (normed, gate_msa, scale_mlp,
    gate_mlp)."""
    emb = linear(silu(temb), p[f"{pre}.linear.weight"], p[f"{pre}.linear.bias"])
    sc_msa, g_msa, sc_mlp, g_mlp = jnp.split(emb[:, None], 4, axis=-1)
    h = rms_norm(x, p[f"{pre}.norm.weight"], eps=cfg.norm_eps)
    return h * (1.0 + sc_msa), g_msa, sc_mlp, g_mlp


def _block(p, pre, x, rot, temb, cfg: BooguConfig):
    """BooguImageTransformerBlock (boogu.hpp:286)."""
    if f"{pre}.norm1.linear.weight" in p:
        h, g_msa, sc_mlp, g_mlp = _norm_zero(p, f"{pre}.norm1", x, temb, cfg)
        a = _attn(p, f"{pre}.attn", h, rot, cfg)
        a = rms_norm(a, p[f"{pre}.norm2.weight"], eps=cfg.norm_eps)
        x = x + a * jnp.tanh(g_msa)
        m = rms_norm(x, p[f"{pre}.ffn_norm1.weight"], eps=cfg.norm_eps)
        m = m * (1.0 + sc_mlp)
        m = _ff(p, f"{pre}.feed_forward", m)
        m = rms_norm(m, p[f"{pre}.ffn_norm2.weight"], eps=cfg.norm_eps)
        return x + m * jnp.tanh(g_mlp)
    h = rms_norm(x, p[f"{pre}.norm1.weight"], eps=cfg.norm_eps)
    a = _attn(p, f"{pre}.attn", h, rot, cfg)
    x = x + rms_norm(a, p[f"{pre}.norm2.weight"], eps=cfg.norm_eps)
    m = _ff(p, f"{pre}.feed_forward",
            rms_norm(x, p[f"{pre}.ffn_norm1.weight"], eps=cfg.norm_eps))
    return x + rms_norm(m, p[f"{pre}.ffn_norm2.weight"], eps=cfg.norm_eps)


def _joint_attn(p, pre, img, txt, rot, cfg: BooguConfig):
    """BooguImageJointAttention (boogu.hpp:349): separate img/instruct qkv,
    SHARED per-head norms applied after concatenation, separate out
    projections summed through to_out.0."""
    b, li, _ = img.shape
    lt = txt.shape[1]
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def proj(x, name, n, l):
        return linear(x, p[f"{pre}.processor.{name}.weight"]).reshape(
            b, l, n, hd).transpose(0, 2, 1, 3)

    iq = proj(img, "img_to_q", nh, li)
    ik = proj(img, "img_to_k", nkv, li)
    iv = proj(img, "img_to_v", nkv, li)
    tq = proj(txt, "instruct_to_q", nh, lt)
    tk = proj(txt, "instruct_to_k", nkv, lt)
    tv = proj(txt, "instruct_to_v", nkv, lt)
    q = rms_norm(jnp.concatenate([tq, iq], axis=2),
                 p[f"{pre}.norm_q.weight"], eps=1e-5)
    k = rms_norm(jnp.concatenate([tk, ik], axis=2),
                 p[f"{pre}.norm_k.weight"], eps=1e-5)
    v = jnp.concatenate([tv, iv], axis=2)
    o = _gqa(q, k, v, rot, nh, nkv).transpose(0, 2, 1, 3)
    o = o.reshape(b, lt + li, nh * hd)
    t_o = linear(o[:, :lt], p[f"{pre}.processor.instruct_out.weight"])
    i_o = linear(o[:, lt:], p[f"{pre}.processor.img_out.weight"])
    joint = jnp.concatenate([t_o, i_o], axis=1)
    return linear(joint, p[f"{pre}.to_out.0.weight"])


def _double_block(p, pre, img, txt, joint_rot, img_rot, temb, cfg: BooguConfig):
    """BooguImageDoubleStreamBlock (boogu.hpp:426)."""
    lt = txt.shape[1]
    in1, ig_msa, isc_mlp, ig_mlp = _norm_zero(p, f"{pre}.img_norm1", img, temb, cfg)
    in2, ish_mlp, _, _ = _norm_zero(p, f"{pre}.img_norm2", img, temb, cfg)
    in3, ig_self, _, _ = _norm_zero(p, f"{pre}.img_norm3", img, temb, cfg)
    tn1, tg_msa, tsc_mlp, tg_mlp = _norm_zero(p, f"{pre}.instruct_norm1", txt, temb, cfg)
    tn2, tsh_mlp, _, _ = _norm_zero(p, f"{pre}.instruct_norm2", txt, temb, cfg)

    joint = _joint_attn(p, f"{pre}.img_instruct_attn", in1, tn1, joint_rot, cfg)
    t_attn, i_attn = joint[:, :lt], joint[:, lt:]
    i_self = _attn(p, f"{pre}.img_self_attn", in3, img_rot, cfg)

    img = img + rms_norm(i_attn, p[f"{pre}.img_attn_norm.weight"],
                         eps=cfg.norm_eps) * jnp.tanh(ig_msa)
    img = img + rms_norm(i_self, p[f"{pre}.img_self_attn_norm.weight"],
                         eps=cfg.norm_eps) * jnp.tanh(ig_self)
    m = in2 * (1.0 + isc_mlp) + ish_mlp
    m = _ff(p, f"{pre}.img_feed_forward",
            rms_norm(m, p[f"{pre}.img_ffn_norm1.weight"], eps=cfg.norm_eps))
    img = img + rms_norm(m, p[f"{pre}.img_ffn_norm2.weight"],
                         eps=cfg.norm_eps) * jnp.tanh(ig_mlp)

    txt = txt + rms_norm(t_attn, p[f"{pre}.instruct_attn_norm.weight"],
                         eps=cfg.norm_eps) * jnp.tanh(tg_msa)
    m = tn2 * (1.0 + tsc_mlp) + tsh_mlp
    m = _ff(p, f"{pre}.instruct_feed_forward",
            rms_norm(m, p[f"{pre}.instruct_ffn_norm1.weight"], eps=cfg.norm_eps))
    txt = txt + rms_norm(m, p[f"{pre}.instruct_ffn_norm2.weight"],
                         eps=cfg.norm_eps) * jnp.tanh(tg_mlp)
    return img, txt


def boogu_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    cfg: BooguConfig = BOOGU_CONFIG,
    ref_latents=(),
) -> jnp.ndarray:
    """x: [B, H, W, 16] flux-VAE latent; timesteps: [B] in [0, 1] (t/1000);
    context: [B, L, instruction_feat_dim] Qwen3-VL hidden states;
    ref_latents: optional list of [B, Hr, Wr, 16] reference latents."""
    b, hh, ww, c = x.shape
    ps = cfg.patch_size
    pad_h, pad_w = (-hh) % ps, (-ww) % ps
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = (hh + pad_h) // ps, (ww + pad_w) // ps

    def patchify(z):
        # patch_last=false layout: feature (py, px, c) (boogu.hpp:637)
        zb, zh, zw, zc = z.shape
        zp = z.reshape(zb, zh // ps, ps, zw // ps, ps, zc)
        zp = zp.transpose(0, 1, 3, 2, 4, 5)
        return zp.reshape(zb, (zh // ps) * (zw // ps), ps * ps * zc)

    img = linear(patchify(x), p["x_embedder.weight"], p["x_embedder.bias"])
    n_img = img.shape[1]

    # timestep inverted internally (boogu.hpp:633)
    t_inv = 1.0 - timesteps.astype(jnp.float32)
    t_proj = timestep_embedding(t_inv * cfg.timestep_scale, 256).astype(img.dtype)
    temb = linear(t_proj, p["time_caption_embed.timestep_embedder.linear_1.weight"],
                  p["time_caption_embed.timestep_embedder.linear_1.bias"])
    temb = linear(silu(temb),
                  p["time_caption_embed.timestep_embedder.linear_2.weight"],
                  p["time_caption_embed.timestep_embedder.linear_2.bias"])

    txt = rms_norm(context, p["time_caption_embed.caption_embedder.0.weight"],
                   eps=cfg.norm_eps)
    txt = linear(txt, p["time_caption_embed.caption_embedder.1.weight"],
                 p["time_caption_embed.caption_embedder.1.bias"])
    n_txt = txt.shape[1]

    ref_img = None
    ref_sizes = []
    for i, ref in enumerate(ref_latents):
        rp = linear(patchify(ref), p["ref_image_patch_embedder.weight"],
                    p["ref_image_patch_embedder.bias"])
        rp = rp + p["image_index_embedding"][min(i, 4)][None, None].astype(rp.dtype)
        ref_img = rp if ref_img is None else jnp.concatenate([ref_img, rp], axis=1)
        ref_sizes.append((ref.shape[1] // ps, ref.shape[2] // ps))
    n_ref = 0 if ref_img is None else ref_img.shape[1]

    rot = boogu_rope(hp, wp, n_txt, cfg, ref_sizes)
    txt_rot = rot[:n_txt]
    noise_rot = rot[n_txt + n_ref:]

    for i in range(cfg.num_refiner_layers):
        txt = _block(p, f"context_refiner.{i}", txt, txt_rot, None, cfg)
    for i in range(cfg.num_refiner_layers):
        img = _block(p, f"noise_refiner.{i}", img, noise_rot, temb, cfg)

    combined = img
    if ref_img is not None:
        ref_rot = rot[n_txt: n_txt + n_ref]
        for i in range(cfg.num_refiner_layers):
            ref_img = _block(p, f"ref_image_refiner.{i}", ref_img, ref_rot,
                             temb, cfg)
        combined = jnp.concatenate([ref_img, img], axis=1)

    img_rot = rot[n_txt: n_txt + combined.shape[1]]
    for i in range(cfg.num_double_stream_layers):
        combined, txt = _double_block(p, f"double_stream_layers.{i}", combined,
                                      txt, rot, img_rot, temb, cfg)

    hseq = jnp.concatenate([txt, combined], axis=1)
    for i in range(cfg.num_layers):
        hseq = _block(p, f"single_stream_layers.{i}", hseq, rot, temb, cfg)

    # LuminaLayerNormContinuous (boogu.hpp:214)
    emb = linear(silu(temb), p["norm_out.linear_1.weight"],
                 p["norm_out.linear_1.bias"])
    out = layer_norm(hseq, eps=1e-6)
    out = out * (1.0 + emb[:, None])
    out = linear(out, p["norm_out.linear_2.weight"], p["norm_out.linear_2.bias"])
    out = out[:, out.shape[1] - n_img:]

    out = out.reshape(b, hp, wp, ps, ps, cfg.out_channels)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp * ps, wp * ps,
                                                  cfg.out_channels)
    if pad_h or pad_w:
        out = out[:, :hh, :ww]
    return -out  # negated velocity (boogu.hpp:694)


def init_boogu_params(cfg: BooguConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def lin(p, pre, din, dout, bias=False):
        p[f"{pre}.weight"] = wt(dout, din)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((dout,), dtype=dtype)

    hid = cfg.hidden_size
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    inner = 4 * hid
    ffh = cfg.multiple_of * ((inner + cfg.multiple_of - 1) // cfg.multiple_of)
    p: dict = {"image_index_embedding": wt(5, hid)}
    lin(p, "x_embedder", cfg.patch_size**2 * cfg.in_channels, hid, bias=True)
    lin(p, "ref_image_patch_embedder", cfg.patch_size**2 * cfg.in_channels,
        hid, bias=True)
    lin(p, "time_caption_embed.timestep_embedder.linear_1", 256, cfg.temb_dim,
        bias=True)
    lin(p, "time_caption_embed.timestep_embedder.linear_2", cfg.temb_dim,
        cfg.temb_dim, bias=True)
    p["time_caption_embed.caption_embedder.0.weight"] = jnp.ones(
        (cfg.instruction_feat_dim,), dtype=dtype)
    lin(p, "time_caption_embed.caption_embedder.1", cfg.instruction_feat_dim,
        hid, bias=True)

    def attn_w(p, pre):
        lin(p, f"{pre}.to_q", hid, nh * hd)
        lin(p, f"{pre}.to_k", hid, nkv * hd)
        lin(p, f"{pre}.to_v", hid, nkv * hd)
        p[f"{pre}.norm_q.weight"] = jnp.ones((hd,), dtype=dtype)
        p[f"{pre}.norm_k.weight"] = jnp.ones((hd,), dtype=dtype)
        lin(p, f"{pre}.to_out.0", nh * hd, hid)

    def block_w(p, pre, modulated):
        attn_w(p, f"{pre}.attn")
        lin(p, f"{pre}.feed_forward.linear_1", hid, ffh)
        lin(p, f"{pre}.feed_forward.linear_2", ffh, hid)
        lin(p, f"{pre}.feed_forward.linear_3", hid, ffh)
        if modulated:
            lin(p, f"{pre}.norm1.linear", cfg.temb_dim, 4 * hid, bias=True)
            p[f"{pre}.norm1.norm.weight"] = jnp.ones((hid,), dtype=dtype)
        else:
            p[f"{pre}.norm1.weight"] = jnp.ones((hid,), dtype=dtype)
        for nm in ("norm2", "ffn_norm1", "ffn_norm2"):
            p[f"{pre}.{nm}.weight"] = jnp.ones((hid,), dtype=dtype)

    for i in range(cfg.num_refiner_layers):
        block_w(p, f"noise_refiner.{i}", True)
        block_w(p, f"ref_image_refiner.{i}", True)
        block_w(p, f"context_refiner.{i}", False)
    for i in range(cfg.num_layers):
        block_w(p, f"single_stream_layers.{i}", True)
    for i in range(cfg.num_double_stream_layers):
        pre = f"double_stream_layers.{i}"
        p[f"{pre}.img_instruct_attn.norm_q.weight"] = jnp.ones((hd,), dtype=dtype)
        p[f"{pre}.img_instruct_attn.norm_k.weight"] = jnp.ones((hd,), dtype=dtype)
        lin(p, f"{pre}.img_instruct_attn.to_out.0", nh * hd, hid)
        for nm, o in (("img_to_q", nh), ("img_to_k", nkv), ("img_to_v", nkv),
                      ("instruct_to_q", nh), ("instruct_to_k", nkv),
                      ("instruct_to_v", nkv)):
            lin(p, f"{pre}.img_instruct_attn.processor.{nm}", hid, o * hd)
        lin(p, f"{pre}.img_instruct_attn.processor.instruct_out", nh * hd, hid)
        lin(p, f"{pre}.img_instruct_attn.processor.img_out", nh * hd, hid)
        attn_w(p, f"{pre}.img_self_attn")
        for s in ("img_feed_forward", "instruct_feed_forward"):
            lin(p, f"{pre}.{s}.linear_1", hid, ffh)
            lin(p, f"{pre}.{s}.linear_2", ffh, hid)
            lin(p, f"{pre}.{s}.linear_3", hid, ffh)
        for nm in ("img_norm1", "img_norm2", "img_norm3", "instruct_norm1",
                   "instruct_norm2"):
            lin(p, f"{pre}.{nm}.linear", cfg.temb_dim, 4 * hid, bias=True)
            p[f"{pre}.{nm}.norm.weight"] = jnp.ones((hid,), dtype=dtype)
        for nm in ("img_attn_norm", "img_self_attn_norm", "img_ffn_norm1",
                   "img_ffn_norm2", "instruct_attn_norm", "instruct_ffn_norm1",
                   "instruct_ffn_norm2"):
            p[f"{pre}.{nm}.weight"] = jnp.ones((hid,), dtype=dtype)
    lin(p, "norm_out.linear_1", cfg.temb_dim, hid, bias=True)
    lin(p, "norm_out.linear_2", hid, cfg.patch_size**2 * cfg.out_channels,
        bias=True)
    return p

"""PiD (PixelDiT) — pixel-space super-resolution DiT.

Reference analog: Pid::PixelDiT / PiDRunner (src/model/diffusion/pid.hpp:478,
819).  Two stages: a patch-level MMDiT (joint image/text attention with
per-block adaLN from the timestep) conditioned by gated low-quality-image
features, then a pixel-level refiner whose per-patch GLU blocks compress to a
patch-grid attention and expand back.  Checkpoint naming:
``patch_blocks.N.{norm_x1,norm_y1,attn.{qkv_x,qkv_y,q_norm_x,k_norm_x,
q_norm_y,k_norm_y,proj_x,proj_y},norm_x2,norm_y2,mlp_x.{w1,w2,w3},mlp_y.*,
adaLN_modulation_img.0,adaLN_modulation_txt.0}``, ``pixel_blocks.N.*``,
``lq_proj.{latent_proj.*,output_heads.N,gate_modules.N,pit_head}``,
``{s,y,t,pixel}_embedder``, ``y_pos_embedding``, ``final_layer``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import conv2d, gelu_tanh, group_norm, silu


@dataclasses.dataclass(frozen=True)
class PidConfig:
    in_channels: int = 3
    hidden_size: int = 1536
    num_groups: int = 24  # patch attention heads
    patch_mlp_hidden_dim: int = 4096
    pixel_hidden_size: int = 16
    pixel_attn_hidden_size: int = 1152
    pixel_num_groups: int = 16
    patch_depth: int = 14
    pixel_depth: int = 2
    patch_size: int = 16
    txt_embed_dim: int = 2304  # Gemma2-2B hidden
    txt_max_length: int = 300
    text_rope_theta: float = 10000.0
    lq_latent_channels: int = 16
    lq_hidden_dim: int = 512
    lq_num_res_blocks: int = 4
    lq_interval: int = 2
    lq_sr_scale: int = 4
    lq_latent_down_factor: int = 8
    lq_latent_unpatchify_factor: int = 1
    lq_replicate_padding: bool = False
    lq_gate_per_token: bool = False
    pit_lq_inject: bool = False  # PiD 1.5
    rope_ref_grid_h: int = 64
    rope_ref_grid_w: int = 64


PID_CONFIG = PidConfig()
PID_15_CONFIG = PidConfig(
    lq_latent_channels=128, lq_latent_down_factor=16,
    lq_latent_unpatchify_factor=2, lq_replicate_padding=True,
    pit_lq_inject=True, rope_ref_grid_h=128, rope_ref_grid_w=128,
)


def detect_pid_config(names, shapes) -> PidConfig:
    """Shape-driven config (reference PixelDiTConfig::detect_from_weights,
    pid.hpp:46-124)."""
    names = set(names)
    kw = {}
    patch_depth = pixel_depth = gates = 0
    for n in names:
        if n.startswith("patch_blocks."):
            patch_depth = max(patch_depth, int(n.split(".")[1]) + 1)
        elif n.startswith("pixel_blocks."):
            pixel_depth = max(pixel_depth, int(n.split(".")[1]) + 1)
        elif n.startswith("lq_proj.gate_modules."):
            gates = max(gates, int(n.split(".")[2]) + 1)
    if patch_depth:
        kw["patch_depth"] = patch_depth
    if pixel_depth:
        kw["pixel_depth"] = pixel_depth
    w = shapes.get("lq_proj.latent_proj.0.weight")
    lq_in = w[1] if w else 16
    if w:
        kw["lq_hidden_dim"] = w[0]
    w = shapes.get("patch_blocks.0.mlp_x.w1.weight")
    if w:
        kw["patch_mlp_hidden_dim"] = w[0]
    w = shapes.get("s_embedder.proj.weight")
    if w:
        kw["hidden_size"] = w[0]
    w = shapes.get("y_embedder.proj.weight")
    if w:
        kw["txt_embed_dim"] = w[1]
    if gates and kw.get("patch_depth"):
        kw["lq_interval"] = (kw["patch_depth"] + gates - 1) // gates
    pit = "lq_proj.pit_head.weight" in names
    kw["pit_lq_inject"] = pit
    if pit:
        kw["lq_replicate_padding"] = True
        kw["rope_ref_grid_h"] = kw["rope_ref_grid_w"] = 128
        if lq_in == 16:
            kw.update(lq_latent_channels=16, lq_latent_down_factor=8,
                      lq_latent_unpatchify_factor=1)
        else:
            kw.update(lq_latent_channels=128, lq_latent_down_factor=16,
                      lq_latent_unpatchify_factor=2)
        gw = shapes.get("lq_proj.gate_modules.0.content_proj.weight")
        if gw:
            kw["lq_gate_per_token"] = gw[0] == 1
    else:
        kw["lq_latent_channels"] = lq_in
        kw["lq_latent_down_factor"] = 16 if lq_in >= 64 else 8
    return dataclasses.replace(PID_CONFIG, **kw)


# --------------------------------------------------------------- positional

def _rope_table_1d(pos: np.ndarray, dim: int, theta: float) -> np.ndarray:
    """[L, dim/2, 2, 2] rope table (reference Rope::rope, rope.hpp:55)."""
    half = dim // 2
    scale = np.linspace(0.0, (dim - 2.0) / dim, half)
    omega = 1.0 / theta**scale
    ang = pos[:, None] * omega[None]  # [L, half]
    c, s = np.cos(ang), np.sin(ang)
    out = np.stack([c, -s, s, c], axis=-1).reshape(len(pos), half, 2, 2)
    return out.astype(np.float32)


def pid_rope_2d(hs: int, ws: int, dim: int, theta: float = 10000.0,
                scale: float = 16.0, ref_h: int = 0, ref_w: int = 0) -> jnp.ndarray:
    """Interleaved 2D rope: x-axis entries on even frequency slots, y on odd;
    positions rescaled to [0, scale], per-axis NTK theta stretched by
    (size/ref)^(d/(d-2)) (reference Rope::embed_2d_interleaved,
    rope.hpp:297-350)."""
    d_axis = dim // 2
    h_ntk = w_ntk = 1.0
    if ref_h > 0 and ref_w > 0 and d_axis > 2:
        power = d_axis / (d_axis - 2.0)
        h_ntk = (hs / ref_h) ** power
        w_ntk = (ws / ref_w) ** power
    ys = np.zeros(hs) if hs == 1 else scale * np.arange(hs) / (hs - 1)
    xs = np.zeros(ws) if ws == 1 else scale * np.arange(ws) / (ws - 1)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    x_emb = _rope_table_1d(xx.reshape(-1), d_axis, theta * w_ntk)  # [L, d/4,2,2]
    y_emb = _rope_table_1d(yy.reshape(-1), d_axis, theta * h_ntk)
    out = np.empty((hs * ws, dim // 2, 2, 2), dtype=np.float32)
    out[:, 0::2] = x_emb
    out[:, 1::2] = y_emb
    return jnp.asarray(out)


def pid_rope_txt(l_txt: int, dim: int, theta: float) -> jnp.ndarray:
    return jnp.asarray(_rope_table_1d(np.arange(l_txt, dtype=np.float64), dim, theta))


def pid_pixel_abs_pos(hh: int, ww: int, dim: int) -> np.ndarray:
    """[H*W, dim] = [sincos(x, dim/2) | sincos(y, dim/2)] (reference
    make_pixel_abs_pos, pid.hpp:144-173, flip_sin_to_cos=false)."""
    half = dim // 2
    yy, xx = np.meshgrid(np.arange(hh, dtype=np.float64),
                         np.arange(ww, dtype=np.float64), indexing="ij")

    def sincos(pos):
        q = half // 2
        freqs = np.exp(-np.log(10000.0) * np.arange(q) / q)
        ang = pos.reshape(-1, 1) * freqs[None]
        return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)

    return np.concatenate([sincos(xx), sincos(yy)], axis=-1).astype(np.float32)


def _apply_rope_interleaved(x, rot):
    """x: [B,H,L,D]; rot: [L, D/2, 2, 2] acting on pairs (2i, 2i+1)."""
    b, nh, l, d = x.shape
    xp = x.reshape(b, nh, l, d // 2, 1, 2).astype(jnp.float32)
    out = rot[None, None, :, :, 0] * xp[..., 0] + rot[None, None, :, :, 1] * xp[..., 1]
    return out.reshape(b, nh, l, d).astype(x.dtype)


# ------------------------------------------------------------------- blocks

def _adaln(x, shift, scale):
    return x + x * scale + shift


def _ff(p, pre, x):
    """SwiGLU FeedForward w1/w2/w3 (reference pid.hpp:241)."""
    h = silu(linear(x, p[f"{pre}.w1.weight"])) * linear(x, p[f"{pre}.w3.weight"])
    return linear(h, p[f"{pre}.w2.weight"])


def _qkv_heads(p, pre, x, heads, suffix=""):
    b, l, d = x.shape
    hd = d // heads
    qkv = linear(x, p[f"{pre}.qkv{suffix}.weight"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, l, heads, hd).transpose(0, 2, 1, 3)
    sx = suffix.replace("_", "")
    sx = f"_{sx}" if sx else ""
    q = rms_norm(q, p[f"{pre}.q_norm{sx}.weight"], eps=1e-6)
    k = rms_norm(k, p[f"{pre}.k_norm{sx}.weight"], eps=1e-6)
    return q, k, v


def _patch_block(p, pre, x, y, cond, rot_img, rot_txt, cfg):
    """MMDiTBlockT2I (reference pid.hpp:366): joint img/txt attention with
    txt tokens FIRST, per-stream 6-way adaLN from silu(t_emb)."""
    heads = cfg.num_groups
    mx = jnp.split(linear(cond, p[f"{pre}.adaLN_modulation_img.0.weight"],
                          p[f"{pre}.adaLN_modulation_img.0.bias"])[:, None], 6, -1)
    my = jnp.split(linear(cond, p[f"{pre}.adaLN_modulation_txt.0.weight"],
                          p[f"{pre}.adaLN_modulation_txt.0.bias"])[:, None], 6, -1)
    xn = _adaln(rms_norm(x, p[f"{pre}.norm_x1.weight"], eps=1e-6), mx[0], mx[1])
    yn = _adaln(rms_norm(y, p[f"{pre}.norm_y1.weight"], eps=1e-6), my[0], my[1])
    qx, kx, vx = _qkv_heads(p, f"{pre}.attn", xn, heads, "_x")
    qy, ky, vy = _qkv_heads(p, f"{pre}.attn", yn, heads, "_y")
    qx = _apply_rope_interleaved(qx, rot_img)
    kx = _apply_rope_interleaved(kx, rot_img)
    qy = _apply_rope_interleaved(qy, rot_txt)
    ky = _apply_rope_interleaved(ky, rot_txt)
    l_txt = y.shape[1]
    q = jnp.concatenate([qy, qx], axis=2)
    k = jnp.concatenate([ky, kx], axis=2)
    v = jnp.concatenate([vy, vx], axis=2)
    o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(x.shape[0], -1, x.shape[-1])
    oy, ox = o[:, :l_txt], o[:, l_txt:]
    x = x + linear(ox, p[f"{pre}.attn.proj_x.weight"], p[f"{pre}.attn.proj_x.bias"]) * mx[2]
    y = y + linear(oy, p[f"{pre}.attn.proj_y.weight"], p[f"{pre}.attn.proj_y.bias"]) * my[2]
    xm = _adaln(rms_norm(x, p[f"{pre}.norm_x2.weight"], eps=1e-6), mx[3], mx[4])
    ym = _adaln(rms_norm(y, p[f"{pre}.norm_y2.weight"], eps=1e-6), my[3], my[4])
    x = x + _ff(p, f"{pre}.mlp_x", xm) * mx[5]
    y = y + _ff(p, f"{pre}.mlp_y", ym) * my[5]
    return x, y


def _sigma_gate(p, pre, x, lq, sigma):
    """SigmaAwareGate (pid.hpp:520): x + lq * sigmoid(proj([x,lq]) -
    exp(log_alpha)*sigma)."""
    logit = linear(jnp.concatenate([x, lq], axis=-1),
                   p[f"{pre}.content_proj.weight"], p[f"{pre}.content_proj.bias"])
    offset = jnp.exp(p[f"{pre}.log_alpha"]) * sigma[:, None, None]
    return x + lq * jax.nn.sigmoid(logit - offset)


def _replicate_pad(x):
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")


def _lq_conv(p, name, x, replicate):
    if replicate:
        x = _replicate_pad(x)
    return conv2d(x, p[f"{name}.weight"], p[f"{name}.bias"],
                  padding=0 if replicate else 1)


def _lq_resblock(p, pre, x, replicate):
    h = silu(group_norm(x, p[f"{pre}.block.0.weight"], p[f"{pre}.block.0.bias"],
                        num_groups=4, eps=1e-5))
    h = _lq_conv(p, f"{pre}.block.2", h, replicate)
    h = silu(group_norm(h, p[f"{pre}.block.3.weight"], p[f"{pre}.block.3.bias"],
                        num_groups=4, eps=1e-5))
    h = _lq_conv(p, f"{pre}.block.5", h, replicate)
    return x + h


def _lq_projection(p, lq, hs, ws, cfg: PidConfig):
    """LQProjection2D (pid.hpp:573): optional 2x2 latent unpatchify, nearest
    resize to the patch grid, conv stack, per-gate output heads (+pit head)."""
    uf = cfg.lq_latent_unpatchify_factor
    if uf > 1:
        b, hl, wl, cl = lq.shape
        lq = (lq.reshape(b, hl, wl, cl // (uf * uf), uf, uf)
              .transpose(0, 1, 4, 2, 5, 3)
              .reshape(b, hl * uf, wl * uf, cl // (uf * uf)))
    b = lq.shape[0]
    if lq.shape[1] != hs or lq.shape[2] != ws:
        lq = jax.image.resize(lq, (b, hs, ws, lq.shape[-1]), method="nearest")
    rep = cfg.lq_replicate_padding
    feat = silu(_lq_conv(p, "lq_proj.latent_proj.0", lq, rep))
    feat = _lq_conv(p, "lq_proj.latent_proj.2", feat, rep)
    for i in range(cfg.lq_num_res_blocks):
        feat = _lq_resblock(p, f"lq_proj.latent_proj.{3 + i}", feat, rep)
    tokens = feat.reshape(b, hs * ws, cfg.lq_hidden_dim)
    n_out = (cfg.patch_depth + cfg.lq_interval - 1) // cfg.lq_interval
    outs = [linear(tokens, p[f"lq_proj.output_heads.{i}.weight"],
                   p[f"lq_proj.output_heads.{i}.bias"]) for i in range(n_out)]
    pit = None
    if cfg.pit_lq_inject:
        pit = linear(tokens, p["lq_proj.pit_head.weight"], p["lq_proj.pit_head.bias"])
    return outs, pit


def _pixel_block(p, pre, pix, s_cond, rot_comp, cfg: PidConfig):
    """PiTBlock (pid.hpp:451): per-patch adaLN generated from the patch
    token, compress P²·pd → patch-grid rotary attention → expand."""
    pd = cfg.pixel_hidden_size
    ps = cfg.patch_size
    p2 = ps * ps
    bl = pix.shape[0]
    ada = linear(s_cond, p[f"{pre}.adaLN_modulation.0.weight"],
                 p[f"{pre}.adaLN_modulation.0.bias"]).reshape(bl, p2, 6 * pd)
    mod = jnp.split(ada, 6, axis=-1)
    xn = _adaln(rms_norm(pix, p[f"{pre}.norm1.weight"], eps=1e-6), mod[0], mod[1])
    comp = linear(xn.reshape(bl, p2 * pd), p[f"{pre}.compress_to_attn.weight"],
                  p[f"{pre}.compress_to_attn.bias"])
    L = rot_comp.shape[0]
    b = bl // L
    comp = comp.reshape(b, L, cfg.pixel_attn_hidden_size)
    q, k, v = _qkv_heads(p, f"{pre}.attn", comp, cfg.pixel_num_groups)
    q = _apply_rope_interleaved(q, rot_comp)
    k = _apply_rope_interleaved(k, rot_comp)
    o = attention(q, k, v).transpose(0, 2, 1, 3).reshape(bl, cfg.pixel_attn_hidden_size)
    o = linear(o, p[f"{pre}.attn.proj.weight"], p[f"{pre}.attn.proj.bias"])
    exp = linear(o, p[f"{pre}.expand_from_attn.weight"],
                 p[f"{pre}.expand_from_attn.bias"]).reshape(bl, p2, pd)
    pix = pix + exp * mod[2]
    xm = _adaln(rms_norm(pix, p[f"{pre}.norm2.weight"], eps=1e-6), mod[3], mod[4])
    h = gelu_tanh(linear(xm, p[f"{pre}.mlp.fc1.weight"], p[f"{pre}.mlp.fc1.bias"]))
    h = linear(h, p[f"{pre}.mlp.fc2.weight"], p[f"{pre}.mlp.fc2.bias"])
    return pix + h * mod[5]


# ------------------------------------------------------------------ forward

def pid_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: jnp.ndarray,
    lq_latent: jnp.ndarray,
    cfg: PidConfig = PID_CONFIG,
    degrade_sigma: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x: [B,H,W,3] noisy pixels; timesteps: [B] (t = sigma*1000);
    context: [B,L,2304] Gemma2 hidden states; lq_latent: [B,hl,wl,Cl]
    VAE-encoded low-quality reference (reference PixelDiT::forward,
    pid.hpp:726-816)."""
    b, h, w, c = x.shape
    ps = cfg.patch_size
    pad_h, pad_w = (-h) % ps, (-w) % ps
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hh, ww = h + pad_h, w + pad_w
    hs, ws = hh // ps, ww // ps
    L = hs * ws
    p2 = ps * ps
    if degrade_sigma is None:
        degrade_sigma = jnp.zeros((b,), dtype=jnp.float32)

    # patch tokens: feature order (c, py, px) (DiT::patchify patch_last=true)
    xp = (x.reshape(b, hs, ps, ws, ps, c).transpose(0, 1, 3, 5, 2, 4)
          .reshape(b, L, c * p2))
    s = linear(xp, p["s_embedder.proj.weight"], p["s_embedder.proj.bias"])

    t_emb = timestep_embedding(timesteps, 256, max_period=10).astype(s.dtype)
    t_emb = linear(t_emb, p["t_embedder.mlp.0.weight"], p["t_embedder.mlp.0.bias"])
    t_emb = linear(silu(t_emb), p["t_embedder.mlp.2.weight"], p["t_embedder.mlp.2.bias"])
    cond = silu(t_emb)

    l_txt = min(context.shape[1], cfg.txt_max_length)
    y = context[:, :l_txt].astype(s.dtype)
    y = linear(y, p["y_embedder.proj.weight"], p["y_embedder.proj.bias"])
    y = rms_norm(y, p["y_embedder.norm.weight"], eps=1e-6)
    y = y + p["y_pos_embedding"][:, :l_txt].astype(y.dtype)

    lq_feats, pit_feat = _lq_projection(p, lq_latent.astype(s.dtype), hs, ws, cfg)

    hd = cfg.hidden_size // cfg.num_groups
    rot_img = pid_rope_2d(hs, ws, hd, 10000.0, 16.0,
                          cfg.rope_ref_grid_h, cfg.rope_ref_grid_w)
    rot_txt = pid_rope_txt(l_txt, hd, cfg.text_rope_theta)

    for i in range(cfg.patch_depth):
        if i % cfg.lq_interval == 0:
            oi = i // cfg.lq_interval
            if oi < len(lq_feats):
                s = _sigma_gate(p, f"lq_proj.gate_modules.{oi}", s,
                                lq_feats[oi], degrade_sigma)
        s, y = _patch_block(p, f"patch_blocks.{i}", s, y, cond,
                            rot_img, rot_txt, cfg)
    s = silu(s + t_emb[:, None])
    if cfg.pit_lq_inject and pit_feat is not None:
        s = _sigma_gate(p, "pit_lq_gate", s, pit_feat, degrade_sigma)

    # pixel stage: per-pixel proj + abs pos, grouped into patches
    pd = cfg.pixel_hidden_size
    pix = x.reshape(b, hh * ww, c)
    pix = linear(pix, p["pixel_embedder.proj.weight"], p["pixel_embedder.proj.bias"])
    pix = pix + jnp.asarray(pid_pixel_abs_pos(hh, ww, pd))[None].astype(pix.dtype)
    pix = (pix.reshape(b, hs, ps, ws, ps, pd).transpose(0, 1, 3, 2, 4, 5)
           .reshape(b * L, p2, pd))

    s_cond = s.reshape(b * L, cfg.hidden_size)
    phd = cfg.pixel_attn_hidden_size // cfg.pixel_num_groups
    rot_comp = pid_rope_2d(hs, ws, phd, 10000.0, 16.0,
                           cfg.rope_ref_grid_h, cfg.rope_ref_grid_w)
    for i in range(cfg.pixel_depth):
        pix = _pixel_block(p, f"pixel_blocks.{i}", pix, s_cond, rot_comp, cfg)

    pix = rms_norm(pix, p["final_layer.norm.weight"], eps=1e-6)
    pix = linear(pix, p["final_layer.linear.weight"], p["final_layer.linear.bias"])
    # unpatchify, feature order (py, px, c)
    out = (pix.reshape(b, hs, ws, ps, ps, c).transpose(0, 1, 3, 2, 4, 5)
           .reshape(b, hh, ww, c))
    return out[:, :h, :w]


# --------------------------------------------------------------------- init

def init_pid_params(cfg: PidConfig = PID_CONFIG, seed: int = 0,
                    dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)
    p: dict = {}

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def lin(pre, o, i, bias=True):
        p[f"{pre}.weight"] = wt(o, i)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((o,), dtype=dtype)

    def norm(name, d):
        p[name] = jnp.ones((d,), dtype=dtype)

    def conv(pre, o, i, k=3):
        p[f"{pre}.weight"] = wt(o, i, k, k)
        p[f"{pre}.bias"] = jnp.zeros((o,), dtype=dtype)

    hid, pd = cfg.hidden_size, cfg.pixel_hidden_size
    p2 = cfg.patch_size**2
    lin("s_embedder.proj", hid, cfg.in_channels * p2)
    lin("t_embedder.mlp.0", hid, 256)
    lin("t_embedder.mlp.2", hid, hid)
    lin("y_embedder.proj", hid, cfg.txt_embed_dim)
    norm("y_embedder.norm.weight", hid)
    p["y_pos_embedding"] = wt(1, cfg.txt_max_length, hid)
    lin("pixel_embedder.proj", pd, cfg.in_channels)
    for i in range(cfg.patch_depth):
        pre = f"patch_blocks.{i}"
        for sfx in ("x", "y"):
            norm(f"{pre}.norm_{sfx}1.weight", hid)
            norm(f"{pre}.norm_{sfx}2.weight", hid)
            lin(f"{pre}.attn.qkv_{sfx}", 3 * hid, hid, bias=False)
            norm(f"{pre}.attn.q_norm_{sfx}.weight", hid // cfg.num_groups)
            norm(f"{pre}.attn.k_norm_{sfx}.weight", hid // cfg.num_groups)
            lin(f"{pre}.attn.proj_{sfx}", hid, hid)
            for wn in ("w1", "w3"):
                lin(f"{pre}.mlp_{sfx}.{wn}", cfg.patch_mlp_hidden_dim, hid,
                    bias=False)
            lin(f"{pre}.mlp_{sfx}.w2", hid, cfg.patch_mlp_hidden_dim, bias=False)
        lin(f"{pre}.adaLN_modulation_img.0", 6 * hid, hid)
        lin(f"{pre}.adaLN_modulation_txt.0", 6 * hid, hid)
    ad = cfg.pixel_attn_hidden_size
    for i in range(cfg.pixel_depth):
        pre = f"pixel_blocks.{i}"
        lin(f"{pre}.compress_to_attn", ad, p2 * pd)
        lin(f"{pre}.expand_from_attn", p2 * pd, ad)
        norm(f"{pre}.norm1.weight", pd)
        norm(f"{pre}.norm2.weight", pd)
        lin(f"{pre}.attn.qkv", 3 * ad, ad, bias=False)
        norm(f"{pre}.attn.q_norm.weight", ad // cfg.pixel_num_groups)
        norm(f"{pre}.attn.k_norm.weight", ad // cfg.pixel_num_groups)
        lin(f"{pre}.attn.proj", ad, ad)
        lin(f"{pre}.mlp.fc1", 4 * pd, pd)
        lin(f"{pre}.mlp.fc2", pd, 4 * pd)
        lin(f"{pre}.adaLN_modulation.0", 6 * pd * p2, hid)
    norm("final_layer.norm.weight", pd)
    lin("final_layer.linear", cfg.in_channels, pd)
    # LQ projection
    uf = cfg.lq_latent_unpatchify_factor
    conv("lq_proj.latent_proj.0", cfg.lq_hidden_dim,
         cfg.lq_latent_channels // (uf * uf))
    conv("lq_proj.latent_proj.2", cfg.lq_hidden_dim, cfg.lq_hidden_dim)
    for i in range(cfg.lq_num_res_blocks):
        pre = f"lq_proj.latent_proj.{3 + i}"
        for bn in ("block.0", "block.3"):
            p[f"{pre}.{bn}.weight"] = jnp.ones((cfg.lq_hidden_dim,), dtype=dtype)
            p[f"{pre}.{bn}.bias"] = jnp.zeros((cfg.lq_hidden_dim,), dtype=dtype)
        conv(f"{pre}.block.2", cfg.lq_hidden_dim, cfg.lq_hidden_dim)
        conv(f"{pre}.block.5", cfg.lq_hidden_dim, cfg.lq_hidden_dim)
    n_out = (cfg.patch_depth + cfg.lq_interval - 1) // cfg.lq_interval
    gate_out = 1 if cfg.lq_gate_per_token else hid
    for i in range(n_out):
        lin(f"lq_proj.output_heads.{i}", hid, cfg.lq_hidden_dim)
        lin(f"lq_proj.gate_modules.{i}.content_proj", gate_out, 2 * hid)
        p[f"lq_proj.gate_modules.{i}.log_alpha"] = jnp.zeros((1,), dtype=dtype)
    if cfg.pit_lq_inject:
        lin("lq_proj.pit_head", hid, cfg.lq_hidden_dim)
        lin("pit_lq_gate.content_proj", gate_out, 2 * hid)
        p["pit_lq_gate.log_alpha"] = jnp.zeros((1,), dtype=dtype)
    return p

"""Mage VAE: a DiCo-conv (depthwise + channel-attention) tokenizer pair —
a 16x patch encoder producing 128-ch mean/logvar latents, and a single-step
"denoiser" decoder that expands latents back to pixels through a per-patch
MLP head seeded with a fixed 2-D DCT basis.

Reference analog: MageVAE::MageVAEModel / MageVAERunner
(src/model/vae/mage_vae.hpp:425,437).  Checkpoint names (relative to the VAE
prefix): ``student.dconv_encoder.{patch_cond_embed, head_blocks.N.*,
proj_down, z_proj, fuse_proj, t_embedder.mlp.{0,2}, blocks.N.*, norm_out,
proj_out}``, ``pipeline.{t_embedder.mlp.{0,2}, y_embedder_x,
x_embedder.embedder.0, s_embedder.{proj1,proj2}, blocks.N.*,
dec_net.{cond_embed, input_proj, res_blocks.N.*}, final_layer.{norm,linear},
y_embedder.decoder.{conv_in, block.N.*, norm_out, conv_out}}``.

Layout: channels-last images [B, H, W, 3]; latents [B, H/16, W/16, 128].
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, conv2d, group_norm, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import gelu, silu

HIDDEN_SIZE = 384
LATENT_CHANNELS = 128
PATCH_SIZE = 16


def _conv(p, pre, x, **kw):
    return conv2d(x, p[f"{pre}.weight"], p.get(f"{pre}.bias"), **kw)


def _ln2d(p, pre, x, affine=True):
    if affine:
        return layer_norm(x, p[f"{pre}.weight"], p[f"{pre}.bias"], eps=1e-6)
    return layer_norm(x, eps=1e-6)


def _channel_attention(p, pre, x):
    """Global-mean squeeze -> 1x1 conv -> sigmoid gate (channel_attention,
    mage_vae.hpp:55)."""
    pooled = x.mean(axis=(1, 2), keepdims=True)
    gate = jax.nn.sigmoid(_conv(p, pre, pooled, padding=0))
    return x * gate


def _t_embed(p, pre, t):
    emb = timestep_embedding(t, 256)
    h = linear(emb, p[f"{pre}.mlp.0.weight"], p[f"{pre}.mlp.0.bias"])
    return linear(silu(h), p[f"{pre}.mlp.2.weight"], p[f"{pre}.mlp.2.bias"])


def _encoder_dico_block(p, pre, x):
    """EncoderDiCoBlock (mage_vae.hpp:82)."""
    h = _ln2d(p, f"{pre}.norm1", x)
    h = _conv(p, f"{pre}.conv1", h, padding=0)
    c = h.shape[-1]
    h = _conv(p, f"{pre}.conv2", h, padding=1, groups=c)
    h = gelu(h)
    h = _channel_attention(p, f"{pre}.ca.1", h)
    h = _conv(p, f"{pre}.conv3", h, padding=0)
    x = x + h
    h = _ln2d(p, f"{pre}.norm2", x)
    h = _conv(p, f"{pre}.conv4", h, padding=0)
    h = gelu(h)
    h = _conv(p, f"{pre}.conv5", h, padding=0)
    return x + h


def _dico_block(p, pre, x, cond):
    """Timestep-modulated DiCoBlock (mage_vae.hpp:118). cond: [B, C]."""
    mods = linear(silu(cond), p[f"{pre}.adaLN_modulation.1.weight"],
                  p[f"{pre}.adaLN_modulation.1.bias"])
    sh1, sc1, g1, sh2, sc2, g2 = [m[:, None, None]
                                  for m in jnp.split(mods, 6, axis=-1)]
    h = _ln2d(p, f"{pre}.norm1", x, affine=False)
    h = h * (1.0 + sc1) + sh1
    h = _conv(p, f"{pre}.conv1", h, padding=0)
    h = _conv(p, f"{pre}.conv2", h, padding=1, groups=h.shape[-1])
    h = gelu(h)
    h = _channel_attention(p, f"{pre}.ca.1", h)
    h = _conv(p, f"{pre}.conv3", h, padding=0)
    x = x + h * g1
    h = _ln2d(p, f"{pre}.norm2", x, affine=False)
    h = h * (1.0 + sc2) + sh2
    h = _conv(p, f"{pre}.conv4", h, padding=0)
    h = gelu(h)
    h = _conv(p, f"{pre}.conv5", h, padding=0)
    return x + h * g2


def _resnet(p, pre, x):
    h = group_norm(x, p[f"{pre}.norm1.weight"], p[f"{pre}.norm1.bias"], eps=1e-6)
    h = _conv(p, f"{pre}.conv1", silu(h))
    h = group_norm(h, p[f"{pre}.norm2.weight"], p[f"{pre}.norm2.bias"], eps=1e-6)
    h = _conv(p, f"{pre}.conv2", silu(h))
    return x + h


def _attn_block(p, pre, x, window: int = 32):
    """Patch-local single-head attention over 32x32 windows with
    edge-replicate padding (MageAttnBlock, mage_vae.hpp:202)."""
    b, hh, ww, c = x.shape
    h = group_norm(x, p[f"{pre}.norm.weight"], p[f"{pre}.norm.bias"], eps=1e-6)
    q = _conv(p, f"{pre}.q", h, padding=0)
    k = _conv(p, f"{pre}.k", h, padding=0)
    v = _conv(p, f"{pre}.v", h, padding=0)
    pad_h = (window - hh % window) % window
    pad_w = (window - ww % window) % window

    def pad_rep(t):
        if pad_h:
            t = jnp.concatenate([t, jnp.repeat(t[:, -1:], pad_h, axis=1)], axis=1)
        if pad_w:
            t = jnp.concatenate([t, jnp.repeat(t[:, :, -1:], pad_w, axis=2)], axis=2)
        return t

    hp, wp = (hh + pad_h) // window, (ww + pad_w) // window

    def to_patches(t):
        t = pad_rep(t)
        t = t.reshape(b, hp, window, wp, window, c)
        t = t.transpose(0, 1, 3, 2, 4, 5).reshape(b * hp * wp, 1,
                                                  window * window, c)
        return t

    o = attention(to_patches(q), to_patches(k), to_patches(v))
    o = o.reshape(b, hp, wp, window, window, c).transpose(0, 1, 3, 2, 4, 5)
    o = o.reshape(b, hp * window, wp * window, c)[:, :hh, :ww]
    return x + _conv(p, f"{pre}.proj_out", o, padding=0)


def _decoder(p, pre, z):
    """y_embedder.decoder (mage_vae.hpp:280): latent [B,h,w,128] ->
    conditioning features [B,h,w,384]."""
    x = _conv(p, f"{pre}.conv_in", z)
    x = _resnet(p, f"{pre}.block.0", x)
    x = _attn_block(p, f"{pre}.block.1", x)
    x = _resnet(p, f"{pre}.block.2", x)
    x = _attn_block(p, f"{pre}.block.3", x)
    x = _resnet(p, f"{pre}.block.4", x)
    x = group_norm(x, p[f"{pre}.norm_out.weight"], p[f"{pre}.norm_out.bias"], eps=1e-6)
    return _conv(p, f"{pre}.conv_out", silu(x))


def dct_basis(patch: int = PATCH_SIZE) -> np.ndarray:
    """Fixed 8x8-frequency cosine basis per patch position, [P*P, 64]
    (MageVAERunner ctor, mage_vae.hpp:443)."""
    out = np.zeros((patch * patch, 64), dtype=np.float32)
    ys = np.arange(patch) / (patch - 1)
    xs = np.arange(patch) / (patch - 1)
    for fy in range(8):
        for fx in range(8):
            freq = fx * 8 + fy
            fxv, fyv = fx * 8.0 / 7.0, fy * 8.0 / 7.0
            coeff = 1.0 / (1.0 + fxv * fyv)
            basis = (np.cos(xs[None, :] * fxv * np.pi) *
                     np.cos(ys[:, None] * fyv * np.pi) * coeff)
            out[:, freq] = basis.reshape(-1)
    return out


def mage_vae_encode(p, image: jnp.ndarray, noise=None,
                    n_blocks: int = 21) -> jnp.ndarray:
    """image [B,H,W,3] -> latent [B,H/16,W/16,128] (mean channel of
    DConvEncoder output; mage_vae.hpp:306)."""
    pre = "student.dconv_encoder"
    cond = _conv(p, f"{pre}.patch_cond_embed", image, stride=PATCH_SIZE, padding=0)
    for i in range(2):
        cond = _encoder_dico_block(p, f"{pre}.head_blocks.{i}", cond)
    cond = _conv(p, f"{pre}.proj_down", cond, padding=0)
    z = jnp.zeros(cond.shape[:3] + (LATENT_CHANNELS,), cond.dtype)
    z = _conv(p, f"{pre}.z_proj", z, padding=0)
    z = jnp.concatenate([cond, z], axis=-1)
    z = _conv(p, f"{pre}.fuse_proj", z, padding=0)
    b = image.shape[0]
    c = _t_embed(p, f"{pre}.t_embedder", jnp.zeros((b,), jnp.float32)).astype(z.dtype)
    for i in range(n_blocks):
        z = _dico_block(p, f"{pre}.blocks.{i}", z, c)
    z = _ln2d(p, f"{pre}.norm_out", z)
    moments = _conv(p, f"{pre}.proj_out", z, padding=0)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if noise is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -20.0, 10.0))
        mean = mean + std * noise.astype(mean.dtype)
    return mean


def mage_vae_decode(p, latent: jnp.ndarray, n_blocks: int = 21) -> jnp.ndarray:
    """latent [B,h,w,128] -> image [B,16h,16w,3] (DConvDenoiser single-step
    decode; mage_vae.hpp:369)."""
    pre = "pipeline"
    cond = _decoder(p, f"{pre}.y_embedder.decoder", latent)
    b, hh, ww, _ = cond.shape
    length = hh * ww
    pp = PATCH_SIZE * PATCH_SIZE

    c = _t_embed(p, f"{pre}.t_embedder", jnp.zeros((b,), jnp.float32)).astype(cond.dtype)
    image = jnp.zeros((b, hh * PATCH_SIZE, ww * PATCH_SIZE, 3), cond.dtype)
    s0 = _conv(p, f"{pre}.s_embedder.proj1", image, stride=PATCH_SIZE, padding=0)
    s0 = jnp.concatenate([s0, cond], axis=-1)
    s = _conv(p, f"{pre}.s_embedder.proj2", s0, padding=0)
    for i in range(n_blocks):
        s = _dico_block(p, f"{pre}.blocks.{i}", s, c)
    s = s.reshape(b * length, HIDDEN_SIZE)

    # per-pixel MLP head: tokens are the P*P pixels of each patch
    y = _conv(p, f"{pre}.y_embedder_x", cond, padding=0)  # [B,h,w,32*P*P]
    y = y.reshape(b * length, pp, 32)
    dct = jnp.asarray(dct_basis())[None].astype(y.dtype)  # [1, P*P, 64]
    dct = jnp.broadcast_to(dct, (b * length, pp, 64))
    x = jnp.concatenate([jnp.zeros((b * length, pp, 3), y.dtype), y, dct], axis=-1)
    x = linear(x, p[f"{pre}.x_embedder.embedder.0.weight"],
               p.get(f"{pre}.x_embedder.embedder.0.bias"))
    x = linear(x, p[f"{pre}.dec_net.input_proj.weight"],
               p.get(f"{pre}.dec_net.input_proj.bias"))
    dec_cond = linear(s, p[f"{pre}.dec_net.cond_embed.weight"],
                      p.get(f"{pre}.dec_net.cond_embed.bias"))
    dec_cond = dec_cond.reshape(b * length, pp, 32)
    for i in range(3):
        rp = f"{pre}.dec_net.res_blocks.{i}"
        mods = linear(silu(dec_cond), p[f"{rp}.adaLN_modulation.1.weight"],
                      p[f"{rp}.adaLN_modulation.1.bias"])
        sh, sc, g = jnp.split(mods, 3, axis=-1)
        h = layer_norm(x, p[f"{rp}.in_ln.weight"], p[f"{rp}.in_ln.bias"], eps=1e-6)
        h = h * (1.0 + sc) + sh
        h = linear(h, p[f"{rp}.mlp.0.weight"], p[f"{rp}.mlp.0.bias"])
        h = linear(silu(h), p[f"{rp}.mlp.2.weight"], p[f"{rp}.mlp.2.bias"])
        x = x + g * h
    x = rms_norm(x, p[f"{pre}.final_layer.norm.weight"])
    x = linear(x, p[f"{pre}.final_layer.linear.weight"],
               p.get(f"{pre}.final_layer.linear.bias"))  # [B*L, P*P, 3]
    x = x.reshape(b, hh, ww, PATCH_SIZE, PATCH_SIZE, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh * PATCH_SIZE, ww * PATCH_SIZE, 3)
    return x


def init_mage_vae_params(seed: int = 0, dtype=jnp.float32,
                         n_blocks: int = 21) -> dict:
    """Random checkpoint-shaped params; n_blocks can be reduced for tests but
    checkpoint loads always carry 21 DiCo blocks per tower."""
    g = np.random.default_rng(seed)

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def cv(p, pre, o, i, k=1, bias=True):
        p[f"{pre}.weight"] = wt(o, i, k, k)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((o,), dtype=dtype)

    def ln(p, pre, c):
        p[f"{pre}.weight"] = jnp.ones((c,), dtype=dtype)
        p[f"{pre}.bias"] = jnp.zeros((c,), dtype=dtype)

    def lint(p, pre, din, dout):
        p[f"{pre}.weight"] = wt(dout, din)
        p[f"{pre}.bias"] = jnp.zeros((dout,), dtype=dtype)

    def enc_block(p, pre, c):
        cv(p, f"{pre}.conv1", c, c)
        p[f"{pre}.conv2.weight"] = wt(c, 1, 3, 3)
        p[f"{pre}.conv2.bias"] = jnp.zeros((c,), dtype=dtype)
        cv(p, f"{pre}.conv3", c, c)
        cv(p, f"{pre}.ca.1", c, c)
        cv(p, f"{pre}.conv4", 4 * c, c)
        cv(p, f"{pre}.conv5", c, 4 * c)
        ln(p, f"{pre}.norm1", c)
        ln(p, f"{pre}.norm2", c)

    def dico(p, pre, c):
        cv(p, f"{pre}.conv1", c, c)
        p[f"{pre}.conv2.weight"] = wt(c, 1, 3, 3)
        p[f"{pre}.conv2.bias"] = jnp.zeros((c,), dtype=dtype)
        cv(p, f"{pre}.conv3", c, c)
        cv(p, f"{pre}.ca.1", c, c)
        cv(p, f"{pre}.conv4", 4 * c, c)
        cv(p, f"{pre}.conv5", c, 4 * c)
        lint(p, f"{pre}.adaLN_modulation.1", c, 6 * c)

    p: dict = {}
    e = "student.dconv_encoder"
    cv(p, f"{e}.patch_cond_embed", 768, 3, PATCH_SIZE)
    for i in range(2):
        enc_block(p, f"{e}.head_blocks.{i}", 768)
    cv(p, f"{e}.proj_down", HIDDEN_SIZE, 768)
    cv(p, f"{e}.z_proj", HIDDEN_SIZE, LATENT_CHANNELS)
    cv(p, f"{e}.fuse_proj", HIDDEN_SIZE, 2 * HIDDEN_SIZE)
    lint(p, f"{e}.t_embedder.mlp.0", 256, HIDDEN_SIZE)
    lint(p, f"{e}.t_embedder.mlp.2", HIDDEN_SIZE, HIDDEN_SIZE)
    for i in range(n_blocks):
        dico(p, f"{e}.blocks.{i}", HIDDEN_SIZE)
    ln(p, f"{e}.norm_out", HIDDEN_SIZE)
    cv(p, f"{e}.proj_out", 2 * LATENT_CHANNELS, HIDDEN_SIZE)

    d = "pipeline"
    lint(p, f"{d}.t_embedder.mlp.0", 256, HIDDEN_SIZE)
    lint(p, f"{d}.t_embedder.mlp.2", HIDDEN_SIZE, HIDDEN_SIZE)
    cv(p, f"{d}.y_embedder_x", 32 * PATCH_SIZE * PATCH_SIZE, HIDDEN_SIZE)
    lint(p, f"{d}.x_embedder.embedder.0", 3 + 32 + 64, 32)
    p[f"{d}.s_embedder.proj1.weight"] = wt(LATENT_CHANNELS, 3, PATCH_SIZE, PATCH_SIZE)
    cv(p, f"{d}.s_embedder.proj2", HIDDEN_SIZE, LATENT_CHANNELS + HIDDEN_SIZE)
    for i in range(n_blocks):
        dico(p, f"{d}.blocks.{i}", HIDDEN_SIZE)
    lint(p, f"{d}.dec_net.cond_embed", HIDDEN_SIZE, PATCH_SIZE * PATCH_SIZE * 32)
    lint(p, f"{d}.dec_net.input_proj", 32, 32)
    for i in range(3):
        rp = f"{d}.dec_net.res_blocks.{i}"
        ln(p, f"{rp}.in_ln", 32)
        lint(p, f"{rp}.mlp.0", 32, 32)
        lint(p, f"{rp}.mlp.2", 32, 32)
        lint(p, f"{rp}.adaLN_modulation.1", 32, 96)
    p[f"{d}.final_layer.norm.weight"] = jnp.ones((32,), dtype=dtype)
    lint(p, f"{d}.final_layer.linear", 32, 3)
    c = "pipeline.y_embedder.decoder"
    cv(p, f"{c}.conv_in", HIDDEN_SIZE, LATENT_CHANNELS, 3)
    for i in (0, 2, 4):
        pre = f"{c}.block.{i}"
        ln(p, f"{pre}.norm1", HIDDEN_SIZE)
        cv(p, f"{pre}.conv1", HIDDEN_SIZE, HIDDEN_SIZE, 3)
        ln(p, f"{pre}.norm2", HIDDEN_SIZE)
        cv(p, f"{pre}.conv2", HIDDEN_SIZE, HIDDEN_SIZE, 3)
    for i in (1, 3):
        pre = f"{c}.block.{i}"
        ln(p, f"{pre}.norm", HIDDEN_SIZE)
        for nm in ("q", "k", "v", "proj_out"):
            cv(p, f"{pre}.{nm}", HIDDEN_SIZE, HIDDEN_SIZE)
    ln(p, f"{c}.norm_out", HIDDEN_SIZE)
    cv(p, f"{c}.conv_out", HIDDEN_SIZE, HIDDEN_SIZE, 3)
    return p


# number of DiCo blocks in both towers; reduced configs are test-only
def count_dico_blocks(names, tower: str = "pipeline.blocks.") -> int:
    n = 0
    for name in names:
        if name.startswith(tower):
            n = max(n, int(name[len(tower):].split(".")[0]) + 1)
    return n or 21

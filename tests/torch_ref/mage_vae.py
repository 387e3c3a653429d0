"""Test-only torch Mage VAE reference (transcribed from the reference C++
math, src/model/vae/mage_vae.hpp: channel_attention :55, EncoderDiCoBlock
:82, DiCoBlock :118, MageAttnBlock :202, decoder :280, encode :306, decode
:369, DCT basis :443).  Consumes the same checkpoint-named param dict as
sdtpu.models.mage_vae."""
import math

import numpy as np
import torch
import torch.nn.functional as F

HIDDEN_SIZE = 384
LATENT_CHANNELS = 128
PATCH_SIZE = 16


def _conv(p, pre, x, stride=1, padding=1, groups=1):
    y = F.conv2d(x.permute(0, 3, 1, 2), p[f"{pre}.weight"],
                 p.get(f"{pre}.bias"), stride=stride, padding=padding,
                 groups=groups)
    return y.permute(0, 2, 3, 1)


def _ln2d(p, pre, x, affine=True):
    if affine:
        return F.layer_norm(x, (x.shape[-1],), p[f"{pre}.weight"],
                            p[f"{pre}.bias"], eps=1e-6)
    return F.layer_norm(x, (x.shape[-1],), eps=1e-6)


def _gn(p, pre, x, groups=32):
    y = F.group_norm(x.permute(0, 3, 1, 2), groups, p[f"{pre}.weight"],
                     p[f"{pre}.bias"], eps=1e-6)
    return y.permute(0, 2, 3, 1)


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _channel_attention(p, pre, x):
    pooled = x.mean(dim=(1, 2), keepdim=True)
    gate = torch.sigmoid(_conv(p, pre, pooled, padding=0))
    return x * gate


def _timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float64) / half
    ).to(torch.float32)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _t_embed(p, pre, t):
    emb = _timestep_embedding(t, 256)
    h = _lin(p, f"{pre}.mlp.0", emb)
    return _lin(p, f"{pre}.mlp.2", F.silu(h))


def _encoder_dico_block(p, pre, x):
    h = _ln2d(p, f"{pre}.norm1", x)
    h = _conv(p, f"{pre}.conv1", h, padding=0)
    c = h.shape[-1]
    h = _conv(p, f"{pre}.conv2", h, padding=1, groups=c)
    h = F.gelu(h)
    h = _channel_attention(p, f"{pre}.ca.1", h)
    h = _conv(p, f"{pre}.conv3", h, padding=0)
    x = x + h
    h = _ln2d(p, f"{pre}.norm2", x)
    h = _conv(p, f"{pre}.conv4", h, padding=0)
    h = F.gelu(h)
    h = _conv(p, f"{pre}.conv5", h, padding=0)
    return x + h


def _dico_block(p, pre, x, cond):
    mods = _lin(p, f"{pre}.adaLN_modulation.1", F.silu(cond))
    sh1, sc1, g1, sh2, sc2, g2 = [m[:, None, None]
                                  for m in mods.chunk(6, dim=-1)]
    h = _ln2d(p, f"{pre}.norm1", x, affine=False)
    h = h * (1.0 + sc1) + sh1
    h = _conv(p, f"{pre}.conv1", h, padding=0)
    h = _conv(p, f"{pre}.conv2", h, padding=1, groups=h.shape[-1])
    h = F.gelu(h)
    h = _channel_attention(p, f"{pre}.ca.1", h)
    h = _conv(p, f"{pre}.conv3", h, padding=0)
    x = x + h * g1
    h = _ln2d(p, f"{pre}.norm2", x, affine=False)
    h = h * (1.0 + sc2) + sh2
    h = _conv(p, f"{pre}.conv4", h, padding=0)
    h = F.gelu(h)
    h = _conv(p, f"{pre}.conv5", h, padding=0)
    return x + h * g2


def _resnet(p, pre, x):
    h = _gn(p, f"{pre}.norm1", x)
    h = _conv(p, f"{pre}.conv1", F.silu(h))
    h = _gn(p, f"{pre}.norm2", h)
    h = _conv(p, f"{pre}.conv2", F.silu(h))
    return x + h


def _attn_block(p, pre, x, window=32):
    b, hh, ww, c = x.shape
    h = _gn(p, f"{pre}.norm", x)
    q = _conv(p, f"{pre}.q", h, padding=0)
    k = _conv(p, f"{pre}.k", h, padding=0)
    v = _conv(p, f"{pre}.v", h, padding=0)
    pad_h = (window - hh % window) % window
    pad_w = (window - ww % window) % window

    def pad_rep(t):
        if pad_h:
            t = torch.cat([t, t[:, -1:].repeat(1, pad_h, 1, 1)], dim=1)
        if pad_w:
            t = torch.cat([t, t[:, :, -1:].repeat(1, 1, pad_w, 1)], dim=2)
        return t

    hp, wp = (hh + pad_h) // window, (ww + pad_w) // window

    def to_patches(t):
        t = pad_rep(t)
        t = t.view(b, hp, window, wp, window, c)
        return t.permute(0, 1, 3, 2, 4, 5).reshape(b * hp * wp, 1,
                                                   window * window, c)

    o = F.scaled_dot_product_attention(to_patches(q).float(),
                                       to_patches(k).float(),
                                       to_patches(v).float())
    o = o.view(b, hp, wp, window, window, c).permute(0, 1, 3, 2, 4, 5)
    o = o.reshape(b, hp * window, wp * window, c)[:, :hh, :ww]
    return x + _conv(p, f"{pre}.proj_out", o, padding=0)


def _decoder(p, pre, z):
    x = _conv(p, f"{pre}.conv_in", z)
    x = _resnet(p, f"{pre}.block.0", x)
    x = _attn_block(p, f"{pre}.block.1", x)
    x = _resnet(p, f"{pre}.block.2", x)
    x = _attn_block(p, f"{pre}.block.3", x)
    x = _resnet(p, f"{pre}.block.4", x)
    x = _gn(p, f"{pre}.norm_out", x)
    return _conv(p, f"{pre}.conv_out", F.silu(x))


def dct_basis(patch=PATCH_SIZE):
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


def mage_vae_encode_torch(p, image, noise=None, n_blocks=21):
    pre = "student.dconv_encoder"
    cond = _conv(p, f"{pre}.patch_cond_embed", image, stride=PATCH_SIZE,
                 padding=0)
    for i in range(2):
        cond = _encoder_dico_block(p, f"{pre}.head_blocks.{i}", cond)
    cond = _conv(p, f"{pre}.proj_down", cond, padding=0)
    z = torch.zeros(*cond.shape[:3], LATENT_CHANNELS)
    z = _conv(p, f"{pre}.z_proj", z, padding=0)
    z = torch.cat([cond, z], dim=-1)
    z = _conv(p, f"{pre}.fuse_proj", z, padding=0)
    b = image.shape[0]
    c = _t_embed(p, f"{pre}.t_embedder", torch.zeros(b))
    for i in range(n_blocks):
        z = _dico_block(p, f"{pre}.blocks.{i}", z, c)
    z = _ln2d(p, f"{pre}.norm_out", z)
    moments = _conv(p, f"{pre}.proj_out", z, padding=0)
    mean, logvar = moments.chunk(2, dim=-1)
    if noise is not None:
        std = torch.exp(0.5 * torch.clamp(logvar, -20.0, 10.0))
        mean = mean + std * noise
    return mean


def mage_vae_decode_torch(p, latent, n_blocks=21):
    pre = "pipeline"
    cond = _decoder(p, f"{pre}.y_embedder.decoder", latent)
    b, hh, ww, _ = cond.shape
    length = hh * ww
    pp = PATCH_SIZE * PATCH_SIZE

    c = _t_embed(p, f"{pre}.t_embedder", torch.zeros(b))
    image = torch.zeros(b, hh * PATCH_SIZE, ww * PATCH_SIZE, 3)
    s0 = F.conv2d(image.permute(0, 3, 1, 2), p[f"{pre}.s_embedder.proj1.weight"],
                  None, stride=PATCH_SIZE).permute(0, 2, 3, 1)
    s0 = torch.cat([s0, cond], dim=-1)
    s = _conv(p, f"{pre}.s_embedder.proj2", s0, padding=0)
    for i in range(n_blocks):
        s = _dico_block(p, f"{pre}.blocks.{i}", s, c)
    s = s.reshape(b * length, HIDDEN_SIZE)

    y = _conv(p, f"{pre}.y_embedder_x", cond, padding=0)
    y = y.reshape(b * length, pp, 32)
    dct = torch.from_numpy(dct_basis())[None].expand(b * length, pp, 64)
    x = torch.cat([torch.zeros(b * length, pp, 3), y, dct], dim=-1)
    x = _lin(p, f"{pre}.x_embedder.embedder.0", x)
    x = _lin(p, f"{pre}.dec_net.input_proj", x)
    dec_cond = _lin(p, f"{pre}.dec_net.cond_embed", s)
    dec_cond = dec_cond.reshape(b * length, pp, 32)
    for i in range(3):
        rp = f"{pre}.dec_net.res_blocks.{i}"
        mods = _lin(p, f"{rp}.adaLN_modulation.1", F.silu(dec_cond))
        sh, sc, g = mods.chunk(3, dim=-1)
        h = F.layer_norm(x, (x.shape[-1],), p[f"{rp}.in_ln.weight"],
                         p[f"{rp}.in_ln.bias"], eps=1e-6)
        h = h * (1.0 + sc) + sh
        h = _lin(p, f"{rp}.mlp.0", h)
        h = _lin(p, f"{rp}.mlp.2", F.silu(h))
        x = x + g * h
    v = x.float()
    x = (v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-6)
         * p[f"{pre}.final_layer.norm.weight"].float())
    x = _lin(p, f"{pre}.final_layer.linear", x)
    x = x.view(b, hh, ww, PATCH_SIZE, PATCH_SIZE, 3)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hh * PATCH_SIZE,
                                            ww * PATCH_SIZE, 3)
    return x

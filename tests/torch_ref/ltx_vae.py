"""Test-only torch LTX-2 video VAE reference (transcribed from the reference
C++ math, src/model/vae/ltx_vae.hpp: CausalConv3d :84, PixelNorm3D :198,
ResnetBlock3D :226, UNetMidBlock3D :339, DepthToSpaceUpsample :398,
SpaceToDepthDownsample :479, decode :951, encode :1183).  Consumes the same
checkpoint-named param dict as sdtpu.models.ltx_vae."""
import math

import torch
import torch.nn.functional as F

_FACTORS = {
    "compress_all": (2, 2), "compress_time": (2, 1), "compress_space": (1, 2),
    "compress_all_res": (2, 2), "compress_time_res": (2, 1),
    "compress_space_res": (1, 2),
}


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _causal_conv3d(x, weight, bias, causal):
    kt, kh = weight.shape[2], weight.shape[3]
    if kt > 1:
        if causal:
            front = x[:, :1].repeat(1, kt - 1, 1, 1, 1)
            x = torch.cat([front, x], dim=1)
        else:
            half = (kt - 1) // 2
            front = x[:, :1].repeat(1, half, 1, 1, 1)
            back = x[:, -1:].repeat(1, half, 1, 1, 1)
            x = torch.cat([front, x, back], dim=1)
    sp = kh // 2
    xt = x.permute(0, 4, 1, 2, 3)
    y = F.conv3d(xt, weight, bias, padding=(0, sp, sp))
    return y.permute(0, 2, 3, 4, 1)


def _pixel_norm(x, eps):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)


def ltx_patchify(x, p):
    if p == 1:
        return x
    b, t, hp, wp, c = x.shape
    h, w = hp // p, wp // p
    y = x.view(b, t, h, p, w, p, c)
    y = y.permute(0, 1, 2, 4, 6, 5, 3)
    return y.reshape(b, t, h, w, c * p * p)


def ltx_unpatchify(x, p):
    if p == 1:
        return x
    b, t, h, w, cpp = x.shape
    c = cpp // (p * p)
    y = x.view(b, t, h, w, c, p, p)
    y = y.permute(0, 1, 2, 6, 3, 5, 4)
    return y.reshape(b, t, h * p, w * p, c)


def _depth_to_space_3d(x, c_out, ft, fs, drop_first):
    b, t, h, w, _ = x.shape
    y = x.view(b, t, h, w, c_out, ft, fs, fs)
    y = y.permute(0, 1, 5, 2, 6, 3, 7, 4)
    y = y.reshape(b, t * ft, h * fs, w * fs, c_out)
    if drop_first and ft > 1 and y.shape[1] > 0:
        y = y[:, 1:]
    return y


def _avg_down_3d(x, out_c, ft, fs):
    b, t, h, w, c = x.shape
    pad_t = (ft - t % ft) % ft
    if pad_t:
        x = torch.cat([torch.zeros(b, pad_t, h, w, c), x], dim=1)
        t += pad_t
    y = x.view(b, t // ft, ft, h // fs, fs, w // fs, fs, c)
    y = y.permute(0, 1, 3, 5, 7, 2, 4, 6)
    y = y.reshape(b, t // ft, h // fs, w // fs, c * ft * fs * fs)
    group = (c * ft * fs * fs) // out_c
    y = y.view(*y.shape[:-1], out_c, group)
    return y.mean(dim=-1)


def _timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float64) / half
    ).to(torch.float32)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _time_embedder(p, pre, t):
    emb = _timestep_embedding(t, 256)
    h = _lin(p, f"{pre}.linear_1", emb)
    return _lin(p, f"{pre}.linear_2", F.silu(h))


def _resblock3d(p, pre, x, t_embed, causal):
    shift1 = scale1 = shift2 = scale2 = None
    if t_embed is not None and f"{pre}.scale_shift_table" in p:
        c = p[f"{pre}.scale_shift_table"].shape[1]
        vals = (p[f"{pre}.scale_shift_table"][None].float()
                + t_embed.reshape(-1, 4, c).float())
        mods = vals[:, :, None, None, None, :]
        shift1, scale1, shift2, scale2 = (mods[:, 0], mods[:, 1],
                                          mods[:, 2], mods[:, 3])
    h = _pixel_norm(x, 1e-6)
    if scale1 is not None:
        h = h * (1.0 + scale1) + shift1
    h = _causal_conv3d(F.silu(h), p[f"{pre}.conv1.conv.weight"],
                       p[f"{pre}.conv1.conv.bias"], causal)
    h = _pixel_norm(h, 1e-6)
    if scale2 is not None:
        h = h * (1.0 + scale2) + shift2
    h = _causal_conv3d(F.silu(h), p[f"{pre}.conv2.conv.weight"],
                       p[f"{pre}.conv2.conv.bias"], causal)
    return x + h


def _mid_block(p, pre, x, num_layers, scaled_t, causal):
    t_embed = None
    if scaled_t is not None and \
            f"{pre}.time_embedder.timestep_embedder.linear_1.weight" in p:
        t_embed = _time_embedder(
            p, f"{pre}.time_embedder.timestep_embedder", scaled_t)
    for i in range(num_layers):
        x = _resblock3d(p, f"{pre}.res_blocks.{i}", x, t_embed, causal)
    return x


def _upsample(p, pre, x, mult, ft, fs, causal):
    c_in = x.shape[-1]
    factor = ft * fs * fs
    drop = ft > 1
    res = _depth_to_space_3d(x, c_in // factor, ft, fs, drop)
    repeat = factor // mult
    res = res.repeat(1, 1, 1, 1, repeat)
    h = _causal_conv3d(x, p[f"{pre}.conv.conv.weight"],
                       p[f"{pre}.conv.conv.bias"], causal)
    h = _depth_to_space_3d(h, c_in // mult, ft, fs, drop)
    return h + res


def _downsample(p, pre, x, out_c, ft, fs, causal):
    if ft > 1:
        front = x[:, :1].repeat(1, ft - 1, 1, 1, 1)
        x = torch.cat([front, x], dim=1)
    residual = _avg_down_3d(x, out_c, ft, fs)
    h = _causal_conv3d(x, p[f"{pre}.conv.conv.weight"],
                       p[f"{pre}.conv.conv.bias"], causal)
    h = _avg_down_3d(h, out_c, ft, fs)
    return h + residual


def ltx_vae_un_normalize(p, z):
    mean = p["per_channel_statistics.mean-of-means"].float()
    std = p["per_channel_statistics.std-of-means"].float()
    return z * std + mean


def ltx_vae_normalize(p, z):
    mean = p["per_channel_statistics.mean-of-means"].float()
    std = p["per_channel_statistics.std-of-means"].float()
    return (z - mean) / std


def ltx_vae_decode_torch(p, z, cfg):
    causal = False
    x = ltx_vae_un_normalize(p, z)
    scaled_t = None
    if cfg.timestep_conditioning:
        mult = p["decoder.timestep_scale_multiplier"].reshape(()).float()
        scaled_t = torch.full((z.shape[0],), cfg.decode_timestep) * mult

    x = _causal_conv3d(x, p["decoder.conv_in.conv.weight"],
                       p["decoder.conv_in.conv.bias"], causal)
    for i, blk in enumerate(cfg.decoder_blocks):
        pre = f"decoder.up_blocks.{i}"
        if blk.type == "res_x":
            x = _mid_block(p, pre, x, blk.num_layers, scaled_t, causal)
        else:
            ft, fs = _FACTORS[blk.type]
            x = _upsample(p, pre, x, blk.multiplier, ft, fs, causal)

    x = _pixel_norm(x, 1e-8)
    if cfg.timestep_conditioning:
        emb = _time_embedder(p, "decoder.last_time_embedder.timestep_embedder",
                             scaled_t)
        c = p["decoder.last_scale_shift_table"].shape[1]
        vals = (p["decoder.last_scale_shift_table"][None].float()
                + emb.reshape(-1, 2, c).float())
        shift = vals[:, 0][:, None, None, None, :]
        scale = vals[:, 1][:, None, None, None, :]
        x = x * (1.0 + scale) + shift
    x = _causal_conv3d(F.silu(x), p["decoder.conv_out.conv.weight"],
                       p["decoder.conv_out.conv.bias"], causal)
    return ltx_unpatchify(x, cfg.patch_size)


def ltx_vae_encode_torch(p, x, cfg):
    t = x.shape[1]
    tf = 1
    for blk in cfg.encoder_blocks:
        if blk.type != "res_x":
            tf *= _FACTORS[blk.type][0]
    crop_t = max(1, 1 + (t - 1) // tf * tf)
    x = x[:, :crop_t]
    x = ltx_patchify(x, cfg.patch_size)
    x = _causal_conv3d(x, p["encoder.conv_in.conv.weight"],
                       p["encoder.conv_in.conv.bias"], True)
    for i, blk in enumerate(cfg.encoder_blocks):
        pre = f"encoder.down_blocks.{i}"
        if blk.type == "res_x":
            x = _mid_block(p, pre, x, blk.num_layers, None, True)
        else:
            ft, fs = _FACTORS[blk.type]
            x = _downsample(p, pre, x, x.shape[-1] * blk.multiplier, ft, fs,
                            True)
    x = _pixel_norm(x, 1e-8)
    x = _causal_conv3d(F.silu(x), p["encoder.conv_out.conv.weight"],
                       p["encoder.conv_out.conv.bias"], True)
    mean = x[..., : cfg.latent_channels]
    return ltx_vae_normalize(p, mean)

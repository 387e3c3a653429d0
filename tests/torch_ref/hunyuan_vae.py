"""Test-only torch Hunyuan Video 1.5 3-D causal VAE reference (transcribed
from the reference C++ math, src/model/vae/hunyuan_vae.hpp: AttnBlock :149,
Upsample :265, Downsample :408, runner :735).  Pixel-(un)shuffle resampling
with channel-matching shortcuts; frame 0 never resamples temporally.
Consumes the same checkpoint-named param dict as sdtpu.models.hunyuan_vae."""
import numpy as np
import torch
import torch.nn.functional as F

from .wan_vae import causal_conv3d


def _rms(p, name, x):
    g = p[f"{name}.gamma"].reshape(-1)
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-12) * g


def _res(p, pre, x):
    h = causal_conv3d(F.silu(_rms(p, f"{pre}.norm1", x)),
                      p[f"{pre}.conv1.weight"], p[f"{pre}.conv1.bias"])
    h = causal_conv3d(F.silu(_rms(p, f"{pre}.norm2", h)),
                      p[f"{pre}.conv2.weight"], p[f"{pre}.conv2.bias"])
    if f"{pre}.nin_shortcut.weight" in p:
        x = causal_conv3d(x, p[f"{pre}.nin_shortcut.weight"],
                          p[f"{pre}.nin_shortcut.bias"])
    return x + h


def _attn(p, pre, x):
    b, t, hh, ww, c = x.shape
    h = _rms(p, f"{pre}.norm", x).reshape(b * t, hh * ww, c)

    def proj(name):
        w = p[f"{pre}.{name}.weight"].reshape(-1, c)
        return h @ w.T + p[f"{pre}.{name}.bias"]

    q, k, v = proj("q"), proj("k"), proj("v")
    att = torch.softmax(
        torch.einsum("bic,bjc->bij", q.float(), k.float()) / np.sqrt(c),
        dim=-1)
    o = torch.einsum("bij,bjc->bic", att, v.float())
    w_o = p[f"{pre}.proj_out.weight"].reshape(-1, c)
    o = (o @ w_o.T + p[f"{pre}.proj_out.bias"]).reshape(b, t, hh, ww, c)
    return x + o


def _mid(p, pre, x):
    x = _res(p, f"{pre}.block_1", x)
    x = _attn(p, f"{pre}.attn_1", x)
    return _res(p, f"{pre}.block_2", x)


def _pixel_unshuffle(x, ft, fs):
    b, t, hh, ww, c = x.shape
    x = x.view(b, t // ft, ft, hh // fs, fs, ww // fs, fs, c)
    x = x.permute(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, t // ft, hh // fs, ww // fs, ft * fs * fs * c)


def _pixel_shuffle(x, ft, fs):
    b, t, hh, ww, fc = x.shape
    c = fc // (ft * fs * fs)
    x = x.view(b, t, hh, ww, ft, fs, fs, c)
    x = x.permute(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, t * ft, hh * fs, ww * fs, c)


def _mean_groups(x, group):
    if group == 1:
        return x
    return x.reshape(*x.shape[:-1], x.shape[-1] // group, group).mean(dim=-1)


def _repeat_channels(x, repeats):
    return x.repeat_interleave(repeats, dim=-1) if repeats > 1 else x


def _downsample(p, pre, x, out_channels, temporal):
    ft = 2 if temporal else 1
    fs = 2
    factor = ft * fs * fs
    in_ch = x.shape[-1]
    group = factor * in_ch // out_channels
    h = causal_conv3d(x, p[f"{pre}.conv.weight"], p[f"{pre}.conv.bias"])
    if ft == 2:
        h_first = _pixel_unshuffle(h[:, :1], 1, fs)
        h_first = torch.cat([h_first, h_first], dim=-1)
        x_first = _mean_groups(_pixel_unshuffle(x[:, :1], 1, fs), group // 2)
        if x.shape[1] == 1:
            return h_first + x_first
        h, x = h[:, 1:], x[:, 1:]
    hq = _pixel_unshuffle(h, ft, fs)
    xq = _mean_groups(_pixel_unshuffle(x, ft, fs), group)
    if ft == 2:
        hq = torch.cat([h_first, hq], dim=1)
        xq = torch.cat([x_first, xq], dim=1)
    return hq + xq


def _upsample(p, pre, x, out_channels, temporal):
    ft = 2 if temporal else 1
    fs = 2
    factor = ft * fs * fs
    in_ch = x.shape[-1]
    repeats = out_channels * factor // in_ch
    h = causal_conv3d(x, p[f"{pre}.conv.weight"], p[f"{pre}.conv.bias"])
    if ft == 2:
        h_first = _pixel_shuffle(h[:, :1], 1, fs)[..., :out_channels]
        x_first = _pixel_shuffle(_repeat_channels(x[:, :1], repeats // 2), 1, fs)
        if x.shape[1] == 1:
            return h_first + x_first
        h_next = _pixel_shuffle(h[:, 1:], ft, fs)
        x_next = _pixel_shuffle(_repeat_channels(x[:, 1:], repeats), ft, fs)
        return torch.cat([h_first + x_first, h_next + x_next], dim=1)
    return (_pixel_shuffle(h, 1, fs)
            + _pixel_shuffle(_repeat_channels(x, repeats), 1, fs))


def hunyuan_vae_decode_torch(p, z, cfg):
    ch = list(reversed(cfg.block_out_channels))
    h = causal_conv3d(z, p["decoder.conv_in.weight"], p["decoder.conv_in.bias"])
    h = h + _repeat_channels(z, ch[0] // cfg.z_channels)
    h = _mid(p, "decoder.mid", h)

    n_sp = int(np.log2(cfg.spatial_ratio))
    n_tp = int(np.log2(cfg.temporal_ratio))
    for i in range(len(ch)):
        for j in range(cfg.layers_per_block + 1):
            h = _res(p, f"decoder.up.{i}.block.{j}", h)
        sp, tp = i < n_sp, i < n_tp
        if sp or tp:
            h = _upsample(p, f"decoder.up.{i}.upsample", h, ch[i + 1], tp)
    h = _rms(p, "decoder.norm_out", h)
    return causal_conv3d(F.silu(h), p["decoder.conv_out.weight"],
                         p["decoder.conv_out.bias"])


def hunyuan_vae_encode_torch(p, x, cfg):
    ch = list(cfg.block_out_channels)
    h = causal_conv3d(x, p["encoder.conv_in.weight"], p["encoder.conv_in.bias"])
    n_sp = int(np.log2(cfg.spatial_ratio))
    t_start = int(np.log2(cfg.spatial_ratio // cfg.temporal_ratio))
    for i in range(len(ch)):
        for j in range(cfg.layers_per_block):
            h = _res(p, f"encoder.down.{i}.block.{j}", h)
        if i < n_sp:
            h = _downsample(p, f"encoder.down.{i}.downsample", h, ch[i + 1],
                            i >= t_start)
    h = _mid(p, "encoder.mid", h)
    shortcut = _mean_groups(h, h.shape[-1] // (cfg.z_channels * 2))
    h = _rms(p, "encoder.norm_out", h)
    h = causal_conv3d(F.silu(h), p["encoder.conv_out.weight"],
                      p["encoder.conv_out.bias"])
    h = h + shortcut
    return h[..., : cfg.z_channels]

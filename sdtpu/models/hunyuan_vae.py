"""Hunyuan Video 1.5 3-D causal VAE (16× spatial, 4× temporal, 32ch latent).

Reference analog: HunyuanVideoVAERunner (src/model/vae/hunyuan_vae.hpp:735).
Checkpoint naming: ``{encoder,decoder}.conv_in``, ``encoder.down.N.block.K`` /
``decoder.up.N.block.K`` (+``downsample``/``upsample`` with inner ``conv``),
``…mid.block_{1,2}/attn_1``, ``…norm_out (RMS gamma)``, ``…conv_out``.

Structure notes (vs the Wan VAE): resampling is pixel-(un)shuffle with
channel-matching shortcuts — downsample averages channel groups, upsample
repeat-interleaves channels; both treat frame 0 separately (no temporal
resampling of the first frame).  Latent scale is a single scalar 1.03682
(reference :780).  Runs full-clip (causal zero padding) like wan_vae.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sdtpu.models.wan_vae import causal_conv3d
from sdtpu.ops import rms_norm
from sdtpu.ops.basic import silu

HUNYUAN_LATENT_SCALE = 1.03682


@dataclasses.dataclass(frozen=True)
class HunyuanVAEConfig:
    z_channels: int = 32
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 1024, 1024)
    layers_per_block: int = 2
    spatial_ratio: int = 16
    temporal_ratio: int = 4


HUNYUAN_VAE_CONFIG = HunyuanVAEConfig()


def _rms(p, name, x):
    return rms_norm(x, p[f"{name}.gamma"].reshape(-1), eps=1e-12)


def _res(p, pre, x):
    h = causal_conv3d(silu(_rms(p, f"{pre}.norm1", x)),
                      p[f"{pre}.conv1.weight"], p[f"{pre}.conv1.bias"])
    h = causal_conv3d(silu(_rms(p, f"{pre}.norm2", h)),
                      p[f"{pre}.conv2.weight"], p[f"{pre}.conv2.bias"])
    if f"{pre}.nin_shortcut.weight" in p:
        x = causal_conv3d(x, p[f"{pre}.nin_shortcut.weight"], p[f"{pre}.nin_shortcut.bias"])
    return x + h


def _attn(p, pre, x):
    """Per-frame spatial attention (reference AttnBlock, hunyuan_vae.hpp:149:
    q/k/v/proj_out 1×1 convs after RMS norm)."""
    import jax

    b, t, hh, ww, c = x.shape
    h = _rms(p, f"{pre}.norm", x).reshape(b * t, hh * ww, c)

    def proj(name):
        w = p[f"{pre}.{name}.weight"].reshape(-1, c)  # [C,C,1,1,(1)] → [C,C]
        return h @ w.T + p[f"{pre}.{name}.bias"]

    q, k, v = proj("q"), proj("k"), proj("v")
    att = jax.nn.softmax(
        jnp.einsum("bic,bjc->bij", q.astype(jnp.float32), k.astype(jnp.float32))
        / np.sqrt(c), axis=-1,
    )
    o = jnp.einsum("bij,bjc->bic", att, v.astype(jnp.float32)).astype(x.dtype)
    w_o = p[f"{pre}.proj_out.weight"].reshape(-1, c)
    o = (o @ w_o.T + p[f"{pre}.proj_out.bias"]).reshape(b, t, hh, ww, c)
    return x + o


def _mid(p, pre, x):
    x = _res(p, f"{pre}.block_1", x)
    x = _attn(p, f"{pre}.attn_1", x)
    return _res(p, f"{pre}.block_2", x)


def _pixel_unshuffle(x, ft, fs):
    """[B,T,H,W,C] → [B,T/ft,H/fs,W/fs,(ft·fs·fs·C)] (channel order ft,fs1,fs2,c)."""
    b, t, hh, ww, c = x.shape
    x = x.reshape(b, t // ft, ft, hh // fs, fs, ww // fs, fs, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, t // ft, hh // fs, ww // fs, ft * fs * fs * c)


def _pixel_shuffle(x, ft, fs):
    """Inverse of _pixel_unshuffle."""
    b, t, hh, ww, fc = x.shape
    c = fc // (ft * fs * fs)
    x = x.reshape(b, t, hh, ww, ft, fs, fs, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, t * ft, hh * fs, ww * fs, c)


def _mean_groups(x, group):
    """Average consecutive channel groups: (g·s) → g."""
    if group == 1:
        return x
    *lead, c = x.shape
    return x.reshape(*lead, c // group, group).mean(axis=-1)


def _repeat_channels(x, repeats):
    return jnp.repeat(x, repeats, axis=-1) if repeats > 1 else x


def _downsample(p, pre, x, out_channels, temporal):
    """Strided pixel-unshuffle with a channel-group-mean shortcut; frame 0
    never resamples temporally (reference Downsample, hunyuan_vae.hpp:408)."""
    ft = 2 if temporal else 1
    fs = 2
    factor = ft * fs * fs
    in_ch = x.shape[-1]
    group = factor * in_ch // out_channels
    h = causal_conv3d(x, p[f"{pre}.conv.weight"], p[f"{pre}.conv.bias"])
    if ft == 2:
        h_first = _pixel_unshuffle(h[:, :1], 1, fs)
        h_first = jnp.concatenate([h_first, h_first], axis=-1)
        x_first = _mean_groups(_pixel_unshuffle(x[:, :1], 1, fs), group // 2)
        if x.shape[1] == 1:
            return h_first + x_first
        h, x = h[:, 1:], x[:, 1:]
    hq = _pixel_unshuffle(h, ft, fs)
    xq = _mean_groups(_pixel_unshuffle(x, ft, fs), group)
    if ft == 2:
        hq = jnp.concatenate([h_first, hq], axis=1)
        xq = jnp.concatenate([x_first, xq], axis=1)
    return hq + xq


def _upsample(p, pre, x, out_channels, temporal):
    """Pixel-shuffle with repeat-interleave shortcut; frame 0 only upsamples
    spatially (reference Upsample, hunyuan_vae.hpp:265)."""
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
        return jnp.concatenate([h_first + x_first, h_next + x_next], axis=1)
    return _pixel_shuffle(h, 1, fs) + _pixel_shuffle(_repeat_channels(x, repeats), 1, fs)


def hunyuan_vae_decode(p, z: jnp.ndarray, cfg: HunyuanVAEConfig = HUNYUAN_VAE_CONFIG) -> jnp.ndarray:
    """z: [B, Tl, h, w, 32] RAW latent (divide diffusion latents by 1.03682
    first) → [B, 1+4(Tl-1), 16h, 16w, 3]."""
    ch = list(reversed(cfg.block_out_channels))  # decoder channel ladder
    h = causal_conv3d(z, p["decoder.conv_in.weight"], p["decoder.conv_in.bias"])
    h = h + _repeat_channels(z, ch[0] // cfg.z_channels)
    h = _mid(p, "decoder.mid", h)

    n_sp = int(np.log2(cfg.spatial_ratio))
    n_tp = int(np.log2(cfg.temporal_ratio))
    cur = ch[0]
    for i in range(len(ch)):
        for j in range(cfg.layers_per_block + 1):
            h = _res(p, f"decoder.up.{i}.block.{j}", h)
        sp, tp = i < n_sp, i < n_tp
        if sp or tp:
            nxt = ch[i + 1]
            h = _upsample(p, f"decoder.up.{i}.upsample", h, nxt, tp)
            cur = nxt
    h = _rms(p, "decoder.norm_out", h)
    return causal_conv3d(silu(h), p["decoder.conv_out.weight"], p["decoder.conv_out.bias"])


def hunyuan_vae_encode(p, x: jnp.ndarray, cfg: HunyuanVAEConfig = HUNYUAN_VAE_CONFIG) -> jnp.ndarray:
    """x: [B, 1+4k, H, W, 3] → RAW latent mean [B, 1+k, H/16, W/16, 32]."""
    ch = list(cfg.block_out_channels)
    h = causal_conv3d(x, p["encoder.conv_in.weight"], p["encoder.conv_in.bias"])
    n_sp = int(np.log2(cfg.spatial_ratio))
    t_start = int(np.log2(cfg.spatial_ratio // cfg.temporal_ratio))
    for i in range(len(ch)):
        for j in range(cfg.layers_per_block):
            h = _res(p, f"encoder.down.{i}.block.{j}", h)
        if i < n_sp:
            nxt = ch[i + 1]
            h = _downsample(p, f"encoder.down.{i}.downsample", h, nxt, i >= t_start)
    h = _mid(p, "encoder.mid", h)
    shortcut = _mean_groups(h, h.shape[-1] // (cfg.z_channels * 2))
    h = _rms(p, "encoder.norm_out", h)
    h = causal_conv3d(silu(h), p["encoder.conv_out.weight"], p["encoder.conv_out.bias"])
    h = h + shortcut
    return h[..., : cfg.z_channels]  # posterior mean


def init_hunyuan_vae_params(cfg: HunyuanVAEConfig = HUNYUAN_VAE_CONFIG, seed: int = 0,
                            dtype=jnp.float32, decode_only: bool = False):
    g = np.random.default_rng(seed)
    p = {}

    def conv3(name, o, i, k=3):
        p[f"{name}.weight"] = jnp.asarray(
            g.standard_normal((o, i, k, k, k), dtype=np.float32) * 0.04, dtype=dtype
        )
        p[f"{name}.bias"] = jnp.zeros((o,), dtype=dtype)

    def gamma(name, c):
        p[f"{name}.gamma"] = jnp.ones((c, 1, 1), dtype=dtype)

    def res(pre, ci, co):
        gamma(f"{pre}.norm1", ci)
        conv3(f"{pre}.conv1", co, ci)
        gamma(f"{pre}.norm2", co)
        conv3(f"{pre}.conv2", co, co)
        if ci != co:
            conv3(f"{pre}.nin_shortcut", co, ci, 1)

    def attn(pre, c):
        gamma(f"{pre}.norm", c)
        for nn in ("q", "k", "v", "proj_out"):
            p[f"{pre}.{nn}.weight"] = jnp.asarray(
                g.standard_normal((c, c, 1, 1, 1), dtype=np.float32) * 0.04, dtype=dtype
            )
            p[f"{pre}.{nn}.bias"] = jnp.zeros((c,), dtype=dtype)

    def mid(pre, c):
        res(f"{pre}.block_1", c, c)
        attn(f"{pre}.attn_1", c)
        res(f"{pre}.block_2", c, c)

    n_sp = int(np.log2(cfg.spatial_ratio))
    n_tp = int(np.log2(cfg.temporal_ratio))
    t_start = int(np.log2(cfg.spatial_ratio // cfg.temporal_ratio))

    if not decode_only:
        ch = list(cfg.block_out_channels)
        conv3("encoder.conv_in", ch[0], 3)
        cur = ch[0]
        for i in range(len(ch)):
            ci = cur
            for j in range(cfg.layers_per_block):
                res(f"encoder.down.{i}.block.{j}", ci, ch[i])
                ci = ch[i]
            cur = ch[i]
            if i < n_sp:
                nxt = ch[i + 1]
                ft = 2 if i >= t_start else 1
                conv3(f"encoder.down.{i}.downsample.conv", nxt // (ft * 4), cur)
                cur = nxt
        mid("encoder.mid", cur)
        gamma("encoder.norm_out", cur)
        conv3("encoder.conv_out", cfg.z_channels * 2, cur)

    ch = list(reversed(cfg.block_out_channels))
    conv3("decoder.conv_in", ch[0], cfg.z_channels)
    mid("decoder.mid", ch[0])
    cur = ch[0]
    for i in range(len(ch)):
        ci = cur
        for j in range(cfg.layers_per_block + 1):
            res(f"decoder.up.{i}.block.{j}", ci, ch[i])
            ci = ch[i]
        cur = ch[i]
        sp, tp = i < n_sp, i < n_tp
        if sp or tp:
            nxt = ch[i + 1]
            ft = 2 if tp else 1
            conv3(f"decoder.up.{i}.upsample.conv", nxt * ft * 4, cur)
            cur = nxt
    gamma("decoder.norm_out", cur)
    conv3("decoder.conv_out", 3, cur)
    return p

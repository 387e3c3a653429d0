"""LTX-2 audio VAE: audio-latent -> mel decoder (2-D, time-causal convs) ->
HiFiGAN-style vocoder (snake-beta activations with anti-aliased up/down
resampling) -> waveform, plus the optional 16k->48k bandwidth-extension (BWE)
stage driven by an on-the-fly log-mel spectrogram.

Reference analog: LTXV::LTXAudioVAE / LTXAudioVAERunner
(src/model/vae/ltx_audio_vae.hpp:913,999).  Checkpoint names:
``audio_vae.decoder.{conv_in.conv.*, mid.block_{1,2}.*, up.L.block.M.*,
up.L.upsample.conv.conv.*, norm_out (no params), conv_out.conv.*}``,
``audio_vae.per_channel_statistics.{mean-of-means,std-of-means}``,
``vocoder.vocoder.{conv_pre.*, ups.N.*, resblocks.K.{convs1.J, convs2.J,
acts1.J.act.{alpha,beta}, acts1.J.{upsample.filter,
downsample.lowpass.filter}, acts2.J...}, act_post.*, conv_post.*}``,
``vocoder.bwe_generator.*`` and ``vocoder.mel_stft.{mel_basis,
stft_fn.forward_basis}`` when BWE is present.

Layouts: audio latent [B, Ta, Ca=8, F=16] (as produced by the LTXAV DiT);
mel [B, T_mel, F_mel=64, 2]; waveform [B, samples, 2].
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import rms_norm
from sdtpu.ops.basic import matmul_precision, silu


@dataclasses.dataclass(frozen=True)
class LTXAudioVAEConfig:
    """Mirrors LTXV::LTXAudioVAEConfig (ltx_audio_vae.hpp:16)."""

    sample_rate: int = 16000
    mel_hop_length: int = 160
    n_fft: int = 1024
    mel_bins: int = 64
    latent_channels: int = 8
    latent_frequency_bins: int = 16
    audio_channels: int = 2
    decoder_channels: int = 128
    decoder_channel_multipliers: Tuple[int, ...] = (1, 2, 4)
    decoder_num_res_blocks: int = 2
    base_upsample_initial_channel: int = 1536
    base_upsample_rates: Tuple[int, ...] = (5, 2, 2, 2, 2, 2)
    base_upsample_kernel_sizes: Tuple[int, ...] = (11, 4, 4, 4, 4, 4)
    base_resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    base_resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    has_bwe: bool = False
    bwe_input_sample_rate: int = 16000
    bwe_output_sample_rate: int = 48000
    bwe_hop_length: int = 80
    bwe_n_fft: int = 512
    bwe_num_mels: int = 64
    bwe_upsample_initial_channel: int = 512
    bwe_upsample_rates: Tuple[int, ...] = (6, 5, 2, 2, 2)
    bwe_upsample_kernel_sizes: Tuple[int, ...] = (12, 11, 4, 4, 4)
    bwe_resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    bwe_resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3

    latent_downsample_factor: int = 4

    def output_sample_rate(self) -> int:
        if self.has_bwe:
            return self.bwe_output_sample_rate
        up = 1
        for r in self.base_upsample_rates:
            up *= r
        return self.sample_rate * up // self.mel_hop_length


LTX_AUDIO_VAE_CONFIG = LTXAudioVAEConfig()


def detect_ltx_audio_vae_config(names, shapes) -> LTXAudioVAEConfig:
    """Config from checkpoint shapes (detect_from_weights,
    ltx_audio_vae.hpp:63)."""
    names = set(names)
    kw: Dict = {}
    ci = shapes.get("audio_vae.decoder.conv_in.conv.weight")  # [O,I,kh,kw]
    co = shapes.get("audio_vae.decoder.conv_out.conv.weight")
    std = shapes.get("audio_vae.per_channel_statistics.std-of-means")
    pre = shapes.get("vocoder.vocoder.conv_pre.weight")
    if ci:
        kw["latent_channels"] = ci[1]
    if co:
        kw["audio_channels"] = co[0]
    if std and ci:
        kw["latent_frequency_bins"] = std[0] // max(1, ci[1])
        kw["mel_bins"] = kw["latent_frequency_bins"] * 4
    if pre:
        kw["base_upsample_initial_channel"] = pre[0]
    levels = []
    for n in names:
        if n.startswith("audio_vae.decoder.up.") and \
                n.endswith(".block.0.conv1.conv.weight"):
            lvl = int(n.split(".")[3])
            levels.append((lvl, shapes[n][0]))
    if levels:
        levels.sort()
        base = levels[0][1]
        kw["decoder_channels"] = base
        kw["decoder_channel_multipliers"] = tuple(c // max(1, base)
                                                  for _, c in levels)
    nblocks = 0
    while f"audio_vae.decoder.up.0.block.{nblocks}.conv1.conv.weight" in names:
        nblocks += 1
    if nblocks:
        kw["decoder_num_res_blocks"] = nblocks - 1
    ks = []
    i = 0
    while f"vocoder.vocoder.ups.{i}.weight" in names:
        ks.append(shapes[f"vocoder.vocoder.ups.{i}.weight"][2])
        i += 1
    if len(ks) == len(LTXAudioVAEConfig.base_upsample_rates):
        kw["base_upsample_kernel_sizes"] = tuple(ks)
    kw["has_bwe"] = "vocoder.bwe_generator.conv_pre.weight" in names
    return dataclasses.replace(LTX_AUDIO_VAE_CONFIG, **kw)


# ------------------------------------------------------------------ 1-D conv helpers


def _conv1d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1):
    """x [B, T, C]; w torch [O, I/groups, K]."""
    kernel = jnp.transpose(w, (2, 1, 0))  # WIO
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(stride,),
        padding=((padding, padding),), rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype, precision=matmul_precision(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _zero_stuff(x, stride):
    """[B, T, C] -> [B, T*stride, C] with (stride-1) zeros after each step."""
    if stride == 1:
        return x
    b, t, c = x.shape
    y = jnp.concatenate(
        [x[:, :, None], jnp.zeros((b, t, stride - 1, c), x.dtype)], axis=2)
    return y.reshape(b, t * stride, c)


def _conv_transpose1d(x, w, b=None, stride=1, padding=0):
    """torch ConvTranspose1d: w [I, O, K]; implemented as zero-stuffing +
    flipped-kernel conv, trimming `padding` from both ends (reference
    ConvTranspose1D, ltx_audio_vae.hpp:564)."""
    k = w.shape[2]
    wf = jnp.flip(jnp.transpose(w, (1, 0, 2)), axis=2)  # [O, I, K] flipped
    y = _conv1d(_zero_stuff(x, stride), wf, None, padding=k - 1)
    out_t = (x.shape[1] - 1) * stride + k
    y = y[:, :out_t]
    if padding > 0:
        y = y[:, padding: y.shape[1] - padding]
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _replicate_pad_t(x, left, right):
    parts = []
    if left > 0:
        parts.append(jnp.repeat(x[:, :1], left, axis=1))
    parts.append(x)
    if right > 0:
        parts.append(jnp.repeat(x[:, -1:], right, axis=1))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def _depthwise_conv1d(x, filt, stride, padding):
    """filt [K] applied per channel (depthwise_conv1d,
    ltx_audio_vae.hpp:314)."""
    c = x.shape[-1]
    w = jnp.broadcast_to(filt.reshape(1, 1, -1), (c, 1, filt.shape[-1]))
    return _conv1d(x, w, stride=stride, padding=padding, groups=c)


def _depthwise_conv_transpose1d(x, filt, stride):
    """Zero-stuff + reversed depthwise conv, scaled by stride (reference
    depthwise_conv_transpose1d, ltx_audio_vae.hpp:341)."""
    k = filt.shape[-1]
    y = _zero_stuff(x, stride)
    c = x.shape[-1]
    w = jnp.broadcast_to(jnp.flip(filt.reshape(-1))[None, None],
                         (c, 1, k))
    y = _conv1d(y, w, padding=k - 1, groups=c)
    out_t = (x.shape[1] - 1) * stride + k
    return y[:, :out_t] * float(stride)


def build_hann_resample_filter(ratio: int) -> np.ndarray:
    """torchaudio-style windowed-sinc (build_hann_resample_filter,
    ltx_audio_vae.hpp:239)."""
    rolloff = 0.99
    width_param = 6
    width = int(math.ceil(width_param / rolloff))
    ksize = 2 * width * ratio + 1
    half_pi = math.pi / width_param / 2.0
    i = np.arange(ksize, dtype=np.float64)
    t = (i / ratio - width) * rolloff
    tc = np.clip(t, -width_param, width_param)
    window = np.cos(tc * half_pi) ** 2
    sinc = np.where(t == 0.0, 1.0, np.sin(math.pi * t) / np.where(t == 0, 1.0, math.pi * t))
    return (sinc * window * rolloff / ratio).astype(np.float32)


def _upsample_waveform_hann(x, filt, ratio: int):
    """x [B, T, C] -> [B, T*ratio, C] (upsample_waveform_hann,
    ltx_audio_vae.hpp:378)."""
    if ratio <= 1:
        return x
    width = int(math.ceil(6 / 0.99))
    ksize = 2 * width * ratio + 1
    pad = width
    pad_left = 2 * width * ratio
    pad_right = ksize - ratio
    y = _replicate_pad_t(x, pad, pad)
    y = _depthwise_conv_transpose1d(y, filt, ratio)
    return y[:, pad_left: y.shape[1] - pad_right]


# ------------------------------------------------------------------ mel decoder (2-D)


def _hconv2d(p, pre, x, stride=(1, 1)):
    """HeightCausalConv2D (ltx_audio_vae.hpp:437): x [B, T, F, C]; full causal
    pad on the time axis, symmetric on frequency."""
    w = p[f"{pre}.conv.weight"]  # [O, I, kh, kw]
    kh, kw = w.shape[2], w.shape[3]
    pw = kw - 1
    kernel = jnp.transpose(w, (2, 3, 1, 0))  # HWIO
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=stride,
        padding=((kh - 1, 0), (pw // 2, pw - pw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype, precision=matmul_precision(x.dtype))
    b = p.get(f"{pre}.conv.bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _audio_resblock(p, pre, x):
    h = rms_norm(x, eps=1e-6)
    h = _hconv2d(p, f"{pre}.conv1", silu(h))
    h = rms_norm(h, eps=1e-6)
    h = _hconv2d(p, f"{pre}.conv2", silu(h))
    if f"{pre}.nin_shortcut.conv.weight" in p:
        x = _hconv2d(p, f"{pre}.nin_shortcut", x)
    return x + h


def _audio_upsample(p, pre, x):
    """Nearest x2 on (time, freq) + conv, dropping the first time row
    (AudioUpsample2D, ltx_audio_vae.hpp:469)."""
    b, t, f, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    x = _hconv2d(p, f"{pre}.conv", x)
    return x[:, 1:]


def _audio_decoder(p, latent, cfg: LTXAudioVAEConfig):
    """latent [B, Ta, Ca, F] -> mel [B, T_mel, F_mel, audio_channels]
    (AudioDecoder::forward, ltx_audio_vae.hpp:878)."""
    b, ta, ca, fb = latent.shape
    mean = p["audio_vae.per_channel_statistics.mean-of-means"]
    std = p["audio_vae.per_channel_statistics.std-of-means"]
    flat = latent.reshape(b, ta, ca * fb)
    flat = flat * std.astype(flat.dtype) + mean.astype(flat.dtype)
    x = flat.reshape(b, ta, ca, fb).transpose(0, 1, 3, 2)  # [B, T, F, C]

    x = _hconv2d(p, "audio_vae.decoder.conv_in", x)
    x = _audio_resblock(p, "audio_vae.decoder.mid.block_1", x)
    x = _audio_resblock(p, "audio_vae.decoder.mid.block_2", x)
    for level in range(len(cfg.decoder_channel_multipliers) - 1, -1, -1):
        for blk in range(cfg.decoder_num_res_blocks + 1):
            x = _audio_resblock(p, f"audio_vae.decoder.up.{level}.block.{blk}", x)
        if level != 0:
            x = _audio_upsample(p, f"audio_vae.decoder.up.{level}.upsample", x)
    x = rms_norm(x, eps=1e-6)
    x = _hconv2d(p, "audio_vae.decoder.conv_out", silu(x))
    target_t = ta * cfg.latent_downsample_factor - (cfg.latent_downsample_factor - 1)
    return x[:, :target_t, : cfg.mel_bins]


# ------------------------------------------------------------------ vocoder


def _snake_beta(p, pre, x):
    """x + sin^2(alpha*x)/(beta+eps) with log-domain params (SnakeBeta1D,
    ltx_audio_vae.hpp:613)."""
    alpha = jnp.exp(p[f"{pre}.alpha"].astype(jnp.float32))
    beta = jnp.exp(p[f"{pre}.beta"].astype(jnp.float32))
    xf = x.astype(jnp.float32)
    osc = jnp.sin(xf * alpha) ** 2
    return (xf + osc / (beta + 1e-9)).astype(x.dtype)


def _activation1d(p, pre, x):
    """Anti-aliased snake: learned x2 upsample filter -> snake-beta ->
    learned /2 lowpass (Activation1D, ltx_audio_vae.hpp:642)."""
    up_k, down_k, r = 12, 12, 2
    up_pad = up_k // r - 1
    up_pad_left = up_pad * r + (up_k - r) // 2
    up_pad_right = up_pad * r + (up_k - r + 1) // 2
    x = _replicate_pad_t(x, up_pad, up_pad)
    x = _depthwise_conv_transpose1d(x, p[f"{pre}.upsample.filter"].reshape(-1), r)
    x = x[:, up_pad_left: x.shape[1] - up_pad_right]
    x = _snake_beta(p, f"{pre}.act", x)
    dl = down_k // 2 - 1
    dr = down_k // 2
    x = _replicate_pad_t(x, dl, dr)
    return _depthwise_conv1d(x, p[f"{pre}.downsample.lowpass.filter"].reshape(-1),
                             r, 0)


def _amp_block(p, pre, x, kernel_size, dilations):
    for i in range(3):
        h = _activation1d(p, f"{pre}.acts1.{i}", x)
        d = dilations[i]
        h = _conv1d(h, p[f"{pre}.convs1.{i}.weight"], p.get(f"{pre}.convs1.{i}.bias"),
                    padding=(kernel_size * d - d) // 2, dilation=d)
        h = _activation1d(p, f"{pre}.acts2.{i}", h)
        h = _conv1d(h, p[f"{pre}.convs2.{i}.weight"], p.get(f"{pre}.convs2.{i}.bias"),
                    padding=kernel_size // 2)
        x = x + h
    return x


def _vocoder(p, pre, mel, cfg: LTXAudioVAEConfig, bwe: bool, final_clamp: bool):
    """mel [B, T, F, C] -> waveform [B, samples, C] (Vocoder::forward,
    ltx_audio_vae.hpp:786).  Input channels are stacked per audio channel:
    feature = c*F + f."""
    rates = cfg.bwe_upsample_rates if bwe else cfg.base_upsample_rates
    rks = cfg.bwe_resblock_kernel_sizes if bwe else cfg.base_resblock_kernel_sizes
    rds = cfg.bwe_resblock_dilations if bwe else cfg.base_resblock_dilations
    b, t, f, c = mel.shape
    x = mel.transpose(0, 1, 3, 2).reshape(b, t, c * f)  # [B, T, C*F]
    x = _conv1d(x, p[f"{pre}.conv_pre.weight"], p.get(f"{pre}.conv_pre.bias"),
                padding=3)
    ri = 0
    for i, rate in enumerate(rates):
        uw = p[f"{pre}.ups.{i}.weight"]
        k = uw.shape[2]
        x = _conv_transpose1d(x, uw, p.get(f"{pre}.ups.{i}.bias"),
                              stride=rate, padding=(k - rate) // 2)
        acc = None
        for j, rk in enumerate(rks):
            h = _amp_block(p, f"{pre}.resblocks.{ri}", x, rk, rds[j])
            acc = h if acc is None else acc + h
            ri += 1
        x = acc / float(len(rks))
    x = _activation1d(p, f"{pre}.act_post", x)
    x = _conv1d(x, p[f"{pre}.conv_post.weight"], None, padding=3)
    if final_clamp:
        x = jnp.clip(x, -1.0, 1.0)
    return x


def _log_mel_spectrogram(x, forward_basis, mel_basis, hop: int):
    """x [B, T, C] waveform -> log-mel [B, frames, n_mels, C]
    (compute_log_mel_spectrogram, ltx_audio_vae.hpp:184).  The STFT is a
    strided conv with the checkpoint's Fourier basis."""
    b, t, c = x.shape
    # forward_basis torch [2*(n_fft/2+1), 1, filter_len]
    fb = forward_basis
    stft_ch = fb.shape[0]
    filt_len = fb.shape[2]
    n_freqs = stft_ch // 2
    left = max(0, filt_len - hop)
    y = x.transpose(0, 2, 1).reshape(b * c, t, 1)  # [B*C, T, 1]
    y = jnp.pad(y, ((0, 0), (left, 0), (0, 0)))
    frames = _conv1d(y, fb, stride=hop)  # [B*C, frames, stft_ch]
    real = frames[..., :n_freqs]
    imag = frames[..., n_freqs:]
    mag = jnp.sqrt(real * real + imag * imag)
    mel = jnp.einsum("bfk,mk->bfm", mag, mel_basis.astype(mag.dtype))
    mel = jnp.log(jnp.clip(mel, 1e-5, None))
    nf = mel.shape[1]
    return mel.reshape(b, c, nf, -1).transpose(0, 2, 3, 1)  # [B, frames, mels, C]


def ltx_audio_vae_decode(p, latent: jnp.ndarray,
                         cfg: LTXAudioVAEConfig) -> jnp.ndarray:
    """latent [B, Ta, Ca, F] -> waveform [B, samples, audio_channels] at
    cfg.output_sample_rate() (LTXAudioVAE::decode, ltx_audio_vae.hpp:943)."""
    mel = _audio_decoder(p, latent, cfg)
    wav = _vocoder(p, "vocoder.vocoder", mel, cfg, bwe=False, final_clamp=True)
    if not cfg.has_bwe:
        return wav
    ratio = cfg.bwe_output_sample_rate // cfg.bwe_input_sample_rate
    low_t = wav.shape[1]
    out_t = low_t * ratio
    rem = low_t % cfg.bwe_hop_length
    bw = wav
    if rem:
        bw = jnp.pad(bw, ((0, 0), (0, cfg.bwe_hop_length - rem), (0, 0)))
    mel2 = _log_mel_spectrogram(bw, p["vocoder.mel_stft.stft_fn.forward_basis"],
                                p["vocoder.mel_stft.mel_basis"],
                                cfg.bwe_hop_length)
    residual = _vocoder(p, "vocoder.bwe_generator", mel2, cfg, bwe=True,
                        final_clamp=False)
    filt = jnp.asarray(build_hann_resample_filter(ratio))
    skip = _upsample_waveform_hann(bw, filt, ratio)
    n = min(residual.shape[1], skip.shape[1])
    out = jnp.clip(residual[:, :n] + skip[:, :n], -1.0, 1.0)
    return out[:, :out_t]


# ------------------------------------------------------------------ init (tests)


def init_ltx_audio_vae_params(cfg: LTXAudioVAEConfig, seed: int = 0,
                              dtype=jnp.float32) -> dict:
    g = np.random.default_rng(seed)

    def w(*shape, scale=0.05):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def hconv(p, pre, o, i, kh=3, kw=3):
        p[f"{pre}.conv.weight"] = w(o, i, kh, kw, scale=0.05 / kh)
        p[f"{pre}.conv.bias"] = jnp.zeros((o,), dtype=dtype)

    def c1(p, pre, o, i, k, bias=True):
        p[f"{pre}.weight"] = w(o, i, k, scale=0.05 / k)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((o,), dtype=dtype)

    def act1d(p, pre, c):
        p[f"{pre}.act.alpha"] = jnp.zeros((c,), dtype=dtype)
        p[f"{pre}.act.beta"] = jnp.zeros((c,), dtype=dtype)
        p[f"{pre}.upsample.filter"] = jnp.asarray(
            build_hann_resample_filter(2)[:12], dtype=dtype)
        p[f"{pre}.downsample.lowpass.filter"] = jnp.asarray(
            build_hann_resample_filter(2)[:12], dtype=dtype)

    def resb(p, pre, ci, co):
        hconv(p, f"{pre}.conv1", co, ci)
        hconv(p, f"{pre}.conv2", co, co)
        if ci != co:
            hconv(p, f"{pre}.nin_shortcut", co, ci, 1, 1)

    def vocoder(p, pre, bwe):
        mel_bins = cfg.bwe_num_mels if bwe else cfg.mel_bins
        init_ch = (cfg.bwe_upsample_initial_channel if bwe
                   else cfg.base_upsample_initial_channel)
        rates = cfg.bwe_upsample_rates if bwe else cfg.base_upsample_rates
        uks = cfg.bwe_upsample_kernel_sizes if bwe else cfg.base_upsample_kernel_sizes
        rks = cfg.bwe_resblock_kernel_sizes if bwe else cfg.base_resblock_kernel_sizes
        c1(p, f"{pre}.conv_pre", init_ch, mel_bins * cfg.audio_channels, 7)
        cur = init_ch
        ri = 0
        for i, rate in enumerate(rates):
            nxt = init_ch // (1 << (i + 1))
            p[f"{pre}.ups.{i}.weight"] = w(cur, nxt, uks[i], scale=0.02)
            p[f"{pre}.ups.{i}.bias"] = jnp.zeros((nxt,), dtype=dtype)
            for rk in rks:
                bp = f"{pre}.resblocks.{ri}"
                for j in range(3):
                    act1d(p, f"{bp}.acts1.{j}", nxt)
                    act1d(p, f"{bp}.acts2.{j}", nxt)
                    c1(p, f"{bp}.convs1.{j}", nxt, nxt, rk)
                    c1(p, f"{bp}.convs2.{j}", nxt, nxt, rk)
                ri += 1
            cur = nxt
        act1d(p, f"{pre}.act_post", cur)
        c1(p, f"{pre}.conv_post", cfg.audio_channels, cur, 7, bias=False)

    p: dict = {}
    n = cfg.latent_channels * cfg.latent_frequency_bins
    p["audio_vae.per_channel_statistics.mean-of-means"] = jnp.zeros((n,), dtype=dtype)
    p["audio_vae.per_channel_statistics.std-of-means"] = jnp.ones((n,), dtype=dtype)
    mults = cfg.decoder_channel_multipliers
    block_in = cfg.decoder_channels * mults[-1]
    hconv(p, "audio_vae.decoder.conv_in", block_in, cfg.latent_channels)
    resb(p, "audio_vae.decoder.mid.block_1", block_in, block_in)
    resb(p, "audio_vae.decoder.mid.block_2", block_in, block_in)
    cur = block_in
    for level in range(len(mults) - 1, -1, -1):
        out_c = cfg.decoder_channels * mults[level]
        for blk in range(cfg.decoder_num_res_blocks + 1):
            resb(p, f"audio_vae.decoder.up.{level}.block.{blk}", cur, out_c)
            cur = out_c
        if level != 0:
            hconv(p, f"audio_vae.decoder.up.{level}.upsample.conv", cur, cur)
    hconv(p, "audio_vae.decoder.conv_out", cfg.audio_channels, cur)
    vocoder(p, "vocoder.vocoder", False)
    if cfg.has_bwe:
        vocoder(p, "vocoder.bwe_generator", True)
        n_freq = cfg.bwe_n_fft // 2 + 1
        p["vocoder.mel_stft.mel_basis"] = w(cfg.bwe_num_mels, n_freq, scale=0.01)
        p["vocoder.mel_stft.stft_fn.forward_basis"] = w(
            2 * n_freq, 1, cfg.bwe_n_fft, scale=0.01)
    return p

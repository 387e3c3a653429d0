"""Test-only torch LTX-2 audio VAE reference (transcribed from the reference
C++ math, src/model/vae/ltx_audio_vae.hpp: log-mel :184, resample filter
:239, depthwise convs :314/:341, hann upsample :378, HeightCausalConv2D
:437, AudioUpsample2D :469, ConvTranspose1D :564, SnakeBeta1D :613,
Activation1D :642, Vocoder :786, AudioDecoder :878, decode :943).  Uses
torch's native conv/conv_transpose ops (independent of the zero-stuffing
formulation in sdtpu).  Consumes the same checkpoint-named param dict as
sdtpu.models.ltx_audio_vae."""
import math

import numpy as np
import torch
import torch.nn.functional as F


def _conv1d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1):
    y = F.conv1d(x.permute(0, 2, 1), w, b, stride=stride, padding=padding,
                 dilation=dilation, groups=groups)
    return y.permute(0, 2, 1)


def _conv_transpose1d(x, w, b=None, stride=1, padding=0):
    y = F.conv_transpose1d(x.permute(0, 2, 1), w, b, stride=stride,
                           padding=padding)
    return y.permute(0, 2, 1)


def _replicate_pad_t(x, left, right):
    return F.pad(x.permute(0, 2, 1), (left, right),
                 mode="replicate").permute(0, 2, 1)


def _depthwise_conv1d(x, filt, stride, padding):
    c = x.shape[-1]
    w = filt.reshape(1, 1, -1).expand(c, 1, filt.shape[-1])
    return _conv1d(x, w, stride=stride, padding=padding, groups=c)


def _depthwise_conv_transpose1d(x, filt, stride):
    c = x.shape[-1]
    w = filt.reshape(1, 1, -1).expand(c, 1, filt.shape[-1])
    y = F.conv_transpose1d(x.permute(0, 2, 1), w, stride=stride, groups=c)
    return y.permute(0, 2, 1) * float(stride)


def build_hann_resample_filter(ratio):
    rolloff = 0.99
    width_param = 6
    width = int(math.ceil(width_param / rolloff))
    ksize = 2 * width * ratio + 1
    half_pi = math.pi / width_param / 2.0
    i = np.arange(ksize, dtype=np.float64)
    t = (i / ratio - width) * rolloff
    tc = np.clip(t, -width_param, width_param)
    window = np.cos(tc * half_pi) ** 2
    sinc = np.where(t == 0.0, 1.0,
                    np.sin(math.pi * t) / np.where(t == 0, 1.0, math.pi * t))
    return (sinc * window * rolloff / ratio).astype(np.float32)


def _upsample_waveform_hann(x, filt, ratio):
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


def _hconv2d(p, pre, x, stride=(1, 1)):
    w = p[f"{pre}.conv.weight"]
    kh, kw = w.shape[2], w.shape[3]
    pw = kw - 1
    xt = x.permute(0, 3, 1, 2)  # [B, C, T, F]
    xt = F.pad(xt, (pw // 2, pw - pw // 2, kh - 1, 0))
    y = F.conv2d(xt, w, p.get(f"{pre}.conv.bias"), stride=stride)
    return y.permute(0, 2, 3, 1)


def _rms_noaffine(x, eps=1e-6):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)


def _audio_resblock(p, pre, x):
    h = _rms_noaffine(x)
    h = _hconv2d(p, f"{pre}.conv1", F.silu(h))
    h = _rms_noaffine(h)
    h = _hconv2d(p, f"{pre}.conv2", F.silu(h))
    if f"{pre}.nin_shortcut.conv.weight" in p:
        x = _hconv2d(p, f"{pre}.nin_shortcut", x)
    return x + h


def _audio_upsample(p, pre, x):
    x = x.repeat_interleave(2, dim=1).repeat_interleave(2, dim=2)
    x = _hconv2d(p, f"{pre}.conv", x)
    return x[:, 1:]


def _audio_decoder(p, latent, cfg):
    b, ta, ca, fb = latent.shape
    mean = p["audio_vae.per_channel_statistics.mean-of-means"].float()
    std = p["audio_vae.per_channel_statistics.std-of-means"].float()
    flat = latent.reshape(b, ta, ca * fb)
    flat = flat * std + mean
    x = flat.view(b, ta, ca, fb).permute(0, 1, 3, 2)

    x = _hconv2d(p, "audio_vae.decoder.conv_in", x)
    x = _audio_resblock(p, "audio_vae.decoder.mid.block_1", x)
    x = _audio_resblock(p, "audio_vae.decoder.mid.block_2", x)
    for level in range(len(cfg.decoder_channel_multipliers) - 1, -1, -1):
        for blk in range(cfg.decoder_num_res_blocks + 1):
            x = _audio_resblock(p, f"audio_vae.decoder.up.{level}.block.{blk}",
                                x)
        if level != 0:
            x = _audio_upsample(p, f"audio_vae.decoder.up.{level}.upsample", x)
    x = _rms_noaffine(x)
    x = _hconv2d(p, "audio_vae.decoder.conv_out", F.silu(x))
    target_t = (ta * cfg.latent_downsample_factor
                - (cfg.latent_downsample_factor - 1))
    return x[:, :target_t, : cfg.mel_bins]


def _snake_beta(p, pre, x):
    alpha = torch.exp(p[f"{pre}.alpha"].float())
    beta = torch.exp(p[f"{pre}.beta"].float())
    xf = x.float()
    osc = torch.sin(xf * alpha) ** 2
    return xf + osc / (beta + 1e-9)


def _activation1d(p, pre, x):
    up_k, down_k, r = 12, 12, 2
    up_pad = up_k // r - 1
    up_pad_left = up_pad * r + (up_k - r) // 2
    up_pad_right = up_pad * r + (up_k - r + 1) // 2
    x = _replicate_pad_t(x, up_pad, up_pad)
    x = _depthwise_conv_transpose1d(x, p[f"{pre}.upsample.filter"].reshape(-1),
                                    r)
    x = x[:, up_pad_left: x.shape[1] - up_pad_right]
    x = _snake_beta(p, f"{pre}.act", x)
    dl = down_k // 2 - 1
    dr = down_k // 2
    x = _replicate_pad_t(x, dl, dr)
    return _depthwise_conv1d(
        x, p[f"{pre}.downsample.lowpass.filter"].reshape(-1), r, 0)


def _amp_block(p, pre, x, kernel_size, dilations):
    for i in range(3):
        h = _activation1d(p, f"{pre}.acts1.{i}", x)
        d = dilations[i]
        h = _conv1d(h, p[f"{pre}.convs1.{i}.weight"],
                    p.get(f"{pre}.convs1.{i}.bias"),
                    padding=(kernel_size * d - d) // 2, dilation=d)
        h = _activation1d(p, f"{pre}.acts2.{i}", h)
        h = _conv1d(h, p[f"{pre}.convs2.{i}.weight"],
                    p.get(f"{pre}.convs2.{i}.bias"),
                    padding=kernel_size // 2)
        x = x + h
    return x


def _vocoder(p, pre, mel, cfg, bwe, final_clamp):
    rates = cfg.bwe_upsample_rates if bwe else cfg.base_upsample_rates
    rks = (cfg.bwe_resblock_kernel_sizes if bwe
           else cfg.base_resblock_kernel_sizes)
    rds = cfg.bwe_resblock_dilations if bwe else cfg.base_resblock_dilations
    b, t, f, c = mel.shape
    x = mel.permute(0, 1, 3, 2).reshape(b, t, c * f)
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
        x = torch.clamp(x, -1.0, 1.0)
    return x


def _log_mel_spectrogram(x, forward_basis, mel_basis, hop):
    b, t, c = x.shape
    fb = forward_basis
    stft_ch = fb.shape[0]
    filt_len = fb.shape[2]
    n_freqs = stft_ch // 2
    left = max(0, filt_len - hop)
    y = x.permute(0, 2, 1).reshape(b * c, t, 1)
    y = F.pad(y.permute(0, 2, 1), (left, 0)).permute(0, 2, 1)
    frames = _conv1d(y, fb, stride=hop)
    real = frames[..., :n_freqs]
    imag = frames[..., n_freqs:]
    mag = torch.sqrt(real * real + imag * imag)
    mel = torch.einsum("bfk,mk->bfm", mag, mel_basis.float())
    mel = torch.log(torch.clamp(mel, min=1e-5))
    nf = mel.shape[1]
    return mel.reshape(b, c, nf, -1).permute(0, 2, 3, 1)


def ltx_audio_vae_decode_torch(p, latent, cfg):
    mel = _audio_decoder(p, latent, cfg)
    wav = _vocoder(p, "vocoder.vocoder", mel, cfg, bwe=False,
                   final_clamp=True)
    if not cfg.has_bwe:
        return wav
    ratio = cfg.bwe_output_sample_rate // cfg.bwe_input_sample_rate
    low_t = wav.shape[1]
    out_t = low_t * ratio
    rem = low_t % cfg.bwe_hop_length
    bw = wav
    if rem:
        bw = F.pad(bw.permute(0, 2, 1),
                   (0, cfg.bwe_hop_length - rem)).permute(0, 2, 1)
    mel2 = _log_mel_spectrogram(bw,
                                p["vocoder.mel_stft.stft_fn.forward_basis"],
                                p["vocoder.mel_stft.mel_basis"],
                                cfg.bwe_hop_length)
    residual = _vocoder(p, "vocoder.bwe_generator", mel2, cfg, bwe=True,
                        final_clamp=False)
    filt = torch.from_numpy(build_hann_resample_filter(ratio))
    skip = _upsample_waveform_hann(bw, filt, ratio)
    n = min(residual.shape[1], skip.shape[1])
    out = torch.clamp(residual[:, :n] + skip[:, :n], -1.0, 1.0)
    return out[:, :out_t]

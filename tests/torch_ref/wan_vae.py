"""Test-only torch Wan 3-D causal VAE reference (transcribed from the
reference C++ math, src/model/vae/wan_vae.hpp: CausalConv3d :16, RMS_norm
:83, ResidualBlock/AttentionBlock :570, temporal Rep upsample :181-210,
decode :948).  Full-clip causal form: zero temporal padding at t=0 equals
the reference's chunked feat-cache recursion run over the whole clip.
Consumes the same checkpoint-named param dict as sdtpu.models.wan_vae."""
import torch
import torch.nn.functional as F


def causal_conv3d(x, w, b, stride=(1, 1, 1), spatial_pad=None, temporal_pad=None):
    """x: [B,T,H,W,C]; w torch [O,I,kt,kh,kw]."""
    kt, kh = w.shape[2], w.shape[3]
    sp = kh // 2 if spatial_pad is None else spatial_pad
    tp = kt - 1 if temporal_pad is None else temporal_pad
    xt = x.permute(0, 4, 1, 2, 3)  # NCDHW
    xt = F.pad(xt, (sp, sp, sp, sp, tp, 0))
    y = F.conv3d(xt, w, b, stride=stride)
    return y.permute(0, 2, 3, 4, 1)


def _conv2d_frames(x, w, b, stride=1, padding=1):
    bb, t, h, ww, c = x.shape
    y = F.conv2d(x.reshape(bb * t, h, ww, c).permute(0, 3, 1, 2), w, b,
                 stride=stride, padding=padding)
    y = y.permute(0, 2, 3, 1)
    return y.reshape(bb, t, *y.shape[1:])


def _rms(p, name, x):
    g = p[f"{name}.gamma"].reshape(-1)
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + 1e-12) * g


def _resblock(p, pre, x):
    h = _rms(p, f"{pre}.residual.0", x)
    h = causal_conv3d(F.silu(h), p[f"{pre}.residual.2.weight"], p[f"{pre}.residual.2.bias"])
    h = _rms(p, f"{pre}.residual.3", h)
    h = causal_conv3d(F.silu(h), p[f"{pre}.residual.6.weight"], p[f"{pre}.residual.6.bias"])
    if f"{pre}.shortcut.weight" in p:
        x = causal_conv3d(x, p[f"{pre}.shortcut.weight"], p[f"{pre}.shortcut.bias"])
    return x + h


def _attn_block(p, pre, x):
    bb, t, hh, ww, c = x.shape
    h = _rms(p, f"{pre}.norm", x)
    qkv = _conv2d_frames(h, p[f"{pre}.to_qkv.weight"], p[f"{pre}.to_qkv.bias"], padding=0)
    q, k, v = qkv.reshape(bb * t, hh * ww, 3 * c).chunk(3, dim=-1)
    att = torch.softmax(
        torch.einsum("bic,bjc->bij", q.float(), k.float()) / (c ** 0.5), dim=-1
    )
    o = torch.einsum("bij,bjc->bic", att, v.float())
    o = o.reshape(bb, t, hh, ww, c)
    o = _conv2d_frames(o, p[f"{pre}.proj.weight"], p[f"{pre}.proj.bias"], padding=0)
    return x + o


def _temporal_upsample(p, pre, x):
    head, tail = x[:, :1], x[:, 1:]
    bb, tm, hh, ww, c = tail.shape
    y = causal_conv3d(tail, p[f"{pre}.time_conv.weight"], p[f"{pre}.time_conv.bias"],
                      spatial_pad=0)
    y = y.reshape(bb, tm, hh, ww, 2, c).permute(0, 1, 4, 2, 3, 5).reshape(
        bb, 2 * tm, hh, ww, c)
    return torch.cat([head, y], dim=1)


def _spatial_upsample(p, pre, x):
    bb, t, hh, ww, c = x.shape
    y = x.reshape(bb * t, hh, ww, c)
    y = y.repeat_interleave(2, dim=1).repeat_interleave(2, dim=2)
    y = F.conv2d(y.permute(0, 3, 1, 2), p[f"{pre}.resample.1.weight"],
                 p[f"{pre}.resample.1.bias"], padding=1).permute(0, 2, 3, 1)
    return y.reshape(bb, t, *y.shape[1:])


def wan_vae_decode_torch(p, z, cfg):
    z = causal_conv3d(z, p["conv2.weight"], p["conv2.bias"])
    x = causal_conv3d(z, p["decoder.conv1.weight"], p["decoder.conv1.bias"])

    x = _resblock(p, "decoder.middle.0", x)
    x = _attn_block(p, "decoder.middle.1", x)
    x = _resblock(p, "decoder.middle.2", x)

    n_levels = len(cfg.dim_mult)
    idx = 0
    for i in range(n_levels):
        for _ in range(cfg.num_res_blocks + 1):
            x = _resblock(p, f"decoder.upsamples.{idx}", x)
            idx += 1
        if i != n_levels - 1:
            pre = f"decoder.upsamples.{idx}"
            if cfg.temporal_upsample[i]:
                x = _temporal_upsample(p, pre, x)
            x = _spatial_upsample(p, pre, x)
            idx += 1

    x = _rms(p, "decoder.head.0", x)
    x = causal_conv3d(F.silu(x), p["decoder.head.2.weight"], p["decoder.head.2.bias"])
    return x

"""Test-only torch TAESD + TAEHV references (transcribed from the reference
C++ math, src/model/vae/tae.hpp: MemBlock :224, WideMemBlock :262,
TinyVideoEncoder :392, TinyVideoDecoder :470, TinyImageAutoEncoder :629,
TAEHV :505/691).  Consumes the same checkpoint-named param dicts as
sdtpu.models.tae / sdtpu.models.taehv."""
import torch
import torch.nn.functional as F


def _conv(p, name, x, stride=1, padding=1, groups=1, bias=True):
    y = F.conv2d(x.permute(0, 3, 1, 2), p[f"{name}.weight"],
                 p.get(f"{name}.bias") if bias else None,
                 stride=stride, padding=padding, groups=groups)
    return y.permute(0, 2, 3, 1)


# --------------------------------------------------------------------- TAESD


def _tae_block(p, pre, x):
    h = _conv(p, f"{pre}.conv.0", x)
    h = F.relu(h)
    h = _conv(p, f"{pre}.conv.2", h)
    h = F.relu(h)
    h = _conv(p, f"{pre}.conv.4", h)
    if f"{pre}.skip.weight" in p:
        x = _conv(p, f"{pre}.skip", x, padding=0, bias=False)
    return F.relu(h + x)


def tae_decode_torch(p, z, cfg):
    h = z / cfg.vae_scale_factor
    h = 3.0 * torch.tanh(h / 3.0)
    nb = cfg.num_blocks
    i = 0
    h = _conv(p, f"decoder.layers.{i}", h)
    h = F.relu(h)
    i = 2
    for _ in range(nb):
        h = _tae_block(p, f"decoder.layers.{i}", h)
        i += 1
    for stage in range(3):
        h = h.repeat_interleave(2, dim=1).repeat_interleave(2, dim=2)
        i += 1
        h = _conv(p, f"decoder.layers.{i}", h, bias=False)
        i += 1
        n = 1 if stage == 2 else nb
        for _ in range(n):
            h = _tae_block(p, f"decoder.layers.{i}", h)
            i += 1
    h = _conv(p, f"decoder.layers.{i}", h)
    return h * 2.0 - 1.0


def tae_encode_torch(p, x, cfg):
    h = (x + 1.0) / 2.0
    nb = cfg.num_blocks
    i = 0
    h = _conv(p, f"encoder.layers.{i}", h)
    i += 1
    h = _tae_block(p, f"encoder.layers.{i}", h)
    i += 1
    for _ in range(3):
        h = _conv(p, f"encoder.layers.{i}", h, stride=2, bias=False)
        i += 1
        for _ in range(nb):
            h = _tae_block(p, f"encoder.layers.{i}", h)
            i += 1
    h = _conv(p, f"encoder.layers.{i}", h)
    return h * cfg.vae_scale_factor


# --------------------------------------------------------------------- TAEHV


def _mem_block(p, pre, h, past, wide):
    x = torch.cat([h, past], dim=-1)
    if wide:
        g = max(1, p[f"{pre}.conv.2.weight"].shape[0] // 64)
        x = F.relu(_conv(p, f"{pre}.conv.0", x, padding=0))
        x = F.relu(_conv(p, f"{pre}.conv.2", x, groups=g))
        x = F.relu(_conv(p, f"{pre}.conv.4", x, padding=0))
        x = _conv(p, f"{pre}.conv.6", x, groups=g)
    else:
        x = F.relu(_conv(p, f"{pre}.conv.0", x))
        x = F.relu(_conv(p, f"{pre}.conv.2", x))
        x = _conv(p, f"{pre}.conv.4", x)
    skip = h
    if f"{pre}.skip.weight" in p:
        skip = _conv(p, f"{pre}.skip", h, padding=0, bias=False)
    return F.relu(x + skip)


def _past(h):
    return torch.cat([torch.zeros_like(h[:1]), h[:-1]], dim=0)


def _patchify(x, ps):
    if ps == 1:
        return x
    t, hh, ww, c = x.shape
    h, w = hh // ps, ww // ps
    x = x.view(t, h, ps, w, ps, c)
    return x.permute(0, 1, 3, 5, 2, 4).reshape(t, h, w, c * ps * ps)


def _unpatchify(x, ps):
    if ps == 1:
        return x
    t, h, w, crq = x.shape
    c = crq // (ps * ps)
    x = x.view(t, h, w, c, ps, ps)
    return x.permute(0, 1, 4, 2, 5, 3).reshape(t, h * ps, w * ps, c)


def taehv_decode_torch(p, z, cfg):
    b = z.shape[0]
    outs = []
    for bi in range(b):
        h = z[bi]
        h = 3.0 * torch.tanh(h / 3.0)
        h = F.relu(_conv(p, "decoder.1", h))
        idx = 3
        for i, up in enumerate(cfg.time_upscale):
            for _ in range(cfg.num_blocks):
                h = _mem_block(p, f"decoder.{idx}", h, _past(h), cfg.is_wide)
                idx += 1
            idx += 1
            h = h.repeat_interleave(2, dim=1).repeat_interleave(2, dim=2)
            stride = 2 if up else 1
            h = _conv(p, f"decoder.{idx}.conv", h, padding=0, bias=False)
            idx += 1
            if stride != 1:
                tt, hh2, ww2, cs = h.shape
                h = h.view(tt, hh2, ww2, stride, cs // stride)
                h = h.permute(0, 3, 1, 2, 4).reshape(tt * stride, hh2, ww2,
                                                     cs // stride)
            h = _conv(p, f"decoder.{idx}", h, bias=False)
            idx += 1
        idx += 1
        h = F.relu(h)
        h = _conv(p, f"decoder.{idx}", h)
        h = _unpatchify(h, cfg.patch_size)
        outs.append(h[cfg.t_upscale - 1:])
    return torch.stack(outs, dim=0)


def taehv_encode_torch(p, x, cfg):
    b = x.shape[0]
    outs = []
    for bi in range(b):
        h = x[bi]
        t = h.shape[0]
        pad = (-t) % cfg.t_downscale
        if pad:
            h = torch.cat([h] + [h[-1:]] * pad, dim=0)
        h = _patchify(h, cfg.patch_size)
        h = F.relu(_conv(p, "encoder.0", h))
        idx = 2
        for i, down in enumerate(cfg.time_downscale):
            stride = 2 if down else 1
            if stride != 1:
                tt, hh2, ww2, c = h.shape
                h = h.view(tt // stride, stride, hh2, ww2, c)
                h = h.permute(0, 2, 3, 1, 4).reshape(tt // stride, hh2, ww2,
                                                     stride * c)
            h = _conv(p, f"encoder.{idx}.conv", h, padding=0, bias=False)
            idx += 1
            h = _conv(p, f"encoder.{idx}", h, stride=2, bias=False)
            idx += 1
            for _ in range(cfg.num_blocks):
                h = _mem_block(p, f"encoder.{idx}", h, _past(h), False)
                idx += 1
        h = _conv(p, f"encoder.{idx}", h)
        outs.append(h)
    return torch.stack(outs, dim=0)

"""Test-only torch LTX latent upsampler reference (transcribed from the
reference C++ math, src/model/upscaler/ltx_latent_upscaler.hpp:
VideoGroupNorm :130, BlurDownsample :249, LatentUpsampler :333, forward
:380).  Consumes the same checkpoint-named param dict as
sdtpu.models.ltx_latent_upsampler."""
import numpy as np
import torch
import torch.nn.functional as F


def _conv3d(p, pre, x):
    y = F.conv3d(x.permute(0, 4, 1, 2, 3), p[f"{pre}.weight"],
                 p.get(f"{pre}.bias"), padding=1)
    return y.permute(0, 2, 3, 4, 1)


def _vgroup_norm(p, pre, x, groups=32):
    b, t, h, w, c = x.shape
    y = F.group_norm(x.reshape(b, t * h * w, c).permute(0, 2, 1), groups,
                     p[f"{pre}.weight"], p[f"{pre}.bias"], eps=1e-5)
    return y.permute(0, 2, 1).reshape(b, t, h, w, c)


def _resblock(p, pre, x):
    h = _conv3d(p, f"{pre}.conv1", x)
    h = _vgroup_norm(p, f"{pre}.norm1", h)
    h = F.silu(h)
    h = _conv3d(p, f"{pre}.conv2", h)
    h = _vgroup_norm(p, f"{pre}.norm2", h)
    return F.silu(x + h)


def _pixel_shuffle_hw(x, r):
    b, t, h, w, crr = x.shape
    c = crr // (r * r)
    y = x.view(b, t, h, w, c, r, r)
    y = y.permute(0, 1, 2, 5, 3, 6, 4)
    return y.reshape(b, t, h * r, w * r, c)


def _blur_downsample(x, stride):
    if stride == 1:
        return x
    binom = np.array([1, 4, 6, 4, 1], dtype=np.float32)
    k2 = torch.from_numpy(np.outer(binom, binom) / 256.0).float()
    b, t, h, w, c = x.shape
    kernel = k2[None, None].repeat(c, 1, 1, 1)  # [C, 1, 5, 5]
    y = F.conv2d(x.reshape(b * t, h, w, c).permute(0, 3, 1, 2), kernel,
                 stride=stride, padding=2, groups=c)
    y = y.permute(0, 2, 3, 1)
    return y.reshape(b, t, *y.shape[1:])


def _conv2d_frames(p, name, x):
    b, t, h, w, c = x.shape
    y = F.conv2d(x.reshape(b * t, h, w, c).permute(0, 3, 1, 2),
                 p[f"{name}.weight"], p.get(f"{name}.bias"), padding=1)
    y = y.permute(0, 2, 3, 1)
    return y.reshape(b, t, h, w, -1)


def latent_upsample_torch(p, x, cfg):
    x = _conv3d(p, "initial_conv", x)
    x = _vgroup_norm(p, "initial_norm", x)
    x = F.silu(x)
    for i in range(cfg.num_blocks_per_stage):
        x = _resblock(p, f"res_blocks.{i}", x)

    if cfg.rational_resampler:
        y = _conv2d_frames(p, "upsampler.conv", x)
        y = _pixel_shuffle_hw(y, cfg.spatial_up_num)
        x = _blur_downsample(y, cfg.spatial_down_den)
    elif cfg.temporal_upsample:
        x = _conv3d(p, "upsampler.0", x)
        b, t, h, w, c2 = x.shape
        c = c2 // cfg.temporal_up_factor
        y = x.view(b, t, h, w, c, cfg.temporal_up_factor)
        y = y.permute(0, 1, 5, 2, 3, 4).reshape(
            b, t * cfg.temporal_up_factor, h, w, c)
        x = y[:, 1:]
    else:
        y = _conv2d_frames(p, "upsampler.0", x)
        x = _pixel_shuffle_hw(y, 2)

    for i in range(cfg.num_blocks_per_stage):
        x = _resblock(p, f"post_upsample_res_blocks.{i}", x)
    return _conv3d(p, "final_conv", x)

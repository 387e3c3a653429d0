"""Test-only torch SVD video-UNet block references (transcribed from the
reference C++ math, src/model/diffusion/block.hpp: AlphaBlender :580,
VideoResBlock :615-662, ff_in transformer variant :441-450;
SpatialVideoTransformer unet.hpp:150-297).  Consume the same
checkpoint-named param dicts as sdtpu.models.unet's svd paths."""
import math

import torch
import torch.nn.functional as F


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _conv(p, name, x, padding=1):
    y = F.conv2d(x.permute(0, 3, 1, 2), p[f"{name}.weight"],
                 p.get(f"{name}.bias"), padding=padding)
    return y.permute(0, 2, 3, 1)


def _gn(p, name, x, eps=1e-5, groups=32):
    nd = x.ndim
    if nd == 4:
        xt = x.permute(0, 3, 1, 2)
    else:  # [B, T, S, C]
        xt = x.permute(0, 3, 1, 2)
    y = F.group_norm(xt, groups, p[f"{name}.weight"], p[f"{name}.bias"],
                     eps=eps)
    return y.permute(0, 2, 3, 1)


def _ln(p, pre, x):
    return F.layer_norm(x, (x.shape[-1],), p[f"{pre}.weight"],
                        p[f"{pre}.bias"])


def timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float64) / half
    ).to(torch.float32)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _alpha_mix(p, pre, spatial, temporal):
    a = torch.sigmoid(p[f"{pre}.mix_factor"].float())
    return spatial * a + temporal * (1.0 - a)


def resblock(p, pre, x, emb):
    out_ch = p[f"{pre}.out_layers.3.weight"].shape[0]
    h = _gn(p, f"{pre}.in_layers.0", x)
    h = F.silu(h)
    h = _conv(p, f"{pre}.in_layers.2", h)
    emb_out = _lin(p, f"{pre}.emb_layers.1", F.silu(emb))
    h = h + emb_out[:, None, None, :]
    h = _gn(p, f"{pre}.out_layers.0", h)
    h = F.silu(h)
    h = _conv(p, f"{pre}.out_layers.3", h)
    if x.shape[-1] != out_ch:
        x = _conv(p, f"{pre}.skip_connection", x, padding=0)
    return x + h


def _temporal_conv(p, name, x):
    # kernel (3,1,1) over the frame axis; x [B, T, S, C]
    w5 = p[f"{name}.weight"]
    w4 = w5.reshape(w5.shape[0], w5.shape[1], w5.shape[2], 1)
    y = F.conv2d(x.permute(0, 3, 1, 2), w4, p[f"{name}.bias"],
                 padding=(w5.shape[2] // 2, 0))
    return y.permute(0, 2, 3, 1)


def temporal_resblock(p, pre, x, emb):
    h = _gn(p, f"{pre}.in_layers.0", x)
    h = F.silu(h)
    h = _temporal_conv(p, f"{pre}.in_layers.2", h)
    emb_out = _lin(p, f"{pre}.emb_layers.1", F.silu(emb))
    h = h + emb_out[:, :, None, :]
    h = _gn(p, f"{pre}.out_layers.0", h)
    h = F.silu(h)
    h = _temporal_conv(p, f"{pre}.out_layers.3", h)
    return x + h


def video_resblock_torch(p, pre, x, emb, num_frames):
    x = resblock(p, pre, x, emb)
    bt, hh, ww, c = x.shape
    b = bt // num_frames
    x4 = x.reshape(b, num_frames, hh * ww, c)
    emb4 = emb.reshape(b, num_frames, emb.shape[-1])
    mixed = temporal_resblock(p, f"{pre}.time_stack", x4, emb4)
    x4 = _alpha_mix(p, f"{pre}.time_mixer", x4, mixed)
    return x4.reshape(bt, hh, ww, c)


def _cross_attention(p, pre, x, context, num_heads):
    b, l, c = x.shape
    ctx = x if context is None else context
    d = c // num_heads
    q = _lin(p, f"{pre}.to_q", x).view(b, l, num_heads, d).permute(0, 2, 1, 3)
    k = _lin(p, f"{pre}.to_k", ctx).view(b, ctx.shape[1], num_heads,
                                         d).permute(0, 2, 1, 3)
    v = _lin(p, f"{pre}.to_v", ctx).view(b, ctx.shape[1], num_heads,
                                         d).permute(0, 2, 1, 3)
    o = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
    o = o.permute(0, 2, 1, 3).reshape(b, l, c)
    return _lin(p, f"{pre}.to_out.0", o)


def _geglu_ff(p, pre, x):
    h = _lin(p, f"{pre}.net.0.proj", x)
    a, g = h.chunk(2, dim=-1)
    return _lin(p, f"{pre}.net.2", a * F.gelu(g))


def transformer_block(p, pre, x, context, num_heads):
    if f"{pre}.norm_in.weight" in p:
        h = _ln(p, f"{pre}.norm_in", x)
        x = x + _geglu_ff(p, f"{pre}.ff_in", h)
    h = _ln(p, f"{pre}.norm1", x)
    x = x + _cross_attention(p, f"{pre}.attn1", h, None, num_heads)
    h = _ln(p, f"{pre}.norm2", x)
    x = x + _cross_attention(p, f"{pre}.attn2", h, context, num_heads)
    h = _ln(p, f"{pre}.norm3", x)
    return x + _geglu_ff(p, f"{pre}.ff", h)


def spatial_video_transformer_torch(p, pre, x, context, num_heads, depth,
                                    num_frames, use_linear=True):
    b, hh, ww, c = x.shape
    h = _gn(p, f"{pre}.norm", x, eps=1e-6)
    h = h.reshape(b, hh * ww, c)
    h = _lin(p, f"{pre}.proj_in", h)
    bt = b
    bb = bt // num_frames
    s = hh * ww
    t_emb = timestep_embedding(torch.arange(num_frames).float(), c)
    t_emb = _lin(p, f"{pre}.time_pos_embed.0", t_emb)
    t_emb = _lin(p, f"{pre}.time_pos_embed.2", F.silu(t_emb))
    tctx = context.view(bb, num_frames, context.shape[1], -1)[:, 0]
    tctx = tctx[:, None].expand(bb, s, *tctx.shape[1:]).reshape(
        bb * s, context.shape[1], -1)
    for k in range(depth):
        h = transformer_block(p, f"{pre}.transformer_blocks.{k}", h, context,
                              num_heads)
        hm = h + t_emb.repeat(bb, 1)[:, None, :]
        hm = (hm.view(bb, num_frames, s, c).permute(0, 2, 1, 3)
              .reshape(bb * s, num_frames, c))
        hm = transformer_block(p, f"{pre}.time_stack.{k}", hm, tctx,
                               num_heads)
        hm = (hm.view(bb, s, num_frames, c).permute(0, 2, 1, 3)
              .reshape(bt, s, c))
        h = _alpha_mix(p, f"{pre}.time_mixer", h, hm)
    h = _lin(p, f"{pre}.proj_out", h)
    h = h.reshape(b, hh, ww, c)
    return x + h

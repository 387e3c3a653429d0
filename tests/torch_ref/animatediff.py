"""Test-only torch AnimateDiff motion-module reference (transcribed from the
reference C++ math, src/model/diffusion/animatediff.hpp:105
TemporalTransformer; injection points unet.hpp:603-630).  Consumes the same
checkpoint-named param dict as sdtpu.models.animatediff."""
import torch
import torch.nn.functional as F


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _ln(p, pre, x):
    return F.layer_norm(x, (x.shape[-1],), p[f"{pre}.weight"],
                        p[f"{pre}.bias"])


def _temporal_attention(p, pre, x, num_heads):
    n, f, c = x.shape
    pe = p[f"{pre}.pos_encoder.pe"].reshape(-1, c)[:f]
    xp = x + pe[None]
    d = c // num_heads
    q = _lin(p, f"{pre}.to_q", xp).view(n, f, num_heads, d).permute(0, 2, 1, 3)
    k = _lin(p, f"{pre}.to_k", xp).view(n, f, num_heads, d).permute(0, 2, 1, 3)
    v = _lin(p, f"{pre}.to_v", xp).view(n, f, num_heads, d).permute(0, 2, 1, 3)
    o = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
    o = o.permute(0, 2, 1, 3).reshape(n, f, c)
    return _lin(p, f"{pre}.to_out.0", o)


def motion_module_forward_torch(p, pre, x, num_frames, num_heads=8):
    """x: [(B·F), H, W, C] channels-last."""
    bf, hh, ww, c = x.shape
    b = bf // num_frames
    tt = f"{pre}.temporal_transformer"
    residual = x
    h = F.group_norm(x.permute(0, 3, 1, 2), 32, p[f"{tt}.norm.weight"],
                     p[f"{tt}.norm.bias"], eps=1e-6).permute(0, 2, 3, 1)
    h = h.reshape(b, num_frames, hh, ww, c).permute(0, 2, 3, 1, 4).reshape(
        b * hh * ww, num_frames, c)
    h = _lin(p, f"{tt}.proj_in", h)

    blk = f"{tt}.transformer_blocks.0"
    h = h + _temporal_attention(p, f"{blk}.attention_blocks.0",
                                _ln(p, f"{blk}.norms.0", h), num_heads)
    h = h + _temporal_attention(p, f"{blk}.attention_blocks.1",
                                _ln(p, f"{blk}.norms.1", h), num_heads)
    hn = _ln(p, f"{blk}.ff_norm", h)
    ffh = _lin(p, f"{blk}.ff.net.0.proj", hn)
    a, g = ffh.chunk(2, dim=-1)
    h = h + _lin(p, f"{blk}.ff.net.2", a * F.gelu(g))

    h = _lin(p, f"{tt}.proj_out", h)
    h = h.reshape(b, hh, ww, num_frames, c).permute(0, 3, 1, 2, 4).reshape(
        bf, hh, ww, c)
    return h + residual

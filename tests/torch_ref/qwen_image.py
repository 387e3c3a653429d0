"""Test-only torch Qwen-Image reference (transcribed from the reference C++
math, src/model/diffusion/qwen_image.hpp: QwenImageAttention :125, blocks
:300-420, AdaLayerNormContinuous :407, rope rope.hpp gen_qwen_image_ids).
Consumes the same checkpoint-named param dict as sdtpu.models.qwen_image."""
import numpy as np
import torch
import torch.nn.functional as F

from .flux import rope_rot, timestep_embedding


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w, eps=1e-6):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _apply_rope(x, rot):
    b, h, l, d = x.shape
    xf = x.float().reshape(b, h, l, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    o0 = rot[None, None, :, :, 0, 0] * x0 + rot[None, None, :, :, 0, 1] * x1
    o1 = rot[None, None, :, :, 1, 0] * x0 + rot[None, None, :, :, 1, 1] * x1
    return torch.stack([o0, o1], dim=-1).reshape(b, h, l, d)


def _heads(x, nh, hd):
    b, l, _ = x.shape
    return x.view(b, l, nh, hd).permute(0, 2, 1, 3)


def qwen_image_forward_torch(p, x, timesteps, context, cfg):
    b, h, w, c = x.shape
    ps = cfg.patch_size
    hp, wp = h // ps, w // ps
    nh, hd = cfg.num_heads, cfg.head_dim
    inner = nh * hd

    img = (
        x.view(b, hp, ps, wp, ps, c).permute(0, 1, 3, 2, 4, 5)
        .reshape(b, hp * wp, ps * ps * c)
    )
    img = _lin(p, "img_in", img)
    txt = _rms(context, p["txt_norm.weight"])
    txt = _lin(p, "txt_in", txt)
    lt = txt.shape[1]

    t_emb = timestep_embedding(timesteps * 1000.0, 256)
    temb = _lin(p, "time_text_embed.timestep_embedder.linear_1", t_emb)
    temb = _lin(p, "time_text_embed.timestep_embedder.linear_2", F.silu(temb))

    ids = np.zeros((lt + hp * wp, 3), dtype=np.float64)
    txt_start = max(hp, wp) // 2
    ids[:lt] = (txt_start + np.arange(lt))[:, None]
    hi, wi = np.meshgrid(np.arange(hp) - hp // 2, np.arange(wp) - wp // 2, indexing="ij")
    ids[lt:, 1] = hi.reshape(-1)
    ids[lt:, 2] = wi.reshape(-1)
    rot = rope_rot(ids, cfg.axes_dim, cfg.theta)

    for i in range(cfg.num_layers):
        blk = f"transformer_blocks.{i}"
        im = _lin(p, f"{blk}.img_mod.1", F.silu(temb)).chunk(6, dim=-1)
        tm = _lin(p, f"{blk}.txt_mod.1", F.silu(temb)).chunk(6, dim=-1)
        im = [m[:, None] for m in im]
        tm = [m[:, None] for m in tm]

        img_n = F.layer_norm(img, (inner,), eps=1e-6) * (1 + im[1]) + im[0]
        txt_n = F.layer_norm(txt, (inner,), eps=1e-6) * (1 + tm[1]) + tm[0]

        pre = f"{blk}.attn"
        iq = _rms(_heads(_lin(p, f"{pre}.to_q", img_n), nh, hd), p[f"{pre}.norm_q.weight"])
        ik = _rms(_heads(_lin(p, f"{pre}.to_k", img_n), nh, hd), p[f"{pre}.norm_k.weight"])
        iv = _heads(_lin(p, f"{pre}.to_v", img_n), nh, hd)
        tq = _rms(_heads(_lin(p, f"{pre}.add_q_proj", txt_n), nh, hd), p[f"{pre}.norm_added_q.weight"])
        tk = _rms(_heads(_lin(p, f"{pre}.add_k_proj", txt_n), nh, hd), p[f"{pre}.norm_added_k.weight"])
        tv = _heads(_lin(p, f"{pre}.add_v_proj", txt_n), nh, hd)
        q = _apply_rope(torch.cat([tq, iq], dim=2), rot)
        k = _apply_rope(torch.cat([tk, ik], dim=2), rot)
        v = torch.cat([tv, iv], dim=2).float()
        att = F.scaled_dot_product_attention(q, k, v)
        att = att.permute(0, 2, 1, 3).reshape(b, lt + hp * wp, inner)
        txt_att = _lin(p, f"{pre}.to_add_out", att[:, :lt])
        img_att = _lin(p, f"{pre}.to_out.0", att[:, lt:])
        img = img + img_att * im[2]
        txt = txt + txt_att * tm[2]

        img_n = F.layer_norm(img, (inner,), eps=1e-6) * (1 + im[4]) + im[3]
        txt_n = F.layer_norm(txt, (inner,), eps=1e-6) * (1 + tm[4]) + tm[3]
        img = img + _lin(
            p, f"{blk}.img_mlp.net.2",
            F.gelu(_lin(p, f"{blk}.img_mlp.net.0.proj", img_n), approximate="tanh"),
        ) * im[5]
        txt = txt + _lin(
            p, f"{blk}.txt_mlp.net.2",
            F.gelu(_lin(p, f"{blk}.txt_mlp.net.0.proj", txt_n), approximate="tanh"),
        ) * tm[5]

    m = _lin(p, "norm_out.linear", F.silu(temb))
    sc, sh = m.chunk(2, dim=-1)
    img = F.layer_norm(img, (inner,), eps=1e-6) * (1 + sc[:, None]) + sh[:, None]
    img = _lin(p, "proj_out", img)
    out = img.view(b, hp, wp, ps, ps, cfg.out_channels)
    return out.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, cfg.out_channels)

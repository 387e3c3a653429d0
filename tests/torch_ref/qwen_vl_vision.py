"""Test-only torch Qwen2.5-VL / Qwen3-VL vision-tower reference (transcribed
from the reference C++ math, src/model/te/llm.hpp: VisionModel :840, patch
extraction :1423, pos-embed resample :1452, encode_image_common
:1516-1585).  Consumes the same checkpoint-named param dict as
sdtpu.models.qwen_vl_vision."""
import numpy as np
import torch
import torch.nn.functional as F


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w, eps=1e-6):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _extract_patches(img, cfg):
    hh, ww, c = img.shape
    ps, ms = cfg.patch_size, cfg.spatial_merge_size
    gh, gw = hh // ps, ww // ps
    x = img.reshape(gh // ms, ms, ps, gw // ms, ms, ps, c)
    x = x.transpose(0, 3, 1, 4, 6, 2, 5)
    x = x.reshape(-1, c, ps, ps)
    x = np.repeat(x[:, :, None], cfg.temporal_patch_size, axis=2)
    return x.reshape(x.shape[0], -1).astype(np.float32)


def _window_order(gh, gw, cfg):
    ms = cfg.spatial_merge_size
    lh, lw = gh // ms, gw // ms
    win = cfg.window_size // cfg.patch_size // ms
    order = []
    seqlens = []
    for ih in range(0, lh, win):
        for iw in range(0, lw, win):
            wh, ww2 = min(win, lh - ih), min(win, lw - iw)
            for iy in range(wh):
                for ix in range(ww2):
                    order.append((ih + iy) * lw + iw + ix)
            seqlens.append(wh * ww2 * ms * ms)
    return np.asarray(order, dtype=np.int64), seqlens


def _rope_cos_sin(rows, cols, head_dim, theta=10000.0):
    quarter = head_dim // 4
    freq = 1.0 / theta ** (np.arange(quarter) * 2.0 / (head_dim // 2))
    ang = np.concatenate([rows[:, None] * freq[None],
                          cols[:, None] * freq[None]], axis=1)
    return (torch.from_numpy(np.cos(ang).astype(np.float32)),
            torch.from_numpy(np.sin(ang).astype(np.float32)))


def _apply_rope_halves(x, cos, sin):
    half = x.shape[-1] // 2
    x1 = x[..., :half].float()
    x2 = x[..., half:].float()
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return torch.cat([o1, o2], dim=-1)


def _vis_norm(p, name, x, cfg):
    if cfg.arch == "qwen3vl":
        return F.layer_norm(x, (x.shape[-1],), p[f"{name}.weight"],
                            p[f"{name}.bias"], eps=1e-6)
    return _rms(x, p[f"{name}.weight"])


def _vis_block(p, pre, x, cos, sin, mask, cfg):
    b, l, hid = x.shape
    nh = cfg.num_heads
    d = hid // nh
    h = _vis_norm(p, f"{pre}.norm1", x, cfg)
    if f"{pre}.attn.qkv.weight" in p:
        q, k, v = _lin(p, f"{pre}.attn.qkv", h).chunk(3, dim=-1)
    else:
        q = _lin(p, f"{pre}.attn.q_proj", h)
        k = _lin(p, f"{pre}.attn.k_proj", h)
        v = _lin(p, f"{pre}.attn.v_proj", h)
    q = q.view(b, l, nh, d).permute(0, 2, 1, 3)
    k = k.view(b, l, nh, d).permute(0, 2, 1, 3)
    v = v.view(b, l, nh, d).permute(0, 2, 1, 3).float()
    q = _apply_rope_halves(q, cos, sin)
    k = _apply_rope_halves(k, cos, sin)
    o = F.scaled_dot_product_attention(q, k, v, attn_mask=mask)
    o = o.permute(0, 2, 1, 3).reshape(b, l, hid)
    x = x + _lin(p, f"{pre}.attn.proj", o)
    h = _vis_norm(p, f"{pre}.norm2", x, cfg)
    if cfg.arch == "qwen3vl":
        m = F.gelu(_lin(p, f"{pre}.mlp.linear_fc1", h), approximate="tanh")
        m = _lin(p, f"{pre}.mlp.linear_fc2", m)
    else:
        gate = F.silu(_lin(p, f"{pre}.mlp.gate_proj", h))
        up = _lin(p, f"{pre}.mlp.up_proj", h)
        m = _lin(p, f"{pre}.mlp.down_proj", gate * up)
    return x + m


def _pos_embeds_q3(p, gh, gw, cfg):
    side = int(round(cfg.num_position_embeddings ** 0.5))
    ms = cfg.spatial_merge_size
    table = p["visual.pos_embed.weight"].float()
    hs = np.arange(gh)
    h_pos = np.zeros(gh) if gh == 1 else (side - 1) * hs / (gh - 1)
    ws = np.arange(gw)
    w_pos = np.zeros(gw) if gw == 1 else (side - 1) * ws / (gw - 1)
    hf = np.floor(h_pos).astype(np.int64)
    hc = np.minimum(hf + 1, side - 1)
    dh = h_pos - hf
    wf = np.floor(w_pos).astype(np.int64)
    wc = np.minimum(wf + 1, side - 1)
    dw = w_pos - wf
    order_r, order_c = [], []
    for bh in range(gh // ms):
        for bw in range(gw // ms):
            for iy in range(ms):
                for ix in range(ms):
                    order_r.append(bh * ms + iy)
                    order_c.append(bw * ms + ix)
    r = np.asarray(order_r)
    c = np.asarray(order_c)

    def gather(idx):
        return table[torch.from_numpy(idx)]

    w00 = torch.from_numpy(((1 - dh[r]) * (1 - dw[c])).astype(np.float32))
    w01 = torch.from_numpy(((1 - dh[r]) * dw[c]).astype(np.float32))
    w10 = torch.from_numpy((dh[r] * (1 - dw[c])).astype(np.float32))
    w11 = torch.from_numpy((dh[r] * dw[c]).astype(np.float32))
    return (gather(hf[r] * side + wf[c]) * w00[:, None]
            + gather(hf[r] * side + wc[c]) * w01[:, None]
            + gather(hc[r] * side + wf[c]) * w10[:, None]
            + gather(hc[r] * side + wc[c]) * w11[:, None])


def qwen_vision_encode_torch(p, image, cfg):
    hh, ww, _ = image.shape
    ps, ms = cfg.patch_size, cfg.spatial_merge_size
    gh, gw = hh // ps, ww // ps
    patches = _extract_patches(np.asarray(image, dtype=np.float32), cfg)

    if cfg.split_patch_embed:
        w0 = p["visual.patch_embed.proj.0.weight"].reshape(cfg.hidden_size, -1)
        w1 = p["visual.patch_embed.proj.1.weight"].reshape(cfg.hidden_size, -1)
        wp = torch.cat([w0, w1], dim=-1)
    else:
        wp = p["visual.patch_embed.proj.weight"].reshape(cfg.hidden_size, -1)
    x = F.linear(torch.from_numpy(patches), wp,
                 p.get("visual.patch_embed.proj.bias"))[None]

    if cfg.arch == "qwen3vl":
        x = x + _pos_embeds_q3(p, gh, gw, cfg)[None]
        order = np.arange((gh // ms) * (gw // ms), dtype=np.int64)
        mask = None
        fullatt = set(range(cfg.num_layers))
    else:
        order, seqlens = _window_order(gh, gw, cfg)
        x = x.view(1, -1, ms * ms, cfg.hidden_size)[:, torch.from_numpy(order)]
        x = x.reshape(1, -1, cfg.hidden_size)
        n = gh * gw
        maskv = np.full((n, n), -1e9, dtype=np.float32)
        start = 0
        for s in seqlens:
            maskv[start:start + s, start:start + s] = 0.0
            start += s
        mask = torch.from_numpy(maskv)[None, None]
        fullatt = set(cfg.fullatt_block_indexes)

    lw = gw // ms
    br = order // lw
    bc = order % lw
    intra = np.arange(ms * ms)
    rows = (br[:, None] * ms + intra[None] // ms).reshape(-1)
    cols = (bc[:, None] * ms + intra[None] % ms).reshape(-1)
    cos, sin = _rope_cos_sin(rows.astype(np.float64), cols.astype(np.float64),
                             cfg.hidden_size // cfg.num_heads)

    for i in range(cfg.num_layers):
        m = None if i in fullatt else mask
        x = _vis_block(p, f"visual.blocks.{i}", x, cos, sin, m, cfg)

    merged_dim = cfg.hidden_size * ms * ms
    if cfg.arch == "qwen3vl":
        h = F.layer_norm(x, (cfg.hidden_size,), p["visual.merger.norm.weight"],
                         p["visual.merger.norm.bias"], eps=1e-6)
        h = h.reshape(1, -1, merged_dim)
        h = _lin(p, "visual.merger.linear_fc1", h)
        h = F.gelu(h, approximate="none")
        out = _lin(p, "visual.merger.linear_fc2", h)
    else:
        h = _rms(x, p["visual.merger.ln_q.weight"])
        h = h.reshape(1, -1, merged_dim)
        h = F.gelu(_lin(p, "visual.merger.mlp.0", h), approximate="tanh")
        out = _lin(p, "visual.merger.mlp.2", h)
        inverse = np.empty_like(order)
        inverse[order] = np.arange(len(order))
        out = out[:, torch.from_numpy(inverse)]
    return out

"""Test-only torch LLM decoder reference (transcribed from the reference C++
math, src/model/conditioner/llm.hpp: LLMRMSNorm :272, GPTOSSMLP :339, sink
softmax :1140, TextModel::forward_embeds :1283, per-arch configs :113-181).
Consumes the same checkpoint-named param dict as sdtpu.models.llm and
supports every arch variant: neox/normal/imrope RoPE, YaRN, qk-norm, gemma
(1+w) norms + sandwich structure, sliding windows, attention sinks, and the
GPT-OSS clamped-swiglu MoE."""
import math

import numpy as np
import torch
import torch.nn.functional as F


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _rms(x, w, eps):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


def _llm_rms(p, name, x, cfg):
    w = p[name]
    if cfg.norm_add:
        w = w + 1.0
    return _rms(x, w, cfg.rms_norm_eps)


def _neox_rope(x, pos, theta, pos_scale=1.0, style="neox", yarn=False,
               orig_ctx=4096):
    b, h, l, d = x.shape
    half = d // 2
    freq = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) * 2 / d))
    mscale = 1.0
    if yarn and pos_scale > 1.0:
        def corr_dim(n_rot):
            return (d * math.log(orig_ctx / (n_rot * 2 * math.pi))
                    / (2 * math.log(theta)))

        low = max(0.0, math.floor(corr_dim(32.0)))
        high = min(d - 1.0, math.ceil(corr_dim(1.0)))
        pair_idx = np.arange(half, dtype=np.float64)
        ramp = 1.0 - np.clip((pair_idx - low) / max(0.001, high - low), 0.0, 1.0)
        freq_interp = freq / pos_scale
        freq = freq_interp * (1.0 - ramp) + freq * ramp
        mscale = 1.0 + 0.1 * math.log(pos_scale)
        ang = (pos.astype(np.float64)[:, None] * freq[None, :])
    else:
        ang = (pos.astype(np.float64)[:, None] / pos_scale) * freq[None, :]
    cos = torch.from_numpy((np.cos(ang.astype(np.float32).astype(np.float64))
                            ).astype(np.float32)) * mscale
    sin = torch.from_numpy((np.sin(ang.astype(np.float32).astype(np.float64))
                            ).astype(np.float32)) * mscale
    if style == "normal":
        x1 = x[..., 0::2].float()
        x2 = x[..., 1::2].float()
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        return torch.stack([o1, o2], dim=-1).reshape(b, h, l, d)
    x1, x2 = x[..., :half].float(), x[..., half:].float()
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return torch.cat([o1, o2], dim=-1)


def _imrope(x, pos4, theta, sections):
    b, h, l, d = x.shape
    half = d // 2
    freq = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) * 2 / d))
    j = np.arange(half)
    stream = np.full(half, 3, dtype=np.int64)
    for s in range(3):
        stream[(j % 3 == s) & (j < 3 * sections[s])] = s
    pos_sel = pos4[stream]  # [half, L]
    ang = pos_sel.astype(np.float64).T * freq[None, :]
    cos = torch.from_numpy(np.cos(ang.astype(np.float32).astype(np.float64))
                           .astype(np.float32))
    sin = torch.from_numpy(np.sin(ang.astype(np.float32).astype(np.float64))
                           .astype(np.float32))
    x1, x2 = x[..., :half].float(), x[..., half:].float()
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    return torch.cat([o1, o2], dim=-1)


def _swiglu_oai(gate, up, alpha=1.702, limit=7.0):
    g = torch.minimum(gate, torch.tensor(limit))
    u = torch.clamp(up, -limit, limit)
    return (u + 1.0) * (g * torch.sigmoid(alpha * g))


def _moe_mlp(p, pre, x, cfg):
    e, k = cfg.num_experts, cfg.num_experts_per_tok
    logits = _lin(p, f"{pre}.router", x)
    topv, topi = torch.topk(logits, k, dim=-1)
    w = F.softmax(topv.float(), dim=-1)
    dispatch = (F.one_hot(topi, e).float() * w[..., None]).sum(dim=2)

    if f"{pre}.experts.gate_up_proj.weight" in p:
        gu = torch.einsum("blh,eih->blei", x,
                          p[f"{pre}.experts.gate_up_proj.weight"].float())
        gu = gu + p[f"{pre}.experts.gate_up_proj.bias"].float()
        gate, up = gu[..., 0::2], gu[..., 1::2]
    else:
        gate = torch.einsum("blh,eih->blei", x,
                            p[f"{pre}.experts.gate_proj.weight"].float())
        gate = gate + p[f"{pre}.experts.gate_proj.bias"].float()
        up = torch.einsum("blh,eih->blei", x,
                          p[f"{pre}.experts.up_proj.weight"].float())
        up = up + p[f"{pre}.experts.up_proj.bias"].float()
    act = _swiglu_oai(gate, up)
    down = torch.einsum("blei,ehi->bleh", act,
                        p[f"{pre}.experts.down_proj.weight"].float())
    down = down + p[f"{pre}.experts.down_proj.bias"].float()
    return torch.einsum("bleh,ble->blh", down, dispatch)


def _sink_attention(q, k, v, mask, sinks):
    d = q.shape[-1]
    scores = torch.einsum("bhqd,bhkd->bhqk", q.float(), k.float()) / math.sqrt(d)
    if mask is not None:
        scores = scores + mask
    sink = sinks.float()[None, :, None]
    m = torch.maximum(scores.max(dim=-1).values, sink)
    num = torch.exp(scores - m[..., None])
    denom = num.sum(dim=-1) + torch.exp(sink - m)
    attn = num / denom[..., None]
    return torch.einsum("bhqk,bhkd->bhqd", attn, v.float())


def llm_forward_torch(p, input_ids, cfg, attention_mask=None, output_layer=-1,
                      all_hidden_states=False, output_layers=(),
                      input_embeds=None, position_ids=None):
    if input_embeds is not None:
        h = input_embeds.float()
        b, l = h.shape[:2]
    else:
        b, l = input_ids.shape
        h = p["model.embed_tokens.weight"][input_ids].float()
        if cfg.normalize_input or cfg.arch.startswith("gemma"):
            h = h * (cfg.hidden_size ** 0.5)
    states = [h] if all_hidden_states else None

    causal = torch.tril(torch.ones(l, l, dtype=torch.bool))
    mask = torch.where(causal, 0.0, -1e9)[None, None]
    if attention_mask is not None:
        if attention_mask.ndim == 1:
            attention_mask = attention_mask[None]
        if attention_mask.ndim == 2 and attention_mask.shape[-1] == l and \
                attention_mask.shape[0] != l:
            pad = torch.where(attention_mask[:, None, None, :] > 0,
                              torch.tensor(0.0), torch.tensor(-1e9))
            mask = mask + pad
        else:
            bias = attention_mask.float()
            while bias.ndim < 4:
                bias = bias[None]
            mask = bias
    sliding_mask = None
    if cfg.sliding_attention:
        window = max(cfg.sliding_attention)
        i0 = torch.arange(l)[None, :]
        i1 = torch.arange(l)[:, None]
        sl = torch.where(i0 + window <= i1,
                         torch.tensor(float("-inf")), torch.tensor(0.0))
        sliding_mask = mask + sl[None, None]

    pos = np.arange(l)
    thetas = cfg.rope_thetas or (cfg.rope_theta,)
    scales = cfg.rope_scales or (1.0,) * len(thetas)
    picks = tuple(output_layers)
    n_layers = cfg.num_layers if (output_layer == -1 or picks) else output_layer
    picked = []
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    for i in range(n_layers):
        pre = f"model.layers.{i}"
        win = (cfg.sliding_attention[i % len(cfg.sliding_attention)]
               if cfg.sliding_attention else 0)
        rope_idx = 1 if (win > 0 and len(thetas) > 1) else 0
        layer_mask = sliding_mask if (win > 0 and sliding_mask is not None) \
            else mask

        hn = _llm_rms(p, f"{pre}.input_layernorm.weight", h, cfg)
        q = _lin(p, f"{pre}.self_attn.q_proj", hn)
        k = _lin(p, f"{pre}.self_attn.k_proj", hn)
        v = _lin(p, f"{pre}.self_attn.v_proj", hn)
        q = q.view(b, l, nh, hd).permute(0, 2, 1, 3)
        k = k.view(b, l, nkv, hd).permute(0, 2, 1, 3)
        v = v.view(b, l, nkv, hd).permute(0, 2, 1, 3)
        if cfg.qk_norm:
            qw = p[f"{pre}.self_attn.q_norm.weight"]
            kw = p[f"{pre}.self_attn.k_norm.weight"]
            if cfg.norm_add:
                qw, kw = qw + 1.0, kw + 1.0
            q = _rms(q, qw, cfg.rms_norm_eps)
            k = _rms(k, kw, cfg.rms_norm_eps)
        if cfg.rope_style == "imrope":
            pos4 = (position_ids if position_ids is not None
                    else np.stack([pos, pos, pos, np.zeros_like(pos)]))
            q = _imrope(q, pos4, thetas[rope_idx], cfg.mrope_sections)
            k = _imrope(k, pos4, thetas[rope_idx], cfg.mrope_sections)
        else:
            q = _neox_rope(q, pos, thetas[rope_idx], scales[rope_idx],
                           cfg.rope_style, cfg.rope_yarn, cfg.rope_orig_ctx)
            k = _neox_rope(k, pos, thetas[rope_idx], scales[rope_idx],
                           cfg.rope_style, cfg.rope_yarn, cfg.rope_orig_ctx)
        if nkv != nh:
            k = k.repeat_interleave(nh // nkv, dim=1)
            v = v.repeat_interleave(nh // nkv, dim=1)
        if cfg.attention_sinks:
            o = _sink_attention(q, k, v, layer_mask,
                                p[f"{pre}.self_attn.sinks"])
        else:
            o = F.scaled_dot_product_attention(q, k, v.float(),
                                               attn_mask=layer_mask)
        o = o.permute(0, 2, 1, 3).reshape(b, l, nh * hd)
        o = _lin(p, f"{pre}.self_attn.o_proj", o)
        if cfg.gemma_norms:
            o = _llm_rms(p, f"{pre}.post_attention_layernorm.weight", o, cfg)
        h = h + o

        ffn_norm = (f"{pre}.pre_feedforward_layernorm.weight"
                    if cfg.gemma_norms
                    else f"{pre}.post_attention_layernorm.weight")
        hn = _llm_rms(p, ffn_norm, h, cfg)
        if cfg.num_experts > 0:
            m = _moe_mlp(p, f"{pre}.mlp", hn, cfg)
        else:
            gate = _lin(p, f"{pre}.mlp.gate_proj", hn)
            up = _lin(p, f"{pre}.mlp.up_proj", hn)
            act = (F.silu(gate) if cfg.mlp_activation == "silu"
                   else F.gelu(gate, approximate="tanh"))
            m = _lin(p, f"{pre}.mlp.down_proj", act * up)
        if cfg.gemma_norms:
            m = _llm_rms(p, f"{pre}.post_feedforward_layernorm.weight", m, cfg)
        h = h + m
        if all_hidden_states and i + 1 < n_layers:
            states.append(h)
        if (i + 1) in picks:
            picked.append(h)

    if output_layer == -1 or all_hidden_states or (cfg.num_layers + 1) in picks:
        h = _llm_rms(p, "model.norm.weight", h, cfg)
    if all_hidden_states:
        states.append(h)
        return torch.cat(states, dim=-1)
    if picks:
        if (cfg.num_layers + 1) in picks:
            picked.append(h)
        return torch.cat(picked, dim=-1)
    return h

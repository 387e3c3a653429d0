"""Test-only torch HiDream-O1 reference (transcribed from the reference C++
math, src/model/diffusion/hidream_o1.hpp: runner :339, position ids
:123-196, x0->velocity :443-446).  Consumes the same checkpoint-named param
dict as sdtpu.models.hidream_o1; the LLM backbone math lives in
tests/torch_ref/llm.py."""
import math

import torch
import torch.nn.functional as F

from .llm import llm_forward_torch


def _timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float64) / half
    ).to(torch.float32)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def hidream_forward_torch(p, x, timesteps, input_ids, position_ids,
                          attn_bias, cfg):
    b, h, w, c = x.shape
    ps = cfg.patch_size
    pad_h, pad_w = (-h) % ps, (-w) % ps
    x_pad = x
    if pad_h or pad_w:
        x_pad = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    hp, wp = (h + pad_h) // ps, (w + pad_w) // ps
    lc = cfg.llm

    txt = p["language_model.embed_tokens.weight"][input_ids][None]
    txt = txt.expand(b, *txt.shape[1:]).float()
    t_emb = _timestep_embedding(timesteps * 1000.0, 256)
    t_emb = _lin(p, "t_embedder1.mlp.0", t_emb)
    t_emb = _lin(p, "t_embedder1.mlp.2", F.silu(t_emb))
    txt = torch.cat([txt[:, :-1], t_emb[:, None]], dim=1)

    vis = (x_pad.view(b, hp, ps, wp, ps, c).permute(0, 1, 3, 5, 2, 4)
           .reshape(b, hp * wp, c * ps * ps))
    vis = _lin(p, "x_embedder.proj1", vis)
    vis = _lin(p, "x_embedder.proj2", vis)

    embeds = torch.cat([txt, vis], dim=1)
    lm = {"model." + k[len("language_model."):]: v for k, v in p.items()
          if k.startswith("language_model.")}
    hidden = llm_forward_torch(lm, None, lc, attention_mask=attn_bias,
                               input_embeds=embeds, position_ids=position_ids)
    pred = _lin(p, "final_layer2.linear", hidden)
    l_txt = txt.shape[1]
    x0 = pred[:, l_txt:l_txt + hp * wp]
    x0 = (x0.view(b, hp, wp, c, ps, ps).permute(0, 1, 4, 2, 5, 3)
          .reshape(b, hp * ps, wp * ps, c))[:, :h, :w]
    sigma = torch.clamp(1.0 - timesteps.float(),
                        min=1e-6)[:, None, None, None]
    return (x - x0) / sigma

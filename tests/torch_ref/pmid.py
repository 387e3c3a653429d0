"""Test-only torch PhotoMaker v1/v2 reference (transcribed from the
reference C++ math, src/model/adapter/pmid.hpp: FuseBlock :11,
PerceiverAttention :70, QFormerPerceiver :206, FuseModule :249, ID encoder
:397).  Consumes the same checkpoint-named param dict as sdtpu.models.pmid."""
import numpy as np
import torch
import torch.nn.functional as F


def _lin(p, name, x):
    return F.linear(x, p[f"{name}.weight"], p.get(f"{name}.bias"))


def _ln(p, pre, x):
    return F.layer_norm(x, (x.shape[-1],), p[f"{pre}.weight"],
                        p[f"{pre}.bias"])


def _act(name):
    if name == "quick_gelu":
        return lambda x: x * torch.sigmoid(1.702 * x)
    return lambda x: F.gelu(x, approximate="tanh")


def _clip_layer(p, prefix, x, num_heads, act):
    b, l, c = x.shape
    d = c // num_heads
    h = _ln(p, f"{prefix}.layer_norm1", x)

    def proj(name):
        return _lin(p, f"{prefix}.self_attn.{name}", h)

    q = proj("q_proj").view(b, l, num_heads, d).permute(0, 2, 1, 3)
    k = proj("k_proj").view(b, l, num_heads, d).permute(0, 2, 1, 3)
    v = proj("v_proj").view(b, l, num_heads, d).permute(0, 2, 1, 3)
    o = F.scaled_dot_product_attention(q.float(), k.float(), v.float())
    o = o.permute(0, 2, 1, 3).reshape(b, l, c)
    x = x + _lin(p, f"{prefix}.self_attn.out_proj", o)
    h = _ln(p, f"{prefix}.layer_norm2", x)
    h = act(_lin(p, f"{prefix}.mlp.fc1", h))
    return x + _lin(p, f"{prefix}.mlp.fc2", h)


def _vision_features(p, pixels, cfg):
    b = pixels.shape[0]
    vm = "vision_model"
    h = F.conv2d(pixels.permute(0, 3, 1, 2),
                 p[f"{vm}.embeddings.patch_embedding.weight"], None,
                 stride=cfg.patch_size)
    h = h.flatten(2).permute(0, 2, 1)  # [B, grid², C]
    cls = p[f"{vm}.embeddings.class_embedding"].reshape(1, 1, -1).expand(
        b, 1, cfg.hidden_size)
    h = torch.cat([cls, h], dim=1)
    h = h + p[f"{vm}.embeddings.position_embedding.weight"][None, : h.shape[1]]
    h = _ln(p, f"{vm}.pre_layrnorm", h)
    act = _act(cfg.hidden_act)
    for i in range(cfg.num_layers):
        h = _clip_layer(p, f"{vm}.encoder.layers.{i}", h, cfg.num_heads, act)
    pooled = _ln(p, f"{vm}.post_layernorm", h[:, 0])
    return pooled, h


def _fuse_block(p, pre, x, use_residue):
    h = _ln(p, f"{pre}.layernorm", x)
    h = F.gelu(_lin(p, f"{pre}.fc1", h), approximate="tanh")
    h = _lin(p, f"{pre}.fc2", h)
    return x + h if use_residue else h


def photomaker_fuse_torch(p, prompt_embeds, id_embeds, class_mask):
    pos = np.nonzero(np.asarray(class_mask))[0]
    pos_t = torch.from_numpy(pos)
    img_tok = prompt_embeds[0, pos_t]
    stacked = torch.cat([img_tok, id_embeds], dim=-1)
    stacked = _fuse_block(p, "fuse_module.mlp1", stacked, use_residue=False)
    stacked = stacked + img_tok
    stacked = _fuse_block(p, "fuse_module.mlp2", stacked, use_residue=True)
    stacked = _ln(p, "fuse_module.layer_norm", stacked)
    out = prompt_embeds.clone()
    out[0, pos_t] = stacked
    return out


def _perceiver_attention(p, pre, x, latents, heads, dim_head):
    b = x.shape[0]
    xn = _ln(p, f"{pre}.norm1", x)
    ln = _ln(p, f"{pre}.norm2", latents)
    q = _lin(p, f"{pre}.to_q", ln)
    kv = _lin(p, f"{pre}.to_kv", torch.cat([xn, ln], dim=1))
    k, v = kv.chunk(2, dim=-1)

    def hs(t):
        return t.view(b, t.shape[1], heads, dim_head).permute(0, 2, 1, 3)

    o = F.scaled_dot_product_attention(hs(q).float(), hs(k).float(),
                                       hs(v).float())
    o = o.permute(0, 2, 1, 3).reshape(b, latents.shape[1], heads * dim_head)
    return _lin(p, f"{pre}.to_out", o)


def qformer_perceiver_torch(p, id_embeds, last_hidden, cross_dim,
                            num_tokens=2, depth=4):
    pre = "qformer_perceiver"
    n = id_embeds.shape[0]
    x = F.gelu(_lin(p, f"{pre}.token_proj.fc1", id_embeds),
               approximate="tanh")
    x = _lin(p, f"{pre}.token_proj.fc2", x)
    x = x.view(n, num_tokens, cross_dim)
    x = _ln(p, f"{pre}.token_norm", x)
    rp = f"{pre}.perceiver_resampler"
    lat = x
    h = _lin(p, f"{rp}.proj_in", last_hidden)
    dim_head = 128 if cross_dim >= 128 and cross_dim % 128 == 0 else cross_dim // 2
    heads = cross_dim // dim_head
    for i in range(depth):
        lat = lat + _perceiver_attention(p, f"{rp}.layers.{i}.0", h, lat,
                                         heads, dim_head)
        ff = f"{rp}.layers.{i}.1"
        t = _ln(p, f"{ff}.0", lat)
        t = F.gelu(_lin(p, f"{ff}.1.fc1", t), approximate="tanh")
        t = _lin(p, f"{ff}.1.fc2", t)
        lat = lat + t
    lat = _lin(p, f"{rp}.proj_out", lat)
    lat = _ln(p, f"{rp}.norm_out", lat)
    return x + lat


def photomaker_encode_torch(p, id_pixels, prompt_embeds, class_mask,
                            id_embeds=None, vision_cfg=None):
    pooled, last_hidden = _vision_features(p, id_pixels, vision_cfg)
    if "qformer_perceiver.token_norm.weight" in p:
        cross = p["qformer_perceiver.token_norm.weight"].shape[0]
        tokens = qformer_perceiver_torch(p, id_embeds, last_hidden,
                                         cross_dim=cross)
        tokens = tokens.reshape(-1, tokens.shape[-1])
    else:
        e1 = _lin(p, "visual_projection", pooled)
        e2 = _lin(p, "visual_projection_2", pooled)
        tokens = torch.cat([e1, e2], dim=-1)
    return photomaker_fuse_torch(p, prompt_embeds, tokens, class_mask)

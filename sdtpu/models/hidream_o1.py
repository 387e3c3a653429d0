"""HiDream-O1 — unified LLM-as-DiT image generator.

Reference analog: HiDreamO1::HiDreamO1Runner (src/model/diffusion/
hidream_o1.hpp:339).  The Qwen3-VL-8B language model IS the diffusion
backbone: prompt token embeddings (last token replaced by the timestep
embedding) are concatenated with 32x32 pixel-patch tokens (bottleneck patch
embed) and run through the full LLM with IMROPE 4-stream position ids and a
text-causal / generation-bidirectional attention mask; a final linear maps
hidden states back to pixel patches.  The model predicts x0 and converts to
velocity internally: v = (x - x0) / max(1e-6, 1 - t) with the timestep input
t = 1 - sigma (hidream_o1.hpp:443-446 + stable-diffusion.cpp:2333).

Checkpoint naming (prefix "model."): ``language_model.layers.N.*``,
``x_embedder.{proj1,proj2}``, ``t_embedder1.mlp.{0,2}``,
``final_layer2.linear``.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from sdtpu.models.llm import LLMConfig, QWEN3_VL_8B_CONFIG, llm_forward
from sdtpu.ops import linear, timestep_embedding
from sdtpu.ops.basic import silu

PATCH_SIZE = 32
TIMESTEP_TOKEN_NUM = 1
IMAGE_TOKEN_ID = 151655
VISION_START_TOKEN_ID = 151652


@dataclasses.dataclass(frozen=True)
class HiDreamO1Config:
    llm: LLMConfig = QWEN3_VL_8B_CONFIG
    patch_size: int = PATCH_SIZE
    in_channels: int = 3


HIDREAM_O1_CONFIG = HiDreamO1Config()


def detect_hidream_config(names, shapes) -> HiDreamO1Config:
    from sdtpu.models.llm import detect_llm_config

    # checkpoint names are "language_model.layers.N..." (TextModel blocks
    # have no inner "model." — llm.hpp:1254); remap to the HF-style names
    # detect_llm_config expects
    lm = {"model." + n[len("language_model."):]: shapes[n] for n in names
          if n.startswith("language_model.")}
    llm_cfg = detect_llm_config(lm.keys(), lm, arch="qwen3_vl")
    return HiDreamO1Config(llm=llm_cfg)


def build_position_ids(input_ids: Sequence[int],
                       image_grids: Sequence[Tuple[int, int, int]],
                       skip_vision_start: Sequence[int]) -> np.ndarray:
    """[4, L] (t, h, w, extra) IMROPE streams: text counts all three
    together; each image grid spans (t, h, w) from a base index — 4096 for
    the first skip-vision-start grid (reference build_position_ids,
    hidream_o1.hpp:123-196)."""
    out_t: List[int] = []
    out_h: List[int] = []
    out_w: List[int] = []
    image_index = 0
    st = 0
    fix_point = 4096
    n = len(input_ids)
    while st < n:
        ed = st
        while ed < n and input_ids[ed] != IMAGE_TOKEN_ID:
            ed += 1
        if ed >= n:
            st_idx = (max(out_t) + 1) if out_t else 0
            for i in range(n - st):
                out_t.append(st_idx + i)
                out_h.append(st_idx + i)
                out_w.append(st_idx + i)
            break
        text_len = max(0, ed - st - skip_vision_start[image_index])
        st_idx = (max(out_t) + 1) if out_t else 0
        for i in range(text_len):
            out_t.append(st_idx + i)
            out_h.append(st_idx + i)
            out_w.append(st_idx + i)
        gt, gh, gw = image_grids[image_index]
        if skip_vision_start[image_index]:
            if fix_point > 0:
                base, fix_point = fix_point, 0
            else:
                base = st_idx
        else:
            base = text_len + st_idx
        for ti in range(gt):
            for hi in range(gh):
                for wi in range(gw):
                    out_t.append(base + ti)
                    out_h.append(base + hi)
                    out_w.append(base + wi)
        st = ed + gt * gh * gw
        image_index += 1
    assert len(out_t) == n
    return np.stack([np.asarray(out_t, dtype=np.int32),
                     np.asarray(out_h, dtype=np.int32),
                     np.asarray(out_w, dtype=np.int32),
                     np.zeros(n, dtype=np.int32)])


def build_hidream_state(input_ids: Sequence[int], lh: int, lw: int):
    """Host-side per-prompt constants for the t2i path (reference
    HiDreamO1Conditioner, hidream_o1.hpp:534-570): ids padded with
    vision_start + image tokens for the target grid, position ids, and the
    text-causal / gen-bidirectional additive mask."""
    input_ids = list(input_ids)
    target_len = lh * lw
    ids_pad = input_ids + [VISION_START_TOKEN_ID] + \
        [IMAGE_TOKEN_ID] * (target_len - 1)
    pos = build_position_ids(ids_pad, [(1, lh, lw)], [1])
    total = len(ids_pad)
    txt_len = len(input_ids)
    token_types = np.zeros(total, dtype=np.int32)
    token_types[txt_len - TIMESTEP_TOKEN_NUM:] = 1
    # query is_gen → attends everywhere; text queries are causal
    is_gen = token_types > 0
    qi = np.arange(total)[:, None]
    ki = np.arange(total)[None, :]
    mask = np.where((~is_gen[:, None]) & (ki > qi), -1e9, 0.0).astype(np.float32)
    return {
        "input_ids": np.asarray(input_ids, dtype=np.int32),
        "position_ids": pos,
        "attn_bias": mask,
        "txt_len": txt_len,
    }


def hidream_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    input_ids: jnp.ndarray,
    position_ids: jnp.ndarray,
    attn_bias: jnp.ndarray,
    cfg: HiDreamO1Config = HIDREAM_O1_CONFIG,
) -> jnp.ndarray:
    """x: [B,H,W,3] noisy pixels; timesteps: [B] model-t = 1 - sigma;
    input_ids: [L_txt] prompt tokens; position_ids: [4, L_total];
    attn_bias: [L_total, L_total].  Returns velocity [B,H,W,3]."""
    b, h, w, c = x.shape
    ps = cfg.patch_size
    pad_h, pad_w = (-h) % ps, (-w) % ps
    x_pad = x
    if pad_h or pad_w:
        x_pad = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = (h + pad_h) // ps, (w + pad_w) // ps
    lc = cfg.llm

    txt = p["language_model.embed_tokens.weight"][input_ids][None]
    txt = jnp.broadcast_to(txt, (b,) + txt.shape[1:]).astype(x.dtype)
    t_emb = timestep_embedding(timesteps * 1000.0, 256).astype(x.dtype)
    t_emb = linear(t_emb, p["t_embedder1.mlp.0.weight"], p["t_embedder1.mlp.0.bias"])
    t_emb = linear(silu(t_emb), p["t_embedder1.mlp.2.weight"],
                   p["t_embedder1.mlp.2.bias"])
    # last prompt token (<|tms_token|>) replaced by the timestep embedding
    txt = jnp.concatenate([txt[:, :-1], t_emb[:, None]], axis=1)

    # 32x32 patches, feature (c, py, px) (DiT::pad_and_patchify patch_last)
    vis = (x_pad.reshape(b, hp, ps, wp, ps, c).transpose(0, 1, 3, 5, 2, 4)
           .reshape(b, hp * wp, c * ps * ps))
    vis = linear(vis, p["x_embedder.proj1.weight"])
    vis = linear(vis, p["x_embedder.proj2.weight"], p["x_embedder.proj2.bias"])

    embeds = jnp.concatenate([txt, vis], axis=1)
    lm = {"model." + k[len("language_model."):]: v for k, v in p.items()
          if k.startswith("language_model.")}
    hidden = llm_forward(lm, None, lc, attention_mask=attn_bias,
                         input_embeds=embeds, position_ids=position_ids)
    pred = linear(hidden, p["final_layer2.linear.weight"],
                  p["final_layer2.linear.bias"])
    l_txt = txt.shape[1]
    x0 = pred[:, l_txt:l_txt + hp * wp]
    x0 = (x0.reshape(b, hp, wp, c, ps, ps).transpose(0, 1, 4, 2, 5, 3)
          .reshape(b, hp * ps, wp * ps, c))[:, :h, :w]
    sigma = jnp.maximum(1e-6, 1.0 - timesteps)[:, None, None, None]
    return (x - x0) / sigma


def init_hidream_params(cfg: HiDreamO1Config = HIDREAM_O1_CONFIG,
                        seed: int = 0, dtype=jnp.float32) -> dict:
    from sdtpu.models.llm import init_llm_params

    g = np.random.default_rng(seed)
    lm = init_llm_params(cfg.llm, seed + 1, dtype=dtype)
    p = {"language_model." + k[len("model."):]: v for k, v in lm.items()}

    def wt(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    hid = cfg.llm.hidden_size
    patch_dim = cfg.patch_size**2 * cfg.in_channels
    p["x_embedder.proj1.weight"] = wt(hid // 4, patch_dim)
    p["x_embedder.proj2.weight"] = wt(hid, hid // 4)
    p["x_embedder.proj2.bias"] = jnp.zeros((hid,), dtype=dtype)
    p["t_embedder1.mlp.0.weight"] = wt(hid, 256)
    p["t_embedder1.mlp.0.bias"] = jnp.zeros((hid,), dtype=dtype)
    p["t_embedder1.mlp.2.weight"] = wt(hid, hid)
    p["t_embedder1.mlp.2.bias"] = jnp.zeros((hid,), dtype=dtype)
    p["final_layer2.linear.weight"] = wt(patch_dim, hid)
    p["final_layer2.linear.bias"] = jnp.zeros((patch_dim,), dtype=dtype)
    return p

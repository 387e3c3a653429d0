"""LTX-2 audio-video DiT (LTXAV): a joint transformer denoising video tokens
and audio (mel-latent) tokens, with bidirectional audio<->video cross
attention in every block, AdaLN-single timestep modulation (optionally
per-video-token), optional learned-register "connector" refiners for the text
context, and LTX's linear-in-coordinate RoPE.

Reference analog: LTXV::LTXAVModelBlock / LTXAVRunner
(src/model/diffusion/ltxv.hpp:1309,1676).  Checkpoint names (internal scheme):
``patchify_proj``, ``audio_patchify_proj``, ``adaln_single.{emb.
timestep_embedder.linear_{1,2}, linear}``, ``av_ca_*_adaln_single``,
``transformer_blocks.N.{attn1,audio_attn1,attn2,audio_attn2,
audio_to_video_attn,video_to_audio_attn}.{to_q,to_k,to_v,q_norm,k_norm,
to_out.0,to_gate_logits}``, ``transformer_blocks.N.{ff,audio_ff}.net.{0.proj,
2}``, ``transformer_blocks.N.{scale_shift_table,audio_scale_shift_table,
scale_shift_table_a2v_ca_{audio,video}}``, ``{video,audio}_embeddings_
connector.{learnable_registers, transformer_1d_blocks.K...}``, ``norm_out``,
``proj_out``, ``audio_norm_out``, ``audio_proj_out``.

Token layouts (JAX-native, batch-major):
  video latent  [B, T, H, W, C]  -> tokens [B, T*H*W, C], (t, h, w) order
  audio latent  [B, Ta, Ca=8, F=16] -> tokens [B, Ta, Ca*F=128]

RoPE here is NOT the 1/theta^k kind: per-token angles are
``freq_i * (coord/max_pos * 2 - 1)`` with freqs log-spaced on [pi/2,
theta*pi/2] (reference generate_freq_grid, ltxv.hpp:270), laid out
axis-interleaved over the *full* hidden width and then split across heads.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.ops import attention, layer_norm, linear, rms_norm, timestep_embedding
from sdtpu.ops.basic import gelu_tanh, silu


@dataclasses.dataclass(frozen=True)
class LTXAVConfig:
    """Mirrors LTXV::LTXAVConfig (ltxv.hpp:76)."""

    in_channels: int = 128
    out_channels: int = 128
    hidden_size: int = 3840
    cross_attention_dim: int = 4096
    caption_channels: int = 3840
    num_heads: int = 30
    head_dim: int = 128
    num_layers: int = 28
    rope_theta: float = 10000.0
    max_pos: Tuple[int, int, int] = (20, 2048, 2048)
    vae_scale_factors: Tuple[int, int, int] = (8, 32, 32)  # (t, h, w)
    causal_temporal_positioning: bool = True
    timestep_scale: float = 1000.0

    audio_in_channels: int = 128
    audio_out_channels: int = 128
    audio_hidden_size: int = 2048
    audio_cross_attention_dim: int = 2048
    audio_num_heads: int = 32
    audio_head_dim: int = 64
    audio_max_pos: int = 20
    av_ca_timestep_scale: float = 1000.0
    num_audio_channels: int = 8
    audio_frequency_bins: int = 16

    use_connector: bool = False
    connector_hidden_size: int = 3840
    connector_num_heads: int = 30
    connector_head_dim: int = 128
    connector_num_layers: int = 2
    connector_num_registers: int = 128
    connector_rope_interleaved: bool = False
    connector_gated: bool = False

    use_audio_connector: bool = False
    audio_connector_hidden_size: int = 2048
    audio_connector_num_heads: int = 32
    audio_connector_head_dim: int = 64
    audio_connector_num_layers: int = 2
    audio_connector_num_registers: int = 128
    audio_connector_rope_interleaved: bool = False
    audio_connector_gated: bool = False

    video_rope_interleaved: bool = False
    use_middle_indices_grid: bool = True
    cross_attention_adaln: bool = False

    use_caption_projection: bool = True
    use_audio_caption_projection: bool = True
    caption_proj_before_connector: bool = True
    caption_projection_first_linear: bool = False

    self_attention_gated: bool = False
    cross_attention_gated: bool = False


LTXAV_CONFIG = LTXAVConfig()


def _infer_attention_layout(hidden_size: int, preferred_heads: int = -1):
    """Reference LTXAVConfig::infer_attention_layout (ltxv.hpp:132)."""
    if preferred_heads > 0 and hidden_size % preferred_heads == 0:
        return preferred_heads, hidden_size // preferred_heads
    for head_dim in (128, 96, 80, 64, 48, 40, 32):
        if hidden_size % head_dim == 0:
            heads = hidden_size // head_dim
            if 8 <= heads <= 64:
                return heads, head_dim
    return 32, hidden_size // 32


def detect_ltxav_config(names, shapes) -> LTXAVConfig:
    """Config from checkpoint tensor names/shapes (torch-order shapes).

    Reference: LTXAVConfig::detect_from_weights (ltxv.hpp:159).
    """
    names = set(names)
    kw: Dict = {}

    def shape(n):
        return shapes.get(n)

    proj = shape("patchify_proj.weight")
    if proj:
        kw["hidden_size"], kw["in_channels"] = proj
        gate_b = shape("transformer_blocks.0.attn1.to_gate_logits.bias")
        heads, hd = _infer_attention_layout(proj[0], gate_b[0] if gate_b else 32)
        kw["num_heads"], kw["head_dim"] = heads, hd
    aproj = shape("audio_patchify_proj.weight")
    if aproj:
        kw["audio_hidden_size"], kw["audio_in_channels"] = aproj
        kw["audio_out_channels"] = aproj[1]
        gate_b = shape("transformer_blocks.0.audio_attn1.to_gate_logits.bias")
        heads, hd = _infer_attention_layout(aproj[0], gate_b[0] if gate_b else 32)
        kw["audio_num_heads"], kw["audio_head_dim"] = heads, hd
    out = shape("proj_out.weight")
    if out:
        kw["out_channels"] = out[0]
    aout = shape("audio_proj_out.weight")
    if aout:
        kw["audio_out_channels"] = aout[0]
    attn2_k = shape("transformer_blocks.0.attn2.to_k.weight")
    if attn2_k:
        kw["cross_attention_dim"] = attn2_k[1]
    a_attn2_k = shape("transformer_blocks.0.audio_attn2.to_k.weight")
    if a_attn2_k:
        kw["audio_cross_attention_dim"] = a_attn2_k[1]
    if "transformer_blocks.0.prompt_scale_shift_table" in names:
        kw["cross_attention_adaln"] = True
    if ("transformer_blocks.0.attn1.to_gate_logits.weight" in names
            or "transformer_blocks.0.audio_attn1.to_gate_logits.weight" in names):
        kw["self_attention_gated"] = True
    if ("transformer_blocks.0.attn2.to_gate_logits.weight" in names
            or "transformer_blocks.0.audio_attn2.to_gate_logits.weight" in names):
        kw["cross_attention_gated"] = True
    if ("caption_projection.linear_2.weight" in names):
        kw["caption_proj_before_connector"] = False
    elif ("caption_projection.linear_1.weight" in names):
        kw["caption_projection_first_linear"] = True
    else:
        kw["use_caption_projection"] = False
    if "audio_caption_projection.linear_1.weight" not in names and \
            "audio_caption_projection.linear_2.weight" not in names:
        kw["use_audio_caption_projection"] = False

    depth = 0
    for n in names:
        if n.startswith("transformer_blocks."):
            depth = max(depth, int(n.split(".")[1]) + 1)
    if depth:
        kw["num_layers"] = depth

    for side, pre in (("", "video_embeddings_connector"),
                      ("audio_", "audio_embeddings_connector")):
        cq = shape(f"{pre}.transformer_1d_blocks.0.attn1.to_q.weight")
        if not cq:
            continue
        kw[f"use_{side}connector"] = True
        kw[f"{side}connector_hidden_size"] = cq[0]
        gate_b = shape(f"{pre}.transformer_1d_blocks.0.attn1.to_gate_logits.bias")
        heads, hd = _infer_attention_layout(cq[0], gate_b[0] if gate_b else 32)
        kw[f"{side}connector_num_heads"] = heads
        kw[f"{side}connector_head_dim"] = hd
        cl = 0
        for n in names:
            if n.startswith(f"{pre}.transformer_1d_blocks."):
                cl = max(cl, int(n.split(".")[2]) + 1)
        kw[f"{side}connector_num_layers"] = cl or 2
        regs = shape(f"{pre}.learnable_registers")
        if regs:
            kw[f"{side}connector_num_registers"] = regs[0]
        if f"{pre}.transformer_1d_blocks.0.attn1.to_gate_logits.weight" in names:
            kw[f"{side}connector_gated"] = True
    return dataclasses.replace(LTXAV_CONFIG, **kw)


# ---------------------------------------------------------------------------
# RoPE (host-side numpy; static per resolution)
# ---------------------------------------------------------------------------


def _freq_grid(theta: float, positional_dims: int, dim: int) -> np.ndarray:
    """Log-spaced [pi/2, theta*pi/2] frequencies (generate_freq_grid,
    ltxv.hpp:270). Computed in float64, matching the double-precision path."""
    n = dim // (2 * positional_dims)
    if n <= 0:
        return np.zeros((0,), dtype=np.float64)
    if n == 1:
        return np.asarray([math.pi / 2], dtype=np.float64)
    ratio = np.arange(n, dtype=np.float64) / (n - 1)
    return np.exp(math.log(theta) * ratio) * (math.pi / 2)


def _split_heads_cos_sin(angles: np.ndarray, num_heads: int):
    """angles [L, half_dim] -> (cos, sin) [L, heads, half_dim//heads]."""
    tokens, half = angles.shape
    assert half % num_heads == 0
    per = half // num_heads
    a = angles.reshape(tokens, num_heads, per)
    return np.cos(a).astype(np.float32), np.sin(a).astype(np.float32)


def _angles_from_coords3(coords: np.ndarray, dim: int, theta: float,
                         max_pos) -> np.ndarray:
    """coords [L, 3] (t, h, w in pixel/second units) -> angles [L, dim//2]
    laid out [zero-pad..., (t,h,w) interleaved per frequency]."""
    freqs = _freq_grid(theta, 3, dim)
    half = dim // 2
    tokens = coords.shape[0]
    norm = coords / np.asarray(max_pos, dtype=np.float64)[None, :]
    scaled = norm * 2.0 - 1.0  # [L, 3]
    # [L, n_freq, 3] -> flatten freq-major, axis-minor
    core = freqs[None, :, None] * scaled[:, None, :]
    out = np.zeros((tokens, half), dtype=np.float64)
    pad = half - freqs.size * 3
    out[:, pad:] = core.reshape(tokens, -1)
    return out


def _angles_from_coords1(coords: np.ndarray, dim: int, theta: float,
                         max_pos: float) -> np.ndarray:
    freqs = _freq_grid(theta, 1, dim)
    half = dim // 2
    tokens = coords.shape[0]
    scaled = coords.astype(np.float64) / max_pos * 2.0 - 1.0
    core = freqs[None, :] * scaled[:, None]
    out = np.zeros((tokens, half), dtype=np.float64)
    out[:, half - freqs.size:] = core
    return out


def _temporal_coord(t: np.ndarray, scale_t: int, frame_rate: float,
                    causal: bool) -> np.ndarray:
    pix = t.astype(np.float64) * scale_t
    if causal:
        pix = np.maximum(0.0, pix + 1.0 - scale_t)
    return pix / frame_rate


def video_rope(width: int, height: int, frames: int, cfg: LTXAVConfig,
               frame_rate: float = 24.0):
    """(cos, sin) [L, heads, head_dim//2] for the (t, h, w) token grid
    (build_video_rope_matrix, ltxv.hpp:365)."""
    t = np.arange(frames)
    ts = _temporal_coord(t, cfg.vae_scale_factors[0], frame_rate,
                         cfg.causal_temporal_positioning)
    if cfg.use_middle_indices_grid:
        te = _temporal_coord(t + 1, cfg.vae_scale_factors[0], frame_rate,
                             cfg.causal_temporal_positioning)
        ts = 0.5 * (ts + te)
    hs = np.arange(height, dtype=np.float64) * cfg.vae_scale_factors[1]
    ws = np.arange(width, dtype=np.float64) * cfg.vae_scale_factors[2]
    if cfg.use_middle_indices_grid:
        hs = hs + 0.5 * cfg.vae_scale_factors[1]
        ws = ws + 0.5 * cfg.vae_scale_factors[2]
    tt, hh, ww = np.meshgrid(ts, hs, ws, indexing="ij")
    coords = np.stack([tt.ravel(), hh.ravel(), ww.ravel()], axis=-1)
    ang = _angles_from_coords3(coords, cfg.hidden_size, cfg.rope_theta,
                               cfg.max_pos)
    return _split_heads_cos_sin(ang, cfg.num_heads)


def video_rope_from_positions(positions: np.ndarray, cfg: LTXAVConfig):
    """positions [2, 3, L] (start/end per axis); middle-grid averaged
    (build_video_rope_matrix_from_positions, ltxv.hpp:442)."""
    start, end = positions[0], positions[1]  # [3, L]
    coords = (0.5 * (start + end) if cfg.use_middle_indices_grid else start).T
    ang = _angles_from_coords3(coords, cfg.hidden_size, cfg.rope_theta,
                               cfg.max_pos)
    return _split_heads_cos_sin(ang, cfg.num_heads)


def _audio_latent_start_sec(idx: np.ndarray, down: int = 4, hop: int = 160,
                            sr: int = 16000, causal: bool = True) -> np.ndarray:
    mel = idx.astype(np.float64) * down
    if causal:
        mel = np.maximum(0.0, mel + 1.0 - down)
    return mel * hop / sr


def audio_rope(seq_len: int, dim: int, heads: int, theta: float,
               max_pos: float, middle: bool):
    """(cos, sin) for audio tokens (build_audio_rope_matrix, ltxv.hpp:1077)."""
    t = np.arange(seq_len)
    c = _audio_latent_start_sec(t)
    if middle:
        c = 0.5 * (c + _audio_latent_start_sec(t + 1))
    ang = _angles_from_coords1(c, dim, theta, max_pos)
    return _split_heads_cos_sin(ang, heads)


def video_temporal_rope(width: int, height: int, frames: int, dim: int,
                        heads: int, frame_rate: float, theta: float,
                        max_pos: float, scale_t: int, causal: bool):
    """Temporal-only rope for a<->v cross attention (queries/keys positioned in
    seconds; build_video_temporal_rope_matrix, ltxv.hpp:1012).  Always uses
    the middle-indices grid, matching the call sites (ltxv.hpp:1840,1852)."""
    t = np.arange(frames)
    cs = _temporal_coord(t, scale_t, frame_rate, causal)
    ce = _temporal_coord(t + 1, scale_t, frame_rate, causal)
    c = np.repeat(0.5 * (cs + ce), height * width)
    ang = _angles_from_coords1(c, dim, theta, max_pos)
    return _split_heads_cos_sin(ang, heads)


def video_temporal_rope_from_positions(positions: np.ndarray, dim: int,
                                       heads: int, theta: float,
                                       max_pos: float):
    c = 0.5 * (positions[0, 0] + positions[1, 0])
    ang = _angles_from_coords1(c, dim, theta, max_pos)
    return _split_heads_cos_sin(ang, heads)


def connector_rope(seq_len: int, dim: int, heads: int,
                   positional_scale: float = 4096.0, theta: float = 10000.0):
    """1-D rope over connector tokens (build_1d_rope_matrix, ltxv.hpp:492)."""
    ang = _angles_from_coords1(np.arange(seq_len, dtype=np.float64), dim,
                               theta, positional_scale)
    return _split_heads_cos_sin(ang, heads)


def _apply_rope(x: jnp.ndarray, cos, sin, heads: int, interleaved: bool):
    """x: [B, L, inner] -> rope-rotated, same shape.  cos/sin [L, H, Dh/2].
    Pairing: interleaved -> (2i, 2i+1); else split halves (i, i+Dh/2)
    (Rope::apply_rope, src/model/common/rope.hpp:966)."""
    b, l, inner = x.shape
    dh = inner // heads
    xf = x.astype(jnp.float32).reshape(b, l, heads, dh)
    cos = jnp.asarray(cos)[None]
    sin = jnp.asarray(sin)[None]
    if interleaved:
        x0 = xf[..., 0::2]
        x1 = xf[..., 1::2]
        o0 = x0 * cos - x1 * sin
        o1 = x0 * sin + x1 * cos
        out = jnp.stack([o0, o1], axis=-1).reshape(b, l, heads, dh)
    else:
        x0 = xf[..., : dh // 2]
        x1 = xf[..., dh // 2:]
        o0 = x0 * cos - x1 * sin
        o1 = x0 * sin + x1 * cos
        out = jnp.concatenate([o0, o1], axis=-1)
    return out.reshape(b, l, inner).astype(x.dtype)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _ltx_attention(p, pre: str, x: jnp.ndarray, context: Optional[jnp.ndarray],
                   heads: int, head_dim: int,
                   pe_q=None, pe_k=None, mask=None,
                   interleaved: bool = False) -> jnp.ndarray:
    """LTXV::CrossAttention (ltxv.hpp:636): full-width qk RMSNorm, optional
    rope, optional per-head sigmoid gate (x2)."""
    ctx = x if context is None else context
    b, l, _ = x.shape
    q = linear(x, p[f"{pre}.to_q.weight"], p.get(f"{pre}.to_q.bias"))
    k = linear(ctx, p[f"{pre}.to_k.weight"], p.get(f"{pre}.to_k.bias"))
    v = linear(ctx, p[f"{pre}.to_v.weight"], p.get(f"{pre}.to_v.bias"))
    q = rms_norm(q, p[f"{pre}.q_norm.weight"], eps=1e-5)
    k = rms_norm(k, p[f"{pre}.k_norm.weight"], eps=1e-5)
    if pe_q is not None:
        q = _apply_rope(q, pe_q[0], pe_q[1], heads, interleaved)
        pk = pe_k if pe_k is not None else pe_q
        k = _apply_rope(k, pk[0], pk[1], heads, interleaved)
    lk = k.shape[1]
    qh = q.reshape(b, l, heads, head_dim).transpose(0, 2, 1, 3)
    kh = k.reshape(b, lk, heads, head_dim).transpose(0, 2, 1, 3)
    vh = v.reshape(b, lk, heads, head_dim).transpose(0, 2, 1, 3)
    o = attention(qh, kh, vh, mask=mask)
    if f"{pre}.to_gate_logits.weight" in p:
        gl = linear(x, p[f"{pre}.to_gate_logits.weight"],
                    p.get(f"{pre}.to_gate_logits.bias"))  # [B, L, H]
        gate = 2.0 * jax.nn.sigmoid(gl.astype(jnp.float32))
        o = o * gate.transpose(0, 2, 1)[..., None].astype(o.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(b, l, heads * head_dim)
    return linear(o, p[f"{pre}.to_out.0.weight"], p.get(f"{pre}.to_out.0.bias"))


def _ff(p, pre: str, x: jnp.ndarray) -> jnp.ndarray:
    """FeedForward GELU variant (src/model/common/block.hpp:261)."""
    h = linear(x, p[f"{pre}.net.0.proj.weight"], p.get(f"{pre}.net.0.proj.bias"))
    h = gelu_tanh(h)
    return linear(h, p[f"{pre}.net.2.weight"], p.get(f"{pre}.net.2.bias"))


def _timestep_embedder(p, pre: str, t: jnp.ndarray, dtype) -> jnp.ndarray:
    """TimestepEmbedder (ltxv.hpp:548): sinusoid(256) -> linear, silu, linear.
    t: [N] -> [N, dim]."""
    emb = timestep_embedding(t, 256).astype(dtype)
    h = linear(emb, p[f"{pre}.linear_1.weight"], p[f"{pre}.linear_1.bias"])
    return linear(silu(h), p[f"{pre}.linear_2.weight"], p[f"{pre}.linear_2.bias"])


def _adaln_single(p, pre: str, t: jnp.ndarray, dtype):
    """AdaLayerNormSingle (ltxv.hpp:570).  t: [B, Lm] -> (mods [B, Lm, C*dim],
    embedded [B, Lm, dim])."""
    b, lm = t.shape
    emb = _timestep_embedder(p, f"{pre}.emb.timestep_embedder",
                             t.reshape(-1), dtype).reshape(b, lm, -1)
    out = linear(silu(emb), p[f"{pre}.linear.weight"], p[f"{pre}.linear.bias"])
    return out, emb


def _ada_values(p_table: jnp.ndarray, t_mod: jnp.ndarray, dim: int, coeff: int):
    """table [coeff, dim] + per-(batch, token) modulation [B, Lm, coeff*dim]
    -> [B, Lm, coeff, dim] (get_ada_values, ltxv.hpp:1147)."""
    b, lm, _ = t_mod.shape
    return t_mod.reshape(b, lm, coeff, dim) + p_table[None, None].astype(t_mod.dtype)


def _modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray):
    """x [B, L, dim]; shift/scale [B, Lm, dim], Lm in {1, L}."""
    return x * (1.0 + scale) + shift


def _connector(p, pre: str, ctx: jnp.ndarray, hidden: int, heads: int,
               head_dim: int, num_layers: int, num_registers: int,
               interleaved: bool) -> jnp.ndarray:
    """Embeddings1DConnector (ltxv.hpp:864): pad with cycled learnable
    registers to ceil(max(1024, L)/R)*R tokens, run 1-D self-attn blocks with
    positional-scale-4096 rope, final plain RMS norm."""
    b, seq, _ = ctx.shape
    if num_registers > 0 and f"{pre}.learnable_registers" in p:
        target = max(1024, seq)
        dup = (target + num_registers - 1) // num_registers
        keep = dup * num_registers - seq
        if keep > 0:
            regs = p[f"{pre}.learnable_registers"].astype(ctx.dtype)
            tiled = jnp.tile(regs, (dup, 1))[seq:dup * num_registers]
            ctx = jnp.concatenate(
                [ctx, jnp.broadcast_to(tiled[None], (b,) + tiled.shape)], axis=1)
    full_len = ctx.shape[1]
    pe = connector_rope(full_len, hidden, heads)
    for i in range(num_layers):
        bp = f"{pre}.transformer_1d_blocks.{i}"
        h = rms_norm(ctx, eps=1e-6)
        h = _ltx_attention(p, f"{bp}.attn1", h, None, heads, head_dim,
                           pe_q=pe, interleaved=interleaved)
        ctx = ctx + h
        h = rms_norm(ctx, eps=1e-6)
        ctx = ctx + _ff(p, f"{bp}.ff", h)
    return rms_norm(ctx, eps=1e-6)


def _preprocess_contexts(p, context: jnp.ndarray, cfg: LTXAVConfig,
                         with_audio: bool):
    """Split / project / connector-refine the text context
    (preprocess_contexts, ltxv.hpp:1439)."""
    d = context.shape[-1]
    lc = context.shape[1]
    dual = cfg.cross_attention_dim + cfg.audio_cross_attention_dim
    if d == dual and lc >= 1024:  # fully processed
        v_ctx = context[..., : cfg.cross_attention_dim]
        a_ctx = context[..., cfg.cross_attention_dim:] if with_audio else None
        return v_ctx, a_ctx

    v_ctx, a_ctx = context, (context if with_audio else None)
    if d == dual and lc < 1024:
        v_ctx = context[..., : cfg.cross_attention_dim]
        if with_audio:
            a_ctx = context[..., cfg.cross_attention_dim:]
    elif d == cfg.caption_channels * 2:
        v_ctx = context[..., : cfg.caption_channels]
        if with_audio:
            a_ctx = context[..., cfg.caption_channels:]

    def norm_single_proj(pre, x, out_dim):
        h = rms_norm(x, eps=1e-6)
        h = h * math.sqrt(out_dim / x.shape[-1])
        return linear(h, p[f"{pre}.linear_1.weight"], p.get(f"{pre}.linear_1.bias"))

    def pixart_proj(pre, x):
        h = linear(x, p[f"{pre}.linear_1.weight"], p[f"{pre}.linear_1.bias"])
        return linear(gelu_tanh(h), p[f"{pre}.linear_2.weight"],
                      p[f"{pre}.linear_2.bias"])

    if cfg.caption_proj_before_connector:
        if (cfg.use_caption_projection and cfg.caption_projection_first_linear
                and v_ctx is not None and v_ctx.shape[-1] == cfg.caption_channels):
            v_ctx = norm_single_proj("caption_projection", v_ctx, cfg.hidden_size)
        if (with_audio and cfg.use_audio_caption_projection
                and cfg.caption_projection_first_linear and a_ctx is not None
                and a_ctx.shape[-1] == cfg.caption_channels):
            a_ctx = norm_single_proj("audio_caption_projection", a_ctx,
                                     cfg.audio_hidden_size)

    if cfg.use_connector and v_ctx is not None and \
            v_ctx.shape[-1] == cfg.connector_hidden_size:
        v_ctx = _connector(p, "video_embeddings_connector", v_ctx,
                           cfg.connector_hidden_size, cfg.connector_num_heads,
                           cfg.connector_head_dim, cfg.connector_num_layers,
                           cfg.connector_num_registers,
                           cfg.connector_rope_interleaved)
    if with_audio and cfg.use_audio_connector and a_ctx is not None and \
            a_ctx.shape[-1] == cfg.audio_connector_hidden_size:
        a_ctx = _connector(p, "audio_embeddings_connector", a_ctx,
                           cfg.audio_connector_hidden_size,
                           cfg.audio_connector_num_heads,
                           cfg.audio_connector_head_dim,
                           cfg.audio_connector_num_layers,
                           cfg.audio_connector_num_registers,
                           cfg.audio_connector_rope_interleaved)

    if not cfg.caption_proj_before_connector:
        if cfg.use_caption_projection and v_ctx is not None and \
                v_ctx.shape[-1] == cfg.caption_channels:
            v_ctx = pixart_proj("caption_projection", v_ctx)
        if with_audio and cfg.use_audio_caption_projection and \
                a_ctx is not None and a_ctx.shape[-1] == cfg.caption_channels:
            a_ctx = pixart_proj("audio_caption_projection", a_ctx)
    return v_ctx, a_ctx


def _text_cross_attention(p, pre_attn: str, x, context, heads, head_dim,
                          table, prompt_table, t_mod, prompt_t_mod, dim,
                          cross_adaln: bool):
    """apply_text_cross_attention (ltxv.hpp:1167)."""
    if cross_adaln:
        mods = _ada_values(table, t_mod, dim, 9)
        q = rms_norm(x, eps=1e-6)
        q = _modulate(q, mods[:, :, 6], mods[:, :, 7])
        ctx_mod = context
        if prompt_t_mod is not None and prompt_table is not None:
            pmods = _ada_values(prompt_table, prompt_t_mod, context.shape[-1], 2)
            ctx_mod = _modulate(ctx_mod, pmods[:, :, 0], pmods[:, :, 1])
        out = _ltx_attention(p, pre_attn, q, ctx_mod, heads, head_dim)
        return out * mods[:, :, 8]
    q = rms_norm(x, eps=1e-6)
    return _ltx_attention(p, pre_attn, q, context, heads, head_dim)


def _av_block(p, pre: str, vx, ax, v_ctx, a_ctx, v_t, a_t, v_pe, a_pe,
              v_cross_pe, a_cross_pe, v_cs_t, a_cs_t, v_gate_t, a_gate_t,
              v_prompt_t, a_prompt_t, cfg: LTXAVConfig):
    """BasicAVTransformerBlock (ltxv.hpp:1096)."""
    vd, ad = cfg.hidden_size, cfg.audio_hidden_size
    vh, ah = cfg.num_heads, cfg.audio_num_heads
    vhd, ahd = cfg.head_dim, cfg.audio_head_dim
    coeff = 9 if cfg.cross_attention_adaln else 6
    v_table = p[f"{pre}.scale_shift_table"]
    a_table = p[f"{pre}.audio_scale_shift_table"]

    v_mods = _ada_values(v_table, v_t, vd, coeff)
    vn = rms_norm(vx, eps=1e-6)
    vn = _modulate(vn, v_mods[:, :, 0], v_mods[:, :, 1])
    sa = _ltx_attention(p, f"{pre}.attn1", vn, None, vh, vhd, pe_q=v_pe,
                        interleaved=cfg.video_rope_interleaved)
    vx = vx + sa * v_mods[:, :, 2]
    v_txt = _text_cross_attention(
        p, f"{pre}.attn2", vx, v_ctx, vh, vhd, v_table,
        p.get(f"{pre}.prompt_scale_shift_table"), v_t, v_prompt_t, vd,
        cfg.cross_attention_adaln)
    vx = vx + v_txt

    if ax is not None:
        a_mods = _ada_values(a_table, a_t, ad, coeff)
        an = rms_norm(ax, eps=1e-6)
        an = _modulate(an, a_mods[:, :, 0], a_mods[:, :, 1])
        asa = _ltx_attention(p, f"{pre}.audio_attn1", an, None, ah, ahd,
                             pe_q=a_pe)
        ax = ax + asa * a_mods[:, :, 2]
        a_txt = _text_cross_attention(
            p, f"{pre}.audio_attn2", ax, a_ctx, ah, ahd, a_table,
            p.get(f"{pre}.audio_prompt_scale_shift_table"), a_t, a_prompt_t,
            ad, cfg.cross_attention_adaln)
        ax = ax + a_txt

        vn3 = rms_norm(vx, eps=1e-6)
        an3 = rms_norm(ax, eps=1e-6)
        ca_a = p[f"{pre}.scale_shift_table_a2v_ca_audio"]  # [5, ad]
        ca_v = p[f"{pre}.scale_shift_table_a2v_ca_video"]  # [5, vd]
        a_cs = _ada_values(ca_a[:4], a_cs_t, ad, 4)
        v_cs = _ada_values(ca_v[:4], v_cs_t, vd, 4)

        # audio -> video: video queries scaled by (shift=v_cs[1], scale=v_cs[0])
        vq = _modulate(vn3, v_cs[:, :, 1], v_cs[:, :, 0])
        ak = _modulate(an3, a_cs[:, :, 1], a_cs[:, :, 0])
        a2v = _ltx_attention(p, f"{pre}.audio_to_video_attn", vq, ak, ah, ahd,
                             pe_q=v_cross_pe, pe_k=a_cross_pe)
        v_gate = _ada_values(ca_v[4:5], v_gate_t, vd, 1)[:, :, 0]
        vx = vx + a2v * v_gate

        # video -> audio
        aq = _modulate(an3, a_cs[:, :, 3], a_cs[:, :, 2])
        vk = _modulate(vn3, v_cs[:, :, 3], v_cs[:, :, 2])
        v2a = _ltx_attention(p, f"{pre}.video_to_audio_attn", aq, vk, ah, ahd,
                             pe_q=a_cross_pe, pe_k=v_cross_pe)
        a_gate = _ada_values(ca_a[4:5], a_gate_t, ad, 1)[:, :, 0]
        ax = ax + v2a * a_gate

        afn = rms_norm(ax, eps=1e-6)
        afn = _modulate(afn, a_mods[:, :, 3], a_mods[:, :, 4])
        ax = ax + _ff(p, f"{pre}.audio_ff", afn) * a_mods[:, :, 5]

    vfn = rms_norm(vx, eps=1e-6)
    vfn = _modulate(vfn, v_mods[:, :, 3], v_mods[:, :, 4])
    vx = vx + _ff(p, f"{pre}.ff", vfn) * v_mods[:, :, 5]
    return vx, ax


def ltxav_forward(
    p,
    x: jnp.ndarray,
    timesteps: jnp.ndarray,
    context: Optional[jnp.ndarray] = None,
    audio_x: Optional[jnp.ndarray] = None,
    audio_timesteps: Optional[jnp.ndarray] = None,
    frame_rate: float = 24.0,
    video_positions: Optional[np.ndarray] = None,
    cfg: LTXAVConfig = LTXAV_CONFIG,
    run_blocks=None,
):
    """x: [B, T, H, W, C] video latent; timesteps: [B] or [B, T*H*W]
    (per-token, from the denoise mask); context: [B, Lc, D];
    audio_x: [B, Ta, Ca, F] or None; audio_timesteps: [B].

    run_blocks: optional ``(vx, ax, aux_tuple) -> (vx, ax)`` override for the
    transformer stack — the weight-streamed path routes the blocks through a
    BlockStreamer while prologue/head use the resident params.

    Returns (video_out [B, T, H, W, out_ch], audio_out or None).
    Reference: LTXAVModelBlock::forward (ltxv.hpp:1548).
    """
    b, t, hh, ww, c = x.shape
    lv = t * hh * ww
    dtype = x.dtype

    vx = x.reshape(b, lv, c)
    vx = linear(vx, p["patchify_proj.weight"], p["patchify_proj.bias"])

    with_audio = audio_x is not None and audio_x.shape[1] > 0
    ax = None
    ta = 0
    if with_audio:
        bb, ta, ca, fb = audio_x.shape
        ax = audio_x.reshape(b, ta, ca * fb)
        ax = linear(ax, p["audio_patchify_proj.weight"],
                    p["audio_patchify_proj.bias"])

    v_ctx = a_ctx = None
    if context is not None:
        v_ctx, a_ctx = _preprocess_contexts(p, context, cfg, with_audio)
        if a_ctx is None:
            a_ctx = v_ctx

    if timesteps.ndim == 1:
        timesteps = timesteps[:, None]
    v_t_scaled = timesteps.astype(jnp.float32) * cfg.timestep_scale
    v_t_mod, v_emb = _adaln_single(p, "adaln_single", v_t_scaled, dtype)

    eff_a_t = audio_timesteps if audio_timesteps is not None else timesteps[:, 0]
    if eff_a_t.ndim == 1:
        eff_a_t = eff_a_t[:, None]
    a_t_scaled = eff_a_t.astype(jnp.float32) * cfg.timestep_scale
    a_t_mod, a_emb = _adaln_single(p, "audio_adaln_single", a_t_scaled, dtype)

    v_prompt_mod = a_prompt_mod = None
    if cfg.cross_attention_adaln:
        v_prompt_mod, _ = _adaln_single(p, "prompt_adaln_single", a_t_scaled, dtype)
        a_prompt_mod, _ = _adaln_single(p, "audio_prompt_adaln_single",
                                        a_t_scaled, dtype)

    # a<->v cross-attention conditioning consumes the RAW (unscaled) timestep,
    # broadcast so each side matches its token axis (ltxv.hpp:1613-1627).
    av_v_t = jnp.broadcast_to(eff_a_t[:, :1], timesteps.shape).astype(jnp.float32)
    av_a_t = eff_a_t.astype(jnp.float32)
    av_factor = cfg.av_ca_timestep_scale / cfg.timestep_scale
    v_cs_t, _ = _adaln_single(p, "av_ca_video_scale_shift_adaln_single", av_v_t, dtype)
    v_gate_t, _ = _adaln_single(p, "av_ca_a2v_gate_adaln_single",
                                av_v_t * av_factor, dtype)
    a_cs_t, _ = _adaln_single(p, "av_ca_audio_scale_shift_adaln_single", av_a_t, dtype)
    a_gate_t, _ = _adaln_single(p, "av_ca_v2a_gate_adaln_single",
                                av_a_t * av_factor, dtype)

    v_pe = (video_rope_from_positions(video_positions, cfg)
            if video_positions is not None
            else video_rope(ww, hh, t, cfg, frame_rate))
    a_pe = v_cross_pe = a_cross_pe = None
    if with_audio:
        a_pe = audio_rope(ta, cfg.audio_hidden_size, cfg.audio_num_heads,
                          cfg.rope_theta, cfg.audio_max_pos,
                          cfg.use_middle_indices_grid)
        tmax = max(cfg.max_pos[0], cfg.audio_max_pos)
        if video_positions is not None:
            v_cross_pe = video_temporal_rope_from_positions(
                video_positions, cfg.audio_cross_attention_dim,
                cfg.audio_num_heads, cfg.rope_theta, tmax)
        else:
            v_cross_pe = video_temporal_rope(
                ww, hh, t, cfg.audio_cross_attention_dim, cfg.audio_num_heads,
                frame_rate, cfg.rope_theta, tmax, cfg.vae_scale_factors[0],
                cfg.causal_temporal_positioning)
        a_cross_pe = audio_rope(ta, cfg.audio_cross_attention_dim,
                                cfg.audio_num_heads, cfg.rope_theta, tmax, True)

    aux = (v_ctx, a_ctx, v_t_mod, a_t_mod, v_pe, a_pe, v_cross_pe,
           a_cross_pe, v_cs_t, a_cs_t, v_gate_t, a_gate_t,
           v_prompt_mod, a_prompt_mod)
    if run_blocks is not None:
        vx, ax = run_blocks(vx, ax, aux)
    else:
        for i in range(cfg.num_layers):
            vx, ax = _av_block(p, f"transformer_blocks.{i}", vx, ax, *aux, cfg)

    # output heads (scale_shift_table [2, dim] + embedded timestep)
    v_ss = v_emb[:, :, None] + p["scale_shift_table"][None, None].astype(dtype)
    vx = layer_norm(vx, eps=1e-6)
    vx = _modulate(vx, v_ss[:, :, 0], v_ss[:, :, 1])
    vx = linear(vx, p["proj_out.weight"], p["proj_out.bias"])
    video_out = vx.reshape(b, t, hh, ww, -1)

    audio_out = None
    if ax is not None:
        a_ss = a_emb[:, :, None] + p["audio_scale_shift_table"][None, None].astype(dtype)
        ax = layer_norm(ax, eps=1e-6)
        ax = _modulate(ax, a_ss[:, :, 0], a_ss[:, :, 1])
        ax = linear(ax, p["audio_proj_out.weight"], p["audio_proj_out.bias"])
        audio_out = ax.reshape(b, ta, cfg.num_audio_channels,
                               cfg.audio_frequency_bins)
    return video_out, audio_out


def init_ltxav_params(cfg: LTXAVConfig, seed: int = 0, dtype=jnp.float32) -> dict:
    """Random params with checkpoint-shaped tensors (tests / dry runs)."""
    g = np.random.default_rng(seed)

    def w(*shape, scale=0.02):
        return jnp.asarray(g.standard_normal(shape, dtype=np.float32) * scale,
                           dtype=dtype)

    def lin(p, pre, din, dout, bias=True):
        p[f"{pre}.weight"] = w(dout, din)
        if bias:
            p[f"{pre}.bias"] = jnp.zeros((dout,), dtype=dtype)

    def adaln(p, pre, dim, coeff):
        lin(p, f"{pre}.emb.timestep_embedder.linear_1", 256, dim)
        lin(p, f"{pre}.emb.timestep_embedder.linear_2", dim, dim)
        lin(p, f"{pre}.linear", dim, coeff * dim)

    def attn(p, pre, qdim, cdim, heads, hd, gated):
        inner = heads * hd
        lin(p, f"{pre}.to_q", qdim, inner)
        lin(p, f"{pre}.to_k", cdim, inner)
        lin(p, f"{pre}.to_v", cdim, inner)
        p[f"{pre}.q_norm.weight"] = jnp.ones((inner,), dtype=dtype)
        p[f"{pre}.k_norm.weight"] = jnp.ones((inner,), dtype=dtype)
        lin(p, f"{pre}.to_out.0", inner, qdim)
        if gated:
            lin(p, f"{pre}.to_gate_logits", qdim, heads)

    def ff(p, pre, dim):
        lin(p, f"{pre}.net.0.proj", dim, dim * 4)
        lin(p, f"{pre}.net.2", dim * 4, dim)

    p: dict = {}
    vd, ad = cfg.hidden_size, cfg.audio_hidden_size
    coeff = 9 if cfg.cross_attention_adaln else 6
    lin(p, "patchify_proj", cfg.in_channels, vd)
    lin(p, "audio_patchify_proj", cfg.audio_in_channels, ad)
    adaln(p, "adaln_single", vd, coeff)
    adaln(p, "audio_adaln_single", ad, coeff)
    if cfg.cross_attention_adaln:
        adaln(p, "prompt_adaln_single", vd, 2)
        adaln(p, "audio_prompt_adaln_single", ad, 2)
    adaln(p, "av_ca_video_scale_shift_adaln_single", vd, 4)
    adaln(p, "av_ca_a2v_gate_adaln_single", vd, 1)
    adaln(p, "av_ca_audio_scale_shift_adaln_single", ad, 4)
    adaln(p, "av_ca_v2a_gate_adaln_single", ad, 1)
    gated = cfg.self_attention_gated or cfg.cross_attention_gated
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        attn(p, f"{pre}.attn1", vd, vd, cfg.num_heads, cfg.head_dim, gated)
        attn(p, f"{pre}.audio_attn1", ad, ad, cfg.audio_num_heads,
             cfg.audio_head_dim, gated)
        attn(p, f"{pre}.attn2", vd, cfg.cross_attention_dim, cfg.num_heads,
             cfg.head_dim, gated)
        attn(p, f"{pre}.audio_attn2", ad, cfg.audio_cross_attention_dim,
             cfg.audio_num_heads, cfg.audio_head_dim, gated)
        attn(p, f"{pre}.audio_to_video_attn", vd, ad, cfg.audio_num_heads,
             cfg.audio_head_dim, gated)
        attn(p, f"{pre}.video_to_audio_attn", ad, vd, cfg.audio_num_heads,
             cfg.audio_head_dim, gated)
        ff(p, f"{pre}.ff", vd)
        ff(p, f"{pre}.audio_ff", ad)
        p[f"{pre}.scale_shift_table"] = w(coeff, vd, scale=0.1)
        p[f"{pre}.audio_scale_shift_table"] = w(coeff, ad, scale=0.1)
        if cfg.cross_attention_adaln:
            p[f"{pre}.prompt_scale_shift_table"] = w(2, vd, scale=0.1)
            p[f"{pre}.audio_prompt_scale_shift_table"] = w(2, ad, scale=0.1)
        p[f"{pre}.scale_shift_table_a2v_ca_audio"] = w(5, ad, scale=0.1)
        p[f"{pre}.scale_shift_table_a2v_ca_video"] = w(5, vd, scale=0.1)
    if cfg.use_connector:
        cpre = "video_embeddings_connector"
        p[f"{cpre}.learnable_registers"] = w(cfg.connector_num_registers,
                                             cfg.connector_hidden_size)
        for i in range(cfg.connector_num_layers):
            bpre = f"{cpre}.transformer_1d_blocks.{i}"
            attn(p, f"{bpre}.attn1", cfg.connector_hidden_size,
                 cfg.connector_hidden_size, cfg.connector_num_heads,
                 cfg.connector_head_dim, cfg.connector_gated)
            ff(p, f"{bpre}.ff", cfg.connector_hidden_size)
    if cfg.use_audio_connector:
        cpre = "audio_embeddings_connector"
        p[f"{cpre}.learnable_registers"] = w(cfg.audio_connector_num_registers,
                                             cfg.audio_connector_hidden_size)
        for i in range(cfg.audio_connector_num_layers):
            bpre = f"{cpre}.transformer_1d_blocks.{i}"
            attn(p, f"{bpre}.attn1", cfg.audio_connector_hidden_size,
                 cfg.audio_connector_hidden_size,
                 cfg.audio_connector_num_heads, cfg.audio_connector_head_dim,
                 cfg.audio_connector_gated)
            ff(p, f"{bpre}.ff", cfg.audio_connector_hidden_size)
    p["scale_shift_table"] = w(2, vd, scale=0.1)
    p["audio_scale_shift_table"] = w(2, ad, scale=0.1)
    lin(p, "proj_out", vd, cfg.out_channels)
    lin(p, "audio_proj_out", ad, cfg.audio_out_channels)
    return p


# ---------------------------------------------------------------------------
# packed AV latents (orchestrator helpers)
# ---------------------------------------------------------------------------


def get_num_audio_latents(frames: int, fps: int) -> int:
    """ceil(seconds * 16000/160/4) (get_ltxav_num_audio_latents,
    stable-diffusion.cpp:4572)."""
    return int(math.ceil(frames / fps * (16000.0 / 160.0 / 4.0)))


def pack_av_latents(video: np.ndarray, audio: Optional[np.ndarray]) -> np.ndarray:
    """video [B, T, H, W, C] + audio [B, Ta, Ca, F] -> packed channels-last:
    audio values flattened and padded into extra channels
    (pack_ltxav_audio_and_video_latents, stable-diffusion.cpp:4357)."""
    if audio is None:
        return video
    b, t, h, w, c = video.shape
    spatial = t * h * w
    audio_values = int(np.prod(audio.shape[1:]))
    extra = (audio_values + spatial - 1) // spatial
    packed = np.zeros((b, t, h, w, c + extra), dtype=video.dtype)
    packed[..., :c] = video
    flat = packed.reshape(b, -1)
    # channels-last layout: audio occupies trailing channel slots per token
    # order; easiest correct mapping mirrors the reference's channel-major
    # memory (W,H,T innermost): emulate by flattening [extra, spatial].
    au = np.zeros((b, extra * spatial), dtype=video.dtype)
    av = audio.reshape(b, -1)
    au[:, : av.shape[1]] = av
    aud = au.reshape(b, extra, t, h, w).transpose(0, 2, 3, 4, 1)
    packed[..., c:] = aud
    return packed


def pack_av_latents_jnp(video: jnp.ndarray, audio: Optional[jnp.ndarray],
                        total_channels: Optional[int] = None) -> jnp.ndarray:
    """jit-safe pack: video [B,T,H,W,C] + audio [B,Ta,Ca,F] -> packed
    channels-last (same memory mapping as pack_av_latents)."""
    if audio is None:
        return video
    b, t, h, w, c = video.shape
    spatial = t * h * w
    audio_values = audio.shape[1] * audio.shape[2] * audio.shape[3]
    extra = (total_channels - c if total_channels is not None
             else (audio_values + spatial - 1) // spatial)
    flat = jnp.zeros((b, extra * spatial), video.dtype)
    flat = flat.at[:, :audio_values].set(audio.reshape(b, -1).astype(video.dtype))
    aud = flat.reshape(b, extra, t, h, w).transpose(0, 2, 3, 4, 1)
    return jnp.concatenate([video, aud], axis=-1)


def unpack_audio_latent_jnp(packed: jnp.ndarray, audio_length: int,
                            video_channels: int,
                            num_audio_channels: int = 8,
                            freq_bins: int = 16) -> Optional[jnp.ndarray]:
    """jit-safe inverse of pack_av_latents_jnp -> [B, Ta, Ca, F]."""
    if audio_length <= 0 or packed.shape[-1] <= video_channels:
        return None
    b = packed.shape[0]
    aud = packed[..., video_channels:].transpose(0, 4, 1, 2, 3).reshape(b, -1)
    need = audio_length * num_audio_channels * freq_bins
    return aud[:, :need].reshape(b, audio_length, num_audio_channels, freq_bins)


def unpack_audio_latent(packed: np.ndarray, audio_length: int,
                        video_channels: int,
                        num_audio_channels: int = 8,
                        freq_bins: int = 16) -> Optional[np.ndarray]:
    """Inverse of pack_av_latents (unpack_ltxav_audio_latent,
    stable-diffusion.cpp:4517) -> [B, Ta, Ca, F]."""
    if audio_length <= 0 or packed.shape[-1] <= video_channels:
        return None
    b, t, h, w, ctot = packed.shape
    extra = ctot - video_channels
    aud = packed[..., video_channels:].transpose(0, 4, 1, 2, 3).reshape(b, -1)
    need = audio_length * num_audio_channels * freq_bins
    if aud.shape[1] < need:
        return None
    return aud[:, :need].reshape(b, audio_length, num_audio_channels, freq_bins)

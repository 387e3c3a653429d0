"""Prompt → conditioning tensors (webui-compatible weighting + 77-token
chunking), for the CLIP-based model families.

Behavioral parity with FrozenCLIPEmbedderWithCustomWords
(src/conditioning/conditioner.hpp:133-536):
  - webui attention parsing, BREAK pads the raw stream to a 75 boundary
  - chunks of 75 raw tokens wrapped with BOS/EOS, padded to 77
  - per-chunk mean-preserving token weighting (conditioner.hpp:68)
  - SD1 pads with EOS, SDXL CLIP-G zeroes tokens after the first EOS and
    contributes the pooled projection + 256-dim size/crop embedding vector

TPU-first: all chunks are embedded in ONE batched encoder call.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sdtpu.conditioning.prompt_parser import parse_prompt_attention
from sdtpu.models.clip import CLIPTextConfig, clip_text_forward
from sdtpu.ops import timestep_embedding

CHUNK_LEN = 77
RAW_CHUNK = 75


def tokenize_with_weights(
    tokenizer, text: str, pad_token_id: int, encode=None
) -> Tuple[np.ndarray, np.ndarray]:
    """→ (tokens [n_chunks*77], weights [n_chunks*77]) int32/float32."""
    encode = encode or tokenizer.encode
    raw_tokens: List[int] = []
    raw_weights: List[float] = []
    for span, weight in parse_prompt_attention(text):
        if span == "BREAK" and weight == -1.0:
            pad = (RAW_CHUNK - (len(raw_tokens) % RAW_CHUNK)) % RAW_CHUNK
            raw_tokens.extend([tokenizer.eos_token_id] * pad)
            raw_weights.extend([1.0] * pad)
            continue
        ids = encode(span)
        raw_tokens.extend(ids)
        raw_weights.extend([weight] * len(ids))

    tokens: List[int] = []
    weights: List[float] = []
    offset = 0
    while True:
        take = min(RAW_CHUNK, len(raw_tokens) - offset)
        chunk = [tokenizer.bos_token_id] + raw_tokens[offset : offset + take] + [tokenizer.eos_token_id]
        cw = [1.0] + raw_weights[offset : offset + take] + [1.0]
        pad = CHUNK_LEN - len(chunk)
        chunk += [pad_token_id] * pad
        cw += [1.0] * pad
        tokens.extend(chunk)
        weights.extend(cw)
        offset += take
        if offset >= len(raw_tokens):
            break
    return np.asarray(tokens, dtype=np.int32), np.asarray(weights, dtype=np.float32)


def apply_token_weights(hidden: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Mean-preserving per-chunk scaling. hidden [n_chunks, 77, C],
    weights [n_chunks, 77]."""
    original_mean = jnp.mean(hidden, axis=(1, 2), keepdims=True)
    weighted = hidden * weights[:, :, None].astype(hidden.dtype)
    new_mean = jnp.mean(weighted, axis=(1, 2), keepdims=True)
    scale = jnp.where(new_mean != 0.0, original_mean / new_mean, 1.0)
    return weighted * scale


@dataclasses.dataclass
class SDCondition:
    c_crossattn: Optional[jnp.ndarray] = None  # [B, L, C]
    c_vector: Optional[jnp.ndarray] = None  # [B, adm]
    c_concat: Optional[jnp.ndarray] = None  # [B, H, W, C] (inpaint)
    # secondary cross-attn stream (HunyuanVideo byt5 glyph states; reference
    # SDCondition.extra_c_crossattns, conditioner.hpp:2699)
    c_extra: Optional[jnp.ndarray] = None  # [B, Lb, C2]


def extract_quoted_texts(text: str):
    """Quoted spans the byt5 glyph branch renders (reference collect_quoted,
    conditioner.hpp:2663-2677): straight double quotes, then the unicode
    single/double quote pairs."""
    out = []
    for open_, close in (('"', '"'), ("‘", "’"),
                         ("“", "”")):
        begin = 0
        while True:
            b = text.find(open_, begin)
            if b < 0:
                break
            e = text.find(close, b + len(open_))
            if e < 0:
                break
            out.append(text[b + len(open_):e])
            begin = e + len(close)
    return out


def byt5_tokenize(texts) -> list:
    """ByT5 byte tokenization of the glyph prompt (reference
    conditioner.hpp:2681-2689): 'Text "..." . ' per quoted span, utf-8 bytes
    shifted by +3 (byt5 special-token offset), EOS=1."""
    byt5_text = "".join(f'Text "{t}". ' for t in texts)
    return [b + 3 for b in byt5_text.encode("utf-8")] + [1]


class EmbeddingMixin:
    """Textual-inversion embeddings (reference
    FrozenCLIPEmbedderWithCustomWords, conditioner.hpp:133): trigger words map
    to rows appended to the token-embedding matrix; prompts are pre-split on
    trigger words before BPE."""

    def init_embeddings(self):
        self._embeddings = {}  # name → list[token_id]

    def load_embedding(self, name: str, vectors, key: str = "params"):
        """vectors: [n, hidden] (or {'emb_params': ...} / {'string_to_param':
        {'*': ...}} checkpoint dicts)."""
        import numpy as np

        if isinstance(vectors, dict):
            if "emb_params" in vectors:
                vectors = vectors["emb_params"]
            elif "string_to_param" in vectors:
                vectors = list(vectors["string_to_param"].values())[0]
            else:  # single-tensor file
                vectors = list(vectors.values())[0]
        vectors = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        params = getattr(self, key)
        emb_key = "text_model.embeddings.token_embedding.weight"
        table = params[emb_key]
        if vectors.shape[1] != table.shape[1]:
            raise ValueError(
                f"embedding '{name}' dim {vectors.shape[1]} != {table.shape[1]}"
            )
        start = table.shape[0]
        params = dict(params)
        params[emb_key] = jnp.concatenate([table, jnp.asarray(vectors, table.dtype)], 0)
        setattr(self, key, params)
        self._embeddings[name.lower()] = list(range(start, start + vectors.shape[0]))

    def _encode_with_embeddings(self, tokenizer, span: str):
        if not getattr(self, "_embeddings", None):
            return tokenizer.encode(span)
        import re as _re

        pat = "|".join(_re.escape(n) for n in sorted(self._embeddings, key=len, reverse=True))
        ids = []
        for part in _re.split(f"({pat})", span, flags=_re.IGNORECASE):
            if not part:
                continue
            if part.lower() in self._embeddings:
                ids.extend(self._embeddings[part.lower()])
            else:
                ids.extend(tokenizer.encode(part))
        return ids


class SD1Conditioner(EmbeddingMixin):
    """SD1.x/2.x single-CLIP conditioner."""

    def __init__(self, tokenizer, clip_params, clip_cfg: CLIPTextConfig, is_sd2: bool = False):
        self.tokenizer = tokenizer
        self.params = clip_params
        self.cfg = clip_cfg
        self.is_sd2 = is_sd2
        self.pad_token_id = 0 if is_sd2 else tokenizer.eos_token_id
        self.init_embeddings()
        self._jit_forward = jax.jit(
            lambda p, ids, w, skip: apply_token_weights(
                clip_text_forward(p, ids, self.cfg, clip_skip=skip)[0], w
            ),
            static_argnums=3,
        )

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        if clip_skip <= 0:
            clip_skip = 2 if self.is_sd2 else 1
        tokens, weights = tokenize_with_weights(
            self.tokenizer, text, self.pad_token_id,
            encode=lambda span: self._encode_with_embeddings(self.tokenizer, span),
        )
        n_chunks = len(tokens) // CHUNK_LEN
        ids = jnp.asarray(tokens.reshape(n_chunks, CHUNK_LEN))
        w = jnp.asarray(weights.reshape(n_chunks, CHUNK_LEN))
        hidden = self._jit_forward(self.params, ids, w, clip_skip)
        c = hidden.reshape(1, n_chunks * CHUNK_LEN, hidden.shape[-1])
        return SDCondition(c_crossattn=c)


def sdxl_size_vector(pooled: jnp.ndarray, width: int, height: int,
                     crop_w: int = 0, crop_h: int = 0,
                     target_width: Optional[int] = None,
                     target_height: Optional[int] = None) -> jnp.ndarray:
    """adm_in vector = pooled(1280) ++ emb256(h,w) ++ emb256(crop) ++ emb256(target)."""
    target_width = target_width or width
    target_height = target_height or height
    vals = jnp.asarray(
        [height, width, crop_h, crop_w, target_height, target_width], dtype=jnp.float32
    )
    embs = timestep_embedding(vals, 256).reshape(1, 6 * 256)
    return jnp.concatenate([pooled.reshape(1, -1), embs], axis=-1)


class SD3Conditioner:
    """SD3 triple conditioner: clip_l + clip_g (feature-concat, padded to 4096)
    token-concatenated with T5-XXL; pooled = clip_l ++ clip_g projections
    (reference SD3CLIPEmbedder, conditioner.hpp:591)."""

    def __init__(
        self,
        clip_tokenizer,
        t5_tokenizer,
        clip_l_params,
        clip_l_cfg,
        clip_g_params,
        clip_g_cfg,
        t5_params,
        t5_cfg,
        t5_seq_len: int = 77,
    ):
        self.clip_tokenizer = clip_tokenizer
        self.t5_tokenizer = t5_tokenizer
        self.pl, self.cl = clip_l_params, clip_l_cfg
        self.pg, self.cg = clip_g_params, clip_g_cfg
        self.pt, self.ct = t5_params, t5_cfg
        self.t5_seq_len = t5_seq_len

        from sdtpu.models.t5 import t5_encoder_forward

        def fwd(pl, pg, pt, ids, w, t5_ids, skip):
            h_l, pooled_l = clip_text_forward(pl, ids, self.cl, clip_skip=skip, return_pooled=True)
            h_g, pooled_g = clip_text_forward(pg, ids, self.cg, clip_skip=skip, return_pooled=True)
            hidden = jnp.concatenate([h_l, h_g], axis=-1)  # [n, 77, 2048]
            hidden = apply_token_weights(hidden, w)
            t5_dim = self.ct.d_model
            pad = t5_dim - hidden.shape[-1]
            hidden = jnp.pad(hidden, ((0, 0), (0, 0), (0, pad)))
            h_t5 = t5_encoder_forward(pt, t5_ids, self.ct)
            pooled = jnp.concatenate([pooled_l, pooled_g], axis=-1)
            return hidden, h_t5, pooled

        self._jit_forward = jax.jit(fwd, static_argnums=6)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        if clip_skip <= 0:
            clip_skip = 2
        tokens, weights = tokenize_with_weights(self.clip_tokenizer, text, 0)
        # SD3 uses only the first chunk per tower
        ids = jnp.asarray(tokens[:CHUNK_LEN][None])
        w = jnp.asarray(weights[:CHUNK_LEN][None])
        if self.t5_tokenizer is not None:
            t5_ids, _ = self.t5_tokenizer.pad(
                self.t5_tokenizer.encode(text, add_eos=True), self.t5_seq_len
            )
        else:
            t5_ids = [0] * self.t5_seq_len
        t5_ids = jnp.asarray(np.asarray(t5_ids, dtype=np.int32)[None])
        hidden, h_t5, pooled = self._jit_forward(self.pl, self.pg, self.pt, ids, w, t5_ids, clip_skip)
        ctx = jnp.concatenate([hidden, h_t5.astype(hidden.dtype)], axis=1)
        return SDCondition(c_crossattn=ctx, c_vector=pooled)


class FluxConditioner:
    """FLUX: clip_l pooled vector + T5 token sequence
    (reference FluxCLIPEmbedder, conditioner.hpp:1003)."""

    def __init__(
        self, clip_tokenizer, t5_tokenizer, clip_l_params, clip_l_cfg, t5_params, t5_cfg,
        t5_seq_len: int = 256,
    ):
        self.clip_tokenizer = clip_tokenizer
        self.t5_tokenizer = t5_tokenizer
        self.pl, self.cl = clip_l_params, clip_l_cfg
        self.pt, self.ct = t5_params, t5_cfg
        self.t5_seq_len = t5_seq_len

        from sdtpu.models.t5 import t5_encoder_forward

        def fwd(pl, pt, ids, t5_ids):
            _, pooled = clip_text_forward(pl, ids, self.cl, clip_skip=-1, return_pooled=True)
            h_t5 = t5_encoder_forward(pt, t5_ids, self.ct)
            return h_t5, pooled

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        tokens, _ = tokenize_with_weights(self.clip_tokenizer, text, self.clip_tokenizer.eos_token_id)
        ids = jnp.asarray(tokens[:CHUNK_LEN][None])
        if self.t5_tokenizer is not None:
            t5_ids, _ = self.t5_tokenizer.pad(
                self.t5_tokenizer.encode(text, add_eos=True), self.t5_seq_len
            )
        else:
            t5_ids = [0] * self.t5_seq_len
        t5_ids = jnp.asarray(np.asarray(t5_ids, dtype=np.int32)[None])
        h_t5, pooled = self._jit_forward(self.pl, self.pt, ids, t5_ids)
        return SDCondition(c_crossattn=h_t5, c_vector=pooled)


class SDXLConditioner:
    """SDXL dual-CLIP (L + G) conditioner with pooled size/crop vector."""

    def __init__(self, tokenizer, clip_l_params, clip_l_cfg, clip_g_params, clip_g_cfg):
        self.tokenizer = tokenizer
        self.pl, self.cl = clip_l_params, clip_l_cfg
        self.pg, self.cg = clip_g_params, clip_g_cfg

        def fwd(pl, pg, ids_l, ids_g, w, skip):
            h_l, _ = clip_text_forward(pl, ids_l, self.cl, clip_skip=skip)
            h_g, pooled = clip_text_forward(
                pg, ids_g, self.cg, clip_skip=skip, return_pooled=True
            )
            hidden = jnp.concatenate([h_l, h_g], axis=-1)
            return apply_token_weights(hidden, w), pooled

        self._jit_forward = jax.jit(fwd, static_argnums=5)

    def get_learned_condition(
        self, text: str, clip_skip: int = -1, width: int = 1024, height: int = 1024, **kw
    ) -> SDCondition:
        if clip_skip <= 0:
            clip_skip = 2
        tokens, weights = tokenize_with_weights(self.tokenizer, text, 0)
        n_chunks = len(tokens) // CHUNK_LEN
        chunks = tokens.reshape(n_chunks, CHUNK_LEN)
        # CLIP-G input zeroes everything after the first EOS per chunk
        chunks_g = chunks.copy()
        for row in chunks_g:
            eos_pos = np.argmax(row == self.tokenizer.eos_token_id)
            if row[eos_pos] == self.tokenizer.eos_token_id and eos_pos + 1 < CHUNK_LEN:
                row[eos_pos + 1 :] = 0
        ids_l = jnp.asarray(chunks)
        ids_g = jnp.asarray(chunks_g)
        w = jnp.asarray(weights.reshape(n_chunks, CHUNK_LEN))
        hidden, pooled = self._jit_forward(self.pl, self.pg, ids_l, ids_g, w, clip_skip)
        c = hidden.reshape(1, n_chunks * CHUNK_LEN, hidden.shape[-1])
        vec = sdxl_size_vector(pooled[:1], width, height, **{
            k: v for k, v in kw.items()
            if k in ("crop_w", "crop_h", "target_width", "target_height")
        })
        return SDCondition(c_crossattn=c, c_vector=vec)

    def get_learned_condition_with_trigger(
        self, text: str, trigger_word: str, trigger_count: int,
        clip_skip: int = -1, width: int = 1024, height: int = 1024,
    ):
        """PhotoMaker conditioning: encode with the trigger word replaced by
        repeated class tokens → (SDCondition, class_mask [77]) (reference
        get_photomaker_condition_with_trigger,
        photomaker_extension.cpp:65-87)."""
        if clip_skip <= 0:
            clip_skip = 2
        tokens, weights, mask = tokenize_photomaker_trigger(
            self.tokenizer, text, trigger_word, trigger_count, 0)
        chunks = tokens.reshape(1, CHUNK_LEN)
        chunks_g = chunks.copy()
        eos_pos = int(np.argmax(chunks_g[0] == self.tokenizer.eos_token_id))
        if chunks_g[0, eos_pos] == self.tokenizer.eos_token_id and eos_pos + 1 < CHUNK_LEN:
            chunks_g[0, eos_pos + 1:] = 0
        hidden, pooled = self._jit_forward(
            self.pl, self.pg, jnp.asarray(chunks), jnp.asarray(chunks_g),
            jnp.asarray(weights.reshape(1, CHUNK_LEN)), clip_skip)
        c = hidden.reshape(1, CHUNK_LEN, hidden.shape[-1])
        vec = sdxl_size_vector(pooled[:1], width, height)
        return SDCondition(c_crossattn=c, c_vector=vec), mask


def tokenize_photomaker_trigger(tokenizer, text: str, trigger_word: str,
                                trigger_count: int, pad_token_id: int):
    """→ (tokens [77], weights [77], class_mask [77]): the trigger word is
    removed and the preceding CLASS token repeated trigger_count times
    (reference tokenize_photomaker_trigger,
    photomaker_extension.cpp:13-63)."""
    image_token = tokenizer.encode(trigger_word)
    assert len(image_token) == 1, "trigger word must be a single token"
    image_token = image_token[0]
    raw_tokens: list = []
    raw_weights: list = []
    for span, weight in parse_prompt_attention(text):
        for tid in tokenizer.encode(span):
            raw_tokens.append(tid)
            raw_weights.append(weight)
    tokens: list = []
    weights: list = []
    class_idx = -1
    for tid, wgt in zip(raw_tokens, raw_weights):
        if tid == image_token:
            if tokens:
                class_idx = len(tokens) - 1
                for _ in range(trigger_count - 1):
                    tokens.append(tokens[class_idx])
                    weights.append(weights[class_idx])
            continue
        tokens.append(tid)
        weights.append(wgt)
    tokens = [tokenizer.bos_token_id] + tokens[: CHUNK_LEN - 2] + [tokenizer.eos_token_id]
    weights = [1.0] + weights[: CHUNK_LEN - 2] + [1.0]
    pad = CHUNK_LEN - len(tokens)
    tokens += [pad_token_id] * pad
    weights += [1.0] * pad
    mask = np.zeros(CHUNK_LEN, dtype=bool)
    if class_idx >= 0:
        lo = class_idx + 1  # +1 for BOS
        mask[lo: lo + trigger_count] = True
    return (np.asarray(tokens, dtype=np.int32),
            np.asarray(weights, dtype=np.float32), mask)


class WanConditioner:
    """Wan 2.x: UMT5-XXL only, 512-token chunk, attention-masked encoding with
    masked hidden states zeroed (reference T5CLIPEmbedder,
    conditioner.hpp:1284, constructed for Wan at stable-diffusion.cpp:1099;
    zero_out_masked=true in the video path, :6064)."""

    def __init__(self, t5_tokenizer, t5_params, t5_cfg, seq_len: int = 512):
        self.t5_tokenizer = t5_tokenizer
        self.pt, self.ct = t5_params, t5_cfg
        self.seq_len = seq_len

        from sdtpu.models.t5 import t5_encoder_forward

        def fwd(pt, ids, mask, w):
            h = t5_encoder_forward(pt, ids, self.ct, attention_mask=mask)
            h = apply_token_weights(h, w)
            return h * mask[:, :, None].astype(h.dtype)  # zero_out_masked

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        weights_by_span = parse_prompt_attention(text)
        ids: List[int] = []
        w: List[float] = []
        if self.t5_tokenizer is not None:
            for span, weight in weights_by_span:
                span_ids = self.t5_tokenizer.encode(span)
                ids.extend(span_ids)
                w.extend([weight] * len(span_ids))
            ids.append(self.t5_tokenizer.eos_token_id)
            w.append(1.0)
            ids, mask = self.t5_tokenizer.pad(ids, self.seq_len)
        else:  # tests without a tokenizer file
            ids, mask = [0] * self.seq_len, [1] * self.seq_len
        w = (w + [1.0] * self.seq_len)[: self.seq_len]
        h = self._jit_forward(
            self.pt,
            jnp.asarray(np.asarray(ids, dtype=np.int32)[None]),
            jnp.asarray(np.asarray(mask, dtype=np.float32)[None]),
            jnp.asarray(np.asarray(w, dtype=np.float32)[None]),
        )
        return SDCondition(c_crossattn=h)


class ChromaConditioner:
    """Chroma: T5-XXL only; c_vector carries the float token mask (0 / -inf)
    consumed by the DiT as an attention bias over txt tokens, with mask_pad
    extra padding tokens kept attendable (reference T5CLIPEmbedder
    constructed with use_mask=false, mask_pad=1 at stable-diffusion.cpp:1037,
    modify_mask_to_attend_padding conditioner.hpp)."""

    def __init__(self, t5_tokenizer, t5_params, t5_cfg, seq_len: int = 512,
                 mask_pad: int = 1, use_mask: bool = False):
        self.t5_tokenizer = t5_tokenizer
        self.pt, self.ct = t5_params, t5_cfg
        self.seq_len = seq_len
        self.mask_pad = mask_pad
        # model_args 'chroma_use_t5_mask': mask padding inside the T5
        # encoder itself (reference conditioner.hpp:1300-1316)
        self.use_mask = use_mask

        from sdtpu.models.t5 import t5_encoder_forward

        def fwd(pt, ids, w, mask01):
            h = t5_encoder_forward(
                pt, ids, self.ct,
                attention_mask=mask01 if self.use_mask else None)
            return apply_token_weights(h, w)

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        ids: List[int] = []
        w: List[float] = []
        if self.t5_tokenizer is not None:
            for span, weight in parse_prompt_attention(text):
                span_ids = self.t5_tokenizer.encode(span)
                ids.extend(span_ids)
                w.extend([weight] * len(span_ids))
            ids.append(self.t5_tokenizer.eos_token_id)
            w.append(1.0)
            ids, mask01 = self.t5_tokenizer.pad(ids, self.seq_len)
        else:
            ids, mask01 = [0] * self.seq_len, [1] * self.seq_len
        w = (w + [1.0] * self.seq_len)[: self.seq_len]
        h = self._jit_forward(
            self.pt,
            jnp.asarray(np.asarray(ids, dtype=np.int32)[None]),
            jnp.asarray(np.asarray(w, dtype=np.float32)[None]),
            jnp.asarray(np.asarray(mask01, dtype=np.float32)[None]),
        )
        mask = np.where(np.asarray(mask01, dtype=np.float32) > 0, 0.0, -np.inf)
        # keep mask_pad padding tokens attendable
        pad_idx = np.where(np.isinf(mask))[0][: self.mask_pad]
        mask[pad_idx] = 0.0
        return SDCondition(
            c_crossattn=h, c_vector=jnp.asarray(mask.astype(np.float32)[None])
        )


def encode_vlm_ref_images(vision_params, vision_cfg, ref_images,
                          max_pixels: int, min_pixels: int = 0):
    """Reference/edit images → list of [n_tokens, D] VL vision-tower token
    embeddings, smart-resized to patch-factor multiples within the pixel-area
    bounds (reference resize_image_dims + llm->encode_image,
    conditioner.hpp:2228-2252)."""
    from sdtpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD
    from sdtpu.models.qwen_vl_vision import clip_smart_resize, qwen_vision_encode
    from sdtpu.utils.image import resize_image

    factor = vision_cfg.patch_size * vision_cfg.spatial_merge_size
    out = []
    for img in ref_images:
        arr = np.asarray(img)[..., :3]
        if arr.dtype != np.uint8:
            arr = np.clip(arr * (255.0 if arr.max() <= 1.5 else 1.0),
                          0, 255).astype(np.uint8)
        nh, nw = clip_smart_resize(arr.shape[0], arr.shape[1], factor,
                                   min_pixels=min_pixels, max_pixels=max_pixels)
        arr = resize_image(arr, nw, nh).astype(np.float32) / 255.0
        arr = (arr - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
        out.append(qwen_vision_encode(vision_params, arr, vision_cfg)[0])
    return out


def splice_vision_states(tokenizer, llm_params, prompt: str, vis_embeds,
                         jit_fwd_embeds, pad_to: int = 0):
    """Tokenize ``prompt``, replace the <|image_pad|> token embeddings with
    the vision-tower embeddings (in order), and run the LLM on input
    embeddings → hidden states [1, L, D] (reference image_embeds splice,
    conditioner.hpp:2153-2284).  pad_to > 0 right-pads with masked pad
    tokens to a minimum length."""
    ids = list(tokenizer.encode(prompt))
    mask = [1.0] * len(ids)
    if pad_to and len(ids) < pad_to:
        pad_id = getattr(tokenizer, "pad_token_id", 0) or 0
        mask += [0.0] * (pad_to - len(ids))
        ids += [pad_id] * (pad_to - len(ids))
    ids_arr = np.asarray(ids, dtype=np.int32)
    image_pad = tokenizer.special.get("<|image_pad|>")
    tok = llm_params["model.embed_tokens.weight"][jnp.asarray(ids_arr)]
    pos = np.nonzero(ids_arr == image_pad)[0]
    vis = jnp.concatenate(vis_embeds, axis=0).astype(tok.dtype)
    assert len(pos) == vis.shape[0], (len(pos), vis.shape)
    tok = tok.at[jnp.asarray(pos)].set(vis)
    return jit_fwd_embeds(
        llm_params, tok[None],
        jnp.asarray(np.asarray(mask, dtype=np.float32)[None]))


def vision_pad_segment(n_tokens: int) -> str:
    return "<|vision_start|>" + "<|image_pad|>" * n_tokens + "<|vision_end|>"


class QwenImageConditioner:
    """Qwen-Image: Qwen2.5-VL decoder LLM prompted with a chat template;
    hidden states after the final norm with the template prefix dropped
    (reference LLMEmbedder, conditioner.hpp:2213-2284,
    prompt_template_encode_start_idx=34)."""

    EDIT_TEMPLATE_PREFIX = (
        "<|im_start|>system\nDescribe the key features of the input image "
        "(color, shape, size, texture, objects, background), then explain "
        "how the user's text instruction should alter or modify the image. "
        "Generate a new image that meets the user's requirements while "
        "maintaining consistency with the original input where appropriate."
        "<|im_end|>\n<|im_start|>user\n"
    )
    EDIT_DROP_IDX = 64

    def __init__(self, qwen_tokenizer, llm_params, llm_cfg, template: str = "qwen_image",
                 max_len: int = 1024, vision_params=None, vision_cfg=None,
                 picture_word: str = "Picture", vlm_min_pixels: int = -1,
                 vlm_max_pixels: int = -1, byt5_params=None, byt5_cfg=None):
        from sdtpu.models.llm import CHAT_TEMPLATES

        self.tokenizer = qwen_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.template, self.drop_idx = CHAT_TEMPLATES[template]
        self.max_len = max_len
        self.vision_params = vision_params
        self.vision_cfg = vision_cfg
        self.picture_word = picture_word  # "Image" for Mage-Flow edit
        # VLM resize bounds (reference conditioner.hpp:2221-2233): qwen edit
        # min 384² / max 560²; Mage-Flow no min / max 384²
        if picture_word == "Image":
            self.vlm_min = 0 if vlm_min_pixels < 0 else vlm_min_pixels
            self.vlm_max = 384 * 384 if vlm_max_pixels < 0 else vlm_max_pixels
        else:
            self.vlm_min = 384 * 384 if vlm_min_pixels < 0 else vlm_min_pixels
            self.vlm_max = 560 * 560 if vlm_max_pixels < 0 else vlm_max_pixels

        from sdtpu.models.llm import llm_forward

        def fwd(pl, ids, mask):
            return llm_forward(pl, ids, self.cl, attention_mask=mask)

        def fwd_embeds(pl, embeds, mask):
            return llm_forward(pl, None, self.cl, input_embeds=embeds,
                               attention_mask=mask)

        self._jit_forward = jax.jit(fwd)
        self._jit_forward_embeds = jax.jit(fwd_embeds)

        # byt5 glyph branch (HunyuanVideo; reference LLMEmbedder byt5,
        # conditioner.hpp:1828-1840)
        self.byt5_params, self.byt5_cfg = byt5_params, byt5_cfg
        if byt5_params is not None:
            from sdtpu.models.t5 import t5_encoder_forward

            self._jit_byt5 = jax.jit(
                lambda p, ids: t5_encoder_forward(p, ids, byt5_cfg))

    def _byt5_condition(self, text: str):
        """Quoted prompt spans → byt5-small hidden states [1, Lb, d], or
        None when the prompt carries no quoted text (reference
        conditioner.hpp:2662-2700)."""
        if self.byt5_params is None:
            return None
        quoted = extract_quoted_texts(text)
        if not quoted:
            return None
        ids = np.asarray(byt5_tokenize(quoted), dtype=np.int32)[None]
        return self._jit_byt5(self.byt5_params, jnp.asarray(ids))

    def _edit_condition(self, text: str, ref_images, **kw) -> SDCondition:
        """Edit path (reference QwenImageEditPlusPipeline branch,
        conditioner.hpp:2213-2273): vision tokens spliced into the token
        embeddings at the <|image_pad|> positions, 64-token prefix dropped."""
        embeds = encode_vlm_ref_images(
            self.vision_params, self.vision_cfg, ref_images,
            max_pixels=kw.get("vlm_max_pixels", self.vlm_max),
            min_pixels=kw.get("vlm_min_pixels", self.vlm_min))
        img_prompt = "".join(
            f"{self.picture_word} {i + 1}: " + vision_pad_segment(e.shape[0])
            for i, e in enumerate(embeds))
        prompt = (self.EDIT_TEMPLATE_PREFIX + img_prompt + text
                  + "<|im_end|>\n<|im_start|>assistant\n")
        h = splice_vision_states(self.tokenizer, self.pl, prompt, embeds,
                                 self._jit_forward_embeds)
        return SDCondition(c_crossattn=h[:, self.EDIT_DROP_IDX:])

    def get_learned_condition(self, text: str, clip_skip: int = -1,
                              ref_images=None, **kw) -> SDCondition:
        if (ref_images and self.vision_params is not None
                and self.tokenizer is not None):
            return self._edit_condition(text, ref_images, **kw)
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(self.template.format(text))[: self.max_len]
            drop = self.drop_idx
        else:  # tests without a tokenizer file
            ids, drop = list(range(48)), 8
        mask = [1] * len(ids)
        h = self._jit_forward(
            self.pl,
            jnp.asarray(np.asarray(ids, dtype=np.int32)[None]),
            jnp.asarray(np.asarray(mask, dtype=np.float32)[None]),
        )
        return SDCondition(c_crossattn=h[:, drop:],
                           c_extra=self._byt5_condition(text))


class LTXAVConditioner:
    """LTX-2: Gemma3-12B with ALL hidden states (49 x 3840 per token), a
    per-state normalization, and a projection to the DiT context — either a
    single 49*3840 -> 3840 linear, or dual video/audio projections producing
    a concatenated 4096+2048 context (reference LTXAVEmbedder /
    LTXAVTextProjection, src/conditioning/conditioner.hpp:2797,2725).

    Prompts are webui-weight parsed, BOS-prefixed and LEFT-padded to 1024
    tokens with a causal+pad additive mask."""

    MIN_LEN = 1024

    def __init__(self, gemma_tokenizer, llm_params, llm_cfg, proj_params,
                 dual_projection: Optional[bool] = None):
        from sdtpu.models.llm import llm_forward

        self.tokenizer = gemma_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.pp = proj_params
        if dual_projection is None:
            dual_projection = "video_aggregate_embed.weight" in proj_params
        self.dual = dual_projection
        self.num_states = llm_cfg.num_layers + 1
        self.hidden = llm_cfg.hidden_size

        def fwd(pl, ids, bias):
            return llm_forward(pl, ids, self.cl, attention_mask=bias,
                               all_hidden_states=True)

        self._jit_forward = jax.jit(fwd)

    def _normalize_states(self, h: np.ndarray) -> np.ndarray:
        """h: [valid, states, hidden].  Dual: per-(state, token) RMS.
        Single: per-state (x - mean) * 8/(max - min) over all tokens
        (conditioner.hpp:2947-2994)."""
        if self.dual:
            rms = np.sqrt(np.mean(np.square(h), axis=-1, keepdims=True) + 1e-6)
            return h / rms
        mean = h.mean(axis=(0, 2), keepdims=True)
        span = (h.max(axis=(0, 2), keepdims=True)
                - h.min(axis=(0, 2), keepdims=True) + 1e-6)
        return (h - mean) * (8.0 / span)

    def _project(self, flat: jnp.ndarray) -> jnp.ndarray:
        from sdtpu.ops import linear

        if not self.dual:
            return linear(flat, self.pp["projection.weight"])
        video_in = flat * float(np.sqrt(4096.0 / self.hidden))
        audio_in = flat * float(np.sqrt(2048.0 / self.hidden))
        video = linear(video_in, self.pp["video_aggregate_embed.weight"],
                       self.pp.get("video_aggregate_embed.bias"))
        audio = linear(audio_in, self.pp["audio_aggregate_embed.weight"],
                       self.pp.get("audio_aggregate_embed.bias"))
        return jnp.concatenate([video, audio], axis=-1)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        ids: List[int] = []
        w: List[float] = []
        if self.tokenizer is not None:
            for span, weight in parse_prompt_attention(text):
                span_ids = self.tokenizer.encode(span)
                ids.extend(span_ids)
                w.extend([weight] * len(span_ids))
            ids, mask = self.tokenizer.pad(ids, self.MIN_LEN)
            w = [1.0] * (len(ids) - len(w)) + w  # BOS + left pads weight 1
        else:  # tests without a tokenizer file
            n_valid = 9
            ids = [0] * (self.MIN_LEN - n_valid) + list(range(1, n_valid + 1))
            mask = [0.0] * (self.MIN_LEN - n_valid) + [1.0] * n_valid
            w = [1.0] * self.MIN_LEN

        n = len(ids)
        m = np.asarray(mask, dtype=np.float32)
        # additive causal + pad bias (conditioner.hpp:2913-2926)
        bias = np.where(m[None, :] > 0, 0.0, -1e9).astype(np.float32)
        bias = bias + np.triu(np.full((n, n), -1e9, dtype=np.float32), k=1)

        h = self._jit_forward(
            self.pl,
            jnp.asarray(np.asarray(ids, dtype=np.int32)[None]),
            jnp.asarray(bias),
        )
        h = apply_token_weights(h, jnp.asarray(np.asarray(w, np.float32)[None]))

        valid = int(m.sum())
        hs = np.asarray(h[0, n - valid:], dtype=np.float32)  # [valid, S*H]
        hs = hs.reshape(valid, self.num_states, self.hidden)
        hs = self._normalize_states(hs)
        flat = jnp.asarray(hs.reshape(valid, self.num_states * self.hidden))
        ctx = self._project(flat)
        return SDCondition(c_crossattn=ctx[None])


class ZImageConditioner:
    """Z-Image: Qwen3 decoder LLM, plain chat wrap, hidden states from the
    second-to-last layer without the final norm (reference LLMEmbedder for
    z_image: out_layers={35}, start idx 0, conditioner.hpp:2544-2564)."""

    TEMPLATE = "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"

    def __init__(self, qwen_tokenizer, llm_params, llm_cfg, max_len: int = 1024):
        from sdtpu.models.llm import llm_forward

        self.tokenizer = qwen_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.max_len = max_len
        out_layer = llm_cfg.num_layers - 1

        def fwd(pl, ids):
            return llm_forward(pl, ids, self.cl, output_layer=out_layer)

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(self.TEMPLATE.format(text))[: self.max_len]
        else:  # tests without a tokenizer file
            ids = list(range(24))
        h = self._jit_forward(
            self.pl, jnp.asarray(np.asarray(ids, dtype=np.int32)[None]))
        return SDCondition(c_crossattn=h)


class Flux2Conditioner:
    """FLUX.2: Mistral-Small-3.2 prompted with the BFL system template,
    hidden states from layers {10, 20, 30} concatenated on the feature axis
    and zero-padded to 512 tokens (reference LLMEmbedder for FLUX2,
    conditioner.hpp:2493-2505).  FLUX.2-klein swaps in Qwen3 with a <think>
    chat template and layers {9, 18, 27} (conditioner.hpp:2565-2577)."""

    TEMPLATE = (
        "[SYSTEM_PROMPT]You are an AI that reasons about image descriptions. "
        "You give structured responses focusing on object relationships, "
        "object\nattribution and actions without speculation.[/SYSTEM_PROMPT]"
        "[INST]{}[/INST]"
    )
    KLEIN_TEMPLATE = ("<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant"
                      "\n<think>\n\n</think>\n\n")
    OUT_LAYERS = (10, 20, 30)
    KLEIN_OUT_LAYERS = (9, 18, 27)
    MIN_LEN = 512  # hidden-state zero pad, applied AFTER the LLM forward

    def __init__(self, tokenizer, llm_params, llm_cfg, klein: bool = False,
                 out_layers=None, max_len: int = 512, min_len: int = MIN_LEN):
        from sdtpu.models.llm import llm_forward

        self.tokenizer = tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.klein = klein
        self.max_len = max_len
        self.min_len = min_len
        layers = tuple(out_layers or
                       (self.KLEIN_OUT_LAYERS if klein else self.OUT_LAYERS))
        layers = tuple(min(li, llm_cfg.num_layers + 1) for li in layers)

        def fwd(pl, ids):
            return llm_forward(pl, ids, self.cl, output_layers=layers)

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        template = self.KLEIN_TEMPLATE if self.klein else self.TEMPLATE
        if self.tokenizer is not None:
            ids = []
            if not self.klein:  # Mistral tokenizer prepends <s>
                ids.append(getattr(self.tokenizer, "bos_token_id", 1))
            ids += self.tokenizer.encode(template.format(text))
            ids = ids[: self.max_len]
        else:  # tests without a tokenizer file
            ids = list(range(12))
        h = self._jit_forward(
            self.pl, jnp.asarray(np.asarray(ids, dtype=np.int32)[None]))
        if h.shape[1] < self.min_len:
            h = jnp.pad(h, ((0, 0), (0, self.min_len - h.shape[1]), (0, 0)))
        return SDCondition(c_crossattn=h)


class LensConditioner:
    """Lens: GPT-OSS-20B prompted in harmony format; hidden states from
    layers {6, 12, 18, 24} concatenated on the feature axis, template prefix
    (97 tokens) dropped, capped at 512 tokens (reference LLMEmbedder for
    lens, conditioner.hpp:2520-2543)."""

    TEMPLATE = (
        "<|start|>system<|message|>You are ChatGPT, a large language model "
        "trained by OpenAI.\nKnowledge cutoff: 2024-06\n"
        "Current date: 2026-05-26\n\nReasoning: medium\n\n"
        "# Valid channels: analysis, commentary, final. Channel must be "
        "included for every message.<|end|><|start|>developer<|message|># "
        "Instructions\n\nDescribe the image by detailing the color, shape, "
        "size, texture, quantity, text, spatial relationships of the objects "
        "and background.\n\n<|end|><|start|>user<|message|>{}"
        "<|end|><|start|>assistant<|channel|>analysis<|message|>Need to "
        "generate one image according to the description.<|end|>"
        "<|start|>assistant<|channel|>final<|message|>"
    )
    DROP_IDX = 97
    OUT_LAYERS = (6, 12, 18, 24)
    MAX_LEN = 512

    def __init__(self, gptoss_tokenizer, llm_params, llm_cfg, out_layers=None):
        from sdtpu.models.llm import llm_forward

        self.tokenizer = gptoss_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        layers = tuple(out_layers or self.OUT_LAYERS)
        # scale picks down for tiny test configs
        layers = tuple(min(li, llm_cfg.num_layers) for li in layers)

        def fwd(pl, ids):
            return llm_forward(pl, ids, self.cl, output_layers=layers)

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(self.TEMPLATE.format(text))[: self.MAX_LEN]
            drop = min(self.DROP_IDX, max(0, len(ids) - 1))
        else:  # tests without a tokenizer file
            ids, drop = list(range(16)), 4
        h = self._jit_forward(
            self.pl, jnp.asarray(np.asarray(ids, dtype=np.int32)[None]))
        return SDCondition(c_crossattn=h[:, drop:])


class SVDConditioner:
    """Stable Video Diffusion: image-only conditioning — the text prompt is
    ignored; context is the CLIP-ViT-H image embedding (filled in by the
    pipeline's video_condition_fn; the conditioner supplies the ZERO
    embedding used for the uncond branch) and c_vector packs sinusoidal
    embeddings of (fps_id, motion_bucket_id, cond_aug), 256 dims each
    (reference FrozenCLIPVisionEmbedder conditioner.hpp:537 + SVD
    adm_in_channels 768, unet.hpp:62)."""

    def __init__(self, fps_id: float = 6.0, motion_bucket_id: float = 127.0,
                 cond_aug: float = 0.02, context_dim: int = 1024):
        self.fps_id = fps_id
        self.motion_bucket_id = motion_bucket_id
        self.cond_aug = cond_aug
        self.context_dim = context_dim

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        from sdtpu.ops import timestep_embedding

        vec = jnp.concatenate([
            timestep_embedding(jnp.asarray([self.fps_id]), 256),
            timestep_embedding(jnp.asarray([self.motion_bucket_id]), 256),
            timestep_embedding(jnp.asarray([self.cond_aug]), 256),
        ], axis=-1)  # [1, 768]
        return SDCondition(
            c_crossattn=jnp.zeros((1, 1, self.context_dim)), c_vector=vec)


class LingBotConditioner:
    """LingBot-Video: Qwen3-VL prompted with a video prompt-enhancement
    system instruction; final-norm hidden states with the template prefix
    dropped (reference LLMEmbedder for lingbot_video,
    conditioner.hpp:2129-2212)."""

    PREFIX = (
        "<|im_start|>system\nGiven a user input that may include a text "
        "prompt alone, a text prompt with an image reference, or a text "
        "prompt with a video reference or a video reference alone, generate "
        "an \"Enhanced prompt\" that provides detailed visual descriptions "
        "suitable for video generation. Evaluate the level of detail in the "
        "user's input: if it is simple, enrich it by adding specifics about "
        "colors, shapes, sizes, textures, lighting, motion dynamics, camera "
        "movement, temporal progression, and spatial relationships to create "
        "vivid, concrete, and temporally coherent scenes to create vivid and "
        "concrete scenes. Please generate only the enhanced description for "
        "the prompt below and avoid including any additional commentary or "
        "evaluations:<|im_end|>\n<|im_start|>user\n"
    )
    SUFFIX = "<|im_end|>\n<|im_start|>assistant\n"

    def __init__(self, qwen_tokenizer, llm_params, llm_cfg,
                 max_len: int = 1024):
        from sdtpu.models.llm import llm_forward

        self.tokenizer = qwen_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.max_len = max_len

        def fwd(pl, ids):
            return llm_forward(pl, ids, self.cl)

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        if self.tokenizer is not None:
            drop = len(self.tokenizer.encode(self.PREFIX))
            ids = self.tokenizer.encode(
                self.PREFIX + text + self.SUFFIX)[: self.max_len]
            drop = min(drop, max(0, len(ids) - 1))
        else:  # tests without a tokenizer file
            ids, drop = list(range(12)), 3
        h = self._jit_forward(
            self.pl, jnp.asarray(np.asarray(ids, dtype=np.int32)[None]))
        return SDCondition(c_crossattn=h[:, drop:])


class HiDreamO1Conditioner:
    """HiDream-O1: the conditioner only TOKENIZES — the Qwen3-VL LLM is the
    diffusion backbone itself, so conditioning state (input ids, IMROPE
    position ids, text-causal/gen-full mask) is baked into the sampling
    program per prompt (reference HiDreamO1Conditioner,
    hidream_o1.hpp:493-570)."""

    TEMPLATE = ("<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"
                "<|boi_token|><|tms_token|>")

    def __init__(self, qwen_tokenizer, patch_size: int = 32):
        self.tokenizer = qwen_tokenizer
        self.patch_size = patch_size
        self.states: list = []  # [cond, uncond?] for the current generate()

    def get_learned_condition(self, text: str, clip_skip: int = -1,
                              width: int = 0, height: int = 0, **kw) -> SDCondition:
        from sdtpu.models.hidream_o1 import build_hidream_state

        if self.tokenizer is not None:
            ids = self.tokenizer.encode(self.TEMPLATE.format(text))
        else:  # tests without a tokenizer file
            ids = list(range(8))
        lh = max(1, height // self.patch_size)
        lw = max(1, width // self.patch_size)
        self.states.append(build_hidream_state(ids, lh, lw))
        # context is carried via baked state; a placeholder keeps the
        # pipeline's generic CFG batching machinery working
        return SDCondition(c_crossattn=jnp.zeros((1, 1, 1)))


class PidConditioner:
    """PiD: Gemma2-2B prompted with the prompt-enhancement instruction;
    final hidden states, left-padded to chi_tokens+298, then BOS + the last
    299 states kept → exactly 300 tokens (reference LLMEmbedder for pid,
    conditioner.hpp:2600-2646)."""

    CHI_PROMPT = (
        "Given a user prompt, generate an \"Enhanced prompt\" that provides "
        "detailed visual descriptions suitable for image generation. Evaluate "
        "the level of detail in the user prompt:\n"
        "- If the prompt is simple, focus on adding specifics about colors, "
        "shapes, sizes, textures, and spatial relationships to create vivid "
        "and concrete scenes.\n"
        "- If the prompt is already detailed, refine and enhance the existing "
        "details slightly without overcomplicating.\n"
        "Here are examples of how to transform or refine prompts:\n"
        "- User Prompt: A cat sleeping -> Enhanced: A small, fluffy white cat "
        "curled up in a round shape, sleeping peacefully on a warm sunny "
        "windowsill, surrounded by pots of blooming red flowers.\n"
        "- User Prompt: A busy city street -> Enhanced: A bustling city "
        "street scene at dusk, featuring glowing street lamps, a diverse "
        "crowd of people in colorful clothing, and a double-decker bus "
        "passing by towering glass skyscrapers.\n"
        "Please generate only the enhanced description for the prompt below "
        "and avoid including any additional commentary or evaluations:\n"
        "User Prompt: "
    )
    MAX_LEN = 300

    def __init__(self, gemma_tokenizer, llm_params, llm_cfg,
                 max_len: int = MAX_LEN):
        from sdtpu.models.llm import llm_forward

        self.tokenizer = gemma_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.max_len = max_len

        def fwd(pl, ids, mask):
            return llm_forward(pl, ids, self.cl, attention_mask=mask)

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        if self.tokenizer is not None:
            bos = getattr(self.tokenizer, "bos_token_id", 2)
            pad = getattr(self.tokenizer, "pad_token_id", 0)
            n_chi = len(self.tokenizer.encode(self.CHI_PROMPT)) + 1  # + BOS
            ids = [bos] + self.tokenizer.encode(self.CHI_PROMPT + " " + text)
            min_len = n_chi + self.max_len - 2
            mask = [1.0] * len(ids)
            if len(ids) < min_len:  # gemma pads LEFT (tokenizer.h pad_left)
                n = min_len - len(ids)
                ids = [pad] * n + ids
                mask = [0.0] * n + mask
        else:  # tests without a tokenizer file
            ids, mask = list(range(12)), [1.0] * 12
        h = self._jit_forward(
            self.pl, jnp.asarray(np.asarray(ids, dtype=np.int32)[None]),
            jnp.asarray(np.asarray(mask, dtype=np.float32)[None]))
        if h.shape[1] > self.max_len:
            # keep position 0 + the last max_len-1 states (reference
            # conditioner.hpp:2632-2639)
            h = jnp.concatenate([h[:, :1], h[:, -(self.max_len - 1):]], axis=1)
        return SDCondition(c_crossattn=h)


class SefiConditioner:
    """SeFi-Image: Qwen3-VL plain chat wrap; hidden states from layers
    {9, 18, 27} concatenated on the feature axis, tokens right-padded to
    1024 with pad keys masked (reference LLMEmbedder for sefi,
    conditioner.hpp:2577-2589)."""

    TEMPLATE = "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"
    OUT_LAYERS = (9, 18, 27)
    MIN_LEN = 1024

    def __init__(self, qwen_tokenizer, llm_params, llm_cfg, out_layers=None,
                 min_len: int = MIN_LEN):
        from sdtpu.models.llm import llm_forward

        self.tokenizer = qwen_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.min_len = min_len
        layers = tuple(out_layers or self.OUT_LAYERS)
        layers = tuple(min(li, llm_cfg.num_layers + 1) for li in layers)

        def fwd(pl, ids, mask):
            return llm_forward(pl, ids, self.cl, attention_mask=mask,
                               output_layers=layers)

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(self.TEMPLATE.format(text))
        else:  # tests without a tokenizer file
            ids = list(range(12))
        mask = [1.0] * len(ids)
        if len(ids) < self.min_len:
            pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
            mask += [0.0] * (self.min_len - len(ids))
            ids = ids + [pad_id] * (self.min_len - len(ids))
        h = self._jit_forward(
            self.pl, jnp.asarray(np.asarray(ids, dtype=np.int32)[None]),
            jnp.asarray(np.asarray(mask, dtype=np.float32)[None]))
        return SDCondition(c_crossattn=h)


class OvisImageConditioner:
    """Ovis-Image: Qwen3 prompted with a captioning instruction + <think>
    suffix; final-norm hidden states, the 28-token template prefix dropped,
    right-padded to 256 content tokens with masked pad positions (reference
    LLMEmbedder for ovis, conditioner.hpp:2590-2599)."""

    TEMPLATE = ("<|im_start|>user\nDescribe the image by detailing the "
                "color, quantity, text, shape, size, texture, spatial "
                "relationships of the objects and background: {}"
                "<|im_end|>\n<|im_start|>assistant\n<think>\n\n</think>\n\n")
    START_IDX = 28
    CONTENT_LEN = 256

    def __init__(self, qwen_tokenizer, llm_params, llm_cfg,
                 start_idx: int = START_IDX, content_len: int = CONTENT_LEN):
        from sdtpu.models.llm import llm_forward

        self.tokenizer = qwen_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.start_idx = start_idx
        self.content_len = content_len

        def fwd(pl, ids, mask):
            return llm_forward(pl, ids, self.cl, attention_mask=mask)

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(self.TEMPLATE.format(text))
            start = min(self.start_idx, max(0, len(ids) - 1))
        else:  # tests without a tokenizer file
            ids, start = list(range(12)), 3
        min_len = start + self.content_len
        mask = [1.0] * len(ids)
        if len(ids) < min_len:
            pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
            mask += [0.0] * (min_len - len(ids))
            ids = ids + [pad_id] * (min_len - len(ids))
        h = self._jit_forward(
            self.pl, jnp.asarray(np.asarray(ids, dtype=np.int32)[None]),
            jnp.asarray(np.asarray(mask, dtype=np.float32)[None]))
        return SDCondition(c_crossattn=h[:, start:])


class LongCatConditioner(OvisImageConditioner):
    """LongCat-Image: Qwen2.5-VL with a captioning system prompt; final-norm
    hidden states, 36-token template prefix dropped, padded to 512 content
    tokens (reference LLMEmbedder for longcat, conditioner.hpp:2425-2492).
    Edit path: editing-expert system prompt with the reference images
    vision-spliced before the instruction, 67-token prefix dropped
    (reference LongCatEditPipeline branch, conditioner.hpp:2430-2480)."""

    TEMPLATE = ("<|im_start|>system\nAs an image captioning expert, generate "
                "a descriptive text prompt based on an image content, "
                "suitable for input to a text-to-image model.<|im_end|>\n"
                "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n")
    START_IDX = 36
    CONTENT_LEN = 512
    EDIT_PREFIX = (
        "<|im_start|>system\nAs an image editing expert, first analyze the "
        "content and attributes of the input image(s). Then, based on the "
        "user's editing instructions, clearly and precisely determine how to "
        "modify the given image(s), ensuring that only the specified parts "
        "are altered and all other aspects remain consistent with the "
        "original(s).<|im_end|>\n<|im_start|>user\n")
    EDIT_START_IDX = 67

    def __init__(self, qwen_tokenizer, llm_params, llm_cfg,
                 start_idx: int = START_IDX, content_len: int = CONTENT_LEN,
                 vision_params=None, vision_cfg=None, vlm_min_pixels: int = -1,
                 vlm_max_pixels: int = -1, edit_start_idx: int = -1):
        super().__init__(qwen_tokenizer, llm_params, llm_cfg,
                         start_idx=start_idx, content_len=content_len)
        from sdtpu.models.llm import llm_forward

        self.vision_params = vision_params
        self.vision_cfg = vision_cfg
        self.vlm_min = 384 * 384 if vlm_min_pixels < 0 else vlm_min_pixels
        self.vlm_max = 560 * 560 if vlm_max_pixels < 0 else vlm_max_pixels
        self.edit_start_idx = (self.EDIT_START_IDX if edit_start_idx < 0
                               else edit_start_idx)

        def fwd_embeds(pl, embeds, mask):
            return llm_forward(pl, None, self.cl, input_embeds=embeds,
                               attention_mask=mask)

        self._jit_forward_embeds = jax.jit(fwd_embeds)

    def get_learned_condition(self, text: str, clip_skip: int = -1,
                              ref_images=None, **kw) -> SDCondition:
        if not (ref_images and self.vision_params is not None
                and self.tokenizer is not None):
            return super().get_learned_condition(text, clip_skip=clip_skip, **kw)
        embeds = encode_vlm_ref_images(
            self.vision_params, self.vision_cfg, ref_images,
            max_pixels=kw.get("vlm_max_pixels", self.vlm_max),
            min_pixels=kw.get("vlm_min_pixels", self.vlm_min))
        img_prompt = "".join(vision_pad_segment(e.shape[0]) for e in embeds)
        prompt = (self.EDIT_PREFIX + img_prompt + text
                  + "<|im_end|>\n<|im_start|>assistant\n")
        n_ids = len(self.tokenizer.encode(prompt))
        start = min(self.edit_start_idx, max(0, n_ids - 1))
        h = splice_vision_states(
            self.tokenizer, self.pl, prompt, embeds, self._jit_forward_embeds,
            pad_to=start + self.content_len)
        return SDCondition(c_crossattn=h[:, start:])


class ErnieImageConditioner:
    """ERNIE-Image: Ministral-3.3B, raw prompt (no chat template), hidden
    states from the second-to-last layer (reference LLMEmbedder for
    ernie_image: out_layers={25}, conditioner.hpp:2513)."""

    def __init__(self, mistral_tokenizer, llm_params, llm_cfg,
                 max_len: int = 1024):
        from sdtpu.models.llm import llm_forward

        self.tokenizer = mistral_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.max_len = max_len
        out_layer = llm_cfg.num_layers - 1

        def fwd(pl, ids):
            return llm_forward(pl, ids, self.cl, output_layer=out_layer)

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        if self.tokenizer is not None:
            ids = [getattr(self.tokenizer, "bos_token_id", 1)]
            ids += self.tokenizer.encode(text)
            ids = ids[: self.max_len]
        else:  # tests without a tokenizer file
            ids = list(range(12))
        h = self._jit_forward(
            self.pl, jnp.asarray(np.asarray(ids, dtype=np.int32)[None]))
        return SDCondition(c_crossattn=h)


class Ideogram4Conditioner:
    """Ideogram4: Qwen3-VL chat-wrapped prompt, 13 hidden-state layers
    {1,4,...,34,36} concatenated layer-major (reference LLMEmbedder,
    conditioner.hpp:2505-2512)."""

    TEMPLATE = "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n"
    OUT_LAYERS = (1, 4, 7, 10, 13, 16, 19, 22, 25, 28, 31, 34, 36)

    def __init__(self, qwen_tokenizer, llm_params, llm_cfg, out_layers=None,
                 max_len: int = 1024):
        from sdtpu.models.llm import llm_forward

        self.tokenizer = qwen_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.max_len = max_len
        layers = tuple(out_layers or self.OUT_LAYERS)
        layers = tuple(min(li, llm_cfg.num_layers + 1) for li in layers)

        def fwd(pl, ids):
            return llm_forward(pl, ids, self.cl, output_layers=layers)

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(self.TEMPLATE.format(text))[: self.max_len]
        else:  # tests without a tokenizer file
            ids = list(range(10))
        h = self._jit_forward(
            self.pl, jnp.asarray(np.asarray(ids, dtype=np.int32)[None]))
        return SDCondition(c_crossattn=h)


class MiniT2IConditioner:
    """MiniT2I: T5 encoder, 256-token pad; the 0/1 validity mask rides in
    c_vector and is consumed by the DiT's learned mask token (reference
    MiniT2IConditioner, conditioner.hpp:1527)."""

    def __init__(self, t5_tokenizer, t5_params, t5_cfg, seq_len: int = 256):
        from sdtpu.models.t5 import t5_encoder_forward

        self.tokenizer = t5_tokenizer
        self.pt, self.ct = t5_params, t5_cfg
        self.seq_len = seq_len

        def fwd(pt, ids, mask):
            return t5_encoder_forward(pt, ids, self.ct, attention_mask=mask)

        self._jit_forward = jax.jit(fwd)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(text)[: self.seq_len]
        else:  # tests without a tokenizer file
            ids = list(range(1, 9))
        mask = [1.0] * len(ids) + [0.0] * (self.seq_len - len(ids))
        ids = ids + [0] * (self.seq_len - len(ids))
        h = self._jit_forward(
            self.pt,
            jnp.asarray(np.asarray(ids, dtype=np.int32)[None]),
            jnp.asarray(np.asarray(mask, dtype=np.float32)[None]),
        )
        return SDCondition(
            c_crossattn=h,
            c_vector=jnp.asarray(np.asarray(mask, np.float32)[None]))


class AnimaConditioner:
    """Anima: Qwen3 hidden states fed through the checkpoint's LLM adapter
    against T5 token embeddings, T5-weighted, zero-padded to 512 tokens
    (reference AnimaConditioner, conditioner.hpp:1646 + the in-DiT adapter,
    anima.hpp:522 — run here once per prompt instead of per step)."""

    TARGET_LEN = 512

    def __init__(self, qwen_tokenizer, t5_tokenizer, llm_params, llm_cfg,
                 adapter_params, adapter_prefix: str = "net.llm_adapter"):
        from sdtpu.models.anima import llm_adapter_forward
        from sdtpu.models.llm import llm_forward

        self.qwen_tokenizer = qwen_tokenizer
        self.t5_tokenizer = t5_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.pa = adapter_params

        def fwd(pl, ids):
            return llm_forward(pl, ids, self.cl)

        def adapt(pa, src, t5_ids):
            return llm_adapter_forward(pa, src, t5_ids, prefix=adapter_prefix)

        self._jit_llm = jax.jit(fwd)
        self._jit_adapter = jax.jit(adapt)

    def get_learned_condition(self, text: str, clip_skip: int = -1, **kw) -> SDCondition:
        spans = parse_prompt_attention(text)
        if self.qwen_tokenizer is not None:
            q_ids = []
            for span, _w in spans:
                q_ids.extend(self.qwen_tokenizer.encode(span))
            q_ids = q_ids or [151643]
        else:  # tests without tokenizer files
            q_ids = list(range(1, 9))
        t5_ids: List[int] = []
        t5_w: List[float] = []
        if self.t5_tokenizer is not None:
            for span, wgt in spans:
                sp = self.t5_tokenizer.encode(span)
                t5_ids.extend(sp)
                t5_w.extend([wgt] * len(sp))
            t5_ids.append(self.t5_tokenizer.eos_token_id)
            t5_w.append(1.0)
        else:
            t5_ids = list(range(1, 7))
            t5_w = [1.0] * 6

        src = self._jit_llm(self.pl, jnp.asarray(np.asarray(q_ids, np.int32)[None]))
        ctx = self._jit_adapter(self.pa, src,
                                jnp.asarray(np.asarray(t5_ids, np.int32)[None]))
        ctx = ctx * jnp.asarray(np.asarray(t5_w, np.float32))[None, :, None]
        n = ctx.shape[1]
        if n < self.TARGET_LEN:
            pad = jnp.zeros((1, self.TARGET_LEN - n, ctx.shape[2]), ctx.dtype)
            ctx = jnp.concatenate([ctx, pad], axis=1)
        else:
            ctx = ctx[:, : self.TARGET_LEN]
        return SDCondition(c_crossattn=ctx)


class BooguConditioner:
    """Boogu-Image: Qwen3-VL with a system+user chat wrap, final-norm hidden
    states (reference LLMEmbedder boogu branch, conditioner.hpp:2287).
    Edit path: editing system prompt with reference images vision-spliced
    before the instruction (reference BooguImageEditPipeline,
    conditioner.hpp:2297-2355; VLM resize bounds 384²)."""

    T2I_SYSTEM = ("You are a helpful assistant that generates high-quality "
                  "images based on user instructions. The instructions are "
                  "as follows.")
    EDIT_SYSTEM = ("Describe the key features of the input image (color, "
                   "shape, size, texture, objects, background), then explain "
                   "how the user's text instruction should alter or modify "
                   "the image. Generate a new image that meets the user's "
                   "requirements while maintaining consistency with the "
                   "original input where appropriate.")

    def __init__(self, qwen_tokenizer, llm_params, llm_cfg, max_len: int = 1024,
                 vision_params=None, vision_cfg=None, vlm_min_pixels: int = -1,
                 vlm_max_pixels: int = -1):
        from sdtpu.models.llm import llm_forward

        self.tokenizer = qwen_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.max_len = max_len
        self.vision_params = vision_params
        self.vision_cfg = vision_cfg
        self.vlm_min = 384 * 384 if vlm_min_pixels < 0 else vlm_min_pixels
        self.vlm_max = 384 * 384 if vlm_max_pixels < 0 else vlm_max_pixels

        def fwd(pl, ids):
            return llm_forward(pl, ids, self.cl)

        def fwd_embeds(pl, embeds, mask):
            return llm_forward(pl, None, self.cl, input_embeds=embeds,
                               attention_mask=mask)

        self._jit_forward = jax.jit(fwd)
        self._jit_forward_embeds = jax.jit(fwd_embeds)

    def get_learned_condition(self, text: str, clip_skip: int = -1,
                              ref_images=None, **kw) -> SDCondition:
        if (ref_images and self.vision_params is not None
                and self.tokenizer is not None):
            embeds = encode_vlm_ref_images(
                self.vision_params, self.vision_cfg, ref_images,
                max_pixels=kw.get("vlm_max_pixels", self.vlm_max),
                min_pixels=kw.get("vlm_min_pixels", self.vlm_min))
            img_prompt = "".join(vision_pad_segment(e.shape[0]) for e in embeds)
            prompt = (f"<|im_start|>system\n{self.EDIT_SYSTEM}<|im_end|>\n"
                      f"<|im_start|>user\n{img_prompt}{text}<|im_end|>\n")
            h = splice_vision_states(self.tokenizer, self.pl, prompt, embeds,
                                     self._jit_forward_embeds)
            return SDCondition(c_crossattn=h)
        # empty prompt → edit system text (reference text_empty switch)
        system = self.T2I_SYSTEM if text.strip() else self.EDIT_SYSTEM
        prompt = (f"<|im_start|>system\n{system}<|im_end|>\n"
                  f"<|im_start|>user\n{text}<|im_end|>\n")
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(prompt)[: self.max_len]
        else:  # tests without a tokenizer file
            ids = list(range(11))
        h = self._jit_forward(
            self.pl, jnp.asarray(np.asarray(ids, dtype=np.int32)[None]))
        return SDCondition(c_crossattn=h)


class Krea2Conditioner:
    """Krea2: Qwen3-VL with the qwen-image system template, 12 hidden-state
    layers {2,5,...,35} concatenated layer-major, template prefix (34 tokens)
    dropped (reference LLMEmbedder krea2 branch, conditioner.hpp:2363)."""

    TEMPLATE = ("<|im_start|>system\nDescribe the image by detailing the "
                "color, shape, size, texture, quantity, text, spatial "
                "relationships of the objects and background:<|im_end|>\n"
                "<|im_start|>user\n{}<|im_end|>\n<|im_start|>assistant\n")
    DROP_IDX = 34
    OUT_LAYERS = (2, 5, 8, 11, 14, 17, 20, 23, 26, 29, 32, 35)

    def __init__(self, qwen_tokenizer, llm_params, llm_cfg, out_layers=None,
                 max_len: int = 1024, vision_params=None, vision_cfg=None,
                 vlm_min_pixels: int = -1, vlm_max_pixels: int = -1):
        from sdtpu.models.llm import llm_forward

        self.tokenizer = qwen_tokenizer
        self.pl, self.cl = llm_params, llm_cfg
        self.max_len = max_len
        self.vision_params = vision_params
        self.vision_cfg = vision_cfg
        # reference krea2 branch: min 384², max 1024² (conditioner.hpp:2370)
        self.vlm_min = 384 * 384 if vlm_min_pixels < 0 else vlm_min_pixels
        self.vlm_max = 1024 * 1024 if vlm_max_pixels < 0 else vlm_max_pixels
        layers = tuple(out_layers or self.OUT_LAYERS)
        layers = tuple(min(li, llm_cfg.num_layers + 1) for li in layers)

        def fwd(pl, ids):
            return llm_forward(pl, ids, self.cl, output_layers=layers)

        def fwd_embeds(pl, embeds, mask):
            return llm_forward(pl, None, self.cl, input_embeds=embeds,
                               attention_mask=mask, output_layers=layers)

        self._jit_forward = jax.jit(fwd)
        self._jit_forward_embeds = jax.jit(fwd_embeds)

    def get_learned_condition(self, text: str, clip_skip: int = -1,
                              ref_images=None, **kw) -> SDCondition:
        if (ref_images and self.vision_params is not None
                and self.tokenizer is not None):
            # reference images "Picture N:"-spliced into the user turn
            # (reference krea2 ref branch, conditioner.hpp:2368-2421)
            embeds = encode_vlm_ref_images(
                self.vision_params, self.vision_cfg, ref_images,
                max_pixels=self.vlm_max, min_pixels=self.vlm_min)
            img_prompt = "".join(
                f"Picture {i + 1}: " + vision_pad_segment(e.shape[0])
                for i, e in enumerate(embeds))
            prompt = self.TEMPLATE.format(img_prompt + text)
            h = splice_vision_states(self.tokenizer, self.pl, prompt, embeds,
                                     self._jit_forward_embeds)
            return SDCondition(c_crossattn=h[:, self.DROP_IDX:])
        if self.tokenizer is not None:
            ids = self.tokenizer.encode(self.TEMPLATE.format(text))[: self.max_len]
            drop = min(self.DROP_IDX, max(0, len(ids) - 1))
        else:  # tests without a tokenizer file
            ids, drop = list(range(12)), 3
        h = self._jit_forward(
            self.pl, jnp.asarray(np.asarray(ids, dtype=np.int32)[None]))
        return SDCondition(c_crossattn=h[:, drop:])

"""Qwen2/Qwen2.5 byte-level BPE tokenizer, loaded from an HF tokenizer.json.

Reference analog: Qwen2Tokenizer (src/tokenizers/qwen2_tokenizer.h:8).  The
embedded vocab blob is unavailable offline, so the vocabulary comes from a
user-supplied tokenizer.json (same requirement as the T5 tokenizer here).
"""
from __future__ import annotations

import json
import re
from typing import Dict, List, Tuple

from .bpe import BPE, bytes_to_unicode

# GPT-2 style pre-tokenization regex used by Qwen2 (contractions, words,
# numbers in 1-3 digit groups, punctuation, whitespace runs)
_PRETOK = re.compile(
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])"
    r"|[^\r\n\w]?[a-zA-Z]+|\d{1,3}"
    r"| ?[^\s\w]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)


class Qwen2Tokenizer:
    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]],
                 special_tokens: Dict[str, int]):
        self.vocab = vocab
        self.special = special_tokens
        self.bpe = BPE({tuple(m): i for i, m in enumerate(merges)})
        self.byte_map = bytes_to_unicode()
        self.eos_token_id = special_tokens.get("<|im_end|>", special_tokens.get("<|endoftext|>", 151643))
        self.pad_token_id = special_tokens.get("<|endoftext|>", 151643)
        # longest-first special token splitting
        self._special_re = (
            re.compile("(" + "|".join(re.escape(t) for t in
                                      sorted(special_tokens, key=len, reverse=True)) + ")")
            if special_tokens
            else None
        )

    # canonical Qwen2/Qwen2.5 special-token ids (fixed across the family)
    _CANONICAL_SPECIAL = {
        "<|endoftext|>": 151643, "<|im_start|>": 151644, "<|im_end|>": 151645,
        "<|object_ref_start|>": 151646, "<|object_ref_end|>": 151647,
        "<|box_start|>": 151648, "<|box_end|>": 151649,
        "<|quad_start|>": 151650, "<|quad_end|>": 151651,
        "<|vision_start|>": 151652, "<|vision_end|>": 151653,
        "<|vision_pad|>": 151654, "<|image_pad|>": 151655,
        "<|video_pad|>": 151656,
    }

    @classmethod
    def byte_fallback(cls) -> "Qwen2Tokenizer":
        """Sidecar-free degraded tokenizer for bare safetensors Qwen TEs
        (reference UX: vocabs are compiled in, src/tokenizers/vocab/vocab.cpp;
        offline we can synthesize only the merge-free subset).

        Byte-level BPE vocabs in the GPT-2 lineage (incl. Qwen2) seed ids
        0..255 with the 256 byte-alphabet units in bytes_to_unicode order and
        pin the special tokens at fixed ids, so encoding text as raw byte
        tokens + exact chat-template specials yields VALID Qwen2 token ids —
        just without multi-byte merges (every word becomes its bytes).
        Conditioning quality degrades accordingly; a tokenizer.json sidecar
        or GGUF vocab metadata restores exact encoding."""
        byte_vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
        return cls(byte_vocab, [], dict(cls._CANONICAL_SPECIAL))

    @classmethod
    def from_tokenizer_json(cls, path: str) -> "Qwen2Tokenizer":
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        model = data["model"]
        vocab = model["vocab"]
        merges = [tuple(m.split(" ")) if isinstance(m, str) else tuple(m)
                  for m in model["merges"]]
        special = {t["content"]: t["id"] for t in data.get("added_tokens", [])}
        return cls(vocab, merges, special)

    def _encode_plain(self, text: str) -> List[int]:
        ids: List[int] = []
        for piece in _PRETOK.findall(text):
            word = tuple(self.byte_map[b] for b in piece.encode("utf-8"))
            for tok in self.bpe.apply(word):
                if tok in self.vocab:
                    ids.append(self.vocab[tok])
        return ids

    def encode(self, text: str) -> List[int]:
        if self._special_re is None:
            return self._encode_plain(text)
        ids: List[int] = []
        for part in self._special_re.split(text):
            if not part:
                continue
            if part in self.special:
                ids.append(self.special[part])
            else:
                ids.extend(self._encode_plain(part))
        return ids

    def pad(self, ids: List[int], length: int) -> Tuple[List[int], List[int]]:
        ids = ids[:length]
        mask = [1] * len(ids) + [0] * (length - len(ids))
        return ids + [self.pad_token_id] * (length - len(ids)), mask

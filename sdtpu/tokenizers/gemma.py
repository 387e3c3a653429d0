"""Gemma sentencepiece-BPE tokenizer (Gemma 1/2/3 share the vocabulary
layout), loaded from an HF tokenizer.json.

Reference analog: GemmaTokenizer (src/tokenizers/gemma_tokenizer.h:8; vocab
blob stripped in the snapshot, so the vocabulary comes from a user-supplied
tokenizer.json).  Character-level sentencepiece BPE — spaces become U+2581,
unknown bytes fall back to <0xXX> tokens.  BOS (id 2) is prepended and
padding (id 0) is applied on the LEFT (pad_left=true,
gemma_tokenizer.cpp:53), matching the causal-LM convention LTX-2 relies on.
"""
from __future__ import annotations

import json
import re
from typing import Dict, List, Tuple

from .bpe import BPE

_SP_SPACE = "▁"


class GemmaTokenizer:
    pad_token_id = 0
    eos_token_id = 1
    bos_token_id = 2
    unk_token_id = 3

    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]],
                 special_tokens: Dict[str, int]):
        self.vocab = vocab
        self.special = special_tokens
        self.bpe = BPE({tuple(m): i for i, m in enumerate(merges)})
        self.pad_token_id = special_tokens.get("<pad>", 0)
        self.eos_token_id = special_tokens.get("<eos>", 1)
        self.bos_token_id = special_tokens.get("<bos>", 2)
        self.unk_token_id = special_tokens.get("<unk>", 3)
        self._special_re = (
            re.compile("(" + "|".join(
                re.escape(t) for t in sorted(special_tokens, key=len,
                                             reverse=True)) + ")")
            if special_tokens else None)

    @classmethod
    def from_tokenizer_json(cls, path: str) -> "GemmaTokenizer":
        with open(path, encoding="utf-8") as f:
            data = json.load(f)
        model = data["model"]
        vocab = model["vocab"]
        if isinstance(vocab, list):  # sentencepiece-style [token, score] pairs
            vocab = {tok: i for i, (tok, _score) in enumerate(vocab)}
        merges = [tuple(m.split(" ")) if isinstance(m, str) else tuple(m)
                  for m in model.get("merges", [])]
        special = {t["content"]: t["id"] for t in data.get("added_tokens", [])}
        return cls(vocab, merges, special)

    def _encode_plain(self, text: str) -> List[int]:
        """Character-level BPE with byte fallback (GemmaTokenizer::normalize
        replaces spaces with U+2581, gemma_tokenizer.cpp:8)."""
        text = text.replace(" ", _SP_SPACE)
        if not text:
            return []
        ids: List[int] = []
        for tok in self.bpe.apply(tuple(text)):
            if tok in self.vocab:
                ids.append(self.vocab[tok])
            else:
                for byte in tok.encode("utf-8"):
                    ids.append(self.vocab.get(f"<0x{byte:02X}>", self.unk_token_id))
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

    def pad(self, ids: List[int], min_length: int) -> Tuple[List[int], List[float]]:
        """Prepend BOS, LEFT-pad to min_length -> (ids, mask) (reference
        Tokenizer::pad_tokens with pad_left, tokenizer.cpp:39)."""
        seq = [self.bos_token_id] + list(ids)
        mask = [1.0] * len(seq)
        if len(seq) < min_length:
            n = min_length - len(seq)
            seq = [self.pad_token_id] * n + seq
            mask = [0.0] * n + mask
        return seq, mask

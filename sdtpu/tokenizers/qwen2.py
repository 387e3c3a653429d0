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

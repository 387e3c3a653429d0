"""Byte-level BPE tokenizers for the GPT-OSS (o200k) and Mistral (tekken)
vocabularies, loaded from HF tokenizer.json files.

Reference analogs: GPTOSSTokenizer (src/tokenizers/gpt_oss_tokenizer.h:8) and
MistralTokenizer (src/tokenizers/mistral_tokenizer.h:8); both are byte-level
BPE variants whose embedded vocab blobs are stripped from the snapshot, so
the vocabulary comes from a user-supplied tokenizer.json.  Pre-tokenization
uses the GPT-4-style split (contractions, words, 1-3 digit groups,
punctuation, whitespace runs) shared by both vocabularies to a close
approximation.
"""
from __future__ import annotations

from .qwen2 import Qwen2Tokenizer


class GPTOSSTokenizer(Qwen2Tokenizer):
    """o200k byte-level BPE; EOS <|return|>, PAD <|endoftext|>."""

    @classmethod
    def from_tokenizer_json(cls, path: str) -> "GPTOSSTokenizer":
        tok = super().from_tokenizer_json(path)
        tok.eos_token_id = tok.special.get("<|return|>",
                                           tok.special.get("<|endoftext|>", 199999))
        tok.pad_token_id = tok.special.get("<|endoftext|>", 199999)
        return tok


class MistralTokenizer(Qwen2Tokenizer):
    """Tekken byte-level BPE; BOS <s>, EOS </s>, with [INST] wrapping handled
    by the conditioner templates."""

    bos_token_id = 1

    @classmethod
    def from_tokenizer_json(cls, path: str) -> "MistralTokenizer":
        tok = super().from_tokenizer_json(path)
        tok.bos_token_id = tok.special.get("<s>", 1)
        tok.eos_token_id = tok.special.get("</s>", 2)
        tok.pad_token_id = tok.special.get("<pad>", tok.special.get("<unk>", 0))
        return tok

"""Tokenizers from embedded GGUF vocab metadata + spiece.model parsing
(VERDICT r3 missing #3: a single llama.cpp-exported TE GGUF must tokenize
with no sidecar tokenizer.json — reference embeds vocabs,
src/tokenizers/vocab/vocab.cpp).
"""
import struct

import numpy as np
import pytest

from sdtpu.io.gguf import GGUFFile, save_gguf
from sdtpu.tokenizers.gguf_vocab import (
    load_spiece_model,
    parse_spiece_model,
    tokenizer_from_gguf_file,
    tokenizer_from_gguf_metadata,
)


def _t5_md():
    # tiny unigram vocab: specials + word pieces
    tokens = ["<pad>", "</s>", "<unk>", "▁a", "▁cat", "▁the", "c", "a", "t"]
    scores = [0.0, 0.0, 0.0, -1.0, -2.0, -1.5, -4.0, -4.0, -4.0]
    ttypes = [3, 3, 2, 1, 1, 1, 1, 1, 1]
    return {
        "tokenizer.ggml.model": "t5",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.scores": scores,
        "tokenizer.ggml.token_type": ttypes,
        "tokenizer.ggml.eos_token_id": 1,
        "tokenizer.ggml.padding_token_id": 0,
        "tokenizer.ggml.unknown_token_id": 2,
    }


def test_t5_from_metadata():
    tok = tokenizer_from_gguf_metadata(_t5_md())
    assert type(tok).__name__ == "T5UnigramTokenizer"
    ids = tok.encode("a cat", add_eos=True)
    assert ids == [3, 4, 1]  # ▁a ▁cat </s>
    assert tok.pad_token_id == 0 and tok.eos_token_id == 1


def test_gpt2_bpe_from_metadata():
    tokens = ["<|endoftext|>", "<|im_end|>", "a", "b", "c", "ab", "abc"]
    md = {
        "tokenizer.ggml.model": "gpt2",
        "tokenizer.ggml.tokens": tokens,
        "tokenizer.ggml.merges": ["a b", "ab c"],
        "tokenizer.ggml.token_type": [3, 3, 1, 1, 1, 1, 1],
        "tokenizer.ggml.eos_token_id": 1,
    }
    tok = tokenizer_from_gguf_metadata(md)
    assert type(tok).__name__ == "Qwen2Tokenizer"
    assert tok.encode("abc") == [6]
    assert tok.eos_token_id == 1
    # specials split before BPE
    assert tok.encode("abc<|im_end|>") == [6, 1]


def test_no_vocab_returns_none():
    assert tokenizer_from_gguf_metadata({"general.architecture": "x"}) is None


def test_gguf_file_roundtrip(tmp_path):
    """Write a synthetic TE GGUF with tokenizer KVs, reopen, tokenize."""
    p = str(tmp_path / "te.gguf")
    save_gguf(p, {"dummy.weight": np.zeros((8, 8), dtype=np.float32)},
              out_type="f32", metadata=_t5_md())
    f = GGUFFile(p)
    assert f.metadata["tokenizer.ggml.tokens"][3] == "▁a"
    assert f.metadata["tokenizer.ggml.scores"][3] == pytest.approx(-1.0)
    assert f.metadata["tokenizer.ggml.eos_token_id"] == 1
    f.close()
    tok = tokenizer_from_gguf_file(p)
    assert tok.encode("the cat", add_eos=True) == [5, 4, 1]


def test_cli_discovers_embedded_vocab(tmp_path, capsys):
    """The CLI TE-GGUF path finds the embedded vocab with no sidecar
    tokenizer.json."""
    from sdtpu.cli import discover_gguf_tokenizer

    p = str(tmp_path / "t5xxl.gguf")
    save_gguf(p, {"dummy.weight": np.zeros((8, 8), dtype=np.float32)},
              out_type="f32", metadata=_t5_md())
    tok = discover_gguf_tokenizer(p, None, None)
    assert type(tok).__name__ == "T5UnigramTokenizer"
    assert "embedded GGUF vocab" in capsys.readouterr().out
    # non-gguf / vocab-less paths → None
    assert discover_gguf_tokenizer(None, None, "x.safetensors") is None


def test_convert_carries_tokenizer_metadata(tmp_path, capsys):
    """`sdtpu convert` on a GGUF with embedded vocab KVs must carry them to
    the output so a converted TE still tokenizes with no sidecar files
    (round-4 review finding: the converter wrote only {'converter': ...})."""
    from sdtpu.cli import discover_gguf_tokenizer, main

    src = str(tmp_path / "t5-src.gguf")
    save_gguf(src, {"blk.w.weight": np.random.default_rng(0)
                    .standard_normal((64, 64)).astype(np.float32)},
              out_type="f32", metadata=_t5_md())
    dst = str(tmp_path / "t5-q8.gguf")
    rc = main(["convert", "-m", src, "-o", dst, "--output-type", "q8_0"])
    assert rc == 0
    capsys.readouterr()
    tok = discover_gguf_tokenizer(dst, None, None)
    assert type(tok).__name__ == "T5UnigramTokenizer"
    assert tok.encode("a cat", add_eos=True) == [3, 4, 1]
    md = GGUFFile(dst).metadata
    assert md["converter"] == "sdtpu"
    assert md["tokenizer.ggml.model"] == "t5"


def _spiece_bytes(pieces):
    """Build a minimal sentencepiece ModelProto (field 1 repeated
    SentencePiece{1: piece, 2: score, 3: type})."""
    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    blob = b""
    for piece, score, ptype in pieces:
        pb = piece.encode("utf-8")
        sp = (b"\x0a" + varint(len(pb)) + pb          # field 1 string
              + b"\x15" + struct.pack("<f", score)    # field 2 float
              + b"\x18" + varint(ptype))              # field 3 varint
        blob += b"\x0a" + varint(len(sp)) + sp
    return blob


def test_spiece_model_parse_and_tokenize(tmp_path):
    pieces = [("<pad>", 0.0, 3), ("</s>", 0.0, 3), ("<unk>", 0.0, 2),
              ("▁a", -1.0, 1), ("▁dog", -2.0, 1)]
    p = str(tmp_path / "spiece.model")
    with open(p, "wb") as f:
        f.write(_spiece_bytes(pieces))
    parsed = parse_spiece_model(open(p, "rb").read())
    assert [x[0] for x in parsed] == [x[0] for x in pieces]
    tok = load_spiece_model(p)
    assert tok.eos_token_id == 1 and tok.pad_token_id == 0 and tok.unk_id == 2
    assert tok.encode("a dog", add_eos=True) == [3, 4, 1]


def test_qwen2_byte_fallback_sidecar_free():
    """A bare safetensors Qwen TE tokenizes with no sidecar (VERDICT r4
    missing #3; reference embeds vocabs, src/tokenizers/vocab/vocab.cpp).
    Byte units get their canonical GPT-2-lineage ids (0..255), specials get
    the fixed Qwen2 ids, and the chat template round-trips."""
    from sdtpu.tokenizers.qwen2 import Qwen2Tokenizer

    tok = Qwen2Tokenizer.byte_fallback()
    # "!" is byte-alphabet id 0; "~" is 93 (GPT-2 ordering)
    assert tok.encode("!") == [0]
    assert tok.encode("~") == [93]
    # multi-byte text becomes its UTF-8 bytes, all ids < 256
    ids = tok.encode("Hello")
    assert len(ids) == 5 and all(i < 256 for i in ids)
    # specials are single canonical ids, template encodes
    ids = tok.encode("<|im_start|>user\nhi<|im_end|>")
    assert ids[0] == 151644 and ids[-1] == 151645
    assert tok.eos_token_id == 151645
    # space byte (0x20) maps through the escaped range (id >= 256 - 68)
    sp = tok.encode(" a")
    assert len(sp) == 2
    # pad() contract used by the conditioners
    padded, mask = tok.pad([1, 2], 4)
    assert padded == [1, 2, 151643, 151643] and mask == [1, 1, 0, 0]


def test_cli_sidecar_free_llm_tokenizer():
    """CLI resolution for a safetensors-only LLM TE bundle: Qwen-conditioned
    versions get the byte-fallback vocabulary; families whose vocab layout
    can't be synthesized error helpfully."""
    import pytest

    from sdtpu.cli import sidecar_free_llm_tokenizer
    from sdtpu.config import SDVersion

    tok = sidecar_free_llm_tokenizer(SDVersion.QWEN_IMAGE)
    ids = tok.encode("<|im_start|>user\na photo of a cat<|im_end|>")
    assert ids[0] == 151644 and ids[-1] == 151645 and len(ids) > 10
    with pytest.raises(SystemExit):
        sidecar_free_llm_tokenizer(SDVersion.LTXAV)

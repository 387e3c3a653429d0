"""CLIP tokenizer tests: golden ids + cross-check against transformers' CLIP
BPE implementation built from the same public merges table."""
import gzip
import importlib.resources
import json

import pytest

from sdtpu.tokenizers import CLIPTokenizer
from sdtpu.tokenizers.clip import BOS_TOKEN_ID, EOS_TOKEN_ID, VOCAB_SIZE


@pytest.fixture(scope="module")
def tok():
    return CLIPTokenizer()


def test_vocab_size(tok):
    assert len(tok.encoder) == VOCAB_SIZE
    assert tok.encoder["<|startoftext|>"] == BOS_TOKEN_ID
    assert tok.encoder["<|endoftext|>"] == EOS_TOKEN_ID


def test_known_ids(tok):
    # canonical OpenAI CLIP ids for "a photo of a cat"
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]


def test_roundtrip(tok):
    # punctuation-free prompt roundtrips exactly (punct becomes its own word)
    text = "a painting of a majestic castle highly detailed"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    ids2 = tok.encode("hello, world")
    assert tok.decode(ids2) == "hello , world"


def test_case_and_whitespace(tok):
    assert tok.encode("A   Photo  OF a CAT") == tok.encode("a photo of a cat")


@pytest.fixture(scope="module")
def hf_tok(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    d = tmp_path_factory.mktemp("cliptok")
    ref = importlib.resources.files("sdtpu.tokenizers").joinpath("data/clip_merges.txt.gz")
    with ref.open("rb") as f:
        merges_text = gzip.decompress(f.read()).decode("utf-8")
    (d / "merges.txt").write_text(merges_text)
    own = CLIPTokenizer()
    (d / "vocab.json").write_text(json.dumps(own.encoder))
    return transformers.CLIPTokenizer(str(d / "vocab.json"), str(d / "merges.txt"))


@pytest.mark.parametrize(
    "text",
    [
        "a photo of a cat",
        "masterpiece, best quality, ultra-detailed, 8k",
        "an astronaut riding a horse on the moon, cinematic lighting",
        "cafe",
        "don't stop believing!!! 123 456",
        "unreal engine 5, octane render, trending on artstation",
        "",
    ],
)
def test_matches_transformers(tok, hf_tok, text):
    want = hf_tok(text, add_special_tokens=False)["input_ids"]
    got = tok.encode(text)
    assert got == want


def test_weighted_encoding(tok):
    ids, weights = tok.encode_with_weights("a (cat:1.5) dog")
    plain = tok.encode("a cat dog")
    assert ids == plain
    cat_ids = tok.encode("cat")
    for i, t in enumerate(ids):
        if t in cat_ids:
            assert weights[i] == 1.5
        else:
            assert weights[i] == 1.0

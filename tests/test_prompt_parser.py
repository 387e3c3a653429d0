"""Prompt-attention parser parity with the webui grammar
(reference doctest block at src/core/util.cpp:776-795)."""
from sdtpu.conditioning import parse_prompt_attention


def test_normal_text():
    assert parse_prompt_attention("normal text") == [("normal text", 1.0)]


def test_important_word():
    assert parse_prompt_attention("an (important) word") == [
        ("an ", 1.0),
        ("important", 1.1),
        (" word", 1.0),
    ]


def test_unbalanced():
    assert parse_prompt_attention("(unbalanced") == [("unbalanced", 1.1)]


def test_literal():
    assert parse_prompt_attention(r"\(literal\]") == [("(literal]", 1.0)]


def test_unnecessary_parens():
    assert parse_prompt_attention("(unnecessary)(parens)") == [("unnecessaryparens", 1.1)]


def test_complex():
    got = parse_prompt_attention("a (((house:1.3)) [on] a (hill:0.5), sun, (((sky))).")
    want = [
        ("a ", 1.0),
        ("house", 1.5730000000000004),
        (" ", 1.1),
        ("on", 1.0),
        (" a ", 1.1),
        ("hill", 0.55),
        (", sun, ", 1.1),
        ("sky", 1.4641000000000006),
        (".", 1.1),
    ]
    assert len(got) == len(want)
    for (gt, gw), (wt, ww) in zip(got, want):
        assert gt == wt
        assert abs(gw - ww) < 1e-6


def test_square_brackets():
    got = parse_prompt_attention("a [word] here")
    assert got[0] == ("a ", 1.0)
    assert got[1][0] == "word"
    assert abs(got[1][1] - 1 / 1.1) < 1e-9


def test_break():
    got = parse_prompt_attention("first BREAK second")
    assert ("BREAK", -1.0) in got
    texts = [t for t, _ in got]
    assert texts == ["first", "BREAK", "second"]


def test_empty():
    assert parse_prompt_attention("") == [("", 1.0)]


def test_explicit_weight():
    assert parse_prompt_attention("(word:1.5)") == [("word", 1.5)]
    assert parse_prompt_attention("(word:0.25)") == [("word", 0.25)]


def test_textual_inversion_embeddings():
    """Trigger words splice learned rows into the token stream (reference
    textual-inversion support in FrozenCLIPEmbedderWithCustomWords)."""
    import numpy as np

    from sdtpu.config import SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    cond = pipe.conditioner
    base = np.asarray(cond.get_learned_condition("a photo of myTI style").c_crossattn)
    vecs = np.random.default_rng(0).standard_normal((2, 64)).astype(np.float32) * 0.3
    cond.load_embedding("myTI", vecs)
    with_emb = np.asarray(cond.get_learned_condition("a photo of myTI style").c_crossattn)
    assert not np.allclose(base, with_emb, atol=1e-5)
    # case-insensitive trigger; unrelated prompt unchanged
    with_emb2 = np.asarray(cond.get_learned_condition("a photo of MYTI style").c_crossattn)
    np.testing.assert_allclose(with_emb, with_emb2, atol=1e-6)
    other = np.asarray(cond.get_learned_condition("a photo of a dog").c_crossattn)
    base_other = other  # sanity: runs fine with extended table
    assert np.isfinite(base_other).all()
    # dim mismatch errors clearly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        cond.load_embedding("bad", np.zeros((1, 99), np.float32))

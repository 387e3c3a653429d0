"""SD3 pipeline e2e (tiny models) + T5 unigram tokenizer algorithm tests."""
import numpy as np
import pytest

from sdtpu.config import GenerationParams, SDVersion
from sdtpu.factory import create_pipeline
from sdtpu.tokenizers.t5 import T5UnigramTokenizer


def _toy_t5_tokenizer():
    # tiny synthetic unigram vocab: specials + chars + some merged pieces
    vocab = [("<pad>", 0.0), ("</s>", 0.0), ("<unk>", -20.0)]
    for ch in "▁abcdefghijklmnopqrstuvwxyz":
        vocab.append((ch, -5.0))
    vocab += [("▁the", -2.0), ("▁cat", -2.5), ("at", -4.0), ("▁a", -3.0)]
    return T5UnigramTokenizer(vocab)


def test_t5_tokenizer_viterbi_picks_best_pieces():
    tok = _toy_t5_tokenizer()
    ids = tok.encode("the cat")
    pieces = [tok.pieces[i][0] for i in ids]
    assert pieces == ["▁the", "▁cat"]  # merged pieces beat char-by-char
    assert tok.decode(ids) == "the cat"


def test_t5_tokenizer_unknown_chars():
    tok = _toy_t5_tokenizer()
    ids = tok.encode("a Z")  # 'Z' not in vocab
    assert tok.unk_id in ids


def test_t5_tokenizer_pad():
    tok = _toy_t5_tokenizer()
    ids, mask = tok.pad(tok.encode("the cat", add_eos=True), 10)
    assert len(ids) == len(mask) == 10
    assert ids[-1] == tok.pad_token_id
    assert mask[:3] == [1, 1, 1]


def test_sd3_txt2img_small():
    pipe = create_pipeline(SDVersion.SD3, small=True, t5_tokenizer=_toy_t5_tokenizer())
    gp = GenerationParams(
        prompt="the cat",
        negative_prompt="",
        width=32,
        height=32,
        sample_steps=4,
        cfg_scale=4.5,
        seed=3,
        sample_method="euler",
        schedule="discrete",
    )
    res = pipe.txt2img(gp)
    assert res.images.shape == (1, 32, 32, 3)
    assert np.isfinite(res.latents).all()
    # flow denoiser path: deterministic across runs
    res2 = pipe.txt2img(gp)
    np.testing.assert_array_equal(res.images, res2.images)


def test_slg_and_apg_wiring():
    """SLG (skip-layer window) and APG wired through generate
    (reference guidance.h + sample loop stable-diffusion.cpp:2752)."""
    import dataclasses

    import numpy as np

    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SD3, small=True, seed=0)
    gp = GenerationParams(
        prompt="a cat", width=32, height=32, sample_steps=4, cfg_scale=4.0,
        sample_method="euler", seed=3, skip_layers=(1,),
    )
    base = pipe.generate(gp)
    # SLG changes the output inside its window
    slg = pipe.generate(dataclasses.replace(gp, slg_scale=2.5, slg_start=0.0, slg_end=1.0))
    assert not np.allclose(base.latents, slg.latents, atol=1e-5)
    # zero-width window → identical to base
    slg0 = pipe.generate(dataclasses.replace(gp, slg_scale=2.5, slg_start=0.99, slg_end=1.0))
    np.testing.assert_allclose(base.latents, slg0.latents, rtol=1e-4, atol=1e-4)
    # APG with eta<1 changes the combine
    apg = pipe.generate(dataclasses.replace(gp, apg_eta=0.5))
    assert not np.allclose(base.latents, apg.latents, atol=1e-5)
    # APG with defaults (disabled) == plain CFG
    same = pipe.generate(dataclasses.replace(gp, apg_eta=1.0))
    np.testing.assert_array_equal(base.latents, same.latents)

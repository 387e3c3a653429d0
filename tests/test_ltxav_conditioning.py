"""Gemma3 LLM arch + LTXAV conditioner tests."""
import dataclasses

import jax.numpy as jnp
import numpy as np

from sdtpu.models.llm import (
    GEMMA2_2B_CONFIG,
    GEMMA3_12B_CONFIG,
    LLMConfig,
    detect_llm_config,
    init_llm_params,
    llm_forward,
)

TINY_G3 = dataclasses.replace(
    GEMMA3_12B_CONFIG, num_layers=3, hidden_size=16, intermediate_size=32,
    num_heads=2, num_kv_heads=1, head_dim=8, vocab_size=64,
    sliding_attention=(4, 0),
)


def test_gemma3_forward_and_all_states():
    p = init_llm_params(TINY_G3, seed=0)
    # gemma norm weights present
    assert "model.layers.0.pre_feedforward_layernorm.weight" in p
    assert "model.layers.0.post_feedforward_layernorm.weight" in p
    ids = jnp.asarray(np.arange(10, dtype=np.int32)[None] % 64)
    h = llm_forward(p, ids, TINY_G3)
    assert h.shape == (1, 10, 16)
    hs = llm_forward(p, ids, TINY_G3, all_hidden_states=True)
    assert hs.shape == (1, 10, 4 * 16)  # embeddings + 2 mids + final norm
    # state 0 is the scaled embedding
    emb = np.asarray(p["model.embed_tokens.weight"])[np.asarray(ids)[0]] * 16**0.5
    np.testing.assert_allclose(np.asarray(hs[0, :, :16]), emb, rtol=1e-5)
    assert np.isfinite(np.asarray(hs)).all()


def test_gemma3_sliding_window_changes_output():
    """Far tokens must be invisible to sliding layers: on a single layer with
    a 4-token window, changing token 0 must not affect token 9's state, but
    must with global attention.  (With stacked sliding layers the receptive
    field grows, so this only holds for one layer.)"""
    cfg_sl = dataclasses.replace(TINY_G3, num_layers=1, sliding_attention=(4,))
    cfg_gl = dataclasses.replace(TINY_G3, num_layers=1, sliding_attention=())
    p = init_llm_params(TINY_G3, seed=0)
    ids1 = np.arange(10, dtype=np.int32) % 64
    ids2 = ids1.copy()
    ids2[0] = (ids2[0] + 7) % 64
    for cfg, should_differ in ((cfg_sl, False), (cfg_gl, True)):
        h1 = np.asarray(llm_forward(p, jnp.asarray(ids1[None]), cfg))
        h2 = np.asarray(llm_forward(p, jnp.asarray(ids2[None]), cfg))
        diff = np.abs(h1[0, 9] - h2[0, 9]).max()
        assert (diff > 1e-6) == should_differ, (cfg.sliding_attention, diff)


def test_gemma2_has_gemma_norm_structure():
    cfg = dataclasses.replace(
        GEMMA2_2B_CONFIG, num_layers=2, hidden_size=16, intermediate_size=32,
        num_heads=2, num_kv_heads=1, head_dim=8, vocab_size=64)
    p = init_llm_params(cfg, seed=1)
    ids = jnp.asarray(np.arange(6, dtype=np.int32)[None])
    h = llm_forward(p, ids, cfg)
    assert h.shape == (1, 6, 16)
    assert np.isfinite(np.asarray(h)).all()


def test_detect_gemma3():
    p = init_llm_params(TINY_G3, seed=0)
    shapes = {k: tuple(v.shape) for k, v in p.items()}
    cfg = detect_llm_config(set(p.keys()), shapes, arch="gemma3_12b")
    assert cfg.num_layers == 3
    assert cfg.hidden_size == 16
    assert cfg.gemma_norms and cfg.qk_norm


def _tiny_conditioner(dual):
    from sdtpu.conditioning.conditioner import LTXAVConditioner

    pl = init_llm_params(TINY_G3, seed=0)
    g = np.random.default_rng(3)
    states = TINY_G3.num_layers + 1
    flat = states * TINY_G3.hidden_size
    if dual:
        pp = {
            "video_aggregate_embed.weight": jnp.asarray(
                g.standard_normal((24, flat), dtype=np.float32) * 0.02),
            "video_aggregate_embed.bias": jnp.zeros((24,), jnp.float32),
            "audio_aggregate_embed.weight": jnp.asarray(
                g.standard_normal((12, flat), dtype=np.float32) * 0.02),
            "audio_aggregate_embed.bias": jnp.zeros((12,), jnp.float32),
        }
    else:
        pp = {"projection.weight": jnp.asarray(
            g.standard_normal((TINY_G3.hidden_size, flat), dtype=np.float32) * 0.02)}
    return LTXAVConditioner(None, pl, TINY_G3, pp)


def test_ltxav_conditioner_single_projection():
    cond = _tiny_conditioner(dual=False)
    assert not cond.dual
    res = cond.get_learned_condition("a red panda")
    assert res.c_crossattn.shape == (1, 9, TINY_G3.hidden_size)
    assert np.isfinite(np.asarray(res.c_crossattn)).all()


def test_ltxav_conditioner_dual_projection():
    cond = _tiny_conditioner(dual=True)
    assert cond.dual
    res = cond.get_learned_condition("a red panda")
    assert res.c_crossattn.shape == (1, 9, 36)  # 24 video + 12 audio
    assert np.isfinite(np.asarray(res.c_crossattn)).all()


def test_gemma_tokenizer_roundtrip(tmp_path):
    """Tokenizer.json loader: sp-style char BPE with byte fallback and
    left-padding with BOS."""
    import json

    from sdtpu.tokenizers.gemma import GemmaTokenizer

    vocab = {"<pad>": 0, "<eos>": 1, "<bos>": 2, "<unk>": 3,
             "▁": 4, "a": 5, "b": 6, "▁a": 7, "ab": 8}
    for i in range(256):
        vocab[f"<0x{i:02X}>"] = 9 + i
    tok_json = {
        "model": {"vocab": vocab, "merges": ["▁ a", "a b"]},
        "added_tokens": [
            {"content": "<pad>", "id": 0}, {"content": "<eos>", "id": 1},
            {"content": "<bos>", "id": 2}, {"content": "<unk>", "id": 3},
        ],
    }
    path = tmp_path / "tokenizer.json"
    path.write_text(json.dumps(tok_json), encoding="utf-8")
    tok = GemmaTokenizer.from_tokenizer_json(str(path))
    ids = tok.encode("ab a")
    # "ab a" -> normalize "ab▁a" -> chars a b ▁ a -> merges: ab, ▁a
    assert ids == [8, 7]
    padded, mask = tok.pad(ids, 6)
    assert padded == [0, 0, 0, 2, 8, 7]
    assert mask == [0.0, 0.0, 0.0, 1.0, 1.0, 1.0]
    # byte fallback for characters outside the vocab
    ids2 = tok.encode("é")
    assert all(9 <= i < 265 for i in ids2) and len(ids2) == 2

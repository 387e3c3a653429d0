"""CLIP text model vs transformers.CLIPTextModel(WithProjection) at f32."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.models.clip import CLIPTextConfig, clip_text_forward

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

SMALL = CLIPTextConfig(
    vocab_size=1000,
    hidden_size=64,
    intermediate_size=128,
    num_layers=4,
    num_heads=4,
    max_position_embeddings=77,
    hidden_act="quick_gelu",
)


def _hf_model(cfg: CLIPTextConfig, with_projection=False, act=None):
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act=act or cfg.hidden_act,
        projection_dim=cfg.projection_dim or cfg.hidden_size,
        eos_token_id=cfg.eos_token_id if cfg.eos_token_id < cfg.vocab_size else 2,
        bos_token_id=1,
    )
    cls = (
        transformers.CLIPTextModelWithProjection if with_projection else transformers.CLIPTextModel
    )
    torch.manual_seed(0)
    m = cls(hf_cfg)
    m.eval()
    return m


def _params_from_hf(m):
    return {k: jnp.asarray(v.detach().numpy()) for k, v in m.state_dict().items()}


@pytest.fixture(scope="module")
def hf_and_ids():
    m = _hf_model(SMALL)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 999, size=(2, 77)).astype(np.int32)
    ids[:, -1] = 2  # eos
    return m, ids


def test_final_hidden_matches_hf(hf_and_ids):
    m, ids = hf_and_ids
    with torch.no_grad():
        want = m(torch.from_numpy(ids).long()).last_hidden_state.numpy()
    p = _params_from_hf(m)
    cfg = SMALL
    got, _ = jax.jit(lambda p, i: clip_text_forward(p, i, cfg, clip_skip=-1))(p, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=2e-5)


def test_penultimate_matches_hf(hf_and_ids):
    m, ids = hf_and_ids
    with torch.no_grad():
        out = m(torch.from_numpy(ids).long(), output_hidden_states=True)
    want = out.hidden_states[-2].numpy()  # penultimate, pre-final-LN
    p = _params_from_hf(m)
    got, _ = jax.jit(lambda p, i: clip_text_forward(p, i, SMALL, clip_skip=2))(p, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=2e-5)


def test_pooled_with_projection():
    # note: eos_token_id must not be 2 — transformers then uses a legacy
    # argmax(input_ids) pooling rule; real CLIP's eos (49407) is the max id so
    # first-eos and argmax coincide, which is what we implement.
    cfg = CLIPTextConfig(
        vocab_size=1000,
        hidden_size=64,
        intermediate_size=128,
        num_layers=4,
        num_heads=4,
        hidden_act="gelu",
        projection_dim=32,
        eos_token_id=999,
    )
    m = _hf_model(cfg, with_projection=True)
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 998, size=(2, 77)).astype(np.int32)
    ids[0, 20] = 999  # eos mid-sequence: pooled must pick position 20
    ids[1, -1] = 999
    with torch.no_grad():
        want = m(torch.from_numpy(ids).long()).text_embeds.numpy()
    p = _params_from_hf(m)
    _, pooled = jax.jit(lambda p, i: clip_text_forward(p, i, cfg, return_pooled=True))(p, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(pooled), want, rtol=1e-4, atol=2e-5)

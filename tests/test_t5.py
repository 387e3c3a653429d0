"""T5 encoder vs transformers.T5EncoderModel at f32 (shared weights)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdtpu.models.t5 import T5Config, t5_encoder_forward

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

SMALL = T5Config(
    vocab_size=512, d_model=64, d_kv=16, d_ff=128, num_layers=3, num_heads=4
)


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.T5Config(
        vocab_size=SMALL.vocab_size,
        d_model=SMALL.d_model,
        d_kv=SMALL.d_kv,
        d_ff=SMALL.d_ff,
        num_layers=SMALL.num_layers,
        num_heads=SMALL.num_heads,
        relative_attention_num_buckets=SMALL.relative_attention_num_buckets,
        relative_attention_max_distance=SMALL.relative_attention_max_distance,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
    )
    torch.manual_seed(0)
    m = transformers.T5EncoderModel(cfg)
    m.eval()
    return m


def test_t5_matches_hf(hf_model):
    m = hf_model
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 511, size=(2, 32)).astype(np.int32)
    with torch.no_grad():
        want = m(torch.from_numpy(ids).long()).last_hidden_state.numpy()
    p = {k: jnp.asarray(v.numpy()) for k, v in m.state_dict().items()}
    got = np.asarray(
        jax.jit(lambda p, i: t5_encoder_forward(p, i, SMALL))(p, jnp.asarray(ids))
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_t5_attention_mask(hf_model):
    m = hf_model
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 511, size=(1, 16)).astype(np.int32)
    mask = np.ones((1, 16), dtype=np.int32)
    mask[0, 10:] = 0
    with torch.no_grad():
        want = m(
            torch.from_numpy(ids).long(), attention_mask=torch.from_numpy(mask).long()
        ).last_hidden_state.numpy()
    p = {k: jnp.asarray(v.numpy()) for k, v in m.state_dict().items()}
    got = np.asarray(
        jax.jit(lambda p, i, am: t5_encoder_forward(p, i, SMALL, attention_mask=am))(
            p, jnp.asarray(ids), jnp.asarray(mask)
        )
    )
    np.testing.assert_allclose(got[:, :10], want[:, :10], rtol=5e-4, atol=5e-4)

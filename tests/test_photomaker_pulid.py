"""PhotoMaker v1/v2 and PuLID identity-conditioning tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from sdtpu.models.clip import CLIPVisionConfig
from sdtpu.models.pmid import init_pmid_params, photomaker_fuse

VCFG = CLIPVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                        num_heads=2, image_size=224, patch_size=32,
                        projection_dim=48)


def test_trigger_tokenization():
    """The trigger word is removed and the preceding class token repeated
    (reference tokenize_photomaker_trigger, photomaker_extension.cpp:13)."""
    from sdtpu.conditioning.conditioner import tokenize_photomaker_trigger
    from sdtpu.tokenizers.clip import CLIPTokenizer

    tok = CLIPTokenizer()
    tokens, weights, mask = tokenize_photomaker_trigger(
        tok, "a man img on a beach", "img", 2, 0)
    assert len(tokens) == 77 and mask.shape == (77,)
    assert mask.sum() == 2
    pos = np.nonzero(mask)[0]
    # both class positions carry the same (duplicated) token id
    assert tokens[pos[0]] == tokens[pos[1]]
    # the trigger token itself is gone
    img_id = tok.encode("img")[0]
    assert img_id not in tokens[1:].tolist() or tokens[pos[0]] != img_id


def test_fuse_replaces_only_class_positions():
    p = init_pmid_params(VCFG, embed_dim=96, v2=False, seed=0)
    g = np.random.default_rng(1)
    prompt = jnp.asarray(g.standard_normal((1, 10, 96), dtype=np.float32))
    ids = jnp.asarray(g.standard_normal((2, 96), dtype=np.float32))
    mask = np.zeros(10, dtype=bool)
    mask[[3, 4]] = True
    out = photomaker_fuse(p, prompt, ids, mask)
    keep = [i for i in range(10) if i not in (3, 4)]
    np.testing.assert_allclose(np.asarray(out[0, keep]),
                               np.asarray(prompt[0, keep]), atol=1e-6)
    assert np.abs(np.asarray(out[0, 3]) - np.asarray(prompt[0, 3])).max() > 1e-4


@pytest.mark.parametrize("v2", [False, True])
def test_photomaker_pipeline(v2):
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SDXL, small=True, seed=0)
    dim = pipe.conditioner.get_learned_condition("x").c_crossattn.shape[-1]
    vcfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                            num_heads=2, image_size=224, patch_size=32,
                            projection_dim=dim // 2)
    pm = init_pmid_params(vcfg, embed_dim=dim, v2=v2, seed=0)
    ids = [np.random.default_rng(0).random((64, 64, 3), dtype=np.float32)]
    kw = {"id_embeds": np.random.default_rng(1).standard_normal(
        (1, 512)).astype(np.float32)} if v2 else {}
    gp = GenerationParams(prompt="a man img on a beach", width=64, height=64,
                          sample_steps=2, sample_method="euler",
                          cfg_scale=1.0, seed=1)
    base = pipe.generate(gp)
    pipe.set_photomaker(pm, ids, style_strength=0.0, vision_cfg=vcfg, **kw)
    res = pipe.generate(gp)
    assert res.images.shape == (1, 64, 64, 3)
    assert (res.images != base.images).any()


def test_pulid_flux_injection():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.FLUX, small=True, seed=0)
    g = np.random.default_rng(0)
    hid, kv_dim = 64, 24
    pp = {}
    for i in range(2):  # double ca at block 0, single ca at block 0
        pre = f"pulid_ca.{i}"
        pp[f"{pre}.norm1.weight"] = jnp.ones((kv_dim,))
        pp[f"{pre}.norm1.bias"] = jnp.zeros((kv_dim,))
        pp[f"{pre}.norm2.weight"] = jnp.ones((hid,))
        pp[f"{pre}.norm2.bias"] = jnp.zeros((hid,))
        pp[f"{pre}.to_q.weight"] = jnp.asarray(
            g.standard_normal((hid, hid), dtype=np.float32) * 0.02)
        pp[f"{pre}.to_kv.weight"] = jnp.asarray(
            g.standard_normal((2 * hid, kv_dim), dtype=np.float32) * 0.02)
        pp[f"{pre}.to_out.weight"] = jnp.asarray(
            g.standard_normal((hid, hid), dtype=np.float32) * 0.02)
    id_emb = g.standard_normal((1, 5, kv_dim)).astype(np.float32)
    gp = GenerationParams(prompt="a cat", width=32, height=32, sample_steps=2,
                          sample_method="euler", cfg_scale=1.0, seed=3)
    base = pipe.generate(gp)
    pipe.set_pulid(pp, id_emb, 0.8)
    res = pipe.generate(gp)
    assert (res.images != base.images).any()
    pipe.set_pulid(None, None)
    res2 = pipe.generate(gp)
    np.testing.assert_array_equal(res2.images, base.images)

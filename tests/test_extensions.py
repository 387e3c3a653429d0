"""GenerationExtension plugin framework (VERDICT r1 item 10; reference
src/extensions/generation_extension.h:39-72)."""
import numpy as np

import jax.numpy as jnp

from sdtpu.config import GenerationParams, SDVersion
from sdtpu.factory import create_pipeline
from sdtpu.pipeline import GenerationExtension


class _CtxSwitcher(GenerationExtension):
    """PhotoMaker-style mid-run condition swap expressed as data."""

    def __init__(self):
        self.attached = False
        self.saw_condition = False

    def on_attach(self, pipeline):
        self.attached = True

    def prepare_condition(self, pipeline, gp, cond, uncond):
        self.saw_condition = True
        self.ctx_shape = cond.c_crossattn.shape
        return cond, uncond

    def prepare_generation(self, pipeline, gp, kwargs):
        # swap to a zero condition after step 1 → visibly different latents
        bc = gp.batch_count
        kwargs["ctx_cond2"] = jnp.zeros((bc,) + self.ctx_shape[1:], dtype=jnp.float32)
        kwargs["ctx_switch_step"] = jnp.int32(0)


def test_extension_hooks_fire_and_affect_output():
    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    gp = GenerationParams(prompt="cat", width=64, height=64, sample_steps=3,
                          sample_method="euler", seed=5, cfg_scale=3.0)
    base = pipe.generate(gp).latents

    ext = _CtxSwitcher()
    pipe.register_extension(ext)
    assert ext.attached
    swapped = pipe.generate(gp).latents
    assert ext.saw_condition
    assert np.abs(base - swapped).max() > 1e-4

    pipe.unregister_extension(ext)
    back = pipe.generate(gp).latents
    np.testing.assert_allclose(back, base, rtol=1e-5, atol=1e-6)


def test_conditioner_cache_reuses_embeddings():
    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    gp = GenerationParams(prompt="cat", width=64, height=64, sample_steps=2,
                          sample_method="euler", seed=5, cfg_scale=3.0)
    a = pipe.generate(gp).latents
    assert len(pipe._cond_cache) == 1
    calls = []
    orig = pipe.conditioner.get_learned_condition
    pipe.conditioner.get_learned_condition = (
        lambda *args, **kw: (calls.append(1), orig(*args, **kw))[1]
    )
    b = pipe.generate(gp).latents  # cache hit → no encoder calls
    assert not calls
    np.testing.assert_allclose(a, b, rtol=1e-6)

    pipe.cond_cache_size = 0
    pipe._cond_cache.clear()
    c = pipe.generate(gp).latents  # disabled → encoder runs again
    assert calls
    np.testing.assert_allclose(a, c, rtol=1e-6)

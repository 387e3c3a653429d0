"""Qwen-Image-Edit: vision splice conditioning + DiT ref-latent stream."""
import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from sdtpu.models.qwen_image import (
    QwenImageConfig,
    init_qwen_image_params,
    qwen_image_forward,
)

TINY = QwenImageConfig(in_channels=16, out_channels=4, num_layers=2,
                       head_dim=16, num_heads=4, joint_attention_dim=48,
                       axes_dim=(4, 6, 6))


class StubTokenizer:
    """Byte-ish tokenizer with qwen special tokens for splice tests."""

    def __init__(self):
        self.special = {"<|image_pad|>": 151655, "<|vision_start|>": 151652,
                        "<|vision_end|>": 151653}
        self.eos_token_id = 151645
        self.pad_token_id = 151643

    def encode(self, text):
        import re

        ids = []
        for part in re.split(r"(<\|[a-z_]+\|>)", text):
            if not part:
                continue
            if part in self.special:
                ids.append(self.special[part])
            else:
                ids.extend((ord(c) % 60) + 1 for c in part)
        return ids


def test_ref_latents_change_output_and_keep_shape():
    p = init_qwen_image_params(TINY, seed=0)
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 4), dtype=np.float32))
    ctx = jnp.asarray(g.standard_normal((1, 9, 48), dtype=np.float32) * 0.1)
    ref = jnp.asarray(g.standard_normal((1, 4, 6, 4), dtype=np.float32))
    base = qwen_image_forward(p, x, jnp.asarray([500.0]), ctx, cfg=TINY)
    out = qwen_image_forward(p, x, jnp.asarray([500.0]), ctx, cfg=TINY,
                             ref_latents=[ref])
    assert out.shape == base.shape == (1, 8, 8, 4)
    assert np.abs(np.asarray(out) - np.asarray(base)).max() > 1e-5
    # two refs
    out2 = qwen_image_forward(p, x, jnp.asarray([500.0]), ctx, cfg=TINY,
                              ref_latents=[ref, ref])
    assert out2.shape == (1, 8, 8, 4)


def test_edit_conditioner_splices_vision_tokens():
    from sdtpu.conditioning.conditioner import QwenImageConditioner
    from sdtpu.models import llm as llm_mod
    from sdtpu.models.qwen_vl_vision import (
        QWEN25_VL_VISION_CONFIG,
        init_vision_params,
    )

    llm_cfg = dataclasses.replace(
        llm_mod.QWEN25_VL_7B_CONFIG, num_layers=2, hidden_size=24,
        intermediate_size=48, num_heads=2, num_kv_heads=1, head_dim=8,
        vocab_size=152064)
    llm_p = llm_mod.init_llm_params(llm_cfg, seed=0)
    vcfg = dataclasses.replace(
        QWEN25_VL_VISION_CONFIG, num_layers=2, hidden_size=16,
        intermediate_size=32, num_heads=2, out_hidden_size=24, patch_size=4,
        window_size=16, fullatt_block_indexes=(0,))
    vis_p = init_vision_params(vcfg, seed=1)
    cond = QwenImageConditioner(StubTokenizer(), llm_p, llm_cfg,
                                vision_params=vis_p, vision_cfg=vcfg,
                                vlm_min_pixels=0, vlm_max_pixels=64 * 64)
    ref = np.random.default_rng(2).random((24, 16, 3), dtype=np.float32)
    c1 = cond.get_learned_condition("turn the cat blue", ref_images=[ref])
    assert c1.c_crossattn.shape[-1] == 24
    assert c1.c_crossattn.shape[1] > 0
    # a different ref image must change the condition
    ref2 = np.random.default_rng(3).random((24, 16, 3), dtype=np.float32)
    c2 = cond.get_learned_condition("turn the cat blue", ref_images=[ref2])
    assert np.abs(np.asarray(c1.c_crossattn) - np.asarray(c2.c_crossattn)).max() > 1e-6
    # no refs → plain text path
    c3 = cond.get_learned_condition("turn the cat blue")
    assert c3.c_crossattn.shape[1] != c1.c_crossattn.shape[1] or \
        np.abs(np.asarray(c3.c_crossattn[:, :1]) -
               np.asarray(c1.c_crossattn[:, :1])).max() > 1e-6

"""Vision-spliced edit conditioning for LongCat / Boogu / Krea2
(reference LLMEmbedder edit branches, conditioner.hpp:2297-2480)."""
import dataclasses

import numpy as np
import pytest

from sdtpu.models import llm as llm_mod
from sdtpu.models.qwen_vl_vision import (
    QWEN25_VL_VISION_CONFIG,
    init_vision_params,
)
from tests.test_qwen_edit import StubTokenizer


def _tiny_llm(arch_cfg):
    return dataclasses.replace(
        arch_cfg, num_layers=2, hidden_size=24, intermediate_size=48,
        num_heads=2, num_kv_heads=1, head_dim=8, vocab_size=152064)


def _tiny_vision():
    return dataclasses.replace(
        QWEN25_VL_VISION_CONFIG, num_layers=2, hidden_size=16,
        intermediate_size=32, num_heads=2, out_hidden_size=24, patch_size=4,
        window_size=16, fullatt_block_indexes=(0,))


def _setup():
    llm_cfg = _tiny_llm(llm_mod.QWEN25_VL_7B_CONFIG)
    llm_p = llm_mod.init_llm_params(llm_cfg, seed=0)
    vcfg = _tiny_vision()
    vis_p = init_vision_params(vcfg, seed=1)
    ref = np.random.default_rng(2).random((24, 16, 3), dtype=np.float32)
    return llm_cfg, llm_p, vcfg, vis_p, ref


def test_longcat_edit_branch():
    from sdtpu.conditioning.conditioner import LongCatConditioner

    llm_cfg, llm_p, vcfg, vis_p, ref = _setup()
    cond = LongCatConditioner(StubTokenizer(), llm_p, llm_cfg, content_len=32,
                              vision_params=vis_p, vision_cfg=vcfg,
                              vlm_min_pixels=0, vlm_max_pixels=64 * 64,
                              edit_start_idx=8)
    c1 = cond.get_learned_condition("make it blue", ref_images=[ref])
    assert c1.c_crossattn.shape[-1] == 24
    assert c1.c_crossattn.shape[1] >= 32  # padded to content_len
    # different ref image changes the condition
    ref2 = np.random.default_rng(3).random((24, 16, 3), dtype=np.float32)
    c2 = cond.get_learned_condition("make it blue", ref_images=[ref2])
    assert np.abs(np.asarray(c1.c_crossattn)
                  - np.asarray(c2.c_crossattn)).max() > 1e-6
    # without refs → captioning template path still works
    c3 = cond.get_learned_condition("make it blue")
    assert c3.c_crossattn.shape[-1] == 24


def test_boogu_edit_branch():
    from sdtpu.conditioning.conditioner import BooguConditioner

    llm_cfg, llm_p, vcfg, vis_p, ref = _setup()
    cond = BooguConditioner(StubTokenizer(), llm_p, llm_cfg,
                            vision_params=vis_p, vision_cfg=vcfg,
                            vlm_min_pixels=0, vlm_max_pixels=64 * 64)
    c1 = cond.get_learned_condition("remove the hat", ref_images=[ref])
    c2 = cond.get_learned_condition("remove the hat")
    assert c1.c_crossattn.shape[-1] == 24
    assert c1.c_crossattn.shape[1] > c2.c_crossattn.shape[1]  # vision tokens added
    # two refs → two vision segments
    c3 = cond.get_learned_condition("remove the hat", ref_images=[ref, ref])
    assert c3.c_crossattn.shape[1] > c1.c_crossattn.shape[1]


def test_krea2_ref_branch():
    from sdtpu.conditioning.conditioner import Krea2Conditioner

    llm_cfg, llm_p, vcfg, vis_p, ref = _setup()
    cond = Krea2Conditioner(StubTokenizer(), llm_p, llm_cfg,
                            out_layers=(1, 2, 3), vision_params=vis_p,
                            vision_cfg=vcfg, vlm_min_pixels=0,
                            vlm_max_pixels=64 * 64)
    c1 = cond.get_learned_condition("add a moon", ref_images=[ref])
    c2 = cond.get_learned_condition("add a moon")
    # 3 output layers concatenated on features
    assert c1.c_crossattn.shape[-1] == 24 * 3
    assert c1.c_crossattn.shape[1] > c2.c_crossattn.shape[1]

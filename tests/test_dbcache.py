"""DBCache / cache_dit step cache + SCM step-computation masks."""
import numpy as np

from sdtpu.diffusion.stepcache import (
    DBCacheConfig,
    generate_scm_mask,
    make_step_cache,
    parse_scm_mask,
)


def _drive(cache, steps, x_fn=None):
    """Run the cache through a fake sampler loop; returns model call count."""
    x = np.zeros((1, 4, 4, 4), dtype=np.float32)
    for i in range(steps):
        xi = x + (0.0 if x_fn is None else x_fn(i))
        pred, _ = cache(xi, 10.0 - i, i)
    return cache


def _model(calls):
    def model(x, sigma, i):
        calls.append(int(i))
        out = np.asarray(x) * 0.5
        return out, out
    return model


def test_dbcache_skips_when_input_static():
    calls = []
    cache = make_step_cache("dbcache", _model(calls), None, 20,
                            max_warmup_steps=2, residual_diff_threshold=0.08)
    _drive(cache, 20)
    assert cache.steps_skipped > 0
    assert len(calls) + cache.steps_skipped == 20


def test_dbcache_computes_when_input_moves():
    calls = []
    cache = make_step_cache("dbcache", _model(calls), None, 20,
                            max_warmup_steps=2, residual_diff_threshold=0.01)
    rng = np.random.default_rng(0)
    _drive(cache, 20, x_fn=lambda i: rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    assert cache.steps_skipped == 0
    assert len(calls) == 20


def test_scm_mask_forces_compute():
    calls = []
    mask = ",".join("1" * 1 for _ in range(20))  # all-ones: every step computed
    cache = make_step_cache("dbcache", _model(calls), None, 20,
                            max_warmup_steps=0, scm_mask=mask)
    _drive(cache, 20)
    assert cache.steps_skipped == 0 and len(calls) == 20


def test_scm_static_policy_forces_cache():
    calls = []
    # steps 5..8 masked 0 with static policy → forced cache hits
    mask = ["1"] * 20
    for i in range(5, 9):
        mask[i] = "0"
    cache = make_step_cache(
        "cache_dit", _model(calls), None, 20, max_warmup_steps=0,
        scm_mask=",".join(mask), scm_policy_dynamic=False,
        residual_diff_threshold=0.0)  # threshold 0 → only forced hits skip
    rng = np.random.default_rng(1)
    _drive(cache, 20, x_fn=lambda i: rng.standard_normal((1, 4, 4, 4)).astype(np.float32))
    assert cache.cached_steps == [5, 6, 7, 8]


def test_warmup_and_caps():
    calls = []
    cache = make_step_cache("dbcache", _model(calls), None, 30,
                            max_warmup_steps=4, max_cached_steps=3,
                            residual_diff_threshold=10.0, start_percent=0.0,
                            end_percent=1.0)
    _drive(cache, 30)
    assert len(cache.cached_steps) == 3  # capped
    assert min(cache.cached_steps) >= 4  # first 4 steps are warmup


def test_scm_mask_helpers():
    assert parse_scm_mask("1,0,0,1") == [1, 0, 0, 1]
    assert parse_scm_mask("1:0:1") == [1, 0, 1]
    m = generate_scm_mask([2, 1], [3, 2], 8)
    assert m == [1, 1, 0, 0, 0, 1, 0, 1]  # last step forced compute
    assert generate_scm_mask([1], [100], 5) == [1, 0, 0, 0, 1]


def test_pipeline_dbcache_end_to_end():
    from sdtpu.config import GenerationParams, SDVersion
    from sdtpu.factory import create_pipeline

    pipe = create_pipeline(SDVersion.SD1, small=True, seed=0)
    gp = GenerationParams(prompt="cat", width=64, height=64, sample_steps=8,
                          sample_method="euler", cfg_scale=1.0, seed=1)
    res = pipe.generate(gp, step_cache="dbcache",
                        cache_options={"max_warmup_steps": 1,
                                       "residual_diff_threshold": 10.0,
                                       "start_percent": 0.0})
    assert res.images.shape == (1, 64, 64, 3)

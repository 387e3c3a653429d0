"""Pipeline stepwise-callback path (progress/preview/cancel — reference
sd_set_progress_callback/sd_set_preview_callback) and video writers
(reference media_io)."""
import os

import numpy as np
import pytest

from sdtpu.config import GenerationParams, SDVersion
from sdtpu.factory import create_pipeline


@pytest.fixture(scope="module")
def pipe():
    return create_pipeline(SDVersion.SD1, small=True, seed=0)


GP = GenerationParams(
    prompt="a dog", width=64, height=64, sample_steps=3, cfg_scale=3.0,
    sample_method="euler", seed=5,
)


def test_stepwise_matches_scan(pipe):
    """The host-driven loop (jitted single step) must reproduce the
    monolithic on-device scan (up to XLA fusion-boundary float noise)."""
    base = pipe.generate(GP)
    calls = []
    stepped = pipe.generate(GP, progress_callback=lambda i, n, x: calls.append((i, n)))
    np.testing.assert_allclose(base.latents, stepped.latents, rtol=1e-3, atol=1e-4)
    assert calls == [(1, 3), (2, 3), (3, 3)]


def test_preview_and_cancel(pipe):
    previews = []
    pipe.generate(GP, preview_callback=lambda i, z: previews.append((i, z.shape)))
    assert [i for i, _ in previews] == [1, 2, 3]
    assert previews[0][1] == (1, 8, 8, 4)

    # cancel after the first step: result differs from the full run
    n = {"v": 0}

    def cancel():
        n["v"] += 1
        return n["v"] > 1

    partial = pipe.generate(GP, cancel_check=cancel)
    full = pipe.generate(GP)
    assert not np.allclose(partial.latents, full.latents)


def test_video_writers(tmp_path):
    from sdtpu.utils.video import write_avi_mjpg, write_gif, write_webp_anim

    frames = (np.random.default_rng(0).uniform(0, 255, (5, 32, 48, 3))).astype(np.uint8)

    avi = tmp_path / "out.avi"
    write_avi_mjpg(str(avi), frames, fps=8)
    raw = avi.read_bytes()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"AVI "
    assert raw.count(b"00dc") >= 5  # one chunk per frame + index entries

    webp = tmp_path / "out.webp"
    write_webp_anim(str(webp), frames, fps=8)
    from PIL import Image

    im = Image.open(webp)
    assert getattr(im, "n_frames", 1) == 5

    gif = tmp_path / "out.gif"
    write_gif(str(gif), frames, fps=8)
    im = Image.open(gif)
    assert im.n_frames == 5

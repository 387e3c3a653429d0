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


def test_write_webm_muxes_vp8_keyframes(tmp_path):
    """WebM mux (VERDICT r2 item 8; reference create_webm_from_sd_images,
    media_io.cpp:1146): PIL-encoded VP8 frames in a hand-written Matroska
    container.  Round-trip: each SimpleBlock's VP8 payload re-wrapped as a
    WebP RIFF must decode to the frame."""
    import io
    import struct

    from PIL import Image

    from sdtpu.utils.video import write_webm

    rng = np.random.default_rng(0)
    frames = (rng.uniform(0, 255, size=(3, 32, 48, 3))).astype(np.uint8)
    path = str(tmp_path / "out.webm")
    write_webm(path, frames, fps=8, quality=90)
    data = open(path, "rb").read()

    assert data[:4] == b"\x1a\x45\xdf\xa3"  # EBML magic
    assert b"webm" in data[:64]
    assert b"V_VP8" in data

    # walk clusters, pull SimpleBlock payloads
    blocks = []
    off = data.find(b"\x1f\x43\xb6\x75")
    while off != -1:
        nxt = data.find(b"\x1f\x43\xb6\x75", off + 4)
        cluster = data[off:nxt if nxt != -1 else len(data)]
        boff = cluster.find(b"\xa3")
        while boff != -1:
            # vint size follows the 1-byte id; payload = track vint +
            # 2-byte ts + flags + frame
            first = cluster[boff + 1]
            ln = 8 - first.bit_length() + 1
            size = int.from_bytes(cluster[boff + 1:boff + 1 + ln], "big") & (
                (1 << (7 * ln)) - 1)
            payload = cluster[boff + 1 + ln:boff + 1 + ln + size]
            blocks.append(payload)
            boff = cluster.find(b"\xa3", boff + 1 + ln + size)
        off = nxt
    vp8_frames = [b[4:] for b in blocks if b[0] == 0x81]
    assert len(vp8_frames) == 3
    for i, chunk in enumerate(vp8_frames):
        assert chunk[3:6] == b"\x9d\x01\x2a"  # VP8 keyframe start code
        riff = (b"RIFF" + struct.pack("<I", 4 + 8 + len(chunk) + (len(chunk) & 1))
                + b"WEBP" + b"VP8 " + struct.pack("<I", len(chunk)) + chunk
                + (b"\x00" if len(chunk) & 1 else b""))
        img = np.asarray(Image.open(io.BytesIO(riff)).convert("RGB"))
        assert img.shape == (32, 48, 3)
        # lossy: just check it's correlated with the source frame
        assert np.abs(img.astype(np.int32) - frames[i].astype(np.int32)).mean() < 64


def test_write_webm_with_pcm_audio(tmp_path):
    """Audio variant: A_PCM/INT/LIT track chunked per video frame
    (reference audio_sample_range_for_video_frame)."""
    from sdtpu.utils.video import write_webm

    rng = np.random.default_rng(1)
    frames = (rng.uniform(0, 255, size=(2, 16, 16, 3))).astype(np.uint8)
    audio = np.sin(np.linspace(0, 40, 1200)).astype(np.float32)
    path = str(tmp_path / "av.webm")
    write_webm(path, frames, fps=4, quality=80, audio=audio, sample_rate=2400)
    data = open(path, "rb").read()
    assert b"A_PCM/INT/LIT" in data
    # the first frame's PCM chunk must land verbatim in the container
    pcm = np.clip(audio[:600] * 32767.0, -32768, 32767).astype("<i2").tobytes()
    assert pcm[:64] in data

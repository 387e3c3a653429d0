"""Video output: MJPG-AVI, animated WebP, and GIF writers.

Reference analog: examples/common/media_io.h:19-107 (MJPG-AVI / animated-WebP
/ WebM muxing).  JPEG/WebP frame encoding via PIL; the AVI RIFF container is
written directly (no ffmpeg dependency).
"""
from __future__ import annotations

import io
import struct
from typing import Sequence

import numpy as np


def _jpeg_bytes(frame: np.ndarray, quality: int = 90) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def write_avi_mjpg(path: str, frames: np.ndarray, fps: int = 16, quality: int = 90):
    """frames: [T, H, W, 3] uint8 → Motion-JPEG AVI (RIFF/AVI 1.0)."""
    t, h, w, _ = frames.shape
    jpegs = [_jpeg_bytes(f, quality) for f in frames]
    max_size = max(len(j) for j in jpegs)

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_size * fps,    # max bytes per sec (approx)
        0,                 # padding granularity
        0x10,              # flags: AVIF_HASINDEX
        t, 0, 1, max_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, t, max_size, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )

    movi_chunks = []
    index = []
    offset = 4  # after 'movi' fourcc
    for j in jpegs:
        c = chunk(b"00dc", j)
        movi_chunks.append(c)
        index.append(struct.pack("<4sIII", b"00dc", 0x10, offset, len(j)))
        offset += len(c)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(index))

    body = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body)) + body)


def write_webp_anim(path: str, frames: np.ndarray, fps: int = 16, quality: int = 90):
    """frames: [T, H, W, 3] uint8 → animated WebP."""
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=max(1, round(1000 / fps)),
        loop=0,
        quality=quality,
    )


def write_gif(path: str, frames: np.ndarray, fps: int = 16):
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=max(1, round(1000 / fps)),
        loop=0,
    )


def write_video(path: str, frames: np.ndarray, fps: int = 16, quality: int = 90):
    """Dispatch on extension (.avi / .webp / .gif); .png writes frame files
    path_0000.png…"""
    low = path.lower()
    if low.endswith(".avi"):
        write_avi_mjpg(path, frames, fps, quality)
    elif low.endswith(".webp"):
        write_webp_anim(path, frames, fps, quality)
    elif low.endswith(".gif"):
        write_gif(path, frames, fps)
    else:
        from sdtpu.utils.image import write_png

        base = path.rsplit(".", 1)[0]
        for i, f in enumerate(frames):
            write_png(f"{base}_{i:04d}.png", f)


def write_wav(path: str, samples: np.ndarray, sample_rate: int = 48000):
    """16-bit PCM WAV writer (reference media_io WAV write,
    examples/common/media_io.h:100).  samples: [T] or [T, channels] float in
    [-1, 1]."""
    import struct

    s = np.asarray(samples, dtype=np.float32)
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    pcm = np.clip(s * 32767.0, -32768, 32767).astype("<i2").tobytes()
    byte_rate = sample_rate * n_ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    hdr += b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_ch, sample_rate,
                                 byte_rate, n_ch * 2, 16)
    hdr += b"data" + struct.pack("<I", len(pcm))
    with open(path, "wb") as f:
        f.write(hdr + pcm)

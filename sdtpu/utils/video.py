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


# ---------------------------------------------------------------------- WebM

def _ebml_vint(n: int) -> bytes:
    """EBML variable-length size encoding."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            out = bytearray(n.to_bytes(length, "big"))
            out[0] |= 0x80 >> (length - 1)
            return bytes(out)
    raise ValueError("size too large for EBML vint")


def _elem(eid: bytes, payload: bytes) -> bytes:
    return eid + _ebml_vint(len(payload)) + payload


def _uint_elem(eid: bytes, val: int) -> bytes:
    n = max(1, (val.bit_length() + 7) // 8)
    return _elem(eid, val.to_bytes(n, "big"))


def _float_elem(eid: bytes, val: float) -> bytes:
    return _elem(eid, struct.pack(">d", float(val)))


def _vp8_frame_from_webp(webp: bytes) -> bytes:
    """Extract the raw VP8 bitstream chunk from a lossy WebP RIFF container
    (reference extract_vp8_frame_from_webp, media_io.cpp:407)."""
    if len(webp) < 12 or webp[:4] != b"RIFF" or webp[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    off = 12
    while off + 8 <= len(webp):
        fourcc = webp[off:off + 4]
        size = struct.unpack("<I", webp[off + 4:off + 8])[0]
        if fourcc == b"VP8 ":
            return webp[off + 8:off + 8 + size]
        off += 8 + size + (size & 1)
    raise ValueError("no lossy VP8 chunk in WebP (alpha/lossless frame?)")


def write_webm(path: str, frames: np.ndarray, fps: int = 16, quality: int = 90,
               audio: np.ndarray = None, sample_rate: int = 48000):
    """frames: [T, H, W, 3] uint8 → WebM (VP8 keyframes, each frame encoded
    via PIL's libwebp then re-muxed, exactly the reference's scheme:
    create_webm_from_sd_images media_io.cpp:1146 encodes frames with libwebp
    and muxes the raw VP8 chunks with libwebm).  Optional audio: float
    [-1, 1] mono [N] or [N, ch] → A_PCM/INT/LIT track, chunked per frame."""
    from PIL import Image

    t, h, w, _ = frames.shape
    vp8 = []
    for f in frames:
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="WEBP", quality=quality,
                                lossless=False, exact=False)
        vp8.append(_vp8_frame_from_webp(buf.getvalue()))

    ms_per_frame = 1000.0 / fps
    duration_ms = t * ms_per_frame

    ebml = _elem(b"\x1a\x45\xdf\xa3", b"".join([
        _uint_elem(b"\x42\x86", 1),        # EBMLVersion
        _uint_elem(b"\x42\xf7", 1),        # EBMLReadVersion
        _uint_elem(b"\x42\xf2", 4),        # EBMLMaxIDLength
        _uint_elem(b"\x42\xf3", 8),        # EBMLMaxSizeLength
        _elem(b"\x42\x82", b"webm"),       # DocType
        _uint_elem(b"\x42\x87", 2),        # DocTypeVersion (SimpleBlock)
        _uint_elem(b"\x42\x85", 2),        # DocTypeReadVersion
    ]))
    info = _elem(b"\x15\x49\xa9\x66", b"".join([
        _uint_elem(b"\x2a\xd7\xb1", 1_000_000),  # TimestampScale: 1 ms ticks
        _float_elem(b"\x44\x89", duration_ms),   # Duration
        _elem(b"\x4d\x80", b"sdtpu"),            # MuxingApp
        _elem(b"\x57\x41", b"sdtpu"),            # WritingApp
    ]))
    video_track = _elem(b"\xae", b"".join([
        _uint_elem(b"\xd7", 1),            # TrackNumber
        _uint_elem(b"\x73\xc5", 1),        # TrackUID
        _uint_elem(b"\x83", 1),            # TrackType: video
        _uint_elem(b"\x9c", 0),            # FlagLacing
        _elem(b"\x86", b"V_VP8"),          # CodecID
        _elem(b"\xe0", _uint_elem(b"\xb0", w) + _uint_elem(b"\xba", h)),
    ]))
    tracks = [video_track]

    pcm = None
    n_ch = 0
    if audio is not None:
        s = np.asarray(audio, dtype=np.float32)
        if s.ndim == 1:
            s = s[:, None]
        n_ch = s.shape[1]
        pcm = np.clip(s * 32767.0, -32768, 32767).astype("<i2")
        tracks.append(_elem(b"\xae", b"".join([
            _uint_elem(b"\xd7", 2),
            _uint_elem(b"\x73\xc5", 2),
            _uint_elem(b"\x83", 2),        # TrackType: audio
            _uint_elem(b"\x9c", 0),
            _elem(b"\x86", b"A_PCM/INT/LIT"),
            _elem(b"\xe1", b"".join([
                _float_elem(b"\xb5", float(sample_rate)),
                _uint_elem(b"\x9f", n_ch),
                _uint_elem(b"\x62\x64", 16),  # BitDepth
            ])),
        ])))
    tracks_elem = _elem(b"\x16\x54\xae\x6b", b"".join(tracks))

    clusters = []
    for i, frame in enumerate(vp8):
        ts = int(round(i * ms_per_frame))
        blocks = [_elem(b"\xa3", b"\x81" + struct.pack(">h", 0) + b"\x80" + frame)]
        if pcm is not None:
            # audio chunk aligned to this video frame (reference
            # audio_sample_range_for_video_frame)
            a0 = (i * len(pcm)) // t
            a1 = ((i + 1) * len(pcm)) // t
            if a1 > a0:
                blocks.append(_elem(
                    b"\xa3",
                    b"\x82" + struct.pack(">h", 0) + b"\x80"
                    + pcm[a0:a1].tobytes()))
        clusters.append(_elem(b"\x1f\x43\xb6\x75",
                              _uint_elem(b"\xe7", ts) + b"".join(blocks)))

    segment = _elem(b"\x18\x53\x80\x67", info + tracks_elem + b"".join(clusters))
    with open(path, "wb") as f:
        f.write(ebml + segment)


def write_video(path: str, frames: np.ndarray, fps: int = 16, quality: int = 90,
                audio: np.ndarray = None, sample_rate: int = 48000):
    """Dispatch on extension (.avi / .webm / .webp / .gif); .png writes frame
    files path_0000.png…"""
    low = path.lower()
    if low.endswith(".avi"):
        write_avi_mjpg(path, frames, fps, quality)
    elif low.endswith(".webm"):
        write_webm(path, frames, fps, quality, audio=audio,
                   sample_rate=sample_rate)
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

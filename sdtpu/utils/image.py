"""Image IO + webui-compatible PNG metadata.

Reference analog: examples/common/media_io (stb-based codecs) and
examples/cli/image_metadata.cpp (webui "parameters" text embedding, readable
by A1111/civitai).  Uses Pillow when present; PNG has a dependency-free
fallback writer.
"""
from __future__ import annotations

import io
import struct
import zlib
from typing import Dict, Optional

import numpy as np


def build_parameters_text(gp, extra: Optional[Dict[str, str]] = None) -> str:
    """webui-style generation parameters string (image_metadata.cpp parity)."""
    lines = [gp.prompt]
    if gp.negative_prompt:
        lines.append(f"Negative prompt: {gp.negative_prompt}")
    fields = [
        f"Steps: {gp.sample_steps}",
        f"Sampler: {gp.sample_method}",
        f"Schedule type: {gp.schedule}",
        f"CFG scale: {gp.cfg_scale:g}",
        f"Seed: {gp.seed}",
        f"Size: {gp.width}x{gp.height}",
    ]
    if gp.clip_skip > 0:
        fields.append(f"Clip skip: {gp.clip_skip}")
    if extra:
        fields.extend(f"{k}: {v}" for k, v in extra.items())
    fields.append("Version: sdtpu")
    lines.append(", ".join(fields))
    return "\n".join(lines)


def parse_parameters_text(text: str) -> Dict[str, str]:
    """Read back a webui parameters blob into a dict."""
    out: Dict[str, str] = {}
    lines = text.split("\n")
    if not lines:
        return out
    out["prompt"] = lines[0]
    rest = lines[1:]
    for line in rest:
        if line.startswith("Negative prompt: "):
            out["negative_prompt"] = line[len("Negative prompt: ") :]
        else:
            for field in line.split(", "):
                if ": " in field:
                    k, v = field.split(": ", 1)
                    out[k.strip().lower().replace(" ", "_")] = v
    return out


def image_format_from_path(path: str) -> str:
    """Still-image container from the output extension — the reference's
    encoded_image_format_from_path (examples/common/media_io.h:17):
    → "png" | "jpeg" | "webp" | "unknown"."""
    low = path.lower()
    if low.endswith(".png"):
        return "png"
    if low.endswith(".jpg") or low.endswith(".jpeg"):
        return "jpeg"
    if low.endswith(".webp"):
        return "webp"
    return "unknown"


def _xml_escape(text: str) -> str:
    return (text.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def _xml_unescape(text: str) -> str:
    return (text.replace("&quot;", '"').replace("&gt;", ">")
            .replace("&lt;", "<").replace("&amp;", "&"))


def build_xmp_packet(parameters: str) -> str:
    """XMP packet carrying the webui parameters blob — the WebP metadata
    vehicle (reference build_webp_xmp_packet, examples/common/media_io.cpp:
    313-330, <sdcpp:parameters> element; we use an sdtpu namespace with the
    same packet shape)."""
    return (
        '<?xpacket begin="﻿" id="W5M0MpCehiHzreSzNTczkc9d"?>\n'
        '<x:xmpmeta xmlns:x="adobe:ns:meta/">\n'
        '  <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">\n'
        '    <rdf:Description xmlns:sdtpu="https://sdtpu/ns/1.0/">\n'
        "      <sdtpu:parameters>" + _xml_escape(parameters)
        + "</sdtpu:parameters>\n"
        "    </rdf:Description>\n"
        "  </rdf:RDF>\n"
        "</x:xmpmeta>\n"
        '<?xpacket end="w"?>'
    )


def parameters_from_xmp(packet: str) -> Optional[str]:
    """Extract a <ns:parameters> element's text from an XMP packet (accepts
    both this repo's sdtpu namespace and the reference's sdcpp one)."""
    import re

    m = re.search(r"<[A-Za-z0-9_]+:parameters>(.*?)</[A-Za-z0-9_]+:parameters>",
                  packet, re.S)
    return _xml_unescape(m.group(1)) if m else None


def _insert_jpeg_com(jpeg: bytes, parameters: str) -> bytes:
    """Splice a COM segment holding ``parameters\\0<text>`` into an encoded
    JPEG, right after SOI (+JFIF APP0 when present) — byte-level parity with
    the reference's writer (thirdparty/stb_image_write.h:1529-1540: COM
    marker, payload "parameters\\0" + text, even-length 0xFF pad)."""
    payload = b"parameters\x00" + parameters.encode("latin-1", "replace")
    payload = payload[: 65534 - 2]  # segment length field caps at 0xFFFF
    seg = b"\xff\xfe" + struct.pack(">H", len(payload) + 2) + payload
    if len(seg) & 1:  # even-length pad, 0xFF fill byte like the reference
        seg += b"\xff"
    pos = 2  # after SOI
    if jpeg[2:4] in (b"\xff\xe0", b"\xff\xe1"):  # keep APP0/APP1 first
        (n,) = struct.unpack(">H", jpeg[4:6])
        pos = 4 + n
    return jpeg[:pos] + seg + jpeg[pos:]


def encode_image(image: np.ndarray, fmt: str,
                 parameters: Optional[str] = None, quality: int = 90) -> bytes:
    """Encode [H,W,3] uint8 → container bytes with the parameters blob
    embedded per-format: PNG tEXt, JPEG COM, WebP XMP (reference
    encode_image_to_vector, examples/common/media_io.cpp:700-752)."""
    from PIL import Image

    fmt = fmt.lower()
    quality = max(0, min(100, int(quality)))
    buf = io.BytesIO()
    if fmt == "png":
        from PIL.PngImagePlugin import PngInfo

        info = PngInfo()
        if parameters:
            info.add_text("parameters", parameters)
        Image.fromarray(image).save(buf, format="PNG", pnginfo=info)
        return buf.getvalue()
    if fmt in ("jpeg", "jpg"):
        Image.fromarray(image).save(buf, format="JPEG", quality=quality)
        data = buf.getvalue()
        return _insert_jpeg_com(data, parameters) if parameters else data
    if fmt == "webp":
        kw = {"xmp": build_xmp_packet(parameters)} if parameters else {}
        Image.fromarray(image).save(buf, format="WEBP", quality=quality, **kw)
        return buf.getvalue()
    raise ValueError(f"unknown still-image format: {fmt!r}")


def write_image(path: str, image: np.ndarray,
                parameters: Optional[str] = None, quality: int = 90) -> None:
    """Write a still picking the container from the extension (.png default;
    .jpg/.jpeg/.webp with the parameters blob embedded — reference
    write_image_to_file, examples/common/media_io.cpp:754-775)."""
    fmt = image_format_from_path(path)
    if fmt in ("unknown", "png"):
        write_png(path, image, parameters=parameters)
        return
    with open(path, "wb") as f:
        f.write(encode_image(image, fmt, parameters=parameters, quality=quality))


def read_image(path: str):
    """→ (image [H,W,3] uint8, parameters text or None) for PNG/JPEG/WebP —
    the read side of write_image: PNG tEXt, JPEG COM ("parameters\\0"
    prefix), WebP XMP all round-trip."""
    from PIL import Image

    img = Image.open(path)
    params = img.info.get("parameters")
    if params is None:
        xmp = img.info.get("xmp")
        if xmp:
            if isinstance(xmp, bytes):
                xmp = xmp.decode("utf-8", "replace")
            params = parameters_from_xmp(xmp)
    arr = np.asarray(img.convert("RGB"))
    if params is None and path.lower().endswith((".jpg", ".jpeg")):
        try:
            for e in walk_image_metadata(path):
                if e.get("keyword") == "parameters" and "value" in e:
                    params = e["value"]
                    break
        except Exception:
            pass
    return arr, params


def write_png(path: str, image: np.ndarray, parameters: Optional[str] = None) -> None:
    """image: [H,W,3] uint8. Embeds `parameters` as a tEXt chunk (webui)."""
    try:
        from PIL import Image
        from PIL.PngImagePlugin import PngInfo

        img = Image.fromarray(image)
        info = PngInfo()
        if parameters:
            info.add_text("parameters", parameters)
        img.save(path, format="PNG", pnginfo=info)
        return
    except ImportError:
        pass
    _write_png_fallback(path, image, parameters)


def read_png(path: str):
    """→ (image [H,W,3] uint8, parameters text or None)."""
    try:
        from PIL import Image

        img = Image.open(path)
        params = img.info.get("parameters")
        return np.asarray(img.convert("RGB")), params
    except ImportError:
        raise RuntimeError("PNG reading requires Pillow in this build")


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _write_png_fallback(path: str, image: np.ndarray, parameters: Optional[str]) -> None:
    h, w, _ = image.shape
    raw = b"".join(b"\x00" + image[y].tobytes() for y in range(h))
    out = io.BytesIO()
    out.write(b"\x89PNG\r\n\x1a\n")
    out.write(_png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)))
    if parameters:
        out.write(_png_chunk(b"tEXt", b"parameters\x00" + parameters.encode("latin-1", "replace")))
    out.write(_png_chunk(b"IDAT", zlib.compress(raw, 6)))
    out.write(_png_chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(out.getvalue())


def walk_image_metadata(path: str, include_structural: bool = False,
                        include_raw: bool = False, brief: bool = False):
    """Chunk/segment-level metadata walk of a PNG or JPEG file — the
    reference metadata mode's reader (examples/cli/image_metadata.cpp:
    print_image_metadata with MetadataReadOptions {include_structural,
    include_raw, brief}).

    → list of dicts {"chunk", "length", ["keyword"], ["value"], ["raw"]}.
    PNG tEXt/iTXt/zTXt parse to keyword/value; JPEG COM parses to text;
    other chunks/segments (eXIf, APPn) get a raw hex preview when
    include_raw; structural entries (IHDR/IDAT/IEND, SOF/SOS) appear only
    with include_structural; brief truncates long text values.
    """
    def _val(text: str) -> str:
        if brief and len(text) > 96:
            return text[:96] + f"…({len(text)} chars)"
        return text

    def _entry(name: str, length: int, keyword=None, value=None, data=None):
        e = {"chunk": name, "length": length}
        if keyword is not None:
            e["keyword"] = keyword
        if value is not None:
            e["value"] = _val(value)
        if data is not None and include_raw:
            e["raw"] = data[:32].hex()
        return e

    with open(path, "rb") as f:
        blob = f.read()
    entries = []
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        structural = {b"IHDR", b"IDAT", b"IEND", b"PLTE", b"pHYs", b"sRGB",
                      b"gAMA", b"cHRM", b"bKGD", b"sBIT", b"tIME"}
        pos = 8
        while pos + 8 <= len(blob):
            (n,) = struct.unpack(">I", blob[pos:pos + 4])
            tag = blob[pos + 4:pos + 8]
            data = blob[pos + 8:pos + 8 + n]
            name = tag.decode("latin-1")
            if tag == b"tEXt" and b"\x00" in data:
                k, v = data.split(b"\x00", 1)
                entries.append(_entry(name, n, k.decode("latin-1"),
                                      v.decode("latin-1", "replace")))
            elif tag == b"zTXt" and b"\x00" in data:
                k, rest = data.split(b"\x00", 1)
                try:
                    v = zlib.decompress(rest[1:]).decode("latin-1", "replace")
                except Exception:
                    v = "(bad zTXt payload)"
                entries.append(_entry(name, n, k.decode("latin-1"), v))
            elif tag == b"iTXt" and data.count(b"\x00") >= 4:
                k, rest = data.split(b"\x00", 1)
                comp = rest[0]
                # rest[2:] = lang\0translated_kw\0text
                parts = rest[2:].split(b"\x00", 2)
                text = parts[2] if len(parts) == 3 else b""
                if comp:
                    try:
                        text = zlib.decompress(text)
                    except Exception:
                        text = b"(bad iTXt payload)"
                entries.append(_entry(name, n, k.decode("latin-1"),
                                      text.decode("utf-8", "replace")))
            elif tag in structural:
                if include_structural:
                    e = _entry(name, n, data=data)
                    if tag == b"IHDR" and n >= 8:
                        w, h = struct.unpack(">II", data[:8])
                        e["value"] = f"{w}x{h}"
                    entries.append(e)
            else:  # eXIf and friends: unparsed payload
                entries.append(_entry(name, n, data=data))
            pos += 12 + n
            if tag == b"IEND":
                break
        return entries
    if blob[:2] == b"\xff\xd8":  # JPEG
        pos = 2
        if include_structural:
            entries.append({"chunk": "SOI", "length": 0})
        while pos + 4 <= len(blob) and blob[pos] == 0xFF:
            while pos + 4 <= len(blob) and blob[pos + 1] == 0xFF:
                pos += 1  # 0xFF fill bytes before a marker are legal padding
            marker = blob[pos + 1]
            if marker in (0xD8, 0xD9):
                pos += 2
                continue
            (n,) = struct.unpack(">H", blob[pos + 2:pos + 4])
            data = blob[pos + 4:pos + 2 + n]
            if marker == 0xFE:  # COM
                if data.startswith(b"parameters\x00"):
                    # the reference writer's generation-parameters comment
                    # (thirdparty/stb_image_write.h:1529: "parameters\0" + text)
                    entries.append(_entry(
                        "COM", n - 2, "parameters",
                        data[len(b"parameters\x00"):].rstrip(b"\x00")
                        .decode("latin-1", "replace")))
                else:
                    entries.append(_entry("COM", n - 2, "comment",
                                          data.decode("latin-1", "replace")))
            elif 0xE0 <= marker <= 0xEF:
                ident = data.split(b"\x00", 1)[0].decode("latin-1", "replace")
                entries.append(_entry(f"APP{marker - 0xE0}", n - 2, ident or None,
                                      data=data))
            elif include_structural:
                entries.append(_entry(f"0xFF{marker:02X}", n - 2, data=data))
            if marker == 0xDA:  # SOS: entropy-coded data follows
                break
            pos += 2 + n
        return entries
    if blob[:4] == b"RIFF" and blob[8:12] == b"WEBP":  # WebP RIFF container
        structural = {b"VP8 ", b"VP8L", b"VP8X", b"ALPH", b"ANIM", b"ANMF",
                      b"ICCP"}
        pos = 12
        while pos + 8 <= len(blob):
            tag = blob[pos:pos + 4]
            (n,) = struct.unpack("<I", blob[pos + 4:pos + 8])
            data = blob[pos + 8:pos + 8 + n]
            name = tag.decode("latin-1")
            if tag == b"XMP ":
                packet = data.decode("utf-8", "replace")
                params = parameters_from_xmp(packet)
                if params is not None:
                    entries.append(_entry(name, n, "parameters", params))
                else:
                    entries.append(_entry(name, n, "xmp", packet))
            elif tag == b"EXIF":
                entries.append(_entry(name, n, data=data))
            elif tag in structural:
                if include_structural:
                    entries.append(_entry(name, n, data=data))
            else:
                entries.append(_entry(name, n, data=data))
            pos += 8 + n + (n & 1)  # RIFF chunks pad to even
        return entries
    raise ValueError(f"{path}: not a PNG, JPEG, or WebP file")


def image_to_base64_png(image: np.ndarray, parameters: Optional[str] = None) -> str:
    import base64

    from PIL import Image
    from PIL.PngImagePlugin import PngInfo

    buf = io.BytesIO()
    info = PngInfo()
    if parameters:
        info.add_text("parameters", parameters)
    Image.fromarray(image).save(buf, format="PNG", pnginfo=info)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def image_to_base64(image: np.ndarray, fmt: str = "png",
                    quality: int = 90,
                    parameters: Optional[str] = None) -> str:
    """Base64-encode an image in png/jpeg/webp (reference OpenAI-route
    output_format/output_compression, api.md; clamped 0..100)."""
    import base64

    from PIL import Image

    fmt = (fmt or "png").lower()
    if fmt == "png":
        return image_to_base64_png(image, parameters=parameters)
    quality = max(0, min(100, int(quality)))
    buf = io.BytesIO()
    Image.fromarray(image).save(buf, format="JPEG" if fmt == "jpeg" else "WEBP",
                                quality=quality)
    return base64.b64encode(buf.getvalue()).decode("ascii")


def base64_png_to_image(data: str) -> np.ndarray:
    import base64

    from PIL import Image

    if data.startswith("data:"):
        data = data.split(",", 1)[1]
    return np.asarray(Image.open(io.BytesIO(base64.b64decode(data))).convert("RGB"))


def resize_image(image: np.ndarray, width: int, height: int) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.fromarray(image).resize((width, height), Image.LANCZOS))

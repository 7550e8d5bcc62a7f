"""Pure-stdlib media codecs: PNG (zlib + struct) and WAV (struct).

VERDICT r9 #5: the multimodal tier's decode step was a documented stub
because no imaging/audio library ships in this environment — but PNG and
PCM WAV are fully decodable with the standard library alone. These codecs
give `operators/multimodal._decode_real` a REAL path for two formats
(everything else keeps the documented NotImplementedError stub).

PNG support: 8-bit greyscale (color type 0) and truecolor RGB (color
type 2), non-interlaced — the full filter set (None/Sub/Up/Average/Paeth,
PNG spec §6) is implemented on both the encode and decode side, and the
encoder can cycle filter types per row so a round-trip genuinely
exercises every unfilter branch. Chunk CRCs are verified on decode.

WAV support: canonical RIFF/WAVE PCM (format tag 1), 8/16-bit.

Scale note: these run inside Arrow-batched mapInPandas workers
(operators/multimodal.decode_media) — pure CPU per row, no shuffle; the
codec never materializes more than one blob at a time.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3}  # color_type -> samples per pixel


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    color_type: int = 0,
    filter_mode: str = "cycle",
) -> bytes:
    """Encode raw 8-bit pixel bytes (row-major, len == width*height*channels)
    as a PNG. ``filter_mode="cycle"`` applies filter type ``row % 5`` so a
    decode round-trip exercises every unfilter branch; ``"none"`` writes
    filter 0 rows only."""
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported color_type {color_type} (0 or 2)")
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{stride}*{height}={stride * height}"
        )
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        ft = (r % 5) if filter_mode == "cycle" else 0
        raw.append(ft)
        if ft == 0:
            raw += row
        else:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pred = (
                    a if ft == 1
                    else b if ft == 2
                    else (a + b) // 2 if ft == 3
                    else _paeth(a, b, c)
                )
                raw.append((row[i] - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> dict:
    """Decode a PNG to raw pixel bytes. Returns ``{format, width, height,
    bit_depth, color_type, channels, pixels}``; verifies the signature and
    every chunk CRC, unfilters all five filter types. Raises ValueError on
    malformed input, NotImplementedError on valid-but-unsupported PNGs
    (bit depth != 8, palette/alpha color types, interlacing)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, hdr, idat, saw_end = 8, None, bytearray(), False
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(data):
            raise ValueError(f"truncated chunk {ctype!r}")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != zlib.crc32(ctype + payload) & 0xFFFFFFFF:
            raise ValueError(f"CRC mismatch in chunk {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            saw_end = True
            break
    if hdr is None:
        raise ValueError("missing IHDR")
    if not saw_end:
        raise ValueError("truncated PNG: missing IEND")
    width, height, bit_depth, color_type, comp, filt, interlace = hdr
    if bit_depth != 8 or color_type not in _CHANNELS or interlace:
        raise NotImplementedError(
            f"unsupported PNG variant (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace})"
        )
    if comp or filt:
        raise ValueError("invalid compression/filter method")
    ch = _CHANNELS[color_type]
    stride = width * ch
    expected = (stride + 1) * height
    # bounded inflate (review r10 #4): a crafted IDAT can expand ~1000x
    # per stream, and decompress() materializes ALL of it before any size
    # check could run — inside a mapInPandas worker that's an executor
    # OOM, not a ValueError. Cap at expected+1: one extra byte is enough
    # to distinguish "exactly right" from "too much".
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expected + 1)
    if len(raw) != expected or not dec.eof or dec.unconsumed_tail:
        raise ValueError(
            f"decompressed {len(raw)}{'+' if not dec.eof else ''} bytes, "
            f"expected {expected}"
        )
    out = bytearray(stride * height)
    prev = bytes(stride)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        row = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if ft > 4:
            raise ValueError(f"bad filter type {ft} on row {r}")
        if ft:
            for i in range(stride):
                a = row[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pred = (
                    a if ft == 1
                    else b if ft == 2
                    else (a + b) // 2 if ft == 3
                    else _paeth(a, b, c)
                )
                row[i] = (row[i] + pred) & 0xFF
        out[r * stride : (r + 1) * stride] = row
        prev = bytes(row)
    return {
        "format": "png",
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "channels": ch,
        "pixels": bytes(out),
    }


def encode_wav(
    frames: bytes, sample_rate: int = 8000, n_channels: int = 1,
    bits_per_sample: int = 8,
) -> bytes:
    """Encode raw PCM frame bytes as a canonical RIFF/WAVE file."""
    if bits_per_sample not in (8, 16):
        raise ValueError("bits_per_sample must be 8 or 16")
    block = n_channels * bits_per_sample // 8
    if len(frames) % block:
        raise ValueError(f"frame buffer not a multiple of block align {block}")
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block, block,
        bits_per_sample,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> dict:
    """Decode a PCM RIFF/WAVE file. Returns ``{format, n_channels,
    sample_rate, bits_per_sample, n_samples, frames}``."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    pos, fmt, frames = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if length < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", payload[:16])
        elif cid == b"data":
            frames = payload
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        raise ValueError("missing fmt/data chunk")
    tag, n_channels, sample_rate, _, block, bits = fmt
    if tag != 1:
        raise NotImplementedError(f"non-PCM WAV (format tag {tag})")
    if block != n_channels * bits // 8 or block == 0:
        # block == 0 (n_channels=0/bits=0) would pass the consistency
        # check as 0 == 0 and then ZeroDivide below (review r10 #8)
        raise ValueError("inconsistent block align")
    return {
        "format": "wav",
        "n_channels": n_channels,
        "sample_rate": sample_rate,
        "bits_per_sample": bits,
        "n_samples": len(frames) // block,
        "frames": frames,
    }

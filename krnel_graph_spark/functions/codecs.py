"""Pure-stdlib media codecs: PNG (zlib + struct) and WAV (wave).

The container has no Pillow/torchaudio/PyAV, so the multimodal operators
historically stubbed ALL decoding behind ``_require_codec``. These two
formats need nothing beyond the standard library, which makes the
metadata→decode→feature path REAL for PNG images and PCM WAV audio:

- PNG: 8-bit greyscale / RGB / RGBA, all five scanline filter types
  (None/Sub/Up/Average/Paeth) on decode, CRC-verified chunks; the encoder
  emits filter-0 scanlines (always valid PNG).
- WAV: 16-bit PCM mono/stereo through the stdlib ``wave`` reader/writer.
- Y4M (YUV4MPEG2): uncompressed video — Cmono/C420/C422/C444 luma-plane
  decode, Cmono/C420jpeg encode — the one real video container that needs
  no compression library.

Scale note: these run INSIDE ``mapInPandas`` workers (bytes never touch
the driver). Decode cost is per-pixel Python only for Sub/Average/Paeth
filtered rows (numpy-vectorized for None/Up); at 100 TB you would swap
``decode_png`` for Pillow-SIMD behind the same seam — the operator
contract (binary in, typed rows out, batch-bounded memory) is identical.

Reference parity note: the reference (krnel-graph) has no media codecs at
all; this surface exists for the training-data-pipeline mandate.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an 8-bit pixel array as a real PNG (filter-0 scanlines).

    ``pixels``: ``(h, w)`` uint8 for greyscale, ``(h, w, 3)`` RGB,
    ``(h, w, 4)`` RGBA.
    """
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported pixel shape {arr.shape}")
    h, w = arr.shape[:2]
    if h < 1 or w < 1:
        raise ValueError("empty image")
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIGNATURE


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to an 8-bit pixel array (``(h, w)`` or ``(h, w, c)``).

    Handles every filter type; rejects bad CRCs, non-8-bit depth, and
    interlaced images (honest ``NotImplementedError``, not silence).
    """
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    idat = bytearray()
    w = h = color_type = None
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"only 8-bit depth (got {depth})")
            if interlace:
                raise NotImplementedError("Adam7 interlace not supported")
            if color_type not in _COLOR_CHANNELS:
                raise ValueError(f"bad color type {color_type}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    channels = _COLOR_CHANNELS[color_type]
    stride = w * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    bpp = channels  # bytes per pixel at 8-bit depth
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif ftype == 2:  # Up (uint8 add wraps mod 256 by itself)
            line += prev
        elif ftype == 3:  # Average
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype} on row {y}")
        out[y] = line
        prev = line
    return out.reshape(h, w, channels) if channels > 1 else out.reshape(h, w)


Y4M_MAGIC = b"YUV4MPEG2 "


def encode_y4m(
    frames: np.ndarray, fps: tuple[int, int] = (25, 1), chroma: str = "mono"
) -> bytes:
    """Encode greyscale frames ``(n, h, w) uint8`` as a YUV4MPEG2 stream.

    ``Cmono`` carries the Y plane only — exactly invertible for greyscale;
    ``C420jpeg`` pads neutral (128) chroma planes for players that want
    them. Y4M is the one real video container parseable with zero
    dependencies, which is what makes the video path testable here."""
    arr = np.ascontiguousarray(frames, dtype=np.uint8)
    if arr.ndim != 3:
        raise ValueError("frames must be (n, h, w) uint8")
    n, h, w = arr.shape
    if chroma not in ("mono", "420jpeg"):
        raise ValueError("chroma must be 'mono' or '420jpeg'")
    if chroma == "420jpeg" and (h % 2 or w % 2):
        raise ValueError("C420 needs even dimensions")
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\n".encode()
    out = bytearray(head)
    neutral = b"\x80" * ((h // 2) * (w // 2)) if chroma == "420jpeg" else b""
    for f in range(n):
        out += b"FRAME\n" + arr[f].tobytes() + neutral + neutral
    return bytes(out)


def is_y4m(data: bytes) -> bool:
    return data[: len(Y4M_MAGIC)] == Y4M_MAGIC


def decode_y4m(data: bytes) -> tuple[tuple[int, int], np.ndarray]:
    """Decode a YUV4MPEG2 stream → ``((fps_num, fps_den), (n, h, w) uint8)``
    Y planes. Supports Cmono and C420* (chroma planes are skipped — the
    luma plane is what the feature/fingerprint operators consume)."""
    if not is_y4m(data):
        raise ValueError("not a Y4M stream (bad magic)")
    nl = data.index(b"\n")
    w = h = None
    fps = (25, 1)
    chroma = "420jpeg"
    for tok in data[len(Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:].decode()
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif key == b"C":
            chroma = val
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if chroma == "mono":
        chroma_len = 0
    elif chroma.startswith("420"):
        chroma_len = 2 * ((h // 2) * (w // 2))
    elif chroma.startswith("444"):
        chroma_len = 2 * h * w
    elif chroma.startswith("422"):
        chroma_len = 2 * ((w // 2) * h)
    else:
        raise NotImplementedError(f"chroma subsampling C{chroma}")
    y_len = w * h
    frames = []
    pos = nl + 1
    while pos < len(data):
        fr_nl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = fr_nl + 1
        if pos + y_len > len(data):
            raise ValueError("truncated frame")
        frames.append(
            np.frombuffer(data, dtype=np.uint8, count=y_len, offset=pos).reshape(
                h, w
            )
        )
        pos += y_len + chroma_len
    return fps, np.stack(frames) if frames else np.empty((0, h, w), np.uint8)


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode 16-bit PCM samples (``(n,)`` mono or ``(n, ch)``) as WAV."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(arr.shape[1])
        f.setsampwidth(2)
        f.setframerate(int(rate))
        f.writeframes(np.ascontiguousarray(arr).tobytes())
    return buf.getvalue()


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a 16-bit PCM WAV → ``(sample_rate, (n, channels) int16)``."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError(
                f"only 16-bit PCM (got {8 * f.getsampwidth()}-bit)"
            )
        n, ch = f.getnframes(), f.getnchannels()
        arr = np.frombuffer(f.readframes(n), dtype="<i2").reshape(n, ch)
    return f.getframerate(), arr

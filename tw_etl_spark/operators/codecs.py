"""Dependency-free media codecs backing the ``decoder="real"`` tier of
:mod:`tw_etl_spark.operators.multimodal`.

The reference probes and transcodes media with ffprobe/ffmpeg
(/root/reference/convert.sh:44-48 extracts width/height via ffprobe;
convert.sh:73-97 re-encodes). This container ships no media libraries,
so the engine implements the simplest honest subset itself, byte-level:

- **PPM (P6)** — uncompressed RGB, the classic netpbm format.
- **BMP** — 24-bit uncompressed (BITMAPINFOHEADER, BI_RGB), bottom-up.
- **WAV** — RIFF/WAVE, PCM16 (format tag 1).

Everything here is driver/executor-side *pure Python + numpy* invoked
from Arrow-batched ``mapInPandas`` — no Spark dependency, so it unit
tests without a session.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- sniff


def sniff(payload: bytes | None) -> str | None:
    """Identify a payload by magic bytes: 'ppm' | 'bmp' | 'wav' | None."""
    if not payload:
        return None
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ----------------------------------------------------------------- PPM


def _ppm_token(b: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited token, skipping '#' comments."""
    while pos < len(b):
        c = b[pos : pos + 1]
        if c == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < len(b) and not b[pos : pos + 1].isspace():
        pos += 1
    return b[start:pos], pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 → (height, width, 3) uint8 RGB array."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = 2
    vals = []
    for _ in range(3):
        tok, pos = _ppm_token(payload, pos)
        vals.append(int(tok))
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    pos += 1  # single whitespace byte after maxval
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) != need:
        raise ValueError(f"truncated PPM raster: {len(raster)} != {need}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img.astype(np.uint8)
    ).tobytes()


def decode_ppm_stream(payload: bytes) -> list[np.ndarray]:
    """Concatenated P6 PPMs (the dependency-free video container the
    dd13 tier synthesizes: one PPM per frame, back to back) → list of
    (height, width, 3) uint8 frames. Each frame's length is known from
    its own header, so the scan is sequential and honest — a malformed
    or truncated frame raises like :func:`decode_ppm` would."""
    frames: list[np.ndarray] = []
    pos = 0
    while pos < len(payload):
        if payload[pos : pos + 2] != b"P6":
            raise ValueError(f"frame {len(frames)}: not a P6 header at {pos}")
        p = pos + 2
        vals = []
        for _ in range(3):
            tok, p = _ppm_token(payload, p)
            vals.append(int(tok))
        w, h, maxval = vals
        if maxval != 255:
            raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
        p += 1
        need = w * h * 3
        raster = payload[p : p + need]
        if len(raster) != need:
            raise ValueError(
                f"frame {len(frames)}: truncated raster {len(raster)} != {need}"
            )
        frames.append(np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3))
        pos = p + need
    if not frames:
        raise ValueError("empty PPM stream")
    return frames


# ----------------------------------------------------------------- BMP


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (height, width, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4-byte boundary
    rows = np.frombuffer(
        payload[data_offset : data_offset + row_bytes * h], dtype=np.uint8
    ).reshape(h, row_bytes)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return img[::-1] if bottom_up else img


def encode_bmp(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = img.astype(np.uint8)[:, :, ::-1]  # RGB → BGR
    raster[:, : w * 3] = bgr[::-1].reshape(h, w * 3)  # bottom-up
    data = raster.tobytes()
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return file_header + info_header + data


# ----------------------------------------------------------------- WAV


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 → (sample_rate, (n_frames, channels) int16 array)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits = 12, None, None, None
    data = None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            fmt_tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1 or bits != 16:
                raise ValueError(f"only PCM16 WAV supported (tag={fmt_tag}, bits={bits})")
        elif chunk_id == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None or channels is None or channels < 1:
        raise ValueError("WAV missing usable fmt/data chunk")
    samples = np.frombuffer(data[: len(data) - len(data) % (2 * channels)], dtype="<i2")
    return rate, samples.reshape(-1, channels)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


# ------------------------------------------------------------ transforms


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps — pure numpy."""
    h, w = img.shape[:2]
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return img[rows][:, cols]


def probe(payload: bytes | None) -> dict:
    """ffprobe analog: codec + dimensions/duration from the bytes alone
    (reference extracts exactly width/height/duration this way,
    convert.sh:44-48)."""
    codec = sniff(payload)
    out = {
        "codec": codec,
        "width": None,
        "height": None,
        "sample_rate": None,
        "duration_ms": None,
    }
    if codec in ("ppm", "bmp"):
        img = decode_ppm(payload) if codec == "ppm" else decode_bmp(payload)
        out["height"], out["width"] = img.shape[:2]
    elif codec == "wav":
        rate, samples = decode_wav(payload)
        out["sample_rate"] = rate
        out["duration_ms"] = int(len(samples) * 1000 / rate)
    return out


# ------------------------------------------------------------- features


def image_features(img: np.ndarray, dim_side: int = 4) -> np.ndarray:
    """dim_side² grayscale thumbnail means in [0,1] — a real, content-
    derived embedding (16-dim at the default)."""
    gray = img.astype(np.float64).mean(axis=2)
    thumb = resize_nearest(gray[:, :, None], dim_side, dim_side)[:, :, 0]
    return (thumb / 255.0).astype(np.float32).ravel()


def audio_features(samples: np.ndarray, n_windows: int = 16) -> np.ndarray:
    """RMS energy over n equal windows, normalized to [0,1]."""
    mono = samples.astype(np.float64).mean(axis=1)
    if len(mono) == 0:
        return np.zeros(n_windows, dtype=np.float32)
    bounds = np.linspace(0, len(mono), n_windows + 1).astype(int)
    rms = np.array(
        [
            np.sqrt(np.mean(mono[a:b] ** 2)) if b > a else 0.0
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
    )
    return (rms / 32768.0).astype(np.float32)

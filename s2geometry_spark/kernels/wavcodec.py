"""Real RIFF/PCM WAV codec — pure stdlib struct + NumPy.

The audio leg of the builder brief's multimodal axis (image/audio/video
as opaque binary columns).  PNG (stdlib zlib) and baseline JPEG/MJPEG
(kernels/jpegcodec) are already real; this closes audio with the actual
interchange format: canonical RIFF/WAVE files with a 16-byte PCM
``fmt `` chunk and little-endian int16 samples (WAVE spec / RFC 2361
format tag 1).  The decoder WALKS the chunk list (skipping unknown
chunks and honoring their padding byte) rather than assuming a fixed
44-byte header, so any standard PCM16 WAV parses.

PCM is lossless, so decode(encode(x)) == x EXACTLY — the audio
invariant is exact equality, not a PSNR floor.

No s2geometry counterpart; cited to the builder brief.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Canonical PCM16 WAV.  ``samples``: (n,) or (n, channels) int16."""
    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.astype("<i2").tobytes()  # interleaved frames
    block_align = 2 * ch
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * block_align, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """-> ((n, channels) int16 samples, sample rate).  Walks the RIFF
    chunk list; raises ValueError on malformed or non-PCM16 input."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    riff_len = struct.unpack("<I", b[4:8])[0]
    if riff_len + 8 > len(b):
        raise ValueError("truncated RIFF payload")
    pos = 12
    fmt_info = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        clen = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            tag, ch, rate, _brate, _align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported format tag={tag} bits={bits}")
            fmt_info = (ch, rate)
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if fmt_info is None or data is None:
        raise ValueError("missing fmt or data chunk")
    ch, rate = fmt_info
    s = np.frombuffer(data, dtype="<i2")
    if ch > 1:
        s = s[: (len(s) // ch) * ch].reshape(-1, ch)
    else:
        s = s[:, None]
    return s.astype(np.int16), rate


def gen_samples(idx: int, n: int, channels: int) -> np.ndarray:
    """Deterministic (n, channels) int16 waveform — two integer square
    waves plus hash noise, pure integer arithmetic (no float summation
    order anywhere, so every engine regenerates it bit-identically)."""
    t = np.arange(n, dtype=np.int64)
    out = np.empty((n, channels), np.int16)
    for c in range(channels):
        seed = np.uint64(idx * 1_000_003 + c * 7919 + 13)
        p1 = 20 + int(seed % np.uint64(90))
        p2 = 7 + int((seed >> np.uint64(8)) % np.uint64(40))
        sq1 = np.where((t // p1) % 2 == 0, 9000, -9000)
        sq2 = np.where((t // p2) % 2 == 0, 4000, -4000)
        # splitmix64-style per-sample noise, folded to [-2048, 2047]
        z = (t.astype(np.uint64) + seed) * np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        noise = (z >> np.uint64(52)).astype(np.int64) - 2048
        out[:, c] = (sq1 + sq2 + noise).astype(np.int16)
    return out
